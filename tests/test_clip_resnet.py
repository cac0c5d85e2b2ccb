"""ModifiedResNet CLIP tower: value parity vs the reference torch classes
(model_explainability.py:17-185) with converted weights."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_oracle import ref_clip_module  # noqa: E402

from semantic_abstraction_tpu.clip import convert_clip_state_dict, encode_image  # noqa: E402
from semantic_abstraction_tpu.clip.resnet import (  # noqa: E402
    convert_resnet_visual,
    modified_resnet_forward,
)


def test_modified_resnet_tower_parity():
    me = ref_clip_module("model_explainability")
    torch.manual_seed(0)
    width, heads = 8, (8 * 32) // 64
    ref = me.ModifiedResNet(
        layers=[1, 1, 1, 1], output_dim=32, heads=heads,
        input_resolution=64, width=width,
    ).float().eval()
    rs = np.random.RandomState(0)
    pixels = rs.randn(2, 3, 64, 64).astype(np.float32) * 0.5
    with torch.no_grad():
        expected = ref(torch.from_numpy(pixels)).numpy()
    visual, vcfg = convert_resnet_visual(
        {k: v for k, v in ref.state_dict().items()}, prefix=""
    )
    assert vcfg == {
        "layers": (1, 1, 1, 1), "width": width, "output_dim": 32,
        "heads": heads, "input_resolution": 64,
    }
    visual = jax.tree_util.tree_map(jnp.asarray, visual)
    got = np.asarray(
        modified_resnet_forward(visual, jnp.asarray(pixels), heads)
    )
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-3)


def test_resnet_clip_checkpoint_conversion_and_encode():
    """Full RN-style CLIP state dict -> auto-detected config + encode_image
    dispatch (reference build_model :549-557 infers the same way)."""
    me = ref_clip_module("model_explainability")
    torch.manual_seed(1)
    ref = me.CLIP(
        embed_dim=32,
        image_resolution=64,
        vision_layers=(1, 1, 1, 1),  # tuple -> ModifiedResNet
        vision_width=8,
        vision_patch_size=None,
        context_length=16,
        vocab_size=128,
        transformer_width=32,
        transformer_heads=1,
        transformer_layers=1,
    ).float().eval()
    sd = {k: v for k, v in ref.state_dict().items()}
    params, cfg = convert_clip_state_dict(sd)
    assert cfg.vision_arch == "resnet"
    assert cfg.resnet_layers == (1, 1, 1, 1)
    assert cfg.vision_heads == (8 * 32) // 64
    params = jax.tree_util.tree_map(jnp.asarray, params)
    rs = np.random.RandomState(1)
    pixels = rs.randn(2, 3, 64, 64).astype(np.float32) * 0.5
    with torch.no_grad():
        expected = ref.encode_image(torch.from_numpy(pixels)).numpy()
    got = np.asarray(encode_image(params, jnp.asarray(pixels), cfg))
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-3)
    with pytest.raises(ValueError):
        encode_image(params, jnp.asarray(pixels), cfg,
                     tile_attn_mask=jnp.zeros((5, 5)))
