"""Parity tests: JAX CLIP vs the reference torch CLIP on identical weights.

A small randomly-initialized reference CLIP (model_explainability.py classes,
imported as oracle) is converted with ``convert_clip_state_dict`` and both
encoders plus the Chefer relevancy must agree.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_oracle import ref_clip_module  # noqa: E402
from semantic_abstraction_tpu.clip import (  # noqa: E402
    ClipConfig,
    convert_clip_state_dict,
    encode_image,
    encode_text,
    gradcam,
    tokenize,
)

# small-but-nontrivial config; vision_heads = width//64 = 2
SMALL = ClipConfig(
    embed_dim=64,
    image_resolution=64,
    vision_layers=4,
    vision_width=128,
    vision_patch_size=16,
    context_length=20,
    vocab_size=512,
    text_width=64,
    text_heads=1,
    text_layers=2,
)


@pytest.fixture(scope="module")
def models():
    me = ref_clip_module("model_explainability")
    torch.manual_seed(0)
    ref = me.CLIP(
        embed_dim=SMALL.embed_dim,
        image_resolution=SMALL.image_resolution,
        vision_layers=SMALL.vision_layers,
        vision_width=SMALL.vision_width,
        vision_patch_size=SMALL.vision_patch_size,
        context_length=SMALL.context_length,
        vocab_size=SMALL.vocab_size,
        transformer_width=SMALL.text_width,
        transformer_heads=SMALL.text_heads,
        transformer_layers=SMALL.text_layers,
    ).float().eval()
    sd = {k: v for k, v in ref.state_dict().items()}
    params, cfg = convert_clip_state_dict(sd, SMALL)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return ref, params


def test_encode_image_parity(models):
    ref, params = models
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(3, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        expected = ref.encode_image(torch.from_numpy(pixels)).numpy()
    got = np.asarray(encode_image(params, jnp.asarray(pixels), SMALL))
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


def test_encode_text_parity(models):
    ref, params = models
    rng = np.random.default_rng(1)
    tokens = rng.integers(1, SMALL.vocab_size, size=(4, SMALL.context_length))
    tokens[:, -1] = SMALL.vocab_size - 1  # force EOT argmax at the end
    with torch.no_grad():
        expected = ref.encode_text(torch.from_numpy(tokens)).numpy()
    got = np.asarray(encode_text(params["text"], jnp.asarray(tokens), SMALL))
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


def test_transformer_forward_need_probs_paths_agree(models):
    """The fused no-probs scan (Pallas kernel forced via interpret mode)
    produces the same output as the probs-returning scan."""
    from unittest import mock

    from semantic_abstraction_tpu.clip.model import transformer_forward
    from semantic_abstraction_tpu.ops import pallas_kernels

    _, params = models
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 17, SMALL.vision_width)), jnp.float32)
    out_probs, probs = transformer_forward(
        params["visual"]["blocks"], x, SMALL.vision_heads, need_probs=True
    )
    assert probs is not None
    orig = pallas_kernels.fused_mha

    def fused_interpret(q, k, v, num_heads, interpret=False):
        return orig(q, k, v, num_heads, True)

    with mock.patch.object(pallas_kernels, "fused_mha", fused_interpret):
        out_fast, none_probs = transformer_forward(
            params["visual"]["blocks"], x, SMALL.vision_heads, need_probs=False
        )
    assert none_probs is None
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_probs),
                               atol=2e-4, rtol=1e-3)


def _torch_interpret(ref_model, pixels, zw, num_layers, positive_attn_only=True):
    """Torch oracle reproducing clip_gradcam.interpret (clip_gradcam.py:70-132)
    via autograd on the reference hooked model, generalized so the head-mean
    does not rely on num_heads == num_blocks (the reference's view only works
    for ViT-B; see clip_gradcam.py:98-115)."""
    x = torch.from_numpy(pixels).requires_grad_(False)
    feats = ref_model.encode_image(x)
    feats = feats / feats.norm(dim=-1, keepdim=True)
    logits = 100.0 * feats @ torch.from_numpy(zw)
    blocks = list(ref_model.visual.transformer.resblocks.children())
    b = pixels.shape[0]
    num_tokens = blocks[0].attn_probs.shape[-1]
    num_prompts = logits.shape[1]
    one_hot = [logit for logit in logits.sum(dim=0)]
    R = torch.eye(num_tokens).repeat(num_prompts, b, 1, 1)
    for i, block in enumerate(blocks):
        if i <= num_layers:
            continue
        grad = torch.stack(
            [
                torch.autograd.grad(l, [block.attn_probs], retain_graph=True)[0].detach()
                for l in one_hot
            ]
        )
        heads = block.attn_probs.shape[0] // b
        grad = grad.view(num_prompts, b, heads, num_tokens, num_tokens)
        cam = block.attn_probs.detach().view(1, b, heads, num_tokens, num_tokens)
        cam = grad * cam
        if positive_attn_only:
            cam = cam.clamp(min=0)
        cam = cam.mean(dim=2)
        R = R + torch.einsum("pbij,pbjk->pbik", cam, R)
    rel = R[:, :, 0, 1:]
    g = int(round((num_tokens - 1) ** 0.5))
    return rel.reshape(num_prompts, b, g, g).detach().numpy()


@pytest.mark.parametrize("num_layers", [2, 0])
def test_gradcam_parity(models, num_layers):
    """Relevancy parity incl. multi-tail-block accumulation (num_layers=0
    exercises 3 chained cam blocks; 2 is the single-tail ViT-B-style path)."""
    ref, params = models
    rng = np.random.default_rng(2)
    pixels = rng.normal(size=(2, 3, 64, 64)).astype(np.float32) * 0.5
    zw = rng.normal(size=(SMALL.embed_dim, 3)).astype(np.float32)
    zw /= np.linalg.norm(zw, axis=0, keepdims=True)

    expected = _torch_interpret(ref, pixels, zw, num_layers)
    got = np.asarray(
        gradcam(params["visual"], jnp.asarray(pixels), jnp.asarray(zw), SMALL, num_layers)
    )
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-2)


def test_tokenize_matches_reference():
    from ref_oracle import ref_clip_module

    st = ref_clip_module("simple_tokenizer")
    ref_tok = st.SimpleTokenizer()
    texts = [
        "a photograph of a nintendo switch in a home.",
        "abstract painting of a vespa",
        "the embroidered fireplace.",
    ]
    ours = tokenize(texts)
    for i, t in enumerate(texts):
        ref_ids = [49406] + ref_tok.encode(t) + [49407]
        np.testing.assert_array_equal(ours[i, : len(ref_ids)], ref_ids)
        assert ours[i, len(ref_ids):].sum() == 0
