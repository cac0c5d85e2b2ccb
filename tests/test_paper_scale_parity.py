"""PAPER-SCALE oracle parity (slow lane): the operating points the tiny
composed-parity suites do not cover.

Every other oracle test runs reduced configs (16^3 voxels / 4-level UNets in
test_ref_net_parity.py, a 4-layer 64-res CLIP in
test_saliency_composed_parity.py). Scale-dependent seams — linear-index
magnitudes at 128^3 (2.1M voxels), the 6-level UNet's 4^3 bottleneck, the
50-token pos-emb anchor and num_layers=10 cutoff of the real 12-layer
ViT-B/32, f16 canvas accumulation on a real camera frame — only exist at
the paper's sizes. Two tests pin them, fp32 CPU, randomly-initialized
weights converted from the torch side:

- SemAbs3D forward at the FULL train config (reference utils.py:38-59:
  128^3 voxels, f_maps=16, num_channels=16, num_groups=8, num_levels=6,
  pts_feat_extractor_hidden_dim=128, 4 patches; points reduced to keep the
  1-vCPU runtime bounded) vs reference net.py SemAbs3D.
- Composed get_clip_saliency at REAL ViT-B/32 dims on the real ARKit demo
  frame (reference scene_files/arkit_vn_poster.pkl, the generate_relevancy
  image-demo input) vs reference ClipWrapper — one full-frame crop scale so
  the torch side stays tractable on 1 vCPU; augs off, flip ON
  (deterministic, __init__.py:170-204).
"""
import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_oracle import fake_text_feature, ref_net_module  # noqa: E402

pytestmark = pytest.mark.slow

REF_ROOT = "/root/reference"


def test_semabs3d_paper_scale_forward_parity():
    """Full 128^3 / 6-level config (reference utils.py:38-59), reduced
    point counts; fp32 both sides."""
    refnet = ref_net_module()
    torch.manual_seed(0)
    kw = dict(
        voxel_shape=(128, 128, 128),
        scene_bounds=((-1.0, -1.0, -0.1), (1.0, 1.0, 1.9)),
        network_inputs=["saliency"],
        use_pts_feat_extractor=True,
        pts_feat_extractor_hidden_dim=128,
        reduce_method="max",
        # the paper regime (utils.py:77 default True); the reference
        # CLASS default is False (net.py:334) — pin it explicitly so both
        # sides build the 19-in (16ch + xyz) decoder
        decoder_concat_xyz_pts=True,
        batch_size=1,
        device="cpu",
        unet_num_channels=16,
        unet_f_maps=16,
        unet_num_groups=8,
        unet_num_levels=6,
    )
    net = refnet.SemAbs3D(**kw).eval()
    rs = np.random.RandomState(0)
    b, p, n, m = 1, 4, 4096, 8192
    xyz = rs.uniform(-1.2, 2.1, (b, n, 3)).astype(np.float32)
    feats = rs.randn(b, p, n, 1).astype(np.float32)
    out_pts = rs.uniform(-1.2, 2.1, (b, p, m, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(
            input_xyz_pts=torch.from_numpy(xyz),
            input_feature_pts=torch.from_numpy(feats),
            tsdf_vol=None,
            output_xyz_pts=torch.from_numpy(out_pts),
        ).numpy()

    from semantic_abstraction_tpu.models import SemAbs3DConfig, semabs3d_forward
    from semantic_abstraction_tpu.models.convert import (
        convert_semabs3d_state_dict,
    )

    cfg = SemAbs3DConfig(
        voxel_shape=(128, 128, 128),
        scene_bounds=((-1.0, -1.0, -0.1), (1.0, 1.0, 1.9)),
        network_inputs=("saliency",),
        use_pts_feat_extractor=True,
        pts_feat_extractor_hidden_dim=128,
        reduce_method="max",
        unet_num_channels=16,
        unet_f_maps=16,
        unet_num_groups=8,
        unet_num_levels=6,
        unet_batch_chunk=0,
        unet_remat_policy="full",
    )
    sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_semabs3d_state_dict(sd))
    ours = np.asarray(
        jax.jit(
            lambda pr, a, f2, o: semabs3d_forward(
                pr, cfg, a, f2, o, compute_dtype=jnp.float32
            )
        )(params, jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(out_pts))
    )
    assert ours.shape == ref.shape == (b, p, m)
    # 6 levels of f32 convs + GN accumulate ~1e-4-scale drift on logits of
    # O(1); correlation pins the composed structure
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)
    cc = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert cc > 0.99999, cc


@pytest.fixture(scope="module")
def arkit_img():
    path = os.path.join(REF_ROOT, "scene_files", "arkit_vn_poster.pkl")
    if not os.path.exists(path):
        pytest.skip("reference ARKit scene file missing")
    with open(path, "rb") as f:
        scene = pickle.load(f)
    img = np.asarray(scene["rgb"], dtype=np.uint8)
    assert img.shape[2] == 3
    return img


def test_composed_saliency_vitb32_arkit_parity(arkit_img):
    """Composed pipeline at REAL ViT-B/32 dims (12 layers, width 768,
    patch 32, embed 512 — the released checkpoint's architecture,
    reference CLIP/clip/clip_explainability.py) on the real ARKit frame,
    vs the reference ClipWrapper. One full-frame-height crop scale
    (2 tiles) keeps the torch side tractable on 1 vCPU; flip ON.

    Pins the paper-dim seams: the 50-token sequence (7x7 grid + CLS),
    num_layers=10 against 12 blocks (the released default — exactly the
    closed-form single-tail fast path's regime, relevancy.py), 768-wide
    attention with 12 heads, and f16 canvas accumulation on the real
    frame.
    """
    import dataclasses  # noqa: F401

    from test_saliency_composed_parity import _matmul_preprocess
    from ref_oracle import ref_clip_module, ref_clip_wrapper_module

    from semantic_abstraction_tpu.clip import (
        VIT_B_32,
        ClipSaliency,
        CropSpec,
        SaliencyConfig,
        convert_clip_state_dict,
    )

    me = ref_clip_module("model_explainability")
    wrap = ref_clip_wrapper_module()
    torch.manual_seed(0)
    ref_model = me.CLIP(
        embed_dim=VIT_B_32.embed_dim,
        image_resolution=VIT_B_32.image_resolution,
        vision_layers=VIT_B_32.vision_layers,
        vision_width=VIT_B_32.vision_width,
        vision_patch_size=VIT_B_32.vision_patch_size,
        context_length=VIT_B_32.context_length,
        vocab_size=VIT_B_32.vocab_size,
        transformer_width=VIT_B_32.text_width,
        transformer_heads=VIT_B_32.text_heads,
        transformer_layers=VIT_B_32.text_layers,
    ).float().eval()

    GC = wrap.ClipGradcam
    gc = GC.__new__(GC)
    torch.nn.Module.__init__(gc)
    gc.clip_model_name = "ViT-B/32"
    gc.model = ref_model
    gc.preprocess = _matmul_preprocess(VIT_B_32.image_resolution)
    gc.templates = ["a photograph of a {} in a home."]
    gc.device = "cpu"
    gc.target_classes = None
    gc.num_layers = 10  # the released default (reference __init__.py:64)
    gc.positive_attn_only = True
    gc.num_res_attn_blocks = VIT_B_32.vision_width // 64  # 12 heads
    W0 = wrap.ClipWrapper
    W0.device = "cpu"
    W0.clip_model = ref_model
    W0.clip_gradcam = gc
    W0.jittering_transforms = None

    class W(W0):
        @classmethod
        def create_tiles(cls, **kwargs):
            tiles, tile_imgs, counts, tile_sizes = W0.create_tiles.__func__(
                cls, **kwargs
            )
            arr = np.empty(len(tiles), dtype=object)
            for i in range(len(tiles)):
                arr[i] = tuple(tiles[i])
            return arr, tile_imgs, counts, tile_sizes

    img = arkit_img  # (256, 192, 3) real ARKit capture
    ts = min(img.shape[:2])  # the dataset writer sizes crops from the
    # short side (reference generate_relevancy.py:75-80)
    labels = ["vespa", "poster", "wall"]
    prompts = ["a photograph of a {} in a home."]
    crops = [{"tile_size": ts, "stride": ts // 4}]
    ref_maps, _ = W.get_clip_saliency(
        img=img,
        text_labels=labels,
        prompts=prompts,
        horizontal_flipping=True,
        positive_attn_only=True,
        augmentations=0,
        cropping_augmentations=crops,
    )
    ref_maps = ref_maps.float().numpy()

    params, cfg = convert_clip_state_dict(
        {k: v for k, v in ref_model.state_dict().items()}, VIT_B_32
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    ours = ClipSaliency(params, cfg, tile_batch_size=8, num_layers=10)
    config = SaliencyConfig(
        crops=(CropSpec(ts, ts // 4),),
        horizontal_flipping=True,
        augmentations=0,
    )
    maps, _ = ours.get_clip_saliency(img, labels, tuple(prompts), config)
    maps = np.asarray(maps).astype(np.float32)

    assert maps.shape == ref_maps.shape == (3,) + img.shape[:2]
    scale = np.abs(ref_maps).max()
    np.testing.assert_allclose(maps, ref_maps, atol=2e-2 * scale, rtol=2e-2)
    cc = np.corrcoef(maps.ravel(), ref_maps.ravel())[0, 1]
    assert cc > 0.999, cc
