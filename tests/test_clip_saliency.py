"""Tests for the multi-scale saliency pipeline (tile plan, preprocessing,
jitter, accumulation, end-to-end shape/behavior)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semantic_abstraction_tpu.clip import (
    ClipConfig,
    ClipSaliency,
    CropSpec,
    SaliencyConfig,
    chefer_et_al_config,
    color_jitter,
    extract_tiles,
    init_clip_params,
    ours_config,
    tile_plan,
)
from semantic_abstraction_tpu.clip.saliency import (
    CLIP_PIXEL_MEAN,
    CLIP_PIXEL_STD,
)


def _reference_tile_loop(h, w, tile_size, stride):
    """Transcription of the reference create_tiles loop semantics
    (CLIP/clip/__init__.py:257-276): y over W (bounded by W-ts), x over H
    (bounded by H-ts), with the y<H / x<W skip quirks."""
    offs = []
    for y in range(0, w - tile_size + 1, stride):
        if y >= h:
            continue
        for x in range(0, h - tile_size + 1, stride):
            if x >= w:
                continue
            offs.append((x, y))
    return offs


@pytest.mark.parametrize("h,w", [(480, 640), (224, 224), (300, 400)])
def test_tile_plan_matches_reference_loop(h, w):
    cfg = ours_config(min(h, w))
    plans = tile_plan((h, w), cfg.crops, num_images=6)
    assert len(plans) == 4
    for crop, plan in zip(cfg.crops, plans):
        ref = _reference_tile_loop(h, w, crop.tile_size, crop.stride)
        assert plan.offsets.shape == (len(ref), 2)
        np.testing.assert_array_equal(plan.offsets, np.asarray(ref))
        # counts: 1e-5 + num_images per covering tile
        count = np.full((h, w), 1e-5, np.float32)
        for x, y in ref:
            count[x : x + crop.tile_size, y : y + crop.tile_size] += 6
        np.testing.assert_allclose(plan.count, count)


def test_tile_plan_regular_grid():
    plans = tile_plan((32, 48), (CropSpec(16, 8),), num_images=1)
    plan = plans[0]
    assert plan.nx * plan.ny == plan.offsets.shape[0]
    # y-outer, x-inner ordering with spacing = stride
    for t, (x, y) in enumerate(plan.offsets):
        iy, ix = divmod(t, plan.nx)
        assert x == ix * plan.stride and y == iy * plan.stride


def test_extract_tiles_matches_pil():
    PIL = pytest.importorskip("PIL.Image")
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (64, 80, 3), dtype=np.uint8)
    offsets = np.asarray([[0, 0], [10, 20], [32, 48]], np.int32)
    ts = 32
    imgs = jnp.asarray(img.transpose(2, 0, 1), jnp.float32)[None] / 255.0
    tiles = np.asarray(extract_tiles(imgs, jnp.asarray(offsets), ts, resolution=224))
    for k, (x, y) in enumerate(offsets):
        crop = img[x : x + ts, y : y + ts]
        pil = PIL.fromarray(crop).resize((224, 224), PIL.BICUBIC)
        ref = np.asarray(pil).astype(np.float32) / 255.0
        ref = (ref - CLIP_PIXEL_MEAN) / CLIP_PIXEL_STD
        got = tiles[k].transpose(1, 2, 0)
        # PIL works in uint8 fixed point between passes; allow small slack
        assert np.abs(got - ref).mean() < 0.05
        assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_color_jitter_valid_range_and_variation():
    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.rand(3, 32, 32).astype(np.float32))
    out1 = color_jitter(jax.random.PRNGKey(0), img)
    out2 = color_jitter(jax.random.PRNGKey(1), img)
    for out in (out1, out2):
        o = np.asarray(out)
        assert o.shape == (3, 32, 32)
        assert o.min() >= -1e-5 and o.max() <= 1 + 1e-5
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_color_jitter_hue_identity_when_zero():
    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.rand(3, 8, 8).astype(np.float32))
    from semantic_abstraction_tpu.clip.saliency import _adjust_hue

    out = np.asarray(_adjust_hue(img, 0.0))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-5)


@pytest.fixture(scope="module")
def tiny_saliency():
    # 2-layer ViT so gradcam's tail exists with num_layers=0
    cfg = ClipConfig(
        embed_dim=32, image_resolution=224, vision_layers=2, vision_width=64,
        vision_patch_size=32, context_length=77, vocab_size=49408,
        text_width=32, text_heads=2, text_layers=2,
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    return ClipSaliency(params, cfg, tile_batch_size=8,
                        num_layers=0)


def test_saliency_end_to_end_shapes(tiny_saliency):
    rs = np.random.RandomState(3)
    img = rs.randint(0, 255, (64, 96, 3), dtype=np.uint8)
    config = SaliencyConfig(
        crops=(CropSpec(64, 16), CropSpec(32, 8)),
        horizontal_flipping=True,
        augmentations=1,
    )
    maps, feats = tiny_saliency.get_clip_saliency(
        img, ["chair", "table", "sofa"], ["a photo of a {}"], config,
        key=jax.random.PRNGKey(0),
    )
    assert maps.shape == (3, 64, 96)
    assert feats.shape == (3, 32)
    m = np.asarray(maps)
    assert np.isfinite(m).all()
    # every pixel is covered by at least the full-image-height tiles
    assert (np.abs(m) > 0).any()


def test_scale_grouping_matches_per_scale(tiny_saliency):
    """Small scales grouped under one dispatch (_scale_group_fn) produce
    the same maps as the per-scale path: per-tile gradcam is
    batch-independent and chunk boundaries only regroup independent rows."""
    rs = np.random.RandomState(11)
    img = rs.randint(0, 255, (64, 96, 3), dtype=np.uint8)
    config = SaliencyConfig(
        crops=(CropSpec(64, 16), CropSpec(32, 8)),
        horizontal_flipping=True,
        augmentations=1,
    )
    labels = ["chair", "table", "sofa"]
    # fuse_scales off on both sides: this test pins the GROUPING
    # equivalence (shared gradcam sweep vs per-scale programs), so the
    # dispatch counts must reflect the group structure, not the mono fuse
    grouped = ClipSaliency(
        tiny_saliency.params, tiny_saliency.cfg, tile_batch_size=8,
        num_layers=0, fuse_scales=False,
    )
    ungrouped = ClipSaliency(
        tiny_saliency.params, tiny_saliency.cfg, tile_batch_size=8,
        num_layers=0, scale_group_tiles=0, fuse_scales=False,
    )
    maps_g, _ = grouped.get_clip_saliency(
        img, labels, ["a photo of a {}"], config, key=jax.random.PRNGKey(0)
    )
    maps_u, _ = ungrouped.get_clip_saliency(
        img, labels, ["a photo of a {}"], config, key=jax.random.PRNGKey(0)
    )
    # the grouped path really engaged: both scales in ONE group (hence one
    # dispatch even unfused), while the ungrouped instance needed two
    n_disp_g = [n for _, n in grouped._dispatch_jit.values()]
    n_disp_u = [n for _, n in ungrouped._dispatch_jit.values()]
    assert n_disp_g == [1] and n_disp_u == [2], (n_disp_g, n_disp_u)
    np.testing.assert_allclose(
        np.asarray(maps_g, np.float32), np.asarray(maps_u, np.float32),
        atol=1e-3, rtol=1e-3,
    )


def test_fuse_scales_matches_chain(tiny_saliency):
    """fuse_scales=True (ONE jitted dispatch per image: prep + every scale
    + combine) is value-identical to the default 2-dispatch chain — jit
    boundaries only regroup pure functions."""
    rs = np.random.RandomState(12)
    img = rs.randint(0, 255, (64, 96, 3), dtype=np.uint8)
    config = SaliencyConfig(
        crops=(CropSpec(64, 16), CropSpec(32, 8), CropSpec(16, 4)),
        horizontal_flipping=True,
        augmentations=1,
    )
    labels = ["chair", "table"]
    fused = ClipSaliency(
        tiny_saliency.params, tiny_saliency.cfg, tile_batch_size=8,
        num_layers=0, scale_group_tiles=40, fuse_scales=True,
    )
    chained = ClipSaliency(
        tiny_saliency.params, tiny_saliency.cfg, tile_batch_size=8,
        num_layers=0, scale_group_tiles=40, fuse_scales=False,
    )
    maps_f, _ = fused.get_clip_saliency(
        img, labels, ["a photo of a {}"], config, key=jax.random.PRNGKey(3)
    )
    maps_c, _ = chained.get_clip_saliency(
        img, labels, ["a photo of a {}"], config, key=jax.random.PRNGKey(3)
    )
    # 3 scale groups under cap 40 (6/90/546 tiles): the chain exercises
    # first (prep-fused), middle, and last (combine-fused) programs
    assert [n for _, n in fused._dispatch_jit.values()] == [1]
    assert [n for _, n in chained._dispatch_jit.values()] == [3]
    np.testing.assert_allclose(
        np.asarray(maps_f, np.float32), np.asarray(maps_c, np.float32),
        atol=1e-3, rtol=1e-3,
    )


def test_label_bucket_matches_exact(tiny_saliency):
    """label_bucket pads the label axis up to a multiple and slices back;
    per-label gradcam is independent so results are identical."""
    rs = np.random.RandomState(4)
    img = rs.randint(0, 255, (64, 96, 3), dtype=np.uint8)
    config = SaliencyConfig(
        crops=(CropSpec(64, 16),), horizontal_flipping=False, augmentations=0,
    )
    labels = ["chair", "table", "sofa"]
    bucketed = ClipSaliency(
        tiny_saliency.params, tiny_saliency.cfg, tile_batch_size=8,
        num_layers=0, label_bucket=4,
    )
    maps_b, feats_b = bucketed.get_clip_saliency(
        img, labels, ["a photo of a {}"], config, key=jax.random.PRNGKey(0)
    )
    maps_e, feats_e = tiny_saliency.get_clip_saliency(
        img, labels, ["a photo of a {}"], config, key=jax.random.PRNGKey(0)
    )
    assert maps_b.shape == (3, 64, 96) and feats_b.shape == (3, 32)
    np.testing.assert_allclose(np.asarray(feats_b), np.asarray(feats_e),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(maps_b, np.float32), np.asarray(maps_e, np.float32),
        atol=1e-3, rtol=1e-3,
    )


@pytest.mark.parametrize("hw,ts,stride,n_images", [
    ((48, 64), 32, 8, 1),       # ts = 4*stride (standard config shape)
    ((48, 64), 30, 8, 2),       # ts not a multiple of stride (partial block)
    ((40, 40), 20, 5, 3),
])
def test_saliency_accumulation_matches_bruteforce(tiny_saliency, hw, ts,
                                                  stride, n_images):
    """Scatter-free overlap-add == per-tile torch-interpolate accumulation."""
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(4)
    h, w = hw
    plans = tile_plan(hw, (CropSpec(ts, stride),), num_images=n_images)
    plan = plans[0]
    t = plan.offsets.shape[0]
    l = 2
    rel = rs.randn(l, n_images * t, 7, 7).astype(np.float32)
    canvas = np.asarray(
        tiny_saliency._accumulate(jnp.asarray(rel), plan, hw, n_images)
    )
    ref = np.zeros((l, h, w), np.float32)
    for i in range(n_images):
        up = torch.nn.functional.interpolate(
            torch.from_numpy(rel[:, i * t : (i + 1) * t]), size=ts,
            mode="bilinear", align_corners=False,
        ).numpy()
        for k, (x, y) in enumerate(plan.offsets):
            ref[:, x : x + ts, y : y + ts] += up[:, k]
    np.testing.assert_allclose(canvas, ref, atol=5e-4, rtol=1e-3)


def test_chefer_config_single_scale():
    cfg = chefer_et_al_config(224)
    assert len(cfg.crops) == 1
    assert cfg.augmentations == 0 and not cfg.horizontal_flipping


def test_gradcam_label_chunking_matches_unchunked():
    """prompt_batch_size chunking (reference CLIP/clip/__init__.py:157-169)
    changes memory, not values — 70 labels on the general multi-tail path."""
    from semantic_abstraction_tpu.clip import ClipConfig, init_clip_params
    from semantic_abstraction_tpu.clip.relevancy import gradcam
    from semantic_abstraction_tpu.clip.saliency import gradcam_label_chunked

    cfg = ClipConfig(
        embed_dim=16, image_resolution=32, vision_layers=3, vision_width=64,
        vision_patch_size=16, text_width=16, text_heads=1, text_layers=1,
    )
    params = init_clip_params(jax.random.PRNGKey(1), cfg)
    rs = np.random.RandomState(5)
    tiles = jnp.asarray(rs.randn(2, 3, 32, 32).astype(np.float32) * 0.1)
    zw = jnp.asarray(rs.randn(16, 70).astype(np.float32))
    full = gradcam(params["visual"], tiles, zw, cfg, num_layers=0)
    chunked = gradcam_label_chunked(
        params["visual"], tiles, zw, prompt_batch_size=16, cfg=cfg,
        num_layers=0,
    )
    assert chunked.shape == full.shape == (70, 2, 2, 2)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(full), atol=1e-5, rtol=1e-4
    )


def test_gradcam_single_tail_fast_path_matches_general():
    """The closed-form CLS-row gradient path (relevancy._gradcam_single_tail)
    == the general vmapped-VJP path."""
    from semantic_abstraction_tpu.clip import ClipConfig, init_clip_params
    from semantic_abstraction_tpu.clip.relevancy import gradcam

    cfg = ClipConfig(
        embed_dim=32, image_resolution=64, vision_layers=3, vision_width=64,
        vision_patch_size=16, text_width=32, text_heads=2, text_layers=2,
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    tiles = jnp.asarray(rs.randn(3, 3, 64, 64).astype(np.float32) * 0.1)
    zw = jnp.asarray(rs.randn(32, 5).astype(np.float32))
    for positive in (True, False):
        fast = gradcam(params["visual"], tiles, zw, cfg, num_layers=1,
                       positive_attn_only=positive)
        gen = gradcam(params["visual"], tiles, zw, cfg, num_layers=1,
                      positive_attn_only=positive, force_general=True)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(gen),
                                   atol=1e-5, rtol=1e-4)


def test_dead_crop_sizes_inflate_divisor(tiny_saliency):
    """Reference __init__.py:148-153 divides by len(counts) over ALL
    configured tile sizes — a crop too large to fit any tile still
    inflates the divisor. Regression for the dispatch-chain cache: config
    B shares config A's LIVE plan geometry exactly (same fitting crops),
    so a cache key that ignores dead crops would silently reuse A's
    combine divisor for B."""
    rs = np.random.RandomState(21)
    img = rs.randint(0, 255, (64, 96, 3), dtype=np.uint8)
    labels = ["chair", "table"]
    common = dict(horizontal_flipping=False, augmentations=0)
    cfg_a = SaliencyConfig(crops=(CropSpec(64, 16), CropSpec(32, 8)),
                           **common)
    cfg_b = SaliencyConfig(
        crops=(CropSpec(64, 16), CropSpec(32, 8), CropSpec(128, 32)),
        **common)
    key = jax.random.PRNGKey(0)
    maps_a, _ = tiny_saliency.get_clip_saliency(
        img, labels, ["a photo of a {}"], cfg_a, key=key)
    maps_b, _ = tiny_saliency.get_clip_saliency(
        img, labels, ["a photo of a {}"], cfg_b, key=key)
    np.testing.assert_allclose(
        np.asarray(maps_b), np.asarray(maps_a) * (2.0 / 3.0),
        rtol=2e-3, atol=1e-6,
    )
