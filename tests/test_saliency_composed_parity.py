"""COMPOSED relevancy-pipeline parity: our ClipSaliency.get_clip_saliency vs
the reference ClipWrapper.get_clip_saliency (multi-scale convolve) as ONE
assembled pipeline on the same small hooked CLIP.

Pins the cross-stage seams the per-piece tests cannot: tile batching order,
per-scale count normalization -> cross-scale mean, the reference's f16
canvases, and the zeroshot text-feature outputs. Reference:
CLIP/clip/__init__.py:103-282, clip_gradcam.py:30-143.

RNG-free comparison: horizontal_flipping off, augmentations=0, and the
reference ClipGradcam.preprocess patched to the same PIL-parity resize
matmul our extractor uses, so both pipelines consume bit-identical tiles
and the test isolates the pipeline seams rather than resize rounding.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_oracle import ref_clip_module, ref_clip_wrapper_module  # noqa: E402

from semantic_abstraction_tpu.clip import (  # noqa: E402
    ClipConfig,
    ClipSaliency,
    CropSpec,
    SaliencyConfig,
    convert_clip_state_dict,
)
from semantic_abstraction_tpu.clip.saliency import (  # noqa: E402
    CLIP_PIXEL_MEAN,
    CLIP_PIXEL_STD,
)
from semantic_abstraction_tpu.ops.sampling import resize_matrix  # noqa: E402

SMALL = ClipConfig(
    embed_dim=64,
    image_resolution=64,
    vision_layers=4,
    vision_width=128,
    vision_patch_size=16,
    context_length=77,
    vocab_size=49408,
    text_width=64,
    text_heads=1,
    text_layers=2,
)
NUM_LAYERS = 1  # blocks with index > 1 of the 4 contribute (ref :85-87)


def _matmul_preprocess(resolution):
    """PIL tile -> CLIP tensor via the same bicubic resize matmuls as our
    extractor (saliency.extract_tiles), so tiles are bit-identical."""
    cache = {}

    def preprocess(pil_img):
        a = np.asarray(pil_img).astype(np.float32) / 255.0  # (ts, ts, 3)
        ts = a.shape[0]
        if ts not in cache:
            cache[ts] = resize_matrix(ts, resolution, "bicubic_pil")
        rm = cache[ts]
        x = a.transpose(2, 0, 1)
        x = np.einsum("chw,oh->cow", x, rm)
        x = np.einsum("cow,pw->cop", x, rm)
        x = np.clip(x, 0.0, 1.0)
        x = (x - CLIP_PIXEL_MEAN[:, None, None]) / CLIP_PIXEL_STD[:, None, None]
        return torch.from_numpy(x.astype(np.float32))

    return preprocess


@pytest.fixture(scope="module")
def pipelines():
    me = ref_clip_module("model_explainability")
    wrap = ref_clip_wrapper_module()
    torch.manual_seed(0)
    ref_model = me.CLIP(
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

    # assemble the reference singleton manually (load() would download):
    GC = wrap.ClipGradcam
    gc = GC.__new__(GC)
    torch.nn.Module.__init__(gc)
    gc.clip_model_name = "test"
    gc.model = ref_model
    gc.preprocess = _matmul_preprocess(SMALL.image_resolution)
    gc.templates = ["a photo of a {}"]
    gc.device = "cpu"
    gc.target_classes = None
    gc.num_layers = NUM_LAYERS
    gc.positive_attn_only = True
    # interpret's .view uses num_res_attn_blocks where the head count
    # belongs (works on ViT-B because heads == blocks == 12); the small
    # model has vision_width//64 == 2 heads
    gc.num_res_attn_blocks = SMALL.vision_width // 64
    W0 = wrap.ClipWrapper
    W0.device = "cpu"
    W0.clip_model = ref_model
    W0.clip_gradcam = gc
    W0.jittering_transforms = None

    class W(W0):
        """The reference indexes torch tensors with numpy OBJECT arrays of
        slices (__init__.py:227 / :282), which torch >= 2 rejects; re-pack
        each tile slice as a real tuple (indexing semantics unchanged)."""

        @classmethod
        def create_tiles(cls, **kwargs):
            tiles, tile_imgs, counts, tile_sizes = W0.create_tiles.__func__(
                cls, **kwargs
            )
            arr = np.empty(len(tiles), dtype=object)
            for i in range(len(tiles)):
                arr[i] = tuple(tiles[i])
            return arr, tile_imgs, counts, tile_sizes

    params, cfg = convert_clip_state_dict(
        {k: v for k, v in ref_model.state_dict().items()}, SMALL
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    ours = ClipSaliency(params, cfg, tile_batch_size=8, num_layers=NUM_LAYERS)
    return W, ours


def test_composed_saliency_parity(pipelines):
    W, ours = pipelines
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (96, 128, 3), dtype=np.uint8)
    labels = ["chair", "table", "sofa"]
    prompts = ["a photo of a {}"]
    crops = [
        {"tile_size": 96, "stride": 24},
        {"tile_size": 48, "stride": 12},
    ]
    ref_maps, ref_feats = W.get_clip_saliency(
        img=img,
        text_labels=labels,
        prompts=prompts,
        horizontal_flipping=False,
        positive_attn_only=True,
        augmentations=0,
        cropping_augmentations=crops,
    )
    ref_maps = ref_maps.float().numpy()

    config = SaliencyConfig(
        crops=(CropSpec(96, 24), CropSpec(48, 12)),
        horizontal_flipping=False,
        augmentations=0,
    )
    maps, _ = ours.get_clip_saliency(img, labels, tuple(prompts), config)
    maps = np.asarray(maps).astype(np.float32)

    assert maps.shape == ref_maps.shape == (3, 96, 128)
    # reference accumulates canvases in f16 (ours f32, f16 only on output):
    # tolerance covers f16 accumulation rounding, nothing else
    scale = np.abs(ref_maps).max()
    np.testing.assert_allclose(maps, ref_maps, atol=2e-2 * scale, rtol=2e-2)
    # and the maps must be pointwise well-correlated, not just close in norm
    cc = np.corrcoef(maps.ravel(), ref_maps.ravel())[0, 1]
    assert cc > 0.999, cc


def test_composed_saliency_parity_flip_on(pipelines):
    """horizontal_flipping=True is DETERMINISTIC (the reference flips the
    preprocessed tile tensor on its last axis, gradcams the mirrored batch,
    un-mirrors the relevancy, and averages — __init__.py:170-204; no RNG
    is involved), so the flip-average/un-mirror seam is oracle-testable.
    Same regime as the flip-off test otherwise."""
    W, ours = pipelines
    W.clip_gradcam.templates = ["a photo of a {}"]
    rs = np.random.RandomState(5)
    img = rs.randint(0, 255, (96, 128, 3), dtype=np.uint8)
    labels = ["chair", "table", "sofa"]
    prompts = ["a photo of a {}"]
    crops = [
        {"tile_size": 96, "stride": 24},
        {"tile_size": 48, "stride": 12},
    ]
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

    config = SaliencyConfig(
        crops=(CropSpec(96, 24), CropSpec(48, 12)),
        horizontal_flipping=True,
        augmentations=0,
    )
    maps, _ = ours.get_clip_saliency(img, labels, tuple(prompts), config)
    maps = np.asarray(maps).astype(np.float32)

    assert maps.shape == ref_maps.shape == (3, 96, 128)
    scale = np.abs(ref_maps).max()
    np.testing.assert_allclose(maps, ref_maps, atol=2e-2 * scale, rtol=2e-2)
    cc = np.corrcoef(maps.ravel(), ref_maps.ravel())[0, 1]
    assert cc > 0.999, cc


def test_composed_distractor_parity(pipelines):
    """Nonempty distractor set, carried on the CONFIG (the reference's
    saliency_configs dicts have a distractor_labels key, __init__.py:21):
    the distractors' mean map is subtracted from every label map
    (__init__.py:125-131)."""
    W, ours = pipelines
    W.clip_gradcam.templates = ["a photo of a {}"]
    rs = np.random.RandomState(1)
    img = rs.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    labels = ["chair", "table"]
    distractors = ["wall", "floor"]
    crops = [{"tile_size": 64, "stride": 16}]
    ref_maps, _ = W.get_clip_saliency(
        img=img,
        text_labels=labels,
        prompts=["a photo of a {}"],
        distractor_labels=set(distractors),
        horizontal_flipping=False,
        positive_attn_only=True,
        augmentations=0,
        cropping_augmentations=crops,
    )
    ref_maps = ref_maps.float().numpy()

    config = SaliencyConfig(
        crops=(CropSpec(64, 16),),
        horizontal_flipping=False,
        augmentations=0,
        distractor_labels=tuple(distractors),
    )
    maps, _ = ours.get_clip_saliency(
        img, labels, ("a photo of a {}",), config
    )
    maps = np.asarray(maps).astype(np.float32)
    assert maps.shape == ref_maps.shape == (2, 64, 64)
    scale = np.abs(ref_maps).max()
    np.testing.assert_allclose(maps, ref_maps, atol=2e-2 * scale, rtol=2e-2)
    # a distractor that duplicates a text label must be ignored
    # (reference: set(distractor_labels) - set(text_labels))
    maps_dup, _ = ours.get_clip_saliency(
        img, labels, ("a photo of a {}",),
        dataclasses.replace(
            config, distractor_labels=tuple(distractors) + ("chair",)
        ),
    )
    np.testing.assert_allclose(
        np.asarray(maps_dup).astype(np.float32), maps, atol=1e-6
    )


def test_composed_text_feature_parity(pipelines):
    """get_clip_saliency's second output: the reference returns the
    prompt-ensembled NORMALIZED zeroshot features (class_to_language_feature,
    __init__.py:117-121); our zeroshot_weights must match them."""
    W, ours = pipelines
    labels = ["chair", "table"]
    prompts = ["a photo of a {}", "a picture of a {}"]
    W.clip_gradcam.templates = prompts
    W.clip_gradcam.set_classes(labels)
    ref_feats = (
        torch.stack(
            list(W.clip_gradcam.class_to_language_feature.values()), dim=0
        )
        .squeeze(-1)
        .detach()
        .numpy()
    )
    got = np.asarray(ours.zeroshot_weights(labels, prompts)).T  # (L, E)
    np.testing.assert_allclose(got, ref_feats, atol=2e-4, rtol=1e-3)
    # and get_clip_saliency must RETURN those features (the dataset writer
    # stores its second output verbatim; a raw-encode_text return here once
    # diverged the |saliency_text_label_features wire format)
    from semantic_abstraction_tpu.clip.saliency import (
        CropSpec,
        SaliencyConfig,
    )

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)
    config = SaliencyConfig(crops=(CropSpec(32, 8),),
                            horizontal_flipping=False, augmentations=0)
    _, returned = ours.get_clip_saliency(img, labels, tuple(prompts), config)
    np.testing.assert_allclose(np.asarray(returned), ref_feats,
                               atol=2e-4, rtol=1e-3)


def test_composed_duplicate_tile_size_parity(pipelines):
    """Crops sharing a tile_size: the reference keys canvases AND counts by
    tile_size (__init__.py:148-153, :231-234), so duplicate-size crops merge
    into one canvas normalized by the SHARED count, and the final mean
    divides by the number of UNIQUE sizes."""
    W, ours = pipelines
    W.clip_gradcam.templates = ["a photo of a {}"]
    rs = np.random.RandomState(2)
    img = rs.randint(0, 255, (64, 96, 3), dtype=np.uint8)
    labels = ["chair", "table"]
    crops = [
        {"tile_size": 64, "stride": 32},
        {"tile_size": 64, "stride": 16},  # duplicate size, different stride
        {"tile_size": 32, "stride": 16},
    ]
    ref_maps, _ = W.get_clip_saliency(
        img=img,
        text_labels=labels,
        prompts=["a photo of a {}"],
        horizontal_flipping=False,
        positive_attn_only=True,
        augmentations=0,
        cropping_augmentations=crops,
    )
    ref_maps = ref_maps.float().numpy()

    config = SaliencyConfig(
        crops=(CropSpec(64, 32), CropSpec(64, 16), CropSpec(32, 16)),
        horizontal_flipping=False,
        augmentations=0,
    )
    maps, _ = ours.get_clip_saliency(
        img, labels, ("a photo of a {}",), config
    )
    maps = np.asarray(maps).astype(np.float32)
    assert maps.shape == ref_maps.shape == (2, 64, 96)
    scale = np.abs(ref_maps).max()
    np.testing.assert_allclose(maps, ref_maps, atol=2e-2 * scale, rtol=2e-2)
    cc = np.corrcoef(maps.ravel(), ref_maps.ravel())[0, 1]
    assert cc > 0.999, cc


def test_get_visual_feature_non_square_parity(pipelines):
    """Reference clip_preprocess = Resize(r, BICUBIC) on the SHORT side +
    CenterCrop(r) (clip.load's transform), not an anisotropic stretch."""
    from PIL import Image

    W, ours = pipelines
    rs = np.random.RandomState(3)
    img = rs.randint(0, 255, (96, 128, 3), dtype=np.uint8)  # non-square
    r = SMALL.image_resolution

    # reference preprocess, reproduced with PIL (torchvision absent):
    # short side h=96 -> r, long side -> int(r * 128 / 96), then center crop
    h, w = img.shape[:2]
    oh, ow = (r, int(r * w / h)) if h <= w else (int(r * h / w), r)
    pil = Image.fromarray(img).resize((ow, oh), Image.BICUBIC)
    x = np.asarray(pil).astype(np.float32) / 255.0
    top = int(round((oh - r) / 2.0))
    left = int(round((ow - r) / 2.0))
    x = x[top:top + r, left:left + r]
    x = (x - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711]
    )
    t = torch.from_numpy(x.transpose(2, 0, 1).astype(np.float32))[None]
    with torch.no_grad():
        ref_feat = W.clip_model.encode_image(t).squeeze(0).numpy()

    got = np.asarray(ours.get_visual_feature(img)).astype(np.float32)
    assert got.shape == ref_feat.shape
    # PIL resize vs the resize-matrix matmul agree to float noise; the
    # encoder amplifies it slightly
    np.testing.assert_allclose(got, ref_feat, atol=5e-3, rtol=5e-3)
    cc = np.corrcoef(got, ref_feat)[0, 1]
    assert cc > 0.9999, cc


def test_saliency_no_fitting_crop_raises(pipelines):
    _, ours = pipelines
    img = np.zeros((16, 16, 3), np.uint8)
    config = SaliencyConfig(
        crops=(CropSpec(64, 16),), horizontal_flipping=False, augmentations=0
    )
    with pytest.raises(ValueError, match="no crop"):
        ours.get_clip_saliency(img, ["chair"], ("a photo of a {}",), config)
