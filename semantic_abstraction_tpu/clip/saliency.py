"""Multi-scale CLIP relevancy extraction — the ClipWrapper equivalent.

TPU-native re-architecture of the reference's relevancy engine
(reference: CLIP/clip/__init__.py:44-282 — ``get_clip_saliency``
:103-133, ``get_clip_saliency_convolve`` :135-236, ``create_tiles``
:238-282, ``saliency_configs`` :19-41).

The reference pipeline is host-bound: PIL crops + per-tile preprocess
(its own comment calls tiling "currently biggest bottleneck",
__init__.py:275), serial python loops over tile/prompt batches, per-label
``torch.autograd.grad`` calls, and host-side canvas accumulation. Here the
whole thing is device-resident:

- The crop plan (tile offsets, per-scale counts, scatter indices) is a
  STATIC function of (H, W, config), computed once per shape and cached —
  no recompiles across images of the same size.
- Tile extraction is a vmapped ``dynamic_slice`` on the device image;
  bicubic tile->224 preprocessing is a pair of precomputed resize-matrix
  matmuls (MXU) matching PIL's antialiased BICUBIC.
- Color-jitter augmentations (torchvision ColorJitter(0.6, 0.6, 0.6, 0.1),
  __init__.py:55-57) run as vectorized JAX image ops with jax.random.
- Relevancy per tile batch is the single jitted forward+VJP of
  ``relevancy.gradcam`` with labels vmapped (vs the reference's serial
  per-label autograd loop).
- Per-scale canvas accumulation (bilinear 7x7 -> tile_size upsample +
  strided window add, __init__.py:205-233) is a scatter-free overlap-add
  of MXU-upsampled blocks (see ``_accumulate_body``).
- The whole image runs as ONE jitted dispatch by default (``fuse_scales``:
  jitter-prep + every scale sweep + the cross-scale combine in a single
  program; ``_dispatch_fns``) — per-image tunnel exposure is a single
  round trip, vs the reference's hundreds of per-tile host steps.

Horizontal flipping averages the relevancy of the mirrored tile batch
(un-mirrored again before accumulation), matching __init__.py:170-204.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import resize_matrix
from .model import ClipConfig, VIT_B_32, encode_text
from .relevancy import gradcam, zeroshot_weights_from_features
from .tokenizer import tokenize


def gradcam_label_chunked(visual, tiles, zw, prompt_batch_size, **kw):
    """gradcam with the LABEL axis chunked at ``prompt_batch_size``
    (reference prompt_batch_size=32, CLIP/clip/__init__.py:157-169).

    The general multi-tail path materializes L x B x H x T x T attention
    grads per tail block; without chunking a description-heavy dataset
    scene (~60 labels+sentences) is unbounded in L. lax.map keeps ONE
    chunk's grads live at a time (the tile forward is recomputed per
    chunk, as in the reference's per-prompt-batch loop).
    """
    l = zw.shape[1]
    if l <= prompt_batch_size:
        return gradcam(visual, tiles, zw, **kw)
    pad = (-l) % prompt_batch_size
    zwp = jnp.pad(zw, ((0, 0), (0, pad)))
    chunks = jnp.moveaxis(
        zwp.reshape(zw.shape[0], -1, prompt_batch_size), 1, 0
    )  # (nchunks, E, pbs)
    rels = jax.lax.map(lambda z: gradcam(visual, tiles, z, **kw), chunks)
    return rels.reshape(-1, *rels.shape[2:])[:l]

CLIP_PIXEL_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_PIXEL_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CropSpec:
    tile_size: int
    stride: int


@dataclasses.dataclass(frozen=True)
class SaliencyConfig:
    """Mirror of the reference saliency_configs entries (__init__.py:19-41).

    ``distractor_labels`` round-trips the reference config dicts' key
    (__init__.py:21, :34 — empty in both published configs): labels whose
    mean relevancy is subtracted from every requested label's map
    (__init__.py:125-131). Merged with any per-call distractors."""

    crops: Tuple[CropSpec, ...]
    horizontal_flipping: bool = True
    augmentations: int = 5
    positive_attn_only: bool = True
    imagenet_prompt_ensemble: bool = False
    distractor_labels: Tuple[str, ...] = ()


def ours_config(img_dim: int) -> SaliencyConfig:
    return SaliencyConfig(
        crops=(
            CropSpec(img_dim, img_dim // 4),
            CropSpec(int(img_dim * 2 / 3), int(img_dim * 2 / 3) // 4),
            CropSpec(img_dim // 2, (img_dim // 2) // 4),
            CropSpec(img_dim // 4, (img_dim // 4) // 4),
        ),
        horizontal_flipping=True,
        augmentations=5,
    )


def chefer_et_al_config(img_dim: int) -> SaliencyConfig:
    return SaliencyConfig(
        crops=(CropSpec(img_dim, img_dim // 4),),
        horizontal_flipping=False,
        augmentations=0,
        distractor_labels=(),
    )


saliency_configs = {"ours": ours_config, "chefer_et_al": chefer_et_al_config}

# The standard OpenAI CLIP ImageNet prompt-ensemble templates (public; used
# when SaliencyConfig.imagenet_prompt_ensemble is set, matching reference
# CLIP/clip/__init__.py:285-366 / generate_relevancy.py:73-79).
IMAGENET_TEMPLATES = [
    "a bad photo of a {}.", "a photo of many {}.", "a sculpture of a {}.",
    "a photo of the hard to see {}.", "a low resolution photo of the {}.",
    "a rendering of a {}.", "graffiti of a {}.", "a bad photo of the {}.",
    "a cropped photo of the {}.", "a tattoo of a {}.",
    "the embroidered {}.", "a photo of a hard to see {}.",
    "a bright photo of a {}.", "a photo of a clean {}.",
    "a photo of a dirty {}.", "a dark photo of the {}.",
    "a drawing of a {}.", "a photo of my {}.", "the plastic {}.",
    "a photo of the cool {}.", "a close-up photo of a {}.",
    "a black and white photo of the {}.", "a painting of the {}.",
    "a painting of a {}.", "a pixelated photo of the {}.",
    "a sculpture of the {}.", "a bright photo of the {}.",
    "a cropped photo of a {}.", "a plastic {}.",
    "a photo of the dirty {}.", "a jpeg corrupted photo of a {}.",
    "a blurry photo of the {}.", "a photo of the {}.",
    "a good photo of the {}.", "a rendering of the {}.",
    "a {} in a video game.", "a photo of one {}.", "a doodle of a {}.",
    "a close-up photo of the {}.", "a photo of a {}.",
    "the origami {}.", "the {} in a video game.", "a sketch of a {}.",
    "a doodle of the {}.", "a origami {}.",
    "a low resolution photo of a {}.", "the toy {}.",
    "a rendition of the {}.", "a photo of the clean {}.",
    "a photo of a large {}.", "a rendition of a {}.",
    "a photo of a nice {}.", "a photo of a weird {}.",
    "a blurry photo of a {}.", "a cartoon {}.", "art of a {}.",
    "a sketch of the {}.", "a embroidered {}.",
    "a pixelated photo of a {}.", "itap of the {}.",
    "a jpeg corrupted photo of the {}.", "a good photo of a {}.",
    "a plushie {}.", "a photo of the nice {}.",
    "a photo of the small {}.", "a photo of the weird {}.",
    "the cartoon {}.", "art of the {}.", "a drawing of the {}.",
    "a photo of the large {}.", "a black and white photo of a {}.",
    "the plushie {}.", "a dark photo of a {}.", "itap of a {}.",
    "graffiti of the {}.", "a toy {}.", "itap of my {}.",
    "a photo of a cool {}.", "a photo of a small {}.", "a tattoo of the {}.",
]


@dataclasses.dataclass(frozen=True)
class ScalePlan:
    tile_size: int
    stride: int
    nx: int  # tiles along rows (x offsets = arange(nx) * stride)
    ny: int  # tiles along cols
    offsets: np.ndarray  # (T, 2) int32 rows (x) / cols (y), per base image
    count: np.ndarray  # (H, W) float32 accumulation normalizer (all images)


@functools.lru_cache(maxsize=64)
def tile_plan(hw: Tuple[int, int], crops: Tuple[CropSpec, ...],
              num_images: int) -> Tuple[ScalePlan, ...]:
    """Static crop plan for an (H, W) image (reference create_tiles
    :238-282, including its y<H / x<W skip quirks and the 1e-5-seeded
    per-scale count canvases).

    Tiles always form a REGULAR (nx, ny) grid with spacing ``stride``
    (the reference loops arange(0, limit, stride) and only skips a
    suffix), which the accumulator exploits to avoid scatters entirely.
    lru_cached: the per-image dispatch path consults the plan (it is a
    pure function of static config), and the count canvas is O(H*W) via
    the grid's separable per-axis coverage instead of per-tile adds.
    """
    h, w = hw
    plans = []
    for crop in crops:
        ts, stride = crop.tile_size, crop.stride
        ys = [y for y in range(0, w - ts + 1, stride) if y < h]
        xs = [x for x in range(0, h - ts + 1, stride) if x < w]
        # reference iterates y (cols) outer, x (rows) inner
        offs = [(x, y) for y in ys for x in xs]
        offsets = np.asarray(offs, dtype=np.int32).reshape(-1, 2)
        # separable coverage: tiles are the cross product xs x ys, so the
        # per-pixel overlap count is (rows covering) x (cols covering).
        # The VALUE per pixel replays the reference's sequential f32 adds
        # (1e-5 += num_images, k times) via a k-indexed table — bit-exact
        # with the per-tile accumulation loop at O(H*W) instead of
        # O(tiles * tile_area)
        rowc = np.zeros(h + 1, np.int64)
        for x in xs:
            rowc[x] += 1
            rowc[min(x + ts, h)] -= 1
        colc = np.zeros(w + 1, np.int64)
        for y in ys:
            colc[y] += 1
            colc[min(y + ts, w)] -= 1
        cover = np.outer(np.cumsum(rowc[:-1]), np.cumsum(colc[:-1]))
        seq = np.empty(int(cover.max()) + 1, np.float32)
        seq[0] = np.float32(1e-5)
        for k in range(1, len(seq)):
            seq[k] = np.float32(seq[k - 1] + np.float32(num_images))
        count = seq[cover]
        plans.append(ScalePlan(ts, stride, len(xs), len(ys), offsets, count))
    return tuple(plans)


# ---------------------------------------------------------------------------
# Color jitter (torchvision ColorJitter(brightness=.6, contrast=.6,
# saturation=.6, hue=.1) distribution parity; exact RNG draws differ)
# ---------------------------------------------------------------------------


def _rgb_to_gray(img: jax.Array) -> jax.Array:
    # torchvision rgb_to_grayscale weights
    r, g, b = img[0], img[1], img[2]
    return 0.2989 * r + 0.587 * g + 0.114 * b


def _adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def _adjust_contrast(img, factor):
    mean = _rgb_to_gray(img).mean()
    return jnp.clip(img * factor + (1.0 - factor) * mean, 0.0, 1.0)


def _adjust_saturation(img, factor):
    gray = _rgb_to_gray(img)[None]
    return jnp.clip(img * factor + (1.0 - factor) * gray, 0.0, 1.0)


def _adjust_hue(img, shift):
    r, g, b = img[0], img[1], img[2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    c = maxc - minc
    s = jnp.where(maxc > 0, c / jnp.maximum(maxc, 1e-12), 0.0)
    safe_c = jnp.maximum(c, 1e-12)
    rc = (maxc - r) / safe_c
    gc = (maxc - g) / safe_c
    bc = (maxc - b) / safe_c
    hr = jnp.where((maxc == r), bc - gc, 0.0)
    hg = jnp.where((maxc == g) & (maxc != r), 2.0 + rc - bc, 0.0)
    hb = jnp.where((maxc != r) & (maxc != g), 4.0 + gc - rc, 0.0)
    hue = ((hr + hg + hb) / 6.0) % 1.0
    hue = jnp.where(c > 0, hue, 0.0)
    hue = (hue + shift) % 1.0
    i = jnp.floor(hue * 6.0)
    f = hue * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r2, g2, b2], axis=0)


def color_jitter(key: jax.Array, img: jax.Array,
                 brightness: float = 0.6, contrast: float = 0.6,
                 saturation: float = 0.6, hue: float = 0.1) -> jax.Array:
    """One jittered copy of a (3, H, W) image in [0, 1], ops in random order."""
    kf, kp = jax.random.split(key)
    fb, fc, fs = jax.random.uniform(kf, (3,), minval=jnp.asarray(
        [1 - brightness, 1 - contrast, 1 - saturation]),
        maxval=jnp.asarray([1 + brightness, 1 + contrast, 1 + saturation]))
    fh = jax.random.uniform(jax.random.fold_in(kf, 1), (), minval=-hue, maxval=hue)
    order = jax.random.permutation(kp, 4)

    def apply_op(i, im):
        op = order[i]
        return jax.lax.switch(
            op,
            [
                lambda x: _adjust_brightness(x, fb),
                lambda x: _adjust_contrast(x, fc),
                lambda x: _adjust_saturation(x, fs),
                lambda x: _adjust_hue(x, fh),
            ],
            im,
        )

    return jax.lax.fori_loop(0, 4, apply_op, img)


# ---------------------------------------------------------------------------
# Tile extraction + preprocessing
# ---------------------------------------------------------------------------


def extract_tiles(images: jax.Array, offsets: jax.Array, tile_size: int,
                  resolution: int = 224) -> jax.Array:
    """(I, 3, H, W) images + (T, 2) offsets -> (I*T, 3, R, R) CLIP inputs.

    Crop via vmapped dynamic_slice; PIL-parity bicubic resize to the CLIP
    resolution as two MXU matmuls; normalize with the CLIP pixel stats.
    """
    rm = jnp.asarray(resize_matrix(tile_size, resolution, "bicubic_pil"))

    def crop_one(img, off):
        return jax.lax.dynamic_slice(
            img, (0, off[0], off[1]), (3, tile_size, tile_size)
        )

    tiles = jax.vmap(
        lambda img: jax.vmap(lambda off: crop_one(img, off))(offsets)
    )(images)  # (I, T, 3, ts, ts)
    i, t = tiles.shape[:2]
    tiles = tiles.reshape(i * t, 3, tile_size, tile_size)
    tiles = jnp.einsum("bchw,oh->bcow", tiles, rm)
    tiles = jnp.einsum("bcow,pw->bcop", tiles, rm)
    tiles = jnp.clip(tiles, 0.0, 1.0)
    mean = jnp.asarray(CLIP_PIXEL_MEAN)[:, None, None]
    std = jnp.asarray(CLIP_PIXEL_STD)[:, None, None]
    return (tiles - mean) / std


def _accumulate_body(rel: jax.Array, plan: ScalePlan, hw: Tuple[int, int],
                     n_images: int) -> jax.Array:
    """Traceable body of the scatter-free overlap-add (see
    ClipSaliency._accumulate for the design notes)."""
    ts, s, nx, ny = plan.tile_size, plan.stride, plan.nx, plan.ny
    g = rel.shape[-1]
    k = -(-ts // s)  # ceil
    up = np.zeros((k * s, g), np.float32)
    up[:ts] = resize_matrix(g, ts, "bilinear_torch")
    h, w = hw
    l = rel.shape[0]
    gsum = rel.reshape(l, n_images, ny, nx, g, g).sum(axis=1)
    cells = jnp.zeros((l, nx + k - 1, ny + k - 1, s, s), jnp.float32)
    for di in range(k):
        rrow = jnp.asarray(up[di * s : (di + 1) * s])
        for dj in range(k):
            rcol = jnp.asarray(up[dj * s : (dj + 1) * s])
            block = jnp.einsum("lyxgh,pg,qh->lxypq", gsum, rrow, rcol)
            cells = cells.at[:, di : di + nx, dj : dj + ny].add(block)
    big = cells.transpose(0, 1, 3, 2, 4).reshape(
        l, (nx + k - 1) * s, (ny + k - 1) * s
    )
    bh, bw = big.shape[1:]
    big = jnp.pad(big, ((0, 0), (0, max(0, h - bh)), (0, max(0, w - bw))))
    return big[:, :h, :w]


# ---------------------------------------------------------------------------
# The extractor
# ---------------------------------------------------------------------------


class ClipSaliency:
    """Multi-scale Chefer relevancy extractor over a JAX CLIP.

    Public surface mirrors the reference ClipWrapper classmethods
    (get_clip_saliency / get_clip_text_feature) but is an instance holding
    the param pytree; jitted stages are cached per static shape.
    """

    def __init__(
        self,
        params: dict,
        cfg: ClipConfig = VIT_B_32,
        compute_dtype=jnp.float32,
        tile_batch_size: int = 32,
        prompt_batch_size: int = 32,
        num_layers: int = 10,
        label_bucket: int = 0,
        scale_group_tiles: int = 384,
        fuse_scales: bool = True,
    ):
        self.params = params
        self.cfg = cfg
        self.compute_dtype = compute_dtype
        self.tile_batch_size = tile_batch_size
        self.prompt_batch_size = prompt_batch_size
        self.num_layers = num_layers
        # consecutive scales whose combined tile count (after jitter) fits
        # this cap share ONE jitted dispatch (see _scale_group_fn); the
        # cap also bounds the materialized resized-tile tensor of a group
        # (384 tiles x (3, 224, 224) f32 = 231 MB). 0 disables grouping.
        self.scale_group_tiles = scale_group_tiles
        # fuse_scales merges EVERY scale program (plus prep and combine)
        # into one jitted dispatch per image — minimum tunnel exposure —
        # at the cost of one larger compile unit (see _dispatch_fns).
        # Measured round 5 (v5e, ours@480x640): equal throughput to the
        # 2-dispatch chain on a clean tunnel (34.5 vs 34.3 maps/s) and one
        # fewer RTT of exposure on contended ones; a mono compile failure
        # falls back to the chain at runtime.
        self.fuse_scales = fuse_scales
        # label_bucket > 0 pads the label axis up to a multiple before the
        # jitted extraction and slices the pad off after. The saliency
        # programs are compiled per (shape, num_labels); a dataset sweep
        # whose scenes carry 10-60 labels each would otherwise pay a
        # 20-60 s remote compile for EVERY distinct label count. Per-label
        # gradcam is independent (one VJP per label logit), so zero-weight
        # pad labels cannot perturb real ones. 0 = exact (demo/bench).
        self.label_bucket = label_bucket
        self._text_jit = jax.jit(
            lambda tokens: encode_text(params["text"], tokens, cfg, jnp.float32)
        )
        self._visual_jit = {}
        self._accum_jit = {}
        self._convolve_jit = {}
        self._group_jit = {}
        self._prep_jit = {}
        self._dispatch_jit = {}
        # mono (fuse_scales) programs validated by one blocking 1-element
        # read — execute-time failures then trigger the chain fallback
        # instead of surfacing at the caller's readback (ids are stable:
        # _dispatch_jit holds the cached fns alive)
        self._validated_mono = set()
        # memo of prompt-ensembled zeroshot weights keyed by (labels,
        # prompts): a dataset sweep / bench loop re-extracts the SAME label
        # set for every image of a scene, and the text stage costs a full
        # tunnel round trip (~30 ms) plus host BPE per call. Deterministic
        # pure function of its inputs, so memoization is value-identical.
        self._zw_memo: Dict[tuple, jax.Array] = {}

    # -- text ---------------------------------------------------------------

    def _pad_label_bucket(self, zw: jax.Array) -> jax.Array:
        """Pad the label axis of (E, L) zeroshot weights up to a multiple
        of ``label_bucket`` (0 = exact); callers slice outputs back."""
        l = zw.shape[1]
        if self.label_bucket and l % self.label_bucket:
            zw = jnp.pad(zw, ((0, 0), (0, (-l) % self.label_bucket)))
        return zw

    def text_features(self, texts: Sequence[str]) -> jax.Array:
        """Raw (unnormalized) CLIP text features, (N, E). Reference
        ClipWrapper.get_clip_text_feature (__init__.py:78-89)."""
        tokens = np.asarray(tokenize(list(texts)))
        n = tokens.shape[0]
        if self.label_bucket and n % self.label_bucket:
            # bound text-encoder compiles the same way as the extractor's
            # label axis (all-zero token rows are discarded after encode)
            tokens = np.pad(tokens, ((0, (-n) % self.label_bucket), (0, 0)))
        return self._text_jit(jnp.asarray(tokens))[:n]

    def zeroshot_weights(self, labels: Sequence[str],
                         templates: Sequence[str]) -> jax.Array:
        """(E, L) prompt-ensembled zeroshot weights
        (reference clip_gradcam.zeroshot_classifier :12-27). Memoized per
        (labels, templates) — see ``_zw_memo`` in ``__init__``."""
        memo_key = (tuple(labels), tuple(templates))
        hit = self._zw_memo.get(memo_key)
        if hit is not None:
            return hit
        texts = [t.format(label) for label in labels for t in templates]
        feats = self.text_features(texts).reshape(
            len(labels), len(templates), -1
        )
        zw = zeroshot_weights_from_features(feats)
        if len(self._zw_memo) >= 16:  # bound device-resident memo entries
            self._zw_memo.pop(next(iter(self._zw_memo)))
        self._zw_memo[memo_key] = zw
        return zw

    def get_visual_feature(self, rgb: np.ndarray,
                           tile_attn_mask=None) -> jax.Array:
        """CLIP image features of an (H, W, 3) uint8 image, optionally with
        a per-tile additive attention mask (reference
        ClipWrapper.get_visual_feature, __init__.py:92-101).

        Matches the reference clip_preprocess exactly: Resize(r, BICUBIC)
        maps the SHORT side to r (long side to int(r * long / short),
        torchvision truncation), then CenterCrop(r) — NOT an independent
        anisotropic stretch of both axes.
        """
        h, w = int(rgb.shape[0]), int(rgb.shape[1])
        r = self.cfg.image_resolution
        if w <= h:
            ow, oh = r, int(r * h / w)
        else:
            oh, ow = r, int(r * w / h)
        mask_sig = (None if tile_attn_mask is None
                    else jnp.shape(tile_attn_mask))
        sig = (h, w, mask_sig)
        if sig not in self._visual_jit:
            rm_h = jnp.asarray(resize_matrix(h, oh, "bicubic_pil"))
            rm_w = jnp.asarray(resize_matrix(w, ow, "bicubic_pil"))
            top = int(round((oh - r) / 2.0))  # torchvision CenterCrop
            left = int(round((ow - r) / 2.0))
            from .model import encode_image

            def run(params, img_u8, mask):
                img = img_u8.astype(jnp.float32)[None] / 255.0
                img = jnp.einsum("bchw,oh->bcow", img, rm_h)
                img = jnp.einsum("bcow,pw->bcop", img, rm_w)
                img = img[:, :, top:top + r, left:left + r]
                img = jnp.clip(img, 0.0, 1.0)
                img = (img - jnp.asarray(CLIP_PIXEL_MEAN)[:, None, None]
                       ) / jnp.asarray(CLIP_PIXEL_STD)[:, None, None]
                return encode_image(
                    params, img, self.cfg, self.compute_dtype,
                    tile_attn_mask=mask,
                )[0]

            self._visual_jit[sig] = jax.jit(run)
        img_u8 = jnp.asarray(np.ascontiguousarray(rgb.transpose(2, 0, 1)))
        return self._visual_jit[sig](self.params, img_u8, tile_attn_mask)

    # -- relevancy ----------------------------------------------------------

    def _accumulate(self, rel: jax.Array, plan: ScalePlan,
                    hw: Tuple[int, int], n_images: int) -> jax.Array:
        """(L, I*ny*nx, g, g) tile relevancies -> (L, H, W) canvas sum.

        SCATTER-FREE overlap-add: tiles form a regular (nx, ny) grid with
        spacing ``stride``, so each tile covers k = ceil(ts/stride)
        stride-cells per dim. Summing the (linear) contributions over the
        image axis first, the canvas is k*k dense shifted slice-adds of
        MXU-upsampled s-blocks — no scatter, no serialization. (XLA TPU
        scatter over ~230k indices was the pathological bottleneck of the
        naive port of reference __init__.py:205-233.)
        """
        sig = (rel.shape, plan.tile_size, plan.stride, plan.nx, plan.ny,
               hw, n_images)
        if sig not in self._accum_jit:
            self._accum_jit[sig] = jax.jit(
                functools.partial(
                    _accumulate_body, plan=plan, hw=hw, n_images=n_images
                )
            )
        return self._accum_jit[sig](rel)

    def get_clip_saliency(
        self,
        img: np.ndarray,
        text_labels: Sequence[str],
        prompts: Sequence[str] = ("{}",),
        config: Optional[SaliencyConfig] = None,
        key: Optional[jax.Array] = None,
        distractor_labels: Sequence[str] = (),
    ) -> Tuple[jax.Array, jax.Array]:
        """(H, W, 3) uint8 image + labels -> ((L, H, W) relevancy, (L, E)
        text features). Reference get_clip_saliency (__init__.py:103-133).
        """
        if getattr(self.cfg, "vision_arch", "vit") != "vit":
            raise ValueError(
                "relevancy extraction is transformer-only (the reference "
                "ClipGradcam supports only ViT models, clip_gradcam.py:51-56); "
                "ModifiedResNet checkpoints serve text/visual features only"
            )
        if config is None:
            config = ours_config(min(img.shape[:2]))
        if key is None:
            key = jax.random.PRNGKey(0)
        if config.imagenet_prompt_ensemble:
            prompts = IMAGENET_TEMPLATES  # reference generate_relevancy.py:73-79
        zw = self.zeroshot_weights(list(text_labels), list(prompts))
        n_labels = zw.shape[1]
        # returned text features are the PROMPT-ENSEMBLED zeroshot features
        # (reference stacks class_to_language_feature, __init__.py:117-121)
        # — NOT raw encode_text outputs; ClipWrapper.get_clip_text_feature
        # (our .text_features) is the raw variant
        label_feats = zw.T
        # config-level distractors (reference saliency_configs carry the
        # key, __init__.py:21) merge with per-call ones
        distractor_labels = tuple(distractor_labels) + tuple(
            d for d in config.distractor_labels if d not in set(distractor_labels)
        )
        extra = [d for d in distractor_labels if d not in set(text_labels)]
        if extra:
            # ONE shared convolve pass: the reference runs a second full
            # tile sweep for distractors (__init__.py:125-131), but each
            # label's gradcam is an independent VJP of its own logit (the
            # label-bucket zero-pad equality test pins this), so stacking
            # distractor columns next to the labels is value-identical
            # and skips re-extracting + re-forwarding every tile
            dzw = self.zeroshot_weights(extra, list(prompts))
            nd = dzw.shape[1]
            joint = jnp.concatenate([zw, dzw], axis=1)
            all_maps = self._saliency_convolve(
                img, self._pad_label_bucket(joint), config, key
            )[: n_labels + nd]
            # subtract in f32 (reference casts canvases with .float()
            # before the distractor mean, CLIP/clip/__init__.py);
            # differencing nearly-equal f16 maps loses precision
            maps = (
                all_maps[:n_labels].astype(jnp.float32)
                - all_maps[n_labels:].astype(jnp.float32).mean(axis=0)
            ).astype(jnp.float16)
        else:
            maps = self._saliency_convolve(
                img, self._pad_label_bucket(zw), config, key
            )[:n_labels]
        return maps, label_feats

    def _scale_body(self, hw: Tuple[int, int], plan: ScalePlan,
                    config: SaliencyConfig, num_labels: int, n_images: int):
        """Traceable body of one scale's extraction: (visual, images, zw)
        -> count-normalized (L, H, W) canvas: extract -> chunked gradcam
        (lax.map) -> flip-average -> overlap-add.

        The earliest structure (a python loop dispatching one jit per tile
        chunk) left the chip ~64% idle through the axon tunnel: ~108
        dispatches x ~7 ms submission latency dominated the 0.4 s of
        device work. Fusing each scale into one computation with
        ``lax.map`` over tile chunks (tiles are extracted INSIDE the map
        body, so at most one chunk of preprocessed tiles is ever
        materialized) collapses that to a handful of round-trips per image;
        ``_dispatch_fns`` composes these bodies into the per-image
        dispatch chain.
        """
        resolution = self.cfg.image_resolution
        mean = jnp.asarray(CLIP_PIXEL_MEAN)[:, None, None]
        std = jnp.asarray(CLIP_PIXEL_STD)[:, None, None]
        ts = plan.tile_size
        t_count = plan.offsets.shape[0]
        n = n_images * t_count
        # Chunk size: the per-scale tile count is STATIC, so prefer an
        # exact divisor of n near the configured batch over padding.
        # ours@480x640 has 12/90/210/1248 tiles per scale after jitter;
        # padding each to 64-multiples burned 7.4% of the ViT compute on
        # zero tiles (116 dead slots), divisors (12/90/70/96) burn none.
        # Scales with fewer tiles than the batch run as ONE exact-size
        # chunk (the top scale has ~12 tiles; padding to 64 would 5x its
        # cost).
        bs = min(self.tile_batch_size, n)
        if n > bs:
            lo, hi = max(1, bs // 2), bs + bs // 2
            divisors = [d for d in range(lo, hi + 1) if n % d == 0]
            if divisors:
                bs = max(divisors)
        img_idx = np.arange(n, dtype=np.int32) // t_count
        offs = np.tile(plan.offsets, (n_images, 1))
        pad = (-n) % bs
        if pad:
            img_idx = np.concatenate([img_idx, np.zeros(pad, np.int32)])
            offs = np.concatenate([offs, np.zeros((pad, 2), np.int32)], axis=0)
        nchunks = (n + pad) // bs
        rm = resize_matrix(ts, resolution, "bicubic_pil")

        def fn(visual, images, zw):
            rm_c = jnp.asarray(rm)

            def chunk_fn(args):
                ii, oo = args  # (bs,), (bs, 2)

                def crop_one(i, off):
                    return jax.lax.dynamic_slice(
                        images, (i, 0, off[0], off[1]), (1, 3, ts, ts)
                    )[0]

                tiles = jax.vmap(crop_one)(ii, oo)
                tiles = jnp.einsum("bchw,oh->bcow", tiles, rm_c)
                tiles = jnp.einsum("bcow,pw->bcop", tiles, rm_c)
                tiles = (jnp.clip(tiles, 0.0, 1.0) - mean) / std
                rel = gradcam_label_chunked(
                    visual, tiles, zw,
                    prompt_batch_size=self.prompt_batch_size,
                    cfg=self.cfg, num_layers=self.num_layers,
                    positive_attn_only=config.positive_attn_only,
                    compute_dtype=self.compute_dtype,
                )
                if config.horizontal_flipping:
                    rel_f = gradcam_label_chunked(
                        visual, tiles[..., ::-1], zw,
                        prompt_batch_size=self.prompt_batch_size,
                        cfg=self.cfg, num_layers=self.num_layers,
                        positive_attn_only=config.positive_attn_only,
                        compute_dtype=self.compute_dtype,
                    )
                    rel = (rel + rel_f[..., ::-1]) / 2.0
                return rel  # (L, bs, g, g)

            rels = jax.lax.map(
                chunk_fn,
                (jnp.asarray(img_idx.reshape(nchunks, bs)),
                 jnp.asarray(offs.reshape(nchunks, bs, 2))),
            )  # (nchunks, L, bs, g, g)
            g = rels.shape[-1]
            rel = jnp.moveaxis(rels, 1, 0).reshape(
                num_labels, nchunks * bs, g, g
            )[:, :n]
            canvas = _accumulate_body(rel, plan, hw, n_images)
            return canvas / jnp.asarray(plan.count)[None]

        return fn

    def _scale_fn(self, hw: Tuple[int, int], plan: ScalePlan,
                  config: SaliencyConfig, num_labels: int, n_images: int):
        """Jitted single-scale program (kept for the stage profiler; the
        hot path goes through ``_dispatch_fns``)."""
        sig = (hw, plan.tile_size, plan.stride, plan.nx, plan.ny,
               config.positive_attn_only, config.horizontal_flipping,
               num_labels, n_images)
        if sig not in self._convolve_jit:
            self._convolve_jit[sig] = jax.jit(
                self._scale_body(hw, plan, config, num_labels, n_images)
            )
        return self._convolve_jit[sig]

    def _group_body(self, hw: Tuple[int, int], plans: Tuple[ScalePlan, ...],
                    config: SaliencyConfig, num_labels: int,
                    n_images: int):
        """Traceable body sweeping SEVERAL small scales in one program.

        The per-scale dispatch (``_scale_fn``) pays one tunnel round trip
        (~25 ms measured) per scale, and the small scales' gradcam batches
        are tiny (ours@480x640: 12 and 90 tiles — the 12-tile dispatch
        measured ~7.7 TFLOP/s against ~125 at batch 64-96). Here every
        scale in the group extracts + bicubic-resizes its tiles up front
        (all resized tiles are (3, R, R), so scales concatenate; the group
        cap bounds the materialized tensor), ONE exact-divisor-chunked
        gradcam sweeps the combined batch at full rate, and each scale's
        relevancy slice overlap-adds to its own count-normalized canvas.
        Values are bit-identical to the per-scale path: per-tile gradcam is
        batch-independent, and chunk boundaries only regroup independent
        rows. Measured round 4: grouping 12+90+210 collapsed 3 dispatches
        to 1 (see KERNELS.md).
        """
        resolution = self.cfg.image_resolution
        mean = jnp.asarray(CLIP_PIXEL_MEAN)[:, None, None]
        std = jnp.asarray(CLIP_PIXEL_STD)[:, None, None]
        ns = [n_images * p.offsets.shape[0] for p in plans]
        n = sum(ns)
        bs = min(self.tile_batch_size, n)
        if n > bs:
            lo, hi = max(1, bs // 2), bs + bs // 2
            divisors = [d for d in range(lo, hi + 1) if n % d == 0]
            if divisors:
                bs = max(divisors)
        pad = (-n) % bs
        nchunks = (n + pad) // bs
        per_plan = []  # static (img_idx, offsets, tile_size, resize matrix)
        for p in plans:
            t_count = p.offsets.shape[0]
            per_plan.append((
                np.arange(n_images * t_count, dtype=np.int32) // t_count,
                np.tile(p.offsets, (n_images, 1)),
                p.tile_size,
                resize_matrix(p.tile_size, resolution, "bicubic_pil"),
            ))

        def fn(visual, images, zw):
            tiles_all = []
            for img_idx, offs, ts, rm in per_plan:
                rm_c = jnp.asarray(rm)

                def crop_one(i, off, ts=ts):
                    return jax.lax.dynamic_slice(
                        images, (i, 0, off[0], off[1]), (1, 3, ts, ts)
                    )[0]

                t_ = jax.vmap(crop_one)(jnp.asarray(img_idx),
                                        jnp.asarray(offs))
                t_ = jnp.einsum("bchw,oh->bcow", t_, rm_c)
                t_ = jnp.einsum("bcow,pw->bcop", t_, rm_c)
                tiles_all.append(t_)
            tiles = jnp.concatenate(tiles_all, axis=0)
            tiles = ((jnp.clip(tiles, 0.0, 1.0) - mean) / std).astype(
                self.compute_dtype
            )
            if pad:
                tiles = jnp.pad(tiles, ((0, pad),) + ((0, 0),) * 3)

            def chunk_fn(tl):
                rel = gradcam_label_chunked(
                    visual, tl, zw,
                    prompt_batch_size=self.prompt_batch_size,
                    cfg=self.cfg, num_layers=self.num_layers,
                    positive_attn_only=config.positive_attn_only,
                    compute_dtype=self.compute_dtype,
                )
                if config.horizontal_flipping:
                    rel_f = gradcam_label_chunked(
                        visual, tl[..., ::-1], zw,
                        prompt_batch_size=self.prompt_batch_size,
                        cfg=self.cfg, num_layers=self.num_layers,
                        positive_attn_only=config.positive_attn_only,
                        compute_dtype=self.compute_dtype,
                    )
                    rel = (rel + rel_f[..., ::-1]) / 2.0
                return rel  # (L, bs, g, g)

            rels = jax.lax.map(
                chunk_fn,
                tiles.reshape(nchunks, bs, 3, resolution, resolution),
            )  # (nchunks, L, bs, g, g)
            g = rels.shape[-1]
            rel = jnp.moveaxis(rels, 1, 0).reshape(
                num_labels, nchunks * bs, g, g
            )[:, :n]
            canvases = []
            o = 0
            for p, n_i in zip(plans, ns):
                cv = _accumulate_body(rel[:, o:o + n_i], p, hw, n_images)
                canvases.append(cv / jnp.asarray(p.count)[None])
                o += n_i
            return tuple(canvases)

        return fn

    def _scale_group_fn(self, hw: Tuple[int, int],
                        plans: Tuple[ScalePlan, ...],
                        config: SaliencyConfig, num_labels: int,
                        n_images: int):
        """Jitted multi-scale group program (kept for tests/profiling; the
        hot path goes through ``_dispatch_fns``)."""
        sig = (hw, tuple((p.tile_size, p.stride, p.nx, p.ny) for p in plans),
               config.positive_attn_only, config.horizontal_flipping,
               num_labels, n_images)
        if sig not in self._group_jit:
            self._group_jit[sig] = jax.jit(
                self._group_body(hw, plans, config, num_labels, n_images)
            )
        return self._group_jit[sig]

    @staticmethod
    def _prep_body(augs: int):
        """Traceable uint8 -> (1+augs, 3, H, W) float image stack: the /255
        convert + torchvision-parity color jitter (reference
        CLIP/clip/__init__.py:55-57)."""

        def prep(b_u8, keys):
            b = b_u8.astype(jnp.float32) / 255.0
            if augs > 0:
                jittered = jax.vmap(color_jitter, in_axes=(0, None))(keys, b)
                return jnp.concatenate([b[None], jittered], axis=0)
            return b[None]

        return prep

    def _grouping(self, plans: Tuple[ScalePlan, ...], n_images: int):
        """Partition the live scale plans into dispatch groups: consecutive
        small scales share one program while their combined (post-jitter)
        tile count fits ``scale_group_tiles``; a scale over the cap (the
        big scales, e.g. ours@480x640's 1248) keeps its own program."""
        live = [p for p in plans if p.offsets.shape[0] > 0]
        cap = self.scale_group_tiles
        groups: list = []
        cur: list = []
        cur_tiles = 0
        for plan in live:
            t = n_images * plan.offsets.shape[0]
            if t > cap:
                if cur:
                    groups.append(cur)
                    cur, cur_tiles = [], 0
                groups.append([plan])
                continue
            if cur and cur_tiles + t > cap:
                groups.append(cur)
                cur, cur_tiles = [], 0
            cur.append(plan)
            cur_tiles += t
        if cur:
            groups.append(cur)
        return groups

    def _dispatch_fns(self, hw: Tuple[int, int], config: SaliencyConfig,
                      num_labels: int, n_images: int):
        """The per-image jitted dispatch chain, with the jitter-prep folded
        into the FIRST program and the cross-scale combine folded into the
        LAST.

        Through the axon tunnel every dispatch is a round trip (7-25 ms
        measured, far worse on contended windows — the round-4 driver
        capture ran at ~3x the clean-window RTT), so per-image tunnel
        exposure is dispatch count x RTT. The published configs used to pay
        4 round trips (prep, small-scale group, big scale, combine);
        folding prep and combine into the scale programs pays 2.
        ``fuse_scales=True`` additionally merges every scale into ONE
        program (1 round trip; bigger compile unit). Value-identical to the
        unfused chain: jit boundaries only regroup pure functions.

        Returns (fns, n_dispatches):
        - n_dispatches == 1: fns[0](visual, base_u8, keys, zw) -> f16 maps
        - else: fns[0](visual, base_u8, keys, zw) -> (images, *canvases);
          fns[i](visual, images, zw) -> (*canvases) for the middle programs;
          fns[-1](visual, images, zw, canvases) -> (L, H, W) float16 maps.

        The combine divides by the number of UNIQUE tile sizes over ALL
        plans (reference __init__.py:148-153, :231-234 — sizes whose crops
        fit no tiles still inflate the divisor); callers must route
        duplicate-tile-size configs to the eager path instead (this method
        asserts distinct sizes).
        """
        plans = tile_plan(hw, config.crops, n_images)
        groups = self._grouping(plans, n_images)
        flat = [p for g in groups for p in g]
        if not flat:
            raise ValueError(
                f"no crop in the saliency config fits a {hw[0]}x{hw[1]} "
                f"image (tile sizes {[p.tile_size for p in plans]})"
            )
        sizes = [p.tile_size for p in flat]
        assert len(set(sizes)) == len(sizes), (
            "duplicate tile sizes must use the eager combine path"
        )
        n_unique = len({p.tile_size for p in plans})
        # n_unique is part of the key: it counts ALL configured tile sizes
        # (sizes whose crops fit no tiles still inflate the reference's
        # divisor, __init__.py:148-153) while the rest of the sig only
        # sees the LIVE plans — two configs with identical live geometry
        # but different dead crops must not share a combine closure
        sig = (hw, tuple((p.tile_size, p.stride, p.nx, p.ny) for p in flat),
               tuple(len(g) for g in groups), n_unique,
               config.positive_attn_only,
               config.horizontal_flipping, config.augmentations,
               num_labels, n_images, bool(self.fuse_scales))
        if sig in self._dispatch_jit:
            return self._dispatch_jit[sig]
        prep = self._prep_body(config.augmentations)
        bodies = []
        for g in groups:
            if len(g) == 1:
                b = self._scale_body(hw, g[0], config, num_labels, n_images)
                bodies.append(lambda v, im, zw, b=b: (b(v, im, zw),))
            else:
                bodies.append(self._group_body(
                    hw, tuple(g), config, num_labels, n_images))

        def combine(canvases):
            # float16 output matches the reference's half-precision
            # canvases (CLIP/clip/__init__.py:146-151) and halves the
            # device->host readback bytes
            return (sum(canvases) / n_unique).astype(jnp.float16)

        if self.fuse_scales or len(bodies) == 1:

            def mono(visual, base_u8, keys, zw):
                images = prep(base_u8, keys)
                canvases = []
                for b in bodies:
                    canvases.extend(b(visual, images, zw))
                return combine(canvases)

            fns = [jax.jit(mono)]
        else:
            first_body = bodies[0]

            def first(visual, base_u8, keys, zw):
                images = prep(base_u8, keys)
                return (images,) + tuple(first_body(visual, images, zw))

            fns = [jax.jit(first)]
            for b in bodies[1:-1]:
                fns.append(jax.jit(
                    lambda visual, images, zw, b=b:
                    tuple(b(visual, images, zw))
                ))
            last_body = bodies[-1]

            def last(visual, images, zw, prior):
                canvases = list(prior) + list(last_body(visual, images, zw))
                return combine(canvases)

            fns.append(jax.jit(last))
        self._dispatch_jit[sig] = (fns, len(fns))
        return self._dispatch_jit[sig]

    def _saliency_convolve(self, img: np.ndarray, zw: jax.Array,
                           config: SaliencyConfig, key: jax.Array) -> jax.Array:
        h, w = img.shape[:2]
        n_images = 1 + config.augmentations
        plans = tile_plan((h, w), config.crops, n_images)
        # upload uint8 (4x fewer bytes than f32: the axon tunnel moves
        # ~20-35 MB/s, so host<->device bytes are precious); /255 on device
        base_u8 = jnp.asarray(
            np.ascontiguousarray(img.transpose(2, 0, 1)), jnp.uint8
        )
        keys = (jax.random.split(key, config.augmentations)
                if config.augmentations > 0
                else jnp.zeros((0, 2), jnp.uint32))
        live = [p for p in plans if p.offsets.shape[0] > 0]
        if not live:
            raise ValueError(
                f"no crop in the saliency config fits a {h}x{w} image "
                f"(tile sizes {[p.tile_size for p in plans]})"
            )
        sizes = [p.tile_size for p in live]
        if len(set(sizes)) == len(sizes):
            # common path (published configs have distinct tile sizes):
            # the fused dispatch chain — 2 round trips per image (1 with
            # fuse_scales), prep and combine folded into the scale programs
            fns, n_disp = self._dispatch_fns(
                (h, w), config, int(zw.shape[1]), n_images
            )
            visual = self.params["visual"]
            if n_disp == 1:
                if not self.fuse_scales:
                    return fns[0](visual, base_u8, keys, zw)
                try:
                    out = fns[0](visual, base_u8, keys, zw)
                    # jax dispatch is async: an execute-time failure (OOM,
                    # remote-tunnel error) would otherwise surface at the
                    # CALLER's readback where no fallback exists. Validate
                    # each mono program ONCE with a 1-element blocking
                    # read; later calls skip the sync.
                    if id(fns[0]) not in self._validated_mono:
                        np.asarray(jax.device_get(out.ravel()[0]))
                        self._validated_mono.add(id(fns[0]))
                    return out
                except Exception:
                    # a mono program too big for the remote compiler falls
                    # back to the per-group chain (one warning, sticky)
                    import logging

                    logging.getLogger(__name__).warning(
                        "fused saliency program failed to compile/run; "
                        "falling back to the multi-dispatch chain",
                        exc_info=True,
                    )
                    self.fuse_scales = False
                    return self._saliency_convolve(img, zw, config, key)
            out = fns[0](visual, base_u8, keys, zw)
            images, canvases = out[0], list(out[1:])
            for fn in fns[1:-1]:
                canvases.extend(fn(visual, images, zw))
            return fns[-1](visual, images, zw, tuple(canvases))
        # duplicate-tile-size path (exotic; eager for parity over speed).
        # The reference keys canvases AND counts by tile_size
        # (__init__.py:148-153, :231-234): duplicate-size crops share one
        # canvas+count, and the final mean divides by the number of UNIQUE
        # tile sizes (len(counts)) — counting even sizes whose crops fit
        # no tiles (their zero canvases still inflate the divisor).
        sig_p = (base_u8.shape, config.augmentations)
        if sig_p not in self._prep_jit:
            self._prep_jit[sig_p] = jax.jit(
                self._prep_body(config.augmentations))
        images = self._prep_jit[sig_p](base_u8, keys)
        plan_canvases = []
        for grp in self._grouping(plans, n_images):
            if len(grp) == 1:
                plan_canvases.append((grp[0], self._scale_fn(
                    (h, w), grp[0], config, int(zw.shape[1]), n_images
                )(self.params["visual"], images, zw)))
            else:
                cvs = self._scale_group_fn(
                    (h, w), tuple(grp), config, int(zw.shape[1]), n_images
                )(self.params["visual"], images, zw)
                plan_canvases.extend(zip(grp, cvs))
        n_unique = len({p.tile_size for p in plans})
        by_size: dict = {}
        for plan, cv in plan_canvases:
            by_size.setdefault(plan.tile_size, []).append((plan, cv))
        # un-normalize each canvas by its own count map, merge sums, and
        # renormalize by the SHARED count (1e-5 seeded once, not per crop)
        merged = []
        for items in by_size.values():
            s = sum(cv * jnp.asarray(p.count)[None] for p, cv in items)
            shared = (sum(p.count for p, _ in items)
                      - (len(items) - 1) * np.float32(1e-5))
            merged.append(s / jnp.asarray(shared)[None])
        return (sum(merged) / n_unique).astype(jnp.float16)
