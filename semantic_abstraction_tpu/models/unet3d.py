"""Residual 3D UNet as pure JAX functions over a param pytree.

TPU-native re-architecture of the reference's vendored pytorch-3dunet
``ResidualUNet3D`` (reference: unet3d.py:658-689, ExtResNetBlock :190-259,
Encoder :262-317, Decoder :320-396, Upsampling :399-444,
Abstract3DUNet :481-621). Semantics reproduced:

- ExtResNetBlock with layer order "gcr" (the Abstract3DUNet default that
  ResidualUNet3D actually instantiates, unet3d.py:520/676): GroupNorm over
  the INPUT channels -> Conv3d(bias=False) -> ReLU for conv1/conv2; conv3
  drops the non-linearity ("gc"); residual add from conv1's output, then
  ReLU (unet3d.py:232-259).
- Encoders: MaxPool3d(2) before the block on every level but the first
  (unet3d.py:534-560).
- Decoders: ConvTranspose3d(k=3, stride=2, padding=1) sized to the skip
  connection, SUM joining, then ExtResNetBlock (unet3d.py:320-396).
- Final 1x1x1 Conv3d with bias (unet3d.py:583-585).

TPU-first departures: the model is ``init`` + pure ``apply`` over a nested
dict pytree; convs run through ``lax.conv_general_dilated`` in a
configurable ``compute_dtype`` (bf16 on TPU feeds the MXU at full rate)
while GroupNorm statistics are always fp32; the transposed conv is expressed
as an input-dilated convolution so XLA lowers it onto the same conv engine.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np


def feature_maps_per_level(f_maps: int, num_levels: int) -> list:
    """[f, 2f, 4f, ...] (reference unet3d.py:12-13)."""
    return [f_maps * 2**k for k in range(num_levels)]


def _group_norm_affine(x: jax.Array, gid: np.ndarray, num_groups: int,
                       scale_c: jax.Array, bias_c: jax.Array,
                       eps: float, count: int | None = None,
                       mask_1d: tuple | None = None) -> jax.Array:
    """Shared GN core: per-channel stats -> group pooling -> ONE
    per-channel affine on the big tensor.

    ``gid`` maps each channel of x to its statistics group. The big
    activation is never reshaped: splitting the channel axis of a
    128^3-scale NCDHW tensor relayouts it on TPU (measured ~20-40 ms per
    train step in XLA "data formatting"); instead the group statistics
    come from tiny (B, C) per-channel moments pooled with a constant
    (C, G) averaging matrix, and normalization is a per-channel
    scale+shift that XLA fuses into one elementwise pass.

    ``count``/``mask_1d`` support the ODD (phase-shifted) blocked basis
    (see phase_conv): tensors there carry zero pad slots that must not
    bias the statistics (``count`` = number of REAL positions per channel;
    the sums are unaffected because pads are zero) and must STAY zero
    through the affine's bias (``mask_1d`` = per-dim (C, n) 0/1 factors,
    applied as a lazily-broadcast product that XLA fuses into the same
    elementwise pass).
    """
    b, c = x.shape[:2]
    # moments over ONE flat spatial axis: with separate (D, H, W) axes the
    # minor dim is W (64 at the deep levels) and every vector op runs on
    # half-empty 128-lane tiles; the merged axis is a free row-major
    # reshape and keeps the reduce full-lane
    x_flat = x.reshape(b, c, -1)
    n = count if count is not None else x_flat.shape[2]
    # one fused convert->(square)->reduce per moment: a SHARED f32
    # upcast (xf = x_flat.astype(f32) consumed by both sums) materialized
    # a full-volume f32 copy in the compiled step (~600 MB x2 at the
    # 128^3 config) because two consumers defeat fusion duplication
    s1 = x_flat.astype(jnp.float32).sum(axis=2) / n  # (B, C)
    s2 = jnp.square(x_flat.astype(jnp.float32)).sum(axis=2) / n  # (B, C)
    pool = np.zeros((c, num_groups), np.float32)
    pool[np.arange(c), gid] = 1.0
    pool /= pool.sum(axis=0, keepdims=True)
    pool = jnp.asarray(pool)
    gm = s1 @ pool  # (B, G)
    var = s2 @ pool - gm * gm
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    gid_j = jnp.asarray(gid)
    sc = inv[:, gid_j] * scale_c.astype(jnp.float32)[None]  # (B, C)
    bi = bias_c.astype(jnp.float32)[None] - gm[:, gid_j] * sc
    # the affine stays on the ORIGINAL 5-D shape (fuses into the following
    # conv's input); only the moments use the flat view — a flat affine
    # measured slightly slower
    shape = (b, c) + (1,) * (x.ndim - 2)
    # apply the affine IN the data dtype (stats stay f32): the f32
    # formulation materialized the full volume f32 and XLA's layout
    # assignment inserted the conv-operand relayout copy at f32 width —
    # ~600 MB x4 extra copy bytes per step at the 128^3 config (seen in
    # the compiled HLO at this line). bf16 rounding of the per-channel
    # scale/bias matches torch-autocast GN semantics; the f32 compute
    # path (all parity tests) is unchanged (casts are no-ops).
    out = x * sc.astype(x.dtype).reshape(shape) + bi.astype(x.dtype).reshape(shape)
    if mask_1d is not None:
        out = _apply_odd_mask(out, mask_1d)
    return out


def group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, num_groups: int,
               eps: float = 1e-5) -> jax.Array:
    """GroupNorm over (B, C, D, H, W); statistics in fp32.

    See _group_norm_affine for the TPU-layout-preserving formulation."""
    c = x.shape[1]
    g = num_groups if c >= num_groups else 1
    gid = np.arange(c) // (c // g)
    return _group_norm_affine(x, gid, g, scale, bias, eps)


_DIMNUMS = ("NCDHW", "OIDHW", "NCDHW")


def conv3d(x: jax.Array, w: jax.Array, bias=None, stride: int = 1,
           padding: int = 1) -> jax.Array:
    # bf16 operands hit the MXU with fp32 accumulation by default on TPU;
    # an explicit preferred_element_type=f32 would break the conv VJP
    # (bf16 input x f32 cotangent dtype mismatch)
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,) * 3,
        padding=[(padding, padding)] * 3,
        dimension_numbers=_DIMNUMS,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype).reshape(1, -1, 1, 1, 1)
    return out


def conv_transpose3d(x: jax.Array, w_t: jax.Array, bias=None, stride: int = 2,
                     padding: int = 1, output_padding: int = 1) -> jax.Array:
    """torch ``ConvTranspose3d`` semantics via an input-dilated conv.

    ``w_t`` is stored in torch layout (I, O, kd, kh, kw). The equivalent
    direct convolution uses the spatially-flipped kernel with I/O swapped,
    lhs_dilation=stride and per-dim padding (k-1-p, k-1-p+output_padding).
    """
    k = w_t.shape[2]
    w = jnp.flip(w_t, axis=(2, 3, 4)).transpose(1, 0, 2, 3, 4)
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1,) * 3,
        padding=[(lo, hi)] * 3,
        lhs_dilation=(stride,) * 3,
        dimension_numbers=_DIMNUMS,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype).reshape(1, -1, 1, 1, 1)
    return out


@functools.lru_cache(maxsize=8)
def _s2d_kernel_maps(k: int = 3, block: int = 2):
    """Static index/mask tables for the space-to-depth conv transform.

    For one spatial dim: an original tap dz in [0, k) contributes to the
    blocked tap K at input-block offset oi for output offset ox where
    dz = block*K + oi - ox - (k // 2) + (block - 1) ... derived for
    k=3, block=2, pad=2: dz = 2K + oi - ox - 1, valid when 0 <= dz < 3.
    Returns (idx (K*oi*ox,), valid (K*oi*ox,)) with K-major, oi, ox order.
    """
    assert k == 3 and block == 2, "transform derived for 3x3x3, block 2"
    idx = np.zeros((3, 2, 2), np.int64)
    valid = np.zeros((3, 2, 2), bool)
    for K in range(3):
        for oi in range(2):
            for ox in range(2):
                dz = 2 * K + oi - ox - 1
                valid[K, oi, ox] = 0 <= dz < 3
                idx[K, oi, ox] = np.clip(dz, 0, 2)
    return idx.reshape(-1), valid.reshape(-1)


@functools.lru_cache(maxsize=2)
def _s2d_selector() -> np.ndarray:
    """(8, 8, 27, 27) 0/1 tensor: Sel[p, q, K, t] = 1 iff original tap
    t = (dz, dy, dx) lands on blocked tap K at output offset p = (oxz,
    oxy, oxx) / input offset q = (oiz, oiy, oix) — per-dim rule
    dz = 2K + oi - ox - 1 (see _s2d_kernel_maps)."""
    sel1 = np.zeros((2, 2, 3, 3), np.float32)  # (ox, oi, K, d)
    for K in range(3):
        for oi in range(2):
            for ox in range(2):
                d = 2 * K + oi - ox - 1
                if 0 <= d < 3:
                    sel1[ox, oi, K, d] = 1.0
    sel = np.einsum(
        "aqkd,brle,csmf->abcqrsklmdef", sel1, sel1, sel1
    )  # (oxz,oxy,oxx, oiz,oiy,oix, Kz,Ky,Kx, dz,dy,dx)
    return np.ascontiguousarray(sel.reshape(8, 8, 27, 27))


def _blocked_weights(w: jax.Array) -> jax.Array:
    """(O, I, 3, 3, 3) kernel -> (8O, 8I, 3, 3, 3) space-to-depth kernel.

    Computed as ONE einsum against a constant 0/1 selector (each output
    element selects exactly one original tap, so the contraction is exact
    in any dtype). The earlier gather+mask+11-D-transpose formulation
    cost ~37 ms/train-step in XLA layout copies (T(2,128)-tiled 11-D
    transposes of the 3.5 MB weight tensor, fwd + d(w) each)."""
    o, i = w.shape[:2]
    sel = jnp.asarray(_s2d_selector(), w.dtype)
    wg = jnp.einsum("oit,pqKt->poqiK", w.reshape(o, i, 27), sel)
    return wg.reshape(8 * o, 8 * i, 3, 3, 3)


def _space_to_depth(x: jax.Array) -> jax.Array:
    """(B, C, D+4, H+4, W+4) padded -> (B, 8C, (D+4)/2, ...) with channel
    order ((oz*2+oy)*2+ox)*C + c."""
    b, c, d, h, w = x.shape
    x = x.reshape(b, c, d // 2, 2, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 3, 5, 7, 1, 2, 4, 6)
    return x.reshape(b, 8 * c, d // 2, h // 2, w // 2)


def _depth_to_space(x: jax.Array) -> jax.Array:
    """(B, 8C, D/2, H/2, W/2) -> (B, C, D, H, W) (inverse channel order)."""
    b, c8, d2, h2, w2 = x.shape
    c = c8 // 8
    x = x.reshape(b, 2, 2, 2, c, d2, h2, w2)
    x = x.transpose(0, 4, 5, 1, 6, 2, 7, 3)
    return x.reshape(b, c, 2 * d2, 2 * h2, 2 * w2)


def conv3d_s2d(x: jax.Array, w: jax.Array) -> jax.Array:
    """3x3x3 same-padding conv computed in a 2x2x2 space-to-depth basis.

    Numerically identical to ``conv3d(x, w, padding=1)``, but the MXU
    contraction runs over 8x the channels (e.g. 16 -> 128): XLA's native
    small-channel 3-D conv runs at ~1% of MXU peak on TPU (lane padding on
    both operands); the blocked form does 8x the nominal MACs at ~64x
    better utilization — measured ~5-7x faster at the UNet's top levels.
    Requires even spatial dims.
    """
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (2, 2), (2, 2)))
    xb = _space_to_depth(xp)
    wb = _blocked_weights(w.astype(x.dtype))
    out = jax.lax.conv_general_dilated(
        xb, wb, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=_DIMNUMS,
    )
    return _depth_to_space(out)


# ---------------------------------------------------------------------------
# Blocked (space-to-depth) level execution.
#
# Measured on v5e: XLA's 3-D conv runs at ~4.8 TFLOP/s with 16 channels but
# 90-137 TFLOP/s with >=128 — the MXU pads both channel operands to the
# 128-lane width. Folding 2x2x2 spatial blocks into channels (16ch@128^3 ->
# 128ch@64^3) moves the top UNet levels onto the fast path. A per-conv
# rewrite loses the gain to pad/transpose pairs (conv3d_s2d), so these ops
# keep a whole level in the blocked basis: one s2d per level entry, one
# d2s per exit. All are exact algebraic rewrites of the reference ops —
# checkpoints and outputs are unchanged (see tests).
#
# The convs themselves run PHASE-ALTERNATING (see the parity section
# below): the ALIGNED-basis 3^3 blocked conv kept here (blocked_conv3d,
# used by conv3d_s2d and kept as the validated fallback) pays 8x the
# original MACs; the parity form pays 64/27 ≈ 2.37x and is what
# residual_unet3d executes.
# ---------------------------------------------------------------------------


def blocked_conv3d(xb: jax.Array, w: jax.Array) -> jax.Array:
    """3x3x3 same conv in the blocked basis: xb (B, 8*I, D/2, H/2, W/2),
    w the ORIGINAL (O, I, 3, 3, 3) kernel. pad-1 blocked == pad-2 original."""
    wb = _blocked_weights(w.astype(xb.dtype))
    return jax.lax.conv_general_dilated(
        xb, wb, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=_DIMNUMS,
    )


def blocked_group_norm(xb: jax.Array, scale: jax.Array, bias: jax.Array,
                       num_groups: int, eps: float = 1e-5) -> jax.Array:
    """GroupNorm of the underlying tensor computed in the blocked basis:
    statistics pool over (8 offsets x channel-group x spatial). Same
    layout-preserving per-channel-affine formulation as group_norm —
    blocked channel j = offset*C + c belongs to group (j % C) // (C/G)."""
    c8 = xb.shape[1]
    c = c8 // 8
    g = num_groups if c >= num_groups else 1
    gid = (np.arange(c8) % c) // (c // g)
    return _group_norm_affine(
        xb, gid, g, jnp.tile(scale, 8), jnp.tile(bias, 8), eps
    )


def blocked_max_pool(xb: jax.Array) -> jax.Array:
    """2x2x2 stride-2 max pool == max over the 8 offset channels; returns
    the UNBLOCKED pooled tensor (B, C, D/2, H/2, W/2)."""
    b, c8 = xb.shape[:2]
    return xb.reshape(b, 8, c8 // 8, *xb.shape[2:]).max(axis=1)


# ---------------------------------------------------------------------------
# Phase-alternating ("parity") blocked convs.
#
# The 3x3x3 conv in the ALIGNED space-to-depth basis (blocked_conv3d) pays
# 8x the original MACs: its (8O, 8I, 27) kernel is only 1/8 dense (each
# output offset uses 27 of the 216 blocked taps) and the MXU multiplies
# the structural zeros. Shifting the INPUT blocking by one original voxel
# (the "odd" basis: block Z holds original positions 2Z-1 and 2Z) makes
# the union receptive field of one output block exactly TWO adjacent input
# blocks per dim, so the same conv becomes a 2x2x2-kernel conv with a
# (8O, 8I, 2, 2, 2) weight of density 27/64 — 64/27 ≈ 2.37x the original
# MACs instead of 8x, at the same ~90-95% MXU occupancy (measured: the
# aligned 3^3 blocked convs ran 163-187 TFLOP/s of mostly-wasted work).
# Both directions (odd->even and even->odd) share one tap rule,
# d = 2b + s - p per dim, so the three convs of an ExtResNetBlock simply
# alternate bases with NO relayout between them; only the basis entry /
# exit (space_to_depth_odd / depth_to_space_odd) changes, at the same cost
# as the aligned s2d/d2s.
#
# Odd-basis tensors carry one pad slot per dim (original positions -1 and
# D). The invariant is: EVERY odd-basis tensor is pad-zeroed. s2d_odd pads
# with zeros; phase_conv(out_parity="odd") and the odd GroupNorm re-zero
# the slots (a lazily-broadcast 0/1 per-dim product fused into the conv
# epilogue / affine pass); ReLU and residual adds preserve zeros. With
# zero pads, a VALID 2^3 phase conv reproduces the original conv's zero
# padding exactly, and GN statistics only need the true-count denominator
# (sums are unaffected by zeros).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=2)
def _phase_selector() -> np.ndarray:
    """(8, 8, 27, 2, 2, 2) 0/1 tensor: Sel[p, s, t, bz, by, bx] = 1 iff
    original tap t = (dz, dy, dx) lands on 2^3-kernel tap b at output
    offset p / input slot s — per-dim rule d = 2b + s - p.

    Derivation (per dim): odd input block Zi holds original position
    2*Zi - 1 + s; output block Zo holds 2*Zo + p (even) or 2*Zo - 1 + p
    (odd). For BOTH conv directions the input block index is Zo + b with
    b in {0, 1} (odd->even: VALID over the 1-larger odd input; even->odd:
    the even input padded by one block each side), and the tap works out
    to d = in - out + 1 = 2b + s - p in both cases, valid when 0 <= d < 3.
    """
    sel1 = np.zeros((2, 2, 2, 3), np.float32)  # (p, b, s, d)
    for p in range(2):
        for bb in range(2):
            for s in range(2):
                d = 2 * bb + s - p
                if 0 <= d < 3:
                    sel1[p, bb, s, d] = 1.0
    sel = np.einsum(
        "aiud,bjve,ckwf->abcuvwdefijk", sel1, sel1, sel1
    )  # (pz,py,px, sz,sy,sx, dz,dy,dx, bz,by,bx)
    return np.ascontiguousarray(sel.reshape(8, 8, 27, 2, 2, 2))


def _phase_weights(w: jax.Array) -> jax.Array:
    """(O, I, 3, 3, 3) kernel -> (8O, 8I, 2, 2, 2) phase-conv kernel
    (density 27/64), as ONE einsum against a constant 0/1 selector —
    exact in any dtype (each output element selects one original tap)."""
    o, i = w.shape[:2]
    sel = jnp.asarray(_phase_selector(), w.dtype)
    wg = jnp.einsum("oit,pstzyx->posizyx", w.reshape(o, i, 27), sel)
    return wg.reshape(8 * o, 8 * i, 2, 2, 2)


@functools.lru_cache(maxsize=64)
def _odd_mask_1d(c8: int, n: int, dim: int) -> np.ndarray:
    """(c8, n) 0/1 factor zeroing the odd-basis pad slots along one
    blocked dim: slot s=0 of block 0 is original position -1, slot s=1 of
    block n-1 is position D — both pads. dim selects which offset bit of
    the blocked channel (s-major order ((sz*2+sy)*2+sx)*C + c) applies."""
    c = c8 // 8
    shift = (2 - dim)  # dim 0 -> sz (bit 2), 1 -> sy (bit 1), 2 -> sx
    s = (np.arange(c8) // c >> shift) & 1
    m = np.ones((c8, n), np.float32)
    m[s == 0, 0] = 0.0
    m[s == 1, n - 1] = 0.0
    return m


def _odd_masks(xb: jax.Array) -> tuple:
    c8, zn, yn, xn = xb.shape[1:5]
    return (_odd_mask_1d(c8, zn, 0), _odd_mask_1d(c8, yn, 1),
            _odd_mask_1d(c8, xn, 2))


def _apply_odd_mask(x: jax.Array, mask_1d: tuple) -> jax.Array:
    """Multiply by the three per-dim factors; broadcasts stay lazy so XLA
    fuses the whole product into the surrounding elementwise pass."""
    mz, my, mx = (jnp.asarray(m, x.dtype) for m in mask_1d)
    return (x * mz[None, :, :, None, None] * my[None, :, None, :, None]
            * mx[None, :, None, None, :])


def space_to_depth_odd(x: jax.Array) -> jax.Array:
    """(B, C, D, H, W) (even dims) -> ODD-basis (B, 8C, D/2+1, ...):
    block Z holds original positions (2Z-1, 2Z); pads are zero."""
    return _space_to_depth(
        jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
    )


def depth_to_space_odd(xb: jax.Array) -> jax.Array:
    """Inverse of space_to_depth_odd (trims the pad slots)."""
    y = _depth_to_space(xb)
    return y[:, :, 1:-1, 1:-1, 1:-1]


def phase_conv(xb: jax.Array, w: jax.Array, out_parity: str) -> jax.Array:
    """3x3x3 same-padding conv as a 2^3 conv between blocked bases.

    odd -> even (``out_parity="even"``): VALID over the one-larger odd
    input. even -> odd (``"odd"``): pad one block each side (those blocks
    are original positions {-2,-1} / {D,D+1}; only -1 and D are reachable
    by the taps, matching the original zero padding), then re-zero the
    output's pad slots to keep the odd-basis invariant.
    """
    wb = _phase_weights(w.astype(xb.dtype))
    pad = [(0, 0)] * 3 if out_parity == "even" else [(1, 1)] * 3
    out = jax.lax.conv_general_dilated(
        xb, wb, window_strides=(1, 1, 1), padding=pad,
        dimension_numbers=_DIMNUMS,
    )
    if out_parity == "odd":
        out = _apply_odd_mask(out, _odd_masks(out))
    return out


def blocked_max_pool_odd(xb: jax.Array) -> jax.Array:
    """2x2x2 stride-2 max pool of an ODD-basis tensor, emitting the PLAIN
    pooled tensor (B, C, D/2, ...). Pool pairs (2k, 2k+1) live in adjacent
    odd blocks (k slot 1, k+1 slot 0), so the pool is an elementwise max
    of 8 shifted slices — one fused pass, no basis conversion."""
    b, c8, zn, yn, xn = xb.shape
    c = c8 // 8
    n = (zn - 1, yn - 1, xn - 1)
    out = None
    for oz in range(2):
        for oy in range(2):
            for ox in range(2):
                s_idx = ((1 - oz) * 2 + (1 - oy)) * 2 + (1 - ox)
                piece = xb[:, s_idx * c:(s_idx + 1) * c,
                           oz:oz + n[0], oy:oy + n[1], ox:ox + n[2]]
                out = piece if out is None else jnp.maximum(out, piece)
    return out


@functools.lru_cache(maxsize=8)
def _odd_transpose_maps():
    """(s, K) -> transposed-conv tap k_t for stride-2/k-3/pad-1/outpad-1
    with ODD-blocked output: odd block Z slot s covers j = 2Z - 1 + s;
    per dim out[j] taps x[Z - 1 + K]: (s=0, K=0) -> w_t[2],
    (s=0, K=1) -> w_t[0], (s=1, K=1) -> w_t[1]; (s=1, K=0) unused."""
    idx = np.zeros((2, 2), np.int64)
    valid = np.zeros((2, 2), bool)
    idx[0, 0], valid[0, 0] = 2, True
    idx[0, 1], valid[0, 1] = 0, True
    idx[1, 1], valid[1, 1] = 1, True
    return idx, valid


def blocked_conv_transpose_odd(x: jax.Array, w_t: jax.Array,
                               bias=None) -> jax.Array:
    """torch ConvTranspose3d(k=3, s=2, p=1, op=1) producing ODD-basis
    output directly: x (B, I, n, ...) unblocked low-res, w_t torch layout
    (I, O, 3, 3, 3); returns (B, 8O, n+1, ...) ==
    space_to_depth_odd(conv_transpose3d(x, w_t)). One pad-(1,1) 2^3 conv;
    the output pad slots are re-zeroed (bias would otherwise leak)."""
    i, o = w_t.shape[:2]
    idx, valid = _odd_transpose_maps()
    fi = idx.reshape(-1)
    fv = valid.reshape(-1)
    wg = w_t[:, :, fi[:, None, None], fi[None, :, None], fi[None, None, :]]
    mask = fv[:, None, None] & fv[None, :, None] & fv[None, None, :]
    wg = wg * jnp.asarray(mask, w_t.dtype)
    wg = wg.reshape(i, o, 2, 2, 2, 2, 2, 2)  # (i, o, sz,Kz, sy,Ky, sx,Kx)
    # -> (sz,sy,sx,o, i, Kz,Ky,Kx) -> (8O, I, 2, 2, 2)
    wg = wg.transpose(2, 4, 6, 1, 0, 3, 5, 7).reshape(8 * o, i, 2, 2, 2)
    out = jax.lax.conv_general_dilated(
        x, wg.astype(x.dtype), window_strides=(1, 1, 1),
        padding=[(1, 1)] * 3, dimension_numbers=_DIMNUMS,
    )
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), 8).reshape(
            1, -1, 1, 1, 1
        )
    return _apply_odd_mask(out, _odd_masks(out))


def blocked_group_norm_odd(xb: jax.Array, scale: jax.Array, bias: jax.Array,
                           num_groups: int, eps: float = 1e-5) -> jax.Array:
    """GroupNorm in the ODD blocked basis: pads are zero (invariant), so
    the sums are exact and only the denominator changes — every blocked
    channel has exactly (zn-1)(yn-1)(xn-1) real positions. The affine
    re-zeros the pad slots (the bias would otherwise leak into them)."""
    c8, zn, yn, xn = xb.shape[1:5]
    c = c8 // 8
    g = num_groups if c >= num_groups else 1
    gid = (np.arange(c8) % c) // (c // g)
    return _group_norm_affine(
        xb, gid, g, jnp.tile(scale, 8), jnp.tile(bias, 8), eps,
        count=(zn - 1) * (yn - 1) * (xn - 1), mask_1d=_odd_masks(xb),
    )


@functools.lru_cache(maxsize=8)
def _s2d_transpose_maps():
    """(ox, K) -> transposed-conv kernel tap k_t for stride 2 / k 3 / pad 1
    / output_padding 1 per spatial dim: out[2X+ox] = sum_K w_t[k_t] x[X+K]."""
    idx = np.zeros((2, 2), np.int64)
    valid = np.zeros((2, 2), bool)
    idx[0, 0], valid[0, 0] = 1, True   # ox=0: w_t[1] x[X]
    idx[1, 0], valid[1, 0] = 2, True   # ox=1: w_t[2] x[X]
    idx[1, 1], valid[1, 1] = 0, True   # ox=1: w_t[0] x[X+1]
    # (ox=0, K=1) unused
    return idx, valid


def blocked_conv_transpose3d(x: jax.Array, w_t: jax.Array, bias=None) -> jax.Array:
    """torch ConvTranspose3d(k=3, s=2, p=1, op=1) producing BLOCKED output.

    x (B, I, D2, H2, W2) unblocked low-res; w_t torch layout (I, O, 3, 3, 3).
    Returns (B, 8*O, D2, H2, W2) == s2d(conv_transpose3d(x, w_t)). The
    stride-2 transposed conv factorizes into a kernel-2 conv per output
    offset, so the blocked form is one pad-(0,1) VALID-ish conv."""
    i, o = w_t.shape[:2]
    idx, valid = _s2d_transpose_maps()
    # gather (i, o, (ox,K)z, (ox,K)y, (ox,K)x) taps
    fi = idx.reshape(-1)
    fv = valid.reshape(-1)
    wg = w_t[:, :, fi[:, None, None], fi[None, :, None], fi[None, None, :]]
    mask = fv[:, None, None] & fv[None, :, None] & fv[None, None, :]
    wg = wg * jnp.asarray(mask, w_t.dtype)
    wg = wg.reshape(i, o, 2, 2, 2, 2, 2, 2)  # (i, o, oxz,Kz, oxy,Ky, oxx,Kx)
    # -> (oxz,oxy,oxx,o, i, Kz,Ky,Kx) -> (8O, I, 2, 2, 2)
    wg = wg.transpose(2, 4, 6, 1, 0, 3, 5, 7).reshape(8 * o, i, 2, 2, 2)
    out = jax.lax.conv_general_dilated(
        x, wg.astype(x.dtype), window_strides=(1, 1, 1),
        padding=[(0, 1)] * 3, dimension_numbers=_DIMNUMS,
    )
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), 8).reshape(
            1, -1, 1, 1, 1
        )
    return out


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, C, D, H, W) (even dims) -> (B, 8C, D/2, H/2, W/2),
    channel order ((oz*2+oy)*2+ox)*C + c."""
    return _space_to_depth(x)


def depth_to_space(x: jax.Array) -> jax.Array:
    return _depth_to_space(x)


def blocked_ext_resnet_block(params: dict, xb: jax.Array,
                             num_groups: int,
                             in_parity: str = "odd") -> jax.Array:
    """ExtResNetBlock in the blocked basis (== ext_resnet_block exactly),
    with phase-alternating convs: each conv flips the basis, so with an
    ODD input (encoder levels: space_to_depth_odd) the residual (conv1
    output) and the block output are both EVEN — max-pool/skips need no
    relayout — and with an EVEN input (decoder levels: transposed conv +
    skip sum) both land ODD, exited through depth_to_space_odd."""

    def single(p, h, relu, par):
        if par == "odd":
            h = blocked_group_norm_odd(h, p["gn_scale"], p["gn_bias"],
                                       num_groups)
            h = jax.ad_checkpoint.checkpoint_name(h, "gn_out")
            h = phase_conv(h, p["w"], out_parity="even")
        else:
            h = blocked_group_norm(h, p["gn_scale"], p["gn_bias"],
                                   num_groups)
            h = jax.ad_checkpoint.checkpoint_name(h, "gn_out")
            h = phase_conv(h, p["w"], out_parity="odd")
        return jax.nn.relu(h) if relu else h

    flip = "even" if in_parity == "odd" else "odd"
    out = single(params["conv1"], xb, True, in_parity)
    residual = out
    out = single(params["conv2"], out, True, flip)
    out = single(params["conv3"], out, False, in_parity)
    return jax.nn.relu(out + residual)


def max_pool3d(x: jax.Array, window: int = 2) -> jax.Array:
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 1, window, window, window),
        window_strides=(1, 1, window, window, window),
        padding="VALID",
    )


def _single_conv(params: dict, x: jax.Array, num_groups: int, relu: bool) -> jax.Array:
    """GroupNorm (input channels) -> Conv3d(bias=False) -> optional ReLU
    ("gcr"/"gc" order, reference unet3d.py:20-95 create_conv).

    Perf note (v5e, measured): a PER-CONV space-to-depth rewrite
    (conv3d_s2d) loses its MXU gains to the pad/transpose pairs around
    each conv (20 vs 12.7 ms at 16ch@128^3), so the plain conv is used
    here; blocked-space execution pays only if a whole level stays in the
    blocked basis."""
    x = group_norm(x, params["gn_scale"], params["gn_bias"], num_groups)
    x = jax.ad_checkpoint.checkpoint_name(x, "gn_out")
    x = conv3d(x, params["w"])
    if relu:
        x = jax.nn.relu(x)
    return x


def ext_resnet_block(params: dict, x: jax.Array, num_groups: int) -> jax.Array:
    """Reference ExtResNetBlock forward (unet3d.py:244-259)."""
    out = _single_conv(params["conv1"], x, num_groups, relu=True)
    residual = out
    out = _single_conv(params["conv2"], out, num_groups, relu=True)
    out = _single_conv(params["conv3"], out, num_groups, relu=False)
    return jax.nn.relu(out + residual)


def _level_is_blocked(i: int, blocked_levels: int, channels: int,
                      spatial) -> bool:
    return (
        # cap 32: blocking the 64-channel level measured neutral at best
        # (0.690 vs 0.684 s/step with the selector-einsum weights) — plain
        # convs are MXU-efficient by C=64
        i < blocked_levels
        and channels <= 32
        and all(s % 2 == 0 and s >= 8 for s in spatial)
    )


def unet_blocked_io_ok(params: dict, voxel_shape,
                       blocked_levels: int = 2) -> bool:
    """True iff this UNet's level 0 executes in the blocked basis at
    ``voxel_shape`` — the precondition for ``blocked_io`` (the caller then
    feeds/consumes (B, D/2, H/2, W/2, 8C) channel-last volumes)."""
    c0 = params["encoders"][0]["conv1"]["w"].shape[0]
    c_in = params["encoders"][0]["conv1"]["w"].shape[1]
    return (
        _level_is_blocked(0, blocked_levels, c0, voxel_shape)
        and _level_is_blocked(0, blocked_levels, c_in, voxel_shape)
        and len(params["decoders"]) > 0
    )


def residual_unet3d(params: dict, x: jax.Array, num_groups: int = 8,
                    compute_dtype=None, remat: bool = True,
                    blocked_levels: int = 2,
                    remat_policy: str = "dots",
                    channels_last: bool = False,
                    blocked_io: bool = False) -> jax.Array:
    """Forward pass. x: (B, C_in, D, H, W) -> (B, C_out, D, H, W); with
    ``channels_last``, (B, D, H, W, C_in) -> (B, D, H, W, C_out) — the
    entry transpose fuses with the level-0 space-to-depth relayout, and
    the final 1x1x1 conv emits channel-minor directly, which is what the
    implicit decoder's neighborhood pack wants (saves a 268 MB relayout
    per decoder call at the train-step shapes).

    With ``remat`` each residual block is wrapped in ``jax.checkpoint``:
    only block boundaries stay live for the backward pass and the block
    interiors (3 convs + GN temps, the conv-backward padding blowup) are
    recomputed — at 128^3 this is what fits the train step in a v5e's
    16 GB HBM.

    The ``blocked_levels`` shallowest levels execute in the space-to-depth
    basis (see blocked_* ops above): identical math, ~8x larger channel
    dim so the convs hit the MXU fast path instead of ~4.8 TFLOP/s, with
    the convs phase-alternating between the aligned and odd bases
    (phase_conv: 2^3 kernels at 2.37x the original MACs instead of the
    aligned 3^3 form's 8x). Encoder blocks enter even (plain s2d) and
    exit odd (pooled directly by blocked_max_pool_odd); decoder blocks
    enter odd (blocked_conv_transpose_odd + odd skip) and exit even
    (plain d2s) — basis entry/exit never materializes a padded volume.

    ``blocked_io`` (the 128-lane end-to-end path): x is ALREADY the level-0
    blocked basis, channel-last — (B, D/2, H/2, W/2, 8*C_in), slot-major
    lanes (== ops.sampling.space_to_depth_cl of the dense volume; the
    voxel scatter emits this form directly) — and the output is returned
    the same way, (B, D/2, H/2, W/2, 8*C_out), for the blocked sampler.
    Level 0's space-to-depth entry and the final depth-to-space exit
    disappear (each was a full-volume relayout whose NARROW 16-lane side
    pays 8x its bytes in (8,128) tiles); the final 1x1x1 conv runs in the
    blocked basis as one kron(I_8, W) lane matmul. Requires level 0 (and
    its decoder) blocked — see :func:`unet_blocked_io_ok`.
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    if blocked_io:
        assert unet_blocked_io_ok(params, tuple(2 * s for s in x.shape[1:4]),
                                  blocked_levels), (
            "blocked_io requires a blocked level 0 (even dims >= 8, "
            "channels <= 32, blocked_levels >= 1)"
        )
        assert x.shape[-1] == 8 * params["encoders"][0]["conv1"]["w"].shape[1]
        x = jnp.transpose(x, (0, 4, 1, 2, 3))  # NCDHW-blocked, 8C_in lanes
    elif channels_last:
        x = jnp.transpose(x, (0, 4, 1, 2, 3))

    if remat and remat_policy != "save_all":
        # "dots" (dots_saveable) keeps conv/matmul outputs and recomputes
        # the cheap elementwise/GN work in the backward pass — fits a v5e
        # at the full single-stream 128^3 config and measured 0.99 vs
        # 1.15 s/step against "full" (nothing_saveable, which also
        # recomputes the convs). "save_all" disables remat entirely
        # (everything saved; largest HBM footprint). Two-stream models
        # (VOOL) need "full".
        if remat_policy == "dots":
            policy = jax.checkpoint_policies.dots_saveable
        elif remat_policy == "dots_gn":
            # also save GroupNorm outputs (tagged "gn_out"): the backward
            # pass then skips recomputing the GN stats/normalize over the
            # 128^3 activations at ~2.5 GB extra HBM
            policy = jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_saveable,
                jax.checkpoint_policies.save_only_these_names("gn_out"),
            )
        else:
            policy = jax.checkpoint_policies.nothing_saveable
        block = jax.checkpoint(ext_resnet_block, static_argnums=(2,),
                               policy=policy)
        block_b = jax.checkpoint(blocked_ext_resnet_block,
                                 static_argnums=(2, 3), policy=policy)
    else:
        block = ext_resnet_block
        block_b = blocked_ext_resnet_block

    # encoder: skips stored blocked for blocked levels. A blocked level
    # emits its successor's input ALREADY pooled (blocked_max_pool), a
    # plain level does not — track that across the transition.
    skips = []  # list of (is_blocked, tensor), deepest first
    blocked_flags = []
    prev_pooled = True  # level 0 input is never pooled
    for i, enc in enumerate(params["encoders"]):
        if i > 0 and not prev_pooled:
            x = max_pool3d(x)
        c = enc["conv1"]["w"].shape[0]
        # with blocked_io, level 0's x is ALREADY halved (blocked) — the
        # blocking decision is about the LOGICAL full-resolution dims
        # (e.g. 12^3 voxels: full dims pass the >= 8 test, the halved 6^3
        # must not flip the decision mid-path)
        spatial = x.shape[2:]
        if blocked_io and i == 0:
            spatial = tuple(2 * s for s in spatial)
        use_blocked = _level_is_blocked(i, blocked_levels, c, spatial)
        blocked_flags.append(use_blocked)
        if use_blocked:
            # plain (EVEN) s2d entry — the ODD basis is only ever reached
            # THROUGH a conv (no materialized 130^3 pad): the block's convs
            # alternate even -> odd -> even -> odd, its output (and the
            # skip) are ODD, and the pool reads the odd basis directly.
            # With blocked_io, level 0's input arrives already blocked.
            xb = x if (blocked_io and i == 0) else space_to_depth(x)
            xb = block_b(enc, xb, num_groups, "even")  # -> ODD basis
            skips.insert(0, (True, xb))
            x = blocked_max_pool_odd(xb)  # pooled, unblocked next input
            prev_pooled = True
        else:
            x = block(enc, x, num_groups)
            skips.insert(0, (False, x))
            prev_pooled = False
    # drop the deepest skip; x currently equals it for the plain path.
    # For a blocked deepest level (tiny configs) x is already pooled one
    # step too far — only reachable when every level is blocked; guard:
    if blocked_flags[-1]:
        is_b, xb = skips[0]
        x = depth_to_space_odd(xb)
    skips = skips[1:]

    n_dec = len(params["decoders"])
    for di, (dec, (skip_blocked, skip)) in enumerate(
        zip(params["decoders"], skips)
    ):
        if skip_blocked:
            xb = blocked_conv_transpose_odd(x, dec["up_w"], dec["up_b"])
            xb = xb + skip  # both ODD basis (pads zero on both sides)
            xb = block_b(dec, xb, num_groups, "odd")  # -> EVEN basis
            if blocked_io and di == n_dec - 1:
                # blocked exit: the 1x1x1 final conv applies per voxel, so
                # in the blocked basis it is the SAME (O, C) matmul on
                # every slot's lane group — one kron(I_8, W^T) lane matmul
                # whose einsum emits the channel-last blocked output
                # directly (no d2s, no separate transpose pass)
                fw = params["final_w"].astype(xb.dtype)[:, :, 0, 0, 0]
                k8 = jnp.kron(jnp.eye(8, dtype=xb.dtype), fw.T)  # (8C, 8O)
                out = jnp.einsum("bkdhw,kl->bdhwl", xb, k8)
                return out + jnp.tile(params["final_b"].astype(xb.dtype), 8)
            x = depth_to_space(xb)  # plain d2s exit
        else:
            x = conv_transpose3d(x, dec["up_w"], dec["up_b"])
            x = x + skip  # sum joining (unet3d.py:392-396)
            x = block(dec, x, num_groups)
    # 1x1x1 final conv as a channel matmul: the conv formulation made XLA
    # relayout the (O, C, 1, 1, 1) weight through a pathological
    # T(1,128)-tiled copy (~10 ms/step)
    fw = params["final_w"].astype(x.dtype)[:, :, 0, 0, 0]
    if channels_last:
        out = jnp.einsum("bcdhw,oc->bdhwo", x, fw)
        return out + params["final_b"].astype(x.dtype)
    out = jnp.einsum("bcdhw,oc->bodhw", x, fw)
    return out + params["final_b"].astype(x.dtype).reshape(1, -1, 1, 1, 1)


def _init_single_conv(key, c_in, c_out, dtype=jnp.float32):
    # torch Conv3d default: kaiming_uniform(a=sqrt(5)) == U(-b, b),
    # b = sqrt(6 / ((1 + 5) * fan_in)) = 1/sqrt(fan_in)
    fan_in = c_in * 27
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "w": jax.random.uniform(key, (c_out, c_in, 3, 3, 3), dtype, -bound, bound),
        # "gcr" order: GroupNorm acts on the conv INPUT channels
        "gn_scale": jnp.ones((c_in,), dtype),
        "gn_bias": jnp.zeros((c_in,), dtype),
    }


def _init_block(key, c_in, c_out, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": _init_single_conv(k1, c_in, c_out, dtype),
        "conv2": _init_single_conv(k2, c_out, c_out, dtype),
        "conv3": _init_single_conv(k3, c_out, c_out, dtype),
    }


def init_residual_unet3d(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    f_maps: int | Sequence[int] = 64,
    num_levels: int = 5,
    dtype=jnp.float32,
) -> dict:
    """Initialize the param pytree (reference defaults at utils.py:56-59:
    f_maps=16, num_levels=6, num_groups=8, in/out=16)."""
    fmaps = (feature_maps_per_level(f_maps, num_levels)
             if isinstance(f_maps, int) else list(f_maps))
    keys = jax.random.split(key, 2 * len(fmaps) + 1)
    encoders = []
    prev = in_channels
    for i, c in enumerate(fmaps):
        encoders.append(_init_block(keys[i], prev, c, dtype))
        prev = c
    decoders = []
    rev = list(reversed(fmaps))
    for i in range(len(rev) - 1):
        c_in, c_out = rev[i], rev[i + 1]
        kk = keys[len(fmaps) + i]
        ku, kb = jax.random.split(kk)
        fan_in = c_in * 27
        bound = 1.0 / np.sqrt(fan_in)
        dec = _init_block(kb, c_out, c_out, dtype)
        dec["up_w"] = jax.random.uniform(
            ku, (c_in, c_out, 3, 3, 3), dtype, -bound, bound
        )
        dec["up_b"] = jax.random.uniform(ku, (c_out,), dtype, -bound, bound)
        decoders.append(dec)
    kf = keys[-1]
    bound = 1.0 / np.sqrt(fmaps[0])
    return {
        "encoders": encoders,
        "decoders": decoders,
        "final_w": jax.random.uniform(
            kf, (out_channels, fmaps[0], 1, 1, 1), dtype, -bound, bound
        ),
        "final_b": jax.random.uniform(kf, (out_channels,), dtype, -bound, bound),
    }


def convert_unet3d_state_dict(state_dict: dict, prefix: str = "") -> dict:
    """torch ResidualUNet3D state dict -> param pytree.

    Accepts tensors or numpy arrays; keys follow the reference layout
    (``encoders.{i}.basic_module.conv{j}.conv.weight`` etc.).
    """

    def arr(name):
        v = state_dict[prefix + name]
        return jnp.asarray(np.asarray(v), dtype=jnp.float32)

    def block(base):
        out = {}
        for j in (1, 2, 3):
            out[f"conv{j}"] = {
                "w": arr(f"{base}.conv{j}.conv.weight"),
                "gn_scale": arr(f"{base}.conv{j}.groupnorm.weight"),
                "gn_bias": arr(f"{base}.conv{j}.groupnorm.bias"),
            }
        return out

    encoders = []
    i = 0
    while prefix + f"encoders.{i}.basic_module.conv1.conv.weight" in state_dict:
        encoders.append(block(f"encoders.{i}.basic_module"))
        i += 1
    decoders = []
    i = 0
    while prefix + f"decoders.{i}.basic_module.conv1.conv.weight" in state_dict:
        dec = block(f"decoders.{i}.basic_module")
        dec["up_w"] = arr(f"decoders.{i}.upsampling.upsample.weight")
        dec["up_b"] = arr(f"decoders.{i}.upsampling.upsample.bias")
        decoders.append(dec)
        i += 1
    return {
        "encoders": encoders,
        "decoders": decoders,
        "final_w": arr("final_conv.weight"),
        "final_b": arr("final_conv.bias"),
    }
