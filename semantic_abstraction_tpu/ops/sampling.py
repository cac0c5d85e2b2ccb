"""Interpolation primitives: 3D trilinear volume sampling + matrix resizes.

TPU-native replacements for torch ``grid_sample`` (reference net.py:233-239)
and the image resizes on the relevancy hot path (PIL bicubic preprocess,
reference CLIP/clip/clip_explainability.py:98-108; torch bilinear relevancy
upsample, reference CLIP/clip/__init__.py:214-221).

Design notes:
- ``grid_sample_3d`` is a hand-rolled 8-corner gather + lerp. XLA lowers the
  gathers efficiently and fuses the lerps; this is the implicit-decoder hot
  op and must match torch bit-for-bit enough for checkpoint parity
  (border padding, align_corners=True, and torch's axis convention where
  coordinate component 0 indexes the LAST volume axis).
- 1-D resizes are precomputed (out, in) matrices applied as matmuls: on TPU
  a dense matmul on the MXU beats gather-based interpolation, and the
  matrices are built once per static (in, out) pair at trace time.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _grid_sample_prep(dhw, coords):
    """Shared index/fraction math for the trilinear sampler and its VJP."""
    d, h, w = dhw
    sizes = jnp.asarray([w, h, d], dtype=coords.dtype)
    idx = (coords + 1.0) * 0.5 * (sizes - 1)
    idx = jnp.clip(idx, 0.0, sizes - 1)
    ix, iy, iz = idx[..., 0], idx[..., 1], idx[..., 2]
    x0 = jnp.clip(jnp.floor(ix), 0, w - 1)
    y0 = jnp.clip(jnp.floor(iy), 0, h - 1)
    z0 = jnp.clip(jnp.floor(iz), 0, d - 1)
    fx, fy, fz = ix - x0, iy - y0, iz - z0
    return (x0.astype(jnp.int32), y0.astype(jnp.int32), z0.astype(jnp.int32),
            fx, fy, fz)


def _row_pack(vol_row_cl: jax.Array) -> jax.Array:
    """(D, H, W, C) channel-last -> (D*H*W, 8, C) packed 2x2x2 neighborhoods.

    pack[lin(z,y,x), (dz,dy,dx)] = vol[z+dz, y+dy, x+dx] with zero padding
    past the far faces. A single wide gather of a packed row replaces 8
    separate corner gathers (TPU gathers are row-count bound); the zero
    rows are only reachable with zero lerp weight (fx/fy/fz = 0 at the
    clipped border), so clamping semantics are preserved. Taking the
    volume channel-last makes the pack a pure pad+stack (the NCDHW form
    cost a 268 MB relayout per decoder call at the train-step shapes).
    """
    d, h, w, c = vol_row_cl.shape
    vp = jnp.pad(vol_row_cl, ((0, 1), (0, 1), (0, 1), (0, 0)))
    # ladder of channel-DOUBLING shifted concats (x, then y, then z): the
    # minor axis grows 16->32->64->128 lanes and the final (..., 8C) axis
    # is already contiguous, so the (DHW, 8, C) reshape is layout-free.
    # The previous stack-of-8-shifted-slices built a (D,H,W,8,C) tensor
    # whose reshape RETILED 537 MB from 16-lane to 128-lane layout
    # (~105 ms per call at train shapes; measured rule: reshapes that
    # split/merge the channel axis relayout the tensor).
    a = jnp.concatenate([vp[:, :, :w], vp[:, :, 1 : w + 1]], axis=-1)
    b = jnp.concatenate([a[:, :h], a[:, 1 : h + 1]], axis=-1)
    p = jnp.concatenate([b[:d], b[1 : d + 1]], axis=-1)  # (D, H, W, 8C)
    # index order: dz*4C + dy*2C + dx*C + c == (dz, dy, dx) corner major
    return p.reshape(d * h * w, 8, c)


def _lerp_weights(fx, fy, fz):
    """(N,) fractions -> (N, 8) corner weights in (dz, dy, dx) order."""
    wx = jnp.stack([1 - fx, fx], axis=-1)
    wy = jnp.stack([1 - fy, fy], axis=-1)
    wz = jnp.stack([1 - fz, fz], axis=-1)
    w8 = (wz[..., :, None, None] * wy[..., None, :, None]
          * wx[..., None, None, :])
    return w8.reshape(w8.shape[:-3] + (8,))


@jax.custom_vjp
def grid_sample_3d_cl(vol: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample a CHANNEL-LAST (B, D, H, W, C) volume at (B, N, 3) normalized
    coords in [-1, 1]; returns (B, N, C).

    Semantics are identical to :func:`grid_sample_3d` (torch
    ``grid_sample(mode="bilinear", padding_mode="border",
    align_corners=True)``, coords[..., 0] indexing W); the channel-last
    form is the internal hot path — both the 2x2x2 neighborhood pack in
    the forward and the d(vol) cotangent in the backward are naturally
    channel-minor, so NCDHW callers pay two 268 MB relayouts per call
    that this entry point avoids.

    TPU design: per batch row, the 2x2x2 neighborhoods are packed once
    (dense shifts) and each query does ONE wide gather of 8C values —
    TPU gathers are bound by row count, and the 8-corner formulation was
    8x the rows for the same bytes. lax.map over rows bounds the packed
    temp to 8x one volume.

    NOTE (parity quirk): the reference decoder passes (x, y, z) world-derived
    coordinates straight into grid_sample (net.py:229-239), so world-x indexes
    the volume's LAST spatial axis while the scatter laid the volume out as
    (gx, gy, gz). Trained checkpoints bake this in; callers here must pass
    coords in the same (x, y, z) order to reproduce it.
    """
    b, d, h, w, c = vol.shape
    x0, y0, z0, fx, fy, fz = _grid_sample_prep((d, h, w), coords)
    lin = (z0 * h + y0) * w + x0
    w8 = _lerp_weights(fx, fy, fz)  # (B, N, 8)

    def row(args):
        vol_r, lin_r, w8_r = args
        pack = _row_pack(vol_r)  # (DHW, 8, C)
        g8 = jnp.take(pack.reshape(d * h * w, 8 * c), lin_r, axis=0)
        g8 = g8.reshape(-1, 8, c)
        return (g8 * w8_r[:, :, None].astype(g8.dtype)).sum(axis=1)

    # lax.map over rows: bounds the packed temp to 8x one volume (a vmap
    # materializing all rows' packs measured ~3% SLOWER at train shapes
    # despite removing the loop — the copies follow the pack, not the loop)
    return jax.lax.map(row, (vol, lin, w8))


def _grid_sample_cl_fwd(vol, coords):
    return grid_sample_3d_cl(vol, coords), (vol, coords)


def _grid_sample_cl_bwd(res, g):
    """Custom backward. The naive VJP scatter-adds 8 corner rows per query
    (XLA TPU scatter ran ~7M rows/s: 1.6 s for the reference's 1.6M-point
    decoder pass). Here all 8 corners pack into ONE base-corner scatter of
    8C channels into a (D+1, H+1, W+1) staging grid, and the corner
    reduction runs as a 2x2x2 convolution over the packed corner channels
    (see the kernel construction below). Border clamping is reproduced
    by folding the overflow planes onto the last valid planes (their
    weights are zero anyway for clipped coords).

    Accumulation precision FOLLOWS THE COTANGENT DTYPE: a bf16 cotangent
    (the bf16 train step's regime) stages and convolves in bf16 — the
    staging grid is the dominant HBM traffic of the decoder backward
    (~1.1 GB f32 per batch row at the 128^3 x 16ch train shapes; halved
    in bf16) and dvol is cast to vol.dtype (bf16) at the end regardless.
    Scatter collisions are rare (400k points into 2.1M staging bins) and
    the conv's corner reduction still accumulates f32 on the MXU. An f32
    cotangent (all parity tests) keeps the exact f32 path.
    """
    vol, coords = res
    b, d, h, w, c = vol.shape
    n = coords.shape[1]
    acc = jnp.bfloat16 if g.dtype == jnp.bfloat16 else jnp.float32
    x0, y0, z0, fx, fy, fz = _grid_sample_prep((d, h, w), coords)
    gf = g.astype(jnp.float32)
    w8 = _lerp_weights(fx, fy, fz).astype(jnp.float32)  # (B, N, 8)
    data = (w8[..., None] * gf[:, :, None, :]).reshape(b, n, 8 * c).astype(acc)
    # staging W dim padded to the 8-sublane tile: at w+1 = 129 XLA padded
    # and reshaped the 550 MB staging around the corner conv (measured
    # ~29 ms/step of pure copies); an aligned allocation costs +5% scatter
    # traffic and no copies. D/H need no alignment (only the minor two
    # dims are tiled).
    w1p = -(-(w + 1) // 8) * 8
    lin0 = (z0 * (h + 1) + y0) * w1p + x0  # base corner in staging grid
    lin = (z0 * h + y0) * w + x0

    fxe = fx[..., None].astype(jnp.float32)
    fye = fy[..., None].astype(jnp.float32)
    fze = fz[..., None].astype(jnp.float32)

    # corner-reduction conv kernel (2, 2, 2, 8C, C), DHWIO:
    # out[z,y,x,cc] += staging[z-dz, y-dy, x-dx, j*C+cc] for corner
    # j = (dz,dy,dx) <=> tap (1-dz, 1-dy, 1-dx) holds group j's identity.
    ker = np.zeros((2, 2, 2, 8 * c, c), np.float32)
    for dz in range(2):
        for dy in range(2):
            for dx in range(2):
                j = (dz * 2 + dy) * 2 + dx
                ker[1 - dz, 1 - dy, 1 - dx, j * c : (j + 1) * c] = np.eye(c)
    ker = jnp.asarray(ker, acc)

    def row(args):
        vol_r, data_r, lin0_r, lin_r, gf_r, fx_r, fy_r, fz_r = args
        # --- d(vol): packed scatter + corner reduction AS A CONVOLUTION.
        # The staging stays a (bins, 8C) matrix in the scatter's native
        # layout; summing the 8 shifted corner groups is exactly a 2x2x2
        # conv over the corner-channel axis, and with NDHWC dimension
        # numbers the (bins, 8C) buffer feeds the conv with NO transpose
        # (a reshape of the row-major leading axis is free). The obvious
        # per-corner slice-and-add formulation forced XLA into a
        # 128-iteration relayout loop over the 1.1 GB staging
        # (~75 ms/row on v5e); the conv form runs at memory speed.
        staging = jnp.zeros(((d + 1) * (h + 1) * w1p, 8 * c), acc)
        staging = staging.at[lin0_r].add(data_r)
        # negative high padding folds the output trim into the conv (the
        # overflow planes d/h/w receive ONLY zero-weight contributions:
        # _grid_sample_prep clips ix to size-1, so a base corner on the
        # far face always has fraction exactly 0 — the old explicit
        # border fold-adds were adding provable zeros)
        dvol_r = jax.lax.conv_general_dilated(
            staging.reshape(1, d + 1, h + 1, w1p, 8 * c),
            ker,
            window_strides=(1, 1, 1),
            padding=[(1, -1), (1, -1), (1, w - w1p)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0]  # (d, h, w, c)

        # --- d(coords): one packed gather for all 8 corner values
        pack = _row_pack(vol_r).astype(jnp.float32)
        g8 = jnp.take(pack.reshape(d * h * w, 8 * c), lin_r, axis=0)
        g8 = g8.reshape(-1, 2, 2, 2, c)  # (N, dz, dy, dx, C)
        # border: packed zero rows stand in for clamped corners; their
        # fraction is 0 so lerp values/derivatives along that axis use the
        # dz/dy/dx = 0 plane, matching the clamped-corner math
        c000, c001 = g8[:, 0, 0, 0], g8[:, 0, 0, 1]
        c010, c011 = g8[:, 0, 1, 0], g8[:, 0, 1, 1]
        c100, c101 = g8[:, 1, 0, 0], g8[:, 1, 0, 1]
        c110, c111 = g8[:, 1, 1, 0], g8[:, 1, 1, 1]
        dfx = ((c001 - c000) * (1 - fy_r) + (c011 - c010) * fy_r) * (1 - fz_r) + (
            (c101 - c100) * (1 - fy_r) + (c111 - c110) * fy_r
        ) * fz_r
        dfy = ((c010 - c000) * (1 - fx_r) + (c011 - c001) * fx_r) * (1 - fz_r) + (
            (c110 - c100) * (1 - fx_r) + (c111 - c101) * fx_r
        ) * fz_r
        dfz = ((c100 - c000) * (1 - fx_r) + (c101 - c001) * fx_r) * (1 - fy_r) + (
            (c110 - c010) * (1 - fx_r) + (c111 - c011) * fx_r
        ) * fy_r
        gx = (gf_r * dfx).sum(-1)
        gy = (gf_r * dfy).sum(-1)
        gz = (gf_r * dfz).sum(-1)
        return dvol_r, jnp.stack([gx, gy, gz], axis=-1)

    dvol, dxyz = jax.lax.map(
        row, (vol, data, lin0, lin, gf, fxe, fye, fze)
    )
    dvol = dvol.astype(vol.dtype)  # (B, D, H, W, C) — already channel-last
    # chain through idx = clip((coords+1)/2*(size-1), 0, size-1): the clip
    # zeroes the gradient outside the open interval
    sizes = jnp.asarray([w, h, d], dtype=jnp.float32)
    idx_unclipped = (coords.astype(jnp.float32) + 1.0) * 0.5 * (sizes - 1)
    scale = 0.5 * (sizes - 1)
    interior = (idx_unclipped > 0) & (idx_unclipped < sizes - 1)
    dcoords = dxyz * scale * interior
    return dvol, dcoords.astype(coords.dtype)


grid_sample_3d_cl.defvjp(_grid_sample_cl_fwd, _grid_sample_cl_bwd)


# ---------------------------------------------------------------------------
# BLOCKED-basis trilinear sampling (the 128-lane end-to-end train path).
#
# The UNet's hot levels execute in a 2x2x2 space-to-depth basis
# (models/unet3d.py): volumes live as (D/2, H/2, W/2, 8C) with lane order
# slot-major ((sz*2+sy)*2+sx)*C + c. Sampling FROM that basis directly —
# instead of depth-to-space'ing back to (D, H, W, C) and re-packing 2x2x2
# neighborhoods with the 16->32->64->128 concat ladder — eliminates the two
# relayout passes that dominated the round-4 train-step profile (~130 ms of
# the 152 ms "data formatting" category; KERNELS.md).
#
# Key identity: for a query whose base corner has parity p = (z0&1, y0&1,
# x0&1), the 2x2x2 neighborhood is a fixed LANE-MIXING of the base block
# and its +1 neighbors: corner d sits in block b + (p+d)//2 at slot
# (p+d)%2, per axis. Eight parity-specific packed volumes are built with
# 0/1 lane-selector MATMULS over shifted block slices — (N, 8C) @ (8C, 8C)
# runs on the MXU at full rate, where the old concat ladder paid narrow-
# lane relayouts — and one wide gather per query reads its parity pack.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _blocked_pack_selectors(c: int):
    """Static (parity, block-offset) -> (8C, 8C) 0/1 lane selectors.

    For parity p and offset combo o (one of up to 8 shifted block slices),
    Sel[l_in((s), ch), l_out((d), ch)] = 1 where per axis: p=0 -> o=0 with
    (d, s) in {(0,0), (1,1)}; p=1 -> o=0 gives (0,1), o=1 gives (1,0).
    Returns a list of (parity_code, (oz, oy, ox), matrix | None); None
    marks the identity selector (parity 0, offset 0)."""
    import itertools

    k = 8 * c
    out = []
    for pz, py, px in itertools.product((0, 1), repeat=3):
        pc = (pz * 2 + py) * 2 + px
        ax = []
        for p in (pz, py, px):
            if p == 0:
                ax.append({0: [(0, 0), (1, 1)]})
            else:
                ax.append({0: [(0, 1)], 1: [(1, 0)]})
        for oz in ax[0]:
            for oy in ax[1]:
                for ox in ax[2]:
                    if pc == 0:
                        out.append((0, (0, 0, 0), None))
                        continue
                    m = np.zeros((k, k), np.float32)
                    for dz, sz in ax[0][oz]:
                        for dy, sy in ax[1][oy]:
                            for dx, sx in ax[2][ox]:
                                lo = ((dz * 2 + dy) * 2 + dx) * c
                                li = ((sz * 2 + sy) * 2 + sx) * c
                                m[li : li + c, lo : lo + c] = np.eye(c)
                    out.append((pc, (oz, oy, ox), m))
    return tuple(out)


def _parity_pack(vol_b: jax.Array) -> jax.Array:
    """(B, D2, H2, W2, 8C) blocked volumes -> (B * 8 * D2*H2*W2, 8C)
    parity-stacked neighborhood packs: rows
    [(b * 8 + pc) * D2*H2*W2 + lin(bz, by, bx)] hold the 2x2x2
    neighborhood of base voxel (2bz+pz, 2by+py, 2bx+px) in corner-major
    (dz, dy, dx) lane order — the same order :func:`_row_pack` emits, so
    the gather+lerp downstream is shared. BATCHED straight-line code (no
    lax.map): the blocked sampler's per-row loop form measured ~75 ms/step
    of loop-boundary buffer copies at the train config."""
    b, d2, h2, w2, k = vol_b.shape
    c = k // 8
    vp = jnp.pad(vol_b, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
    packs = [None] * 8
    for pc, (oz, oy, ox), m in _blocked_pack_selectors(c):
        sl = jax.lax.slice(
            vp, (0, oz, oy, ox, 0), (b, oz + d2, oy + h2, ox + w2, k)
        )
        # precision=HIGHEST: the selector is a 0/1 lane PERMUTATION, so the
        # matmul must be value-exact. TPU's default f32 matmul precision
        # truncates operands to bf16 on the MXU (caught on-chip: ~1e-3 rel
        # error vs the dense sampler); HIGHEST restores f32-exactness and
        # is a no-op for bf16 operands (the train path).
        contrib = sl if m is None else jnp.einsum(
            "bdhwk,kl->bdhwl", sl, jnp.asarray(m, vol_b.dtype),
            precision=jax.lax.Precision.HIGHEST,
        )
        packs[pc] = contrib if packs[pc] is None else packs[pc] + contrib
    return jnp.stack(packs, axis=1).reshape(b * 8 * d2 * h2 * w2, k)


def _blocked_prep(dhw2, coords):
    """Index/fraction math for the blocked sampler: full-resolution base
    corner + fractions from :func:`_grid_sample_prep`, then (parity, block)
    row ids into the parity-stacked pack."""
    d2, h2, w2 = dhw2
    x0, y0, z0, fx, fy, fz = _grid_sample_prep((2 * d2, 2 * h2, 2 * w2), coords)
    pc = ((z0 & 1) * 2 + (y0 & 1)) * 2 + (x0 & 1)
    lin = ((pc * d2 + (z0 >> 1)) * h2 + (y0 >> 1)) * w2 + (x0 >> 1)
    return lin, fx, fy, fz


@jax.custom_vjp
def grid_sample_3d_blocked_cl(vol_b: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample a BLOCKED channel-last (B, D/2, H/2, W/2, 8C) volume at
    (B, N, 3) normalized coords in [-1, 1]; returns (B, N, C).

    Value-identical to ``grid_sample_3d_cl(depth_to_space(vol_b), coords)``
    (torch grid_sample border/align_corners=True semantics, coords[..., 0]
    indexing W) — tested — but never materializes the unblocked volume.
    Lane order of the blocked channel axis is slot-major
    ((sz*2+sy)*2+sx)*C + c, matching models/unet3d._space_to_depth."""
    b, d2, h2, w2, k = vol_b.shape
    c = k // 8
    n = coords.shape[1]
    lin, fx, fy, fz = _blocked_prep((d2, h2, w2), coords)
    w8 = _lerp_weights(fx, fy, fz)  # (B, N, 8)
    pack = _parity_pack(vol_b)
    rows = lin + (jnp.arange(b, dtype=lin.dtype)
                  * (8 * d2 * h2 * w2))[:, None]
    g8 = jnp.take(pack, rows.reshape(-1), axis=0).reshape(b, n, 8, c)
    return (g8 * w8[..., None].astype(g8.dtype)).sum(axis=2)


def _grid_sample_blocked_fwd(vol_b, coords):
    return grid_sample_3d_blocked_cl(vol_b, coords), (vol_b, coords)


def _grid_sample_blocked_bwd(res, g):
    """d(vol): one 8C-wide base-row scatter per query into the parity-
    stacked staging, then the ADJOINT of the pack construction — the
    transposed lane-selector matmuls accumulated onto shifted slices of
    the padded blocked volume. All traffic stays 8C lanes wide; no narrow
    scatters, no depth-to-space. d(coords): the same packed gather as the
    forward feeds the analytic lerp derivatives (identical math to
    :func:`_grid_sample_cl_bwd`). Accumulation dtype follows the cotangent
    (bf16 train regime halves the staging traffic; f32 elsewhere)."""
    vol_b, coords = res
    b, d2, h2, w2, k = vol_b.shape
    c = k // 8
    n = coords.shape[1]
    nb = 8 * d2 * h2 * w2
    acc = jnp.bfloat16 if g.dtype == jnp.bfloat16 else jnp.float32
    lin, fx, fy, fz = _blocked_prep((d2, h2, w2), coords)
    gf = g.astype(jnp.float32)
    w8 = _lerp_weights(fx, fy, fz).astype(jnp.float32)  # (B, N, 8)
    data = (w8[..., None] * gf[:, :, None, :]).reshape(b * n, k).astype(acc)
    rows = (lin + (jnp.arange(b, dtype=lin.dtype) * nb)[:, None]).reshape(-1)
    staging = jnp.zeros((b * nb, k), acc).at[rows].add(data)
    staging = staging.reshape(b, 8, d2, h2, w2, k)
    dvp = jnp.zeros((b, d2 + 1, h2 + 1, w2 + 1, k), acc)
    for pc, (oz, oy, ox), m in _blocked_pack_selectors(c):
        st = staging[:, pc]
        contrib = st if m is None else jnp.einsum(
            "bdhwl,kl->bdhwk", st, jnp.asarray(m, acc),
            precision=jax.lax.Precision.HIGHEST,  # exact permutation
        )
        dvp = dvp.at[:, oz : oz + d2, oy : oy + h2, ox : ox + w2].add(contrib)
    dvol = dvp[:, :d2, :h2, :w2].astype(vol_b.dtype)

    # --- d(coords): packed gather + analytic lerp derivatives. Straight-
    # line code: when the caller stop_gradients the queries (the decoder
    # does — coords are data, never parameters) XLA DCEs this entire
    # branch, which a lax.map body did not reliably allow.
    pack = _parity_pack(vol_b).astype(jnp.float32)
    g8 = jnp.take(pack, rows, axis=0).reshape(b, n, 2, 2, 2, c)
    fxe = fx[..., None].astype(jnp.float32)
    fye = fy[..., None].astype(jnp.float32)
    fze = fz[..., None].astype(jnp.float32)
    c000, c001 = g8[:, :, 0, 0, 0], g8[:, :, 0, 0, 1]
    c010, c011 = g8[:, :, 0, 1, 0], g8[:, :, 0, 1, 1]
    c100, c101 = g8[:, :, 1, 0, 0], g8[:, :, 1, 0, 1]
    c110, c111 = g8[:, :, 1, 1, 0], g8[:, :, 1, 1, 1]
    dfx = ((c001 - c000) * (1 - fye) + (c011 - c010) * fye) * (1 - fze) + (
        (c101 - c100) * (1 - fye) + (c111 - c110) * fye
    ) * fze
    dfy = ((c010 - c000) * (1 - fxe) + (c011 - c001) * fxe) * (1 - fze) + (
        (c110 - c100) * (1 - fxe) + (c111 - c101) * fxe
    ) * fze
    dfz = ((c100 - c000) * (1 - fxe) + (c101 - c001) * fxe) * (1 - fye) + (
        (c110 - c010) * (1 - fxe) + (c111 - c011) * fxe
    ) * fye
    gx = (gf * dfx).sum(-1)
    gy = (gf * dfy).sum(-1)
    gz = (gf * dfz).sum(-1)
    dxyz = jnp.stack([gx, gy, gz], axis=-1)
    d, h, w = 2 * d2, 2 * h2, 2 * w2
    sizes = jnp.asarray([w, h, d], dtype=jnp.float32)
    idx_unclipped = (coords.astype(jnp.float32) + 1.0) * 0.5 * (sizes - 1)
    scale = 0.5 * (sizes - 1)
    interior = (idx_unclipped > 0) & (idx_unclipped < sizes - 1)
    dcoords = dxyz * scale * interior
    return dvol, dcoords.astype(coords.dtype)


grid_sample_3d_blocked_cl.defvjp(_grid_sample_blocked_fwd, _grid_sample_blocked_bwd)


def grid_sample_3d_blocked_cl_chunked(vol_b: jax.Array, coords: jax.Array,
                                      chunk: int = 1,
                                      max_unroll: int = 8) -> jax.Array:
    """Batch-chunked :func:`grid_sample_3d_blocked_cl`: unrolled python
    loop over ``chunk``-sized batch slices (value-identical — the sampler
    is independent per batch row). The full-batch form materializes every
    patch's parity pack at once (~268 MB at the 4-patch train config) and
    measured −10% on the full OVSSC step from the extra memory pressure;
    per-patch chunks keep ONE pack live while avoiding the old lax.map
    row loop's ~75 ms/step of loop-boundary buffer copies. Beyond
    ``max_unroll`` chunks (e.g. eval's all-classes broadcast with B*Q
    volumes) a ``lax.map`` traces ONE body instead of b/chunk program
    copies — the unrolled form's compile size grows linearly with b."""
    b = vol_b.shape[0]
    if b <= chunk or b % chunk != 0:
        return grid_sample_3d_blocked_cl(vol_b, coords)
    n_chunks = b // chunk
    if n_chunks > max_unroll:
        vb = vol_b.reshape(n_chunks, chunk, *vol_b.shape[1:])
        cb = coords.reshape(n_chunks, chunk, *coords.shape[1:])
        out = jax.lax.map(
            lambda args: grid_sample_3d_blocked_cl(*args), (vb, cb)
        )
        return out.reshape(b, *out.shape[2:])
    outs = []
    for i in range(0, b, chunk):
        outs.append(grid_sample_3d_blocked_cl(
            jax.lax.slice_in_dim(vol_b, i, i + chunk, axis=0),
            jax.lax.slice_in_dim(coords, i, i + chunk, axis=0),
        ))
    return jnp.concatenate(outs, axis=0)


def space_to_depth_cl(vol_cl: jax.Array) -> jax.Array:
    """(D, H, W, C) or (B, D, H, W, C) channel-last -> blocked channel-last
    (..., D/2, H/2, W/2, 8C), slot-major lane order (test/adapter helper —
    the hot path gets blocked volumes directly from the scatter/UNet)."""
    batched = vol_cl.ndim == 5
    if not batched:
        vol_cl = vol_cl[None]
    b, d, h, w, c = vol_cl.shape
    x = vol_cl.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    out = x.reshape(b, d // 2, h // 2, w // 2, 8 * c)
    return out if batched else out[0]


def grid_sample_3d(vol: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample (B, C, D, H, W) volume at (B, N, 3) normalized coords in [-1, 1].

    Matches ``torch.nn.functional.grid_sample(mode="bilinear",
    padding_mode="border", align_corners=True)`` for 5-D inputs:
    coords[..., 0] indexes W (the last axis), coords[..., 1] H, coords[..., 2]
    D. Returns (B, N, C). Thin NCDHW wrapper over the channel-last core
    :func:`grid_sample_3d_cl` (autodiff carries d(vol) back through the
    transpose); hot paths should call the channel-last form directly.
    """
    return grid_sample_3d_cl(jnp.transpose(vol, (0, 2, 3, 4, 1)), coords)


def trilinear_sample(vol: jax.Array, coords: jax.Array) -> jax.Array:
    """Alias of :func:`grid_sample_3d` (torch-convention trilinear sampling)."""
    return grid_sample_3d(vol, coords)


def pack_volume(vol_cl: jax.Array) -> jax.Array:
    """Precompute the (D*H*W, 8*C) packed-neighborhood matrix of a
    channel-last (D, H, W, C) volume for repeated sampling.

    Dense inference (visualize's 240^3 sweep) samples the SAME volume in
    ~50 chunked passes; packing once instead of per-chunk saves a ~0.5 GB
    rebuild per chunk. Pair with :func:`grid_sample_packed`.
    """
    d, h, w, c = vol_cl.shape
    return _row_pack(vol_cl).reshape(d * h * w, 8 * c)


def grid_sample_packed(pack: jax.Array, dhw, coords: jax.Array) -> jax.Array:
    """Sample a prepacked volume (see :func:`pack_volume`) at (N, 3)
    normalized coords; returns (N, C). Forward-only (no custom VJP)."""
    d, h, w = dhw
    c = pack.shape[1] // 8
    x0, y0, z0, fx, fy, fz = _grid_sample_prep((d, h, w), coords)
    lin = (z0 * h + y0) * w + x0
    w8 = _lerp_weights(fx, fy, fz)  # (N, 8)
    g8 = jnp.take(pack, lin, axis=0).reshape(-1, 8, c)
    return (g8 * w8[:, :, None].astype(g8.dtype)).sum(axis=1)


def _cubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Catmull-Rom cubic (a=-0.5), the kernel used by both PIL and torch."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=None)
def resize_matrix(in_size: int, out_size: int, method: str = "bilinear_torch"):
    """Precompute a dense (out_size, in_size) 1-D interpolation matrix.

    methods:
    - "bilinear_torch":  torch ``F.interpolate(mode="bilinear",
      align_corners=False, antialias=False)`` row weights.
    - "bilinear_torch_ac": same with align_corners=True.
    - "bicubic_pil": PIL's antialiased BICUBIC resample weights (support
      scaled by the downsampling factor, weights normalized to sum 1). This
      is the CLIP tile-preprocess resize.

    Cached per (in, out, method); returns a float32 numpy array so callers
    can fold it into jitted matmuls as a constant.
    """
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if method in ("bilinear_torch", "bilinear_torch_ac"):
        if method == "bilinear_torch_ac" and out_size > 1:
            scale = (in_size - 1) / (out_size - 1)
            centers = np.arange(out_size) * scale
        else:
            scale = in_size / out_size
            centers = (np.arange(out_size) + 0.5) * scale - 0.5
        centers = np.clip(centers, 0.0, in_size - 1)
        lo = np.floor(centers).astype(int)
        hi = np.minimum(lo + 1, in_size - 1)
        frac = centers - lo
        mat[np.arange(out_size), lo] += 1.0 - frac
        mat[np.arange(out_size), hi] += frac
    elif method == "bicubic_pil":
        scale = in_size / out_size
        filterscale = max(scale, 1.0)
        support = 2.0 * filterscale
        for i in range(out_size):
            center = (i + 0.5) * scale
            xmin = max(int(center - support + 0.5), 0)
            xmax = min(int(center + support + 0.5), in_size)
            xs = np.arange(xmin, xmax)
            w = _cubic_kernel((xs - center + 0.5) / filterscale)
            s = w.sum()
            if s != 0:
                w = w / s
            mat[i, xmin:xmax] = w
    else:
        raise ValueError(f"unknown resize method {method!r}")
    return mat.astype(np.float32)


def _apply_separable(img: jax.Array, row_mat: np.ndarray, col_mat: np.ndarray):
    """Apply (Hout,Hin) and (Wout,Win) matrices over the last two axes."""
    rm = jnp.asarray(row_mat, dtype=img.dtype)
    cm = jnp.asarray(col_mat, dtype=img.dtype)
    out = jnp.einsum("...hw,oh->...ow", img, rm)
    return jnp.einsum("...ow,pw->...op", out, cm)


def resize_bilinear(
    img: jax.Array, out_hw: tuple, align_corners: bool = False
) -> jax.Array:
    """Bilinear resize of (..., H, W), matching torch ``F.interpolate``."""
    h, w = img.shape[-2], img.shape[-1]
    method = "bilinear_torch_ac" if align_corners else "bilinear_torch"
    return _apply_separable(
        img, resize_matrix(h, out_hw[0], method), resize_matrix(w, out_hw[1], method)
    )


def resize_bicubic_pil(img: jax.Array, out_hw: tuple) -> jax.Array:
    """PIL-style antialiased bicubic resize of (..., H, W) in float.

    Matches PIL's ``Image.resize(..., BICUBIC)`` weights; PIL's uint8
    fixed-point rounding between the two passes is not reproduced (float
    end-to-end), giving ~1e-2 max deviation on [0,1]-scaled images.
    """
    h, w = img.shape[-2], img.shape[-1]
    return _apply_separable(
        img,
        resize_matrix(h, out_hw[0], "bicubic_pil"),
        resize_matrix(w, out_hw[1], "bicubic_pil"),
    )
