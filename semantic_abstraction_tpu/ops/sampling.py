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


def grid_sample_3d(vol: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample (B, C, D, H, W) volume at (B, N, 3) normalized coords in [-1, 1].

    Matches ``torch.nn.functional.grid_sample(mode="bilinear",
    padding_mode="border", align_corners=True)`` for 5-D inputs:
    coords[..., 0] indexes W (the last axis), coords[..., 1] H, coords[..., 2]
    D. Returns (B, N, C).

    NOTE (parity quirk): the reference decoder passes (x, y, z) world-derived
    coordinates straight into grid_sample (net.py:229-239), so world-x indexes
    the volume's LAST axis while the scatter laid the volume out as
    (gx, gy, gz). Trained checkpoints bake this in; callers here must pass
    coords in the same (x, y, z) order to reproduce it.
    """
    b, c, d, h, w = vol.shape
    sizes = jnp.asarray([w, h, d], dtype=coords.dtype)
    # align_corners=True: -1 -> 0, +1 -> size-1
    idx = (coords + 1.0) * 0.5 * (sizes - 1)
    # border padding: clamp the continuous index into the valid range
    idx = jnp.clip(idx, 0.0, sizes - 1)
    ix, iy, iz = idx[..., 0], idx[..., 1], idx[..., 2]

    x0 = jnp.clip(jnp.floor(ix), 0, w - 1)
    y0 = jnp.clip(jnp.floor(iy), 0, h - 1)
    z0 = jnp.clip(jnp.floor(iz), 0, d - 1)
    fx, fy, fz = ix - x0, iy - y0, iz - z0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    z1 = jnp.minimum(z0 + 1, d - 1)

    # flatten to (B, D*H*W, C) and gather linear indices: one contiguous
    # take_along_axis per corner (3-D advanced-index gathers lower to
    # pathologically slow scatter-gathers on TPU)
    vol_flat = jnp.transpose(vol, (0, 2, 3, 4, 1)).reshape(b, d * h * w, c)

    def gather(zz, yy, xx):
        lin = (zz * h + yy) * w + xx  # (B, N)
        return jnp.take_along_axis(vol_flat, lin[..., None], axis=1)

    c000 = gather(z0, y0, x0)
    c001 = gather(z0, y0, x1)
    c010 = gather(z0, y1, x0)
    c011 = gather(z0, y1, x1)
    c100 = gather(z1, y0, x0)
    c101 = gather(z1, y0, x1)
    c110 = gather(z1, y1, x0)
    c111 = gather(z1, y1, x1)

    fx = fx[..., None]
    fy = fy[..., None]
    fz = fz[..., None]
    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def trilinear_sample(vol: jax.Array, coords: jax.Array) -> jax.Array:
    """Alias of :func:`grid_sample_3d` (torch-convention trilinear sampling)."""
    return grid_sample_3d(vol, coords)


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
