"""Pallas TPU kernels for the relevancy hot path.

``chefer_cam_accumulate`` fuses the Chefer relevancy update
(reference: CLIP/clip/clip_gradcam.py:116-126)

    cam = mean_heads(relu(grad * attn))
    R   = R + cam @ R

into one kernel per (label, tile): the elementwise product, ReLU, head
mean and the (T, T) matmul-accumulate run out of VMEM in a single pass.

Grid: one program per (label, tile) pair; H attention heads stream
through VMEM. T=50 tokens pad to the fp32 (8, 128) tile.

MEASURED VERDICT (v5e, L=9 B=32 H=12 T=50): 8.9 ms/step vs 1.7 ms for the
plain XLA einsum formulation — the 288 tiny (50, 50) programs occupy the
chip poorly and XLA already fuses the cam intermediate. The kernel is
kept as a validated implementation (numerics match to bf16-MXU rounding,
~8e-4 relative) but relevancy.gradcam defaults to the XLA path; revisit
only if the relevancy shapes grow (e.g. ViT-L/14 @ 336px: T=577).

Falls back to interpret mode off-TPU so CPU tests run the same code.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cam_accum_kernel(grad_ref, attn_ref, r_ref, out_ref):
    """grad/attn: (1, H, T, T) blocks; r/out: (1, T, T) blocks."""
    h = grad_ref.shape[1]
    cam = jnp.maximum(grad_ref[0] * attn_ref[0], 0.0)
    cam = cam.sum(axis=0) / h  # mean over heads
    r = r_ref[0]
    out_ref[0] = r + jnp.dot(
        cam, r, preferred_element_type=jnp.float32
    ).astype(r.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chefer_cam_accumulate(
    grads: jax.Array,
    attn: jax.Array,
    r_mat: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """One Chefer relevancy-accumulation step, fused.

    grads, attn: (L, B, H, T, T) — per-label attention-prob gradients and
    the attention probabilities. r_mat: (L, B, T, T) running relevancy.
    Returns r_mat + mean_heads(relu(grads * attn)) @ r_mat.
    """
    l, b, h, t, _ = grads.shape
    grads = grads.reshape(l * b, h, t, t).astype(jnp.float32)
    attn = attn.reshape(l * b, h, t, t).astype(jnp.float32)
    r = r_mat.reshape(l * b, t, t).astype(jnp.float32)

    out = pl.pallas_call(
        _cam_accum_kernel,
        grid=(l * b,),
        in_specs=[
            pl.BlockSpec((1, h, t, t), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, t, t), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, t), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l * b, t, t), jnp.float32),
        interpret=interpret,
    )(grads, attn, r)
    return out.reshape(l, b, t, t)


def _squeeze_lead(ref):
    return ref[0]


def cam_accumulate_reference(grads, attn, r_mat, positive_attn_only=True):
    """Plain-XLA equivalent (for tests and the fallback path)."""
    cam = grads.astype(jnp.float32) * attn.astype(jnp.float32)
    if positive_attn_only:
        cam = jnp.maximum(cam, 0.0)
    cam = cam.mean(axis=2)
    return r_mat + jnp.einsum(
        "lbij,lbjk->lbik", cam, r_mat, preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# Fused GroupNorm moment kernel: one pass over the activation producing both
# per-channel moments, streaming the flat (B, C, S) view once and
# accumulating (B, C) sums in VMEM.
#
# MEASURED VERDICT (v5e, x10-amortized): identical to XLA's fused
# two-output reduce — 3.30 vs 3.32 ms (81 GB/s) at (4, 128, 64^3) and a
# wash at (4, 256, 32^3) (both ~20 GB/s, overhead-bound). The ~13 GB/s
# attributed to GN in train-step traces comes from remat/loop-boundary
# copies AROUND the reduce, not the reduce itself, so the kernel is kept
# validated but group_norm stays on the XLA path.
# ---------------------------------------------------------------------------


def _moments_kernel(x_ref, s1_ref, s2_ref):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    xb = x_ref[0].astype(jnp.float32)  # (C, CHUNK)
    p1 = xb.sum(axis=1)
    p2 = (xb * xb).sum(axis=1)

    @pl.when(i == 0)
    def _():
        s1_ref[bi] = p1
        s2_ref[bi] = p2

    @pl.when(i > 0)
    def _():
        s1_ref[bi] = s1_ref[bi] + p1
        s2_ref[bi] = s2_ref[bi] + p2


def channel_moments(x: jax.Array, interpret: bool = False):
    """(B, C, S) -> (s1, s2) = (sum(x), sum(x*x)) over S, both (B, C) f32.

    Returns None if the shape doesn't fit the kernel's blocking (caller
    falls back to plain XLA reductions).
    """
    b, c, s = x.shape
    chunk = 2048
    while chunk > 128 and s % chunk:
        chunk //= 2
    if s % chunk or c % 8:
        return None
    grid = (b, s // chunk)
    s1, s2 = pl.pallas_call(
        _moments_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, c, chunk), lambda bi, si: (bi, 0, si))],
        out_specs=(
            # whole-array blocks revisited by every program (the TPU grid
            # runs sequentially, so the accumulator persists in VMEM)
            pl.BlockSpec((b, c), lambda bi, si: (0, 0)),
            pl.BlockSpec((b, c), lambda bi, si: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
        ),
        interpret=interpret,
    )(x)
    return s1, s2
