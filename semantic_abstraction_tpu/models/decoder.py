"""Implicit volumetric decoder + pointing attention, pure JAX.

TPU-native re-architecture of the reference's ImplicitVolumetricDecoder
(reference: net.py:204-256) and PointingAttention (net.py:259-316).

The decoder trilinearly samples a feature volume at continuous query points
(via :func:`ops.sampling.grid_sample_3d`, matching torch grid_sample with
border padding + align_corners=True) and runs a 2-layer MLP per point. The
reference normalizes the clamped float voxel index by ``grid_shape`` (NOT
grid_shape-1, net.py:221-228) and feeds coordinate component 0 (world-x
index) into grid_sample's last-axis slot — both quirks are reproduced
because trained checkpoints bake them in.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import (
    grid_sample_3d,
    grid_sample_3d_blocked_cl_chunked,
    grid_sample_3d_cl,
)
from ..ops.voxel import VoxelGrid


def _linear(p: dict, x: jax.Array) -> jax.Array:
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _init_linear(key, d_in, d_out, dtype=jnp.float32):
    # torch Linear default init
    bound = 1.0 / np.sqrt(d_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
    }


def init_implicit_decoder(key, hidden_size: int, output_dim: int,
                          concat_xyz_pts: bool = False, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": _init_linear(k1, hidden_size + 3 * int(concat_xyz_pts), hidden_size, dtype),
        "fc2": _init_linear(k2, hidden_size, output_dim, dtype),
    }


def implicit_decoder(
    params: dict,
    features_vol: jax.Array,
    grid: VoxelGrid,
    query_points: jax.Array,
    concat_xyz_pts: bool = False,
    channels_last: bool = False,
    blocked: bool = False,
) -> jax.Array:
    """(B, C, gx, gy, gz) volume + (B, N, 3) world points -> (B, N, output_dim).

    Reference net.py:215-256: world points -> clamped float voxel indices ->
    /grid_shape -> *2-1 -> grid_sample(bilinear, border, align_corners=True)
    -> optional xyz concat -> Linear-LeakyReLU-Linear.

    With ``channels_last`` the volume is (B, gx, gy, gz, C) and sampling
    skips the NCDHW->channel-minor relayout (the train-step hot path:
    the UNet emits channel-last directly). With ``blocked`` the volume is
    the space-to-depth blocked form (B, gx/2, gy/2, gz/2, 8C) straight off
    the blocked UNet and the parity-pack sampler consumes it with no
    depth-to-space anywhere (the 128-lane end-to-end path).
    """
    idx_f = grid.points_to_idxs(query_points, cast_to_int=False)
    shape = jnp.asarray(grid.grid_shape, dtype=idx_f.dtype)
    coords = 2.0 * (idx_f / shape) - 1.0
    # query points are data, never parameters: stop_gradient lets XLA
    # dead-code-eliminate the sampler VJP's d(coords) branch (a packed
    # corner gather + lerp derivatives per point)
    coords = jax.lax.stop_gradient(coords)
    if blocked:
        # a tuple of blocked volumes (VOOL's two streams) samples each and
        # concatenates the per-point features — value-identical to
        # sampling a channel-concat volume (trilinear is per-channel),
        # which the blocked lane order cannot express directly
        if isinstance(features_vol, (tuple, list)):
            sampled = jnp.concatenate(
                [grid_sample_3d_blocked_cl_chunked(v, coords)
                 for v in features_vol],
                axis=-1,
            )
        else:
            sampled = grid_sample_3d_blocked_cl_chunked(features_vol, coords)
    elif channels_last:
        sampled = grid_sample_3d_cl(features_vol, coords)  # (B, N, C)
    else:
        sampled = grid_sample_3d(features_vol, coords)  # (B, N, C)
    if concat_xyz_pts:
        sampled = jnp.concatenate([sampled, coords.astype(sampled.dtype)], axis=-1)
    h = jax.nn.leaky_relu(_linear(params["fc1"], sampled), negative_slope=0.01)
    return _linear(params["fc2"], h)


def _prep_input(key: jax.Array, query: jax.Array):
    """Broadcast-shaping helper (reference net.py:275-292)."""
    if key.shape == query.shape:
        return key, query
    for _ in range(key.ndim - 3):
        query = jnp.expand_dims(query, 2)
    for _ in range(query.ndim - key.ndim):
        key = jnp.expand_dims(key, -2)
    key = jnp.expand_dims(key, 2)
    query = jnp.expand_dims(query, 1)
    return key, query


def init_pointing_attention(key, pointing_dim: int, method: str = "cosine_sim",
                            dtype=jnp.float32) -> dict:
    if method == "additive":
        bound = 1.0 / np.sqrt(pointing_dim)
        return {"v": jax.random.uniform(key, (pointing_dim, 1), dtype, -bound, bound)}
    return {}


def pointing_attention(
    params: dict,
    key: jax.Array,
    query: jax.Array,
    method: str = "cosine_sim",
    pointing_dim: Optional[int] = None,
    temperature: float = 0.07,
) -> jax.Array:
    """key (B, K, ..., D) x query (B, Q, ..., D) -> similarity logits.

    Methods match reference net.py:294-316: dot_product (/sqrt(D)),
    cosine_sim (/temperature, the default with temp 0.07, utils.py:87-91),
    additive (tanh + learned readout).
    """
    key, query = _prep_input(key, query)
    if method == "dot_product":
        d = pointing_dim if pointing_dim is not None else key.shape[-1]
        return (query * key).sum(axis=-1) / np.sqrt(d)
    if method == "cosine_sim":
        # torch.cosine_similarity clamps each norm at eps=1e-8
        kn = jnp.maximum(jnp.linalg.norm(key, axis=-1), 1e-8)
        qn = jnp.maximum(jnp.linalg.norm(query, axis=-1), 1e-8)
        cos = (key * query).sum(axis=-1) / (kn * qn)
        return cos / temperature
    if method == "additive":
        h = jnp.tanh(query + key)
        return (h @ params["v"].astype(h.dtype))[..., 0]
    raise ValueError(f"unknown pointing method {method!r}")


def pointing_attention_paired(
    params: dict,
    key: jax.Array,
    query: jax.Array,
    method: str = "cosine_sim",
    pointing_dim: Optional[int] = None,
    temperature: float = 0.07,
) -> jax.Array:
    """Pairwise pointer: key (..., D) against query (..., M, D) -> (..., M).

    Vectorized equivalent of the reference's per-patch pointer loop
    (SemanticAwareOVSSC.forward, net.py:449-466), which calls
    PointingAttention once per patch with a singleton key. One fused op
    instead of a Python loop over patches.
    """
    key = key[..., None, :]
    if method == "dot_product":
        d = pointing_dim if pointing_dim is not None else key.shape[-1]
        return (query * key).sum(axis=-1) / np.sqrt(d)
    if method == "cosine_sim":
        kn = jnp.maximum(jnp.linalg.norm(key, axis=-1), 1e-8)
        qn = jnp.maximum(jnp.linalg.norm(query, axis=-1), 1e-8)
        return (key * query).sum(axis=-1) / (kn * qn) / temperature
    if method == "additive":
        h = jnp.tanh(query + key)
        return (h @ params["v"].astype(h.dtype))[..., 0]
    raise ValueError(f"unknown pointing method {method!r}")


@dataclasses.dataclass(frozen=True)
class PointingConfig:
    method: str = "cosine_sim"
    pointing_dim: int = 64
    temperature: float = 0.07
