"""Voxel grid index math + point->voxel scatter reduction, pure JAX.

TPU-native replacement for the reference's ``VirtualGrid`` + torch_scatter
(reference: net.py:24-201). The scatter primitive — segment-reduce of N point
features into flattened voxel bins — is THE voxelization op of the whole
framework; here it is an XLA ``segment_max``/``segment_sum`` over
batch-offset flattened indices instead of a CUDA extension.

Semantics parity (reference file:line):
- points_to_idxs    <- net.py:84-113  (truncating int cast, per-axis clamp)
- flatten_idxs      <- net.py:115-133 (row-major strides over (B,)+grid)
- idxs_to_points    <- net.py:158-183
- grid_points       <- net.py:63-82
- scatter_points    <- net.py:185-201; torch_scatter fills empty bins with 0
  for both "max" and "mean" reductions, so empty voxels are zeros here too.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VoxelGrid:
    """World-coordinate <-> voxel-index mapping over axis-aligned bounds.

    All configuration is static (hashable) so a ``VoxelGrid`` can be closed
    over by jitted functions without retracing on value changes.
    """

    lower: Tuple[float, float, float]
    upper: Tuple[float, float, float]
    grid_shape: Tuple[int, int, int] = (32, 32, 32)

    @classmethod
    def from_bounds(cls, scene_bounds, grid_shape=(32, 32, 32)) -> "VoxelGrid":
        scene_bounds = np.asarray(scene_bounds, dtype=np.float64)
        return cls(
            lower=tuple(float(v) for v in scene_bounds[0]),
            upper=tuple(float(v) for v in scene_bounds[1]),
            grid_shape=tuple(int(v) for v in grid_shape),
        )

    @property
    def num_voxels(self) -> int:
        return int(np.prod(self.grid_shape))

    def _scales(self, dtype):
        lc = jnp.asarray(self.lower, dtype=dtype)
        uc = jnp.asarray(self.upper, dtype=dtype)
        idx_scale = jnp.asarray(self.grid_shape, dtype=dtype) - 1
        return lc, uc, idx_scale

    def points_to_idxs(self, points: jax.Array, cast_to_int: bool = True) -> jax.Array:
        """Map world points (..., 3) to (clamped) voxel indices.

        With ``cast_to_int`` the float index is truncated toward zero before
        the per-axis clamp to [0, dim-1] (matching torch's ``.to(int64)``);
        without, the float index itself is clamped.
        """
        lc, uc, idx_scale = self._scales(points.dtype)
        idx_f = (points - lc) * (idx_scale / (uc - lc))
        hi = jnp.asarray(self.grid_shape, dtype=points.dtype) - 1
        if cast_to_int:
            idx = jnp.trunc(idx_f).astype(jnp.int32)
            return jnp.clip(idx, 0, jnp.asarray(self.grid_shape, jnp.int32) - 1)
        return jnp.clip(idx_f, 0.0, hi)

    def flatten_idxs(self, idxs: jax.Array) -> jax.Array:
        """Row-major flatten of (..., 3) voxel indices to scalar bin ids."""
        gx, gy, gz = self.grid_shape
        strides = jnp.asarray([gy * gz, gz, 1], dtype=idxs.dtype)
        return (idxs * strides).sum(axis=-1)

    def unflatten_idxs(self, flat_idxs: jax.Array) -> jax.Array:
        gx, gy, gz = self.grid_shape
        ix = flat_idxs // (gy * gz)
        rem = flat_idxs % (gy * gz)
        return jnp.stack([ix, rem // gz, rem % gz], axis=-1)

    def idxs_to_points(self, idxs: jax.Array, dtype=jnp.float32) -> jax.Array:
        """Voxel indices (..., 3) to world coordinates of voxel centers."""
        lc, uc, idx_scale = self._scales(dtype)
        return idxs.astype(dtype) * ((uc - lc) / idx_scale) + lc

    def grid_points(self, dtype=jnp.float32) -> jax.Array:
        """(gx, gy, gz, 3) world coordinates of every voxel."""
        axes = [jnp.arange(d) for d in self.grid_shape]
        idxs = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
        return self.idxs_to_points(idxs, dtype=dtype)

    def scatter_points(
        self,
        xyz_pts: jax.Array,
        feature_pts: jax.Array,
        reduce_method: str = "max",
        valid_mask: jax.Array | None = None,
        channels_last: bool = False,
        layout: str = "dense",
    ) -> jax.Array:
        """Scatter (B, N, C) point features into a (B, C, gx, gy, gz) volume
        (or (B, gx, gy, gz, C) with ``channels_last`` — that form is FREE:
        the segment-reduce output is already bin-major channel-minor).

        ``reduce_method`` is "max" or "mean". Voxels that receive no points
        are zero (torch_scatter convention). ``valid_mask`` (B, N) optionally
        drops points from the reduction entirely (used for padded inputs; the
        reference instead pre-filters on host).

        ``layout="blocked_cl"`` scatters DIRECTLY into the 2x2x2
        space-to-depth basis the UNet's hot levels execute in: a
        (B, gx/2, gy/2, gz/2, 8C) channel-last volume with slot-major lane
        order ((sz*2+sy)*2+sx)*C + c (== unet3d._space_to_depth of the
        dense volume; tested). Requires 8*C == 128 (the paper config's
        C=16) and even grid dims — the wide scatter row IS the blocked
        row, so the UNet's level-0 space-to-depth relayout disappears.
        """
        if xyz_pts.ndim == 2:
            xyz_pts = xyz_pts[None]
            feature_pts = feature_pts[None]
        batch, num_pts, channels = feature_pts.shape
        nv = self.num_voxels
        idxs = self.points_to_idxs(xyz_pts)
        if layout == "blocked_cl":
            return self._scatter_blocked_cl(
                idxs, feature_pts, reduce_method, valid_mask
            )
        if layout != "dense":
            raise ValueError(f"unknown layout {layout!r}")
        flat = self.flatten_idxs(idxs)
        batch_offset = jnp.arange(batch, dtype=flat.dtype)[:, None] * nv
        seg_ids = (flat + batch_offset).reshape(-1)
        if valid_mask is not None:
            # route invalid points to a trash bin past the end
            seg_ids = jnp.where(valid_mask.reshape(-1), seg_ids, batch * nv)
        feats = feature_pts.reshape(batch * num_pts, channels)

        # TPU scatter throughput is set by the LANE WIDTH of each updated
        # row, not its byte count: a 16-channel segment reduce runs ~4.5x
        # slower than a 128-lane one for the same rows (each narrow update
        # still read-modify-writes a full (8,128) tile). Pack k = 128/C
        # consecutive bins into one 128-wide row and place each point's
        # C channels in its bin's column group; empty-bin handling rides
        # the reduction identity (-inf for max, a packed ones-column for
        # mean) so no second narrow counts scatter is needed.
        pack = 128 // channels if channels <= 128 else 0
        packable = pack > 0 and 128 % channels == 0 and nv % pack == 0
        if reduce_method not in ("max", "mean"):
            raise ValueError(f"unknown reduce_method {reduce_method!r}")
        if packable and pack > 1:
            rows = seg_ids // pack
            group = (seg_ids % pack).astype(jnp.int32)
            num_rows = batch * nv // pack + (1 if valid_mask is not None else 0)
            onehot = group[:, None] == jnp.arange(pack, dtype=jnp.int32)[None, :]
            fill = jnp.asarray(
                -jnp.inf if reduce_method == "max" else 0.0, feats.dtype
            )
            wide = jnp.where(
                onehot[:, :, None], feats[:, None, :].astype(feats.dtype), fill
            ).reshape(-1, 128)
            # Both post-reduction fixups run on the WIDE (rows, 128) form.
            # The previous ``.reshape(-1, channels)``-first formulation
            # materialized a (batch*nv, C) narrow f32 tensor that XLA lays
            # out T(8,128) — 128/C x lane padding (a 1.0 GB buffer for
            # 128 MB of data at the 128^3/C=16 train shape) plus a
            # relayout pass on both sides.
            if reduce_method == "max":
                out_wide = jax.ops.segment_max(wide, rows, num_segments=num_rows)
                # point features are finite, so a column is -inf iff its
                # bin got no points (the reduction identity) — the
                # empty-bin zero fix is elementwise on the wide form
                out_wide = jnp.where(
                    jnp.isneginf(out_wide), 0.0, out_wide
                ).astype(feats.dtype)
            else:
                sums = jax.ops.segment_sum(wide, rows, num_segments=num_rows)
                # broadcast the bin one-hot over the channel axis so each
                # point contributes a count of 1 to every channel column of
                # its bin group ((P, pack, C) -> (P, 128))
                ones = (
                    jnp.broadcast_to(
                        onehot[:, :, None], (onehot.shape[0], pack, channels)
                    )
                    .astype(feats.dtype)
                    .reshape(-1, 128)
                )
                counts = jax.ops.segment_sum(ones, rows, num_segments=num_rows)
                out_wide = sums / jnp.maximum(counts, 1.0)
            # rows are pack consecutive bins: (batch*nv/pack, pack*C) is the
            # row-major (batch*nv, C) view — slice the trash row and let the
            # single reshape below pick the consumer's layout directly
            out = out_wide[: batch * nv // pack].reshape(-1, channels)
        else:
            num_segments = batch * nv + (1 if valid_mask is not None else 0)
            if reduce_method == "max":
                out = jax.ops.segment_max(feats, seg_ids, num_segments=num_segments)
                counts = jax.ops.segment_sum(
                    jnp.ones((seg_ids.shape[0],), dtype=jnp.int32),
                    seg_ids,
                    num_segments=num_segments,
                )
                out = jnp.where(counts[:, None] > 0, out, 0.0).astype(feats.dtype)
            else:
                sums = jax.ops.segment_sum(feats, seg_ids, num_segments=num_segments)
                counts = jax.ops.segment_sum(
                    jnp.ones((seg_ids.shape[0],), dtype=feats.dtype),
                    seg_ids,
                    num_segments=num_segments,
                )
                out = sums / jnp.maximum(counts[:, None], 1.0)
            if valid_mask is not None:
                out = out[: batch * nv]
        vol = out.reshape(batch, *self.grid_shape, channels)
        if channels_last:
            return vol
        return jnp.transpose(vol, (0, 4, 1, 2, 3))

    def _scatter_blocked_cl(self, idxs, feature_pts, reduce_method,
                            valid_mask):
        """Segment-reduce straight into the space-to-depth basis: the
        128-wide scatter row = one 2x2x2 block (8 slots x C channels),
        point (ix, iy, iz) lands in row lin(idx >> 1) at column group
        ((sx*2+sy)*2+sz from idx & 1) * C. Same wide-row scatter cost as
        the consecutive-bin packing (``pack`` path above); the output IS
        the UNet's blocked level-0 input."""
        batch, num_pts, channels = feature_pts.shape
        gx, gy, gz = self.grid_shape
        if 8 * channels != 128:
            raise ValueError(
                f"blocked_cl layout needs 8*C == 128 lanes, got C={channels}"
            )
        if any(s % 2 for s in self.grid_shape):
            raise ValueError(
                f"blocked_cl layout needs even grid dims, got {self.grid_shape}"
            )
        gx2, gy2, gz2 = gx // 2, gy // 2, gz // 2
        nb = gx2 * gy2 * gz2
        blk = idxs >> 1
        slot = idxs & 1
        rows = (blk[..., 0] * gy2 + blk[..., 1]) * gz2 + blk[..., 2]
        rows = rows + jnp.arange(batch, dtype=rows.dtype)[:, None] * nb
        # slot-major lane order ((sx*2+sy)*2+sz over the (gx, gy, gz) axes)
        # == unet3d._space_to_depth's ((oz*2+oy)*2+ox) over its (d, h, w)
        group = ((slot[..., 0] * 2 + slot[..., 1]) * 2 + slot[..., 2]).astype(
            jnp.int32
        )
        rows = rows.reshape(-1)
        group = group.reshape(-1)
        if valid_mask is not None:
            rows = jnp.where(valid_mask.reshape(-1), rows, batch * nb)
        num_rows = batch * nb + (1 if valid_mask is not None else 0)
        feats = feature_pts.reshape(batch * num_pts, channels)
        onehot = group[:, None] == jnp.arange(8, dtype=jnp.int32)[None, :]
        if reduce_method == "max":
            fill = jnp.asarray(-jnp.inf, feats.dtype)
            wide = jnp.where(onehot[:, :, None], feats[:, None, :], fill)
            wide = wide.reshape(-1, 128)
            out_wide = jax.ops.segment_max(wide, rows, num_segments=num_rows)
            out_wide = jnp.where(jnp.isneginf(out_wide), 0.0, out_wide).astype(
                feats.dtype
            )
        elif reduce_method == "mean":
            wide = jnp.where(
                onehot[:, :, None], feats[:, None, :], jnp.asarray(0.0, feats.dtype)
            ).reshape(-1, 128)
            sums = jax.ops.segment_sum(wide, rows, num_segments=num_rows)
            ones = (
                jnp.broadcast_to(
                    onehot[:, :, None], (onehot.shape[0], 8, channels)
                )
                .astype(feats.dtype)
                .reshape(-1, 128)
            )
            counts = jax.ops.segment_sum(ones, rows, num_segments=num_rows)
            out_wide = sums / jnp.maximum(counts, 1.0)
        else:
            raise ValueError(f"unknown reduce_method {reduce_method!r}")
        return out_wide[: batch * nb].reshape(batch, gx2, gy2, gz2, 128)
