"""Golden tests: VoxelGrid vs the reference's VirtualGrid semantics.

Oracles are plain numpy re-derivations of net.py:24-201 behavior (truncating
int cast, per-axis clamp, row-major flatten, torch_scatter empty-bin zeros).
"""
import numpy as np
import jax.numpy as jnp

from semantic_abstraction_tpu.ops import VoxelGrid

SCENE_BOUNDS = [[-1.0, -1.0, -0.1], [1.0, 1.0, 1.9]]


def np_points_to_idxs(points, lower, upper, grid_shape):
    lower = np.asarray(lower)
    upper = np.asarray(upper)
    scale = (np.asarray(grid_shape) - 1) / (upper - lower)
    idx = ((points - lower) * scale).astype(np.int64)  # trunc toward zero
    return np.clip(idx, 0, np.asarray(grid_shape) - 1)


def test_points_to_idxs_matches_reference_math():
    rng = np.random.default_rng(0)
    grid = VoxelGrid.from_bounds(SCENE_BOUNDS, (8, 8, 8))
    pts = rng.uniform(-1.5, 2.5, size=(1000, 3)).astype(np.float32)
    got = np.asarray(grid.points_to_idxs(jnp.asarray(pts)))
    expected = np_points_to_idxs(pts.astype(np.float32), *np.asarray(SCENE_BOUNDS), (8, 8, 8))
    np.testing.assert_array_equal(got, expected)


def test_flatten_unflatten_roundtrip():
    grid = VoxelGrid.from_bounds(SCENE_BOUNDS, (4, 5, 6))
    rng = np.random.default_rng(1)
    idxs = np.stack(
        [rng.integers(0, d, size=200) for d in (4, 5, 6)], axis=-1
    ).astype(np.int32)
    flat = np.asarray(grid.flatten_idxs(jnp.asarray(idxs)))
    expected = idxs[:, 0] * 30 + idxs[:, 1] * 6 + idxs[:, 2]
    np.testing.assert_array_equal(flat, expected)
    back = np.asarray(grid.unflatten_idxs(jnp.asarray(flat)))
    np.testing.assert_array_equal(back, idxs)


def test_idxs_to_points_corners():
    grid = VoxelGrid.from_bounds(SCENE_BOUNDS, (32, 32, 32))
    idxs = jnp.asarray([[0, 0, 0], [31, 31, 31]])
    pts = np.asarray(grid.idxs_to_points(idxs))
    np.testing.assert_allclose(pts[0], [-1.0, -1.0, -0.1], atol=1e-6)
    np.testing.assert_allclose(pts[1], [1.0, 1.0, 1.9], atol=1e-6)


def _np_scatter(pts, feats, lower, upper, grid_shape, reduce, valid_mask=None):
    """numpy oracle with torch_scatter conventions (empty bins -> 0)."""
    b, n, c = feats.shape
    gx, gy, gz = grid_shape
    out = np.zeros((b, gx, gy, gz, c), dtype=np.float64)
    for bi in range(b):
        idx = np_points_to_idxs(pts[bi], lower, upper, grid_shape)
        keep = (
            np.ones(n, bool) if valid_mask is None else np.asarray(valid_mask[bi])
        )
        if reduce == "max":
            acc = {}
            for i in range(n):
                if not keep[i]:
                    continue
                key = tuple(idx[i])
                acc[key] = (
                    np.maximum(acc[key], feats[bi, i]) if key in acc else feats[bi, i].copy()
                )
            for key, v in acc.items():
                out[bi][key] = v
        else:
            cnt = np.zeros((gx, gy, gz), dtype=np.int64)
            for i in range(n):
                if not keep[i]:
                    continue
                key = tuple(idx[i])
                out[bi][key] += feats[bi, i]
                cnt[key] += 1
            nz = cnt > 0
            out[bi][nz] /= cnt[nz][:, None]
    return np.transpose(out, (0, 4, 1, 2, 3))


def test_scatter_max_and_mean_match_oracle():
    rng = np.random.default_rng(2)
    grid = VoxelGrid.from_bounds(SCENE_BOUNDS, (4, 4, 4))
    pts = rng.uniform(-1.2, 2.0, size=(2, 300, 3)).astype(np.float32)
    feats = rng.normal(size=(2, 300, 3)).astype(np.float32)
    for reduce in ("max", "mean"):
        got = np.asarray(
            grid.scatter_points(jnp.asarray(pts), jnp.asarray(feats), reduce)
        )
        expected = _np_scatter(pts, feats, *np.asarray(SCENE_BOUNDS), (4, 4, 4), reduce)
        np.testing.assert_allclose(got, expected, atol=1e-5)


def test_scatter_packed_lanes_match_oracle():
    """Ground-truth coverage for the 128-lane PACKED fast path.

    Grid 8x8x8 (nv=512) with C in {1, 8, 16}: pack = 128/C divides nv, so
    the packed branch is taken for every case, for both reductions, with
    and without a validity mask (this is the path whose C>1 mean variant
    regressed unnoticed when only C=3 — unpacked — was oracle-tested).
    """
    rng = np.random.default_rng(7)
    grid = VoxelGrid.from_bounds(SCENE_BOUNDS, (8, 8, 8))
    pts = rng.uniform(-1.2, 2.0, size=(2, 500, 3)).astype(np.float32)
    for c in (1, 8, 16):
        feats = rng.normal(size=(2, 500, c)).astype(np.float32)
        for reduce in ("max", "mean"):
            for mask in (None, rng.random((2, 500)) > 0.3):
                got = np.asarray(
                    grid.scatter_points(
                        jnp.asarray(pts), jnp.asarray(feats), reduce,
                        valid_mask=None if mask is None else jnp.asarray(mask),
                    )
                )
                expected = _np_scatter(
                    pts, feats, *np.asarray(SCENE_BOUNDS), (8, 8, 8), reduce,
                    valid_mask=mask,
                )
                np.testing.assert_allclose(got, expected, atol=1e-5,
                                           err_msg=f"C={c} {reduce} mask={mask is not None}")


def test_scatter_negative_features_max_not_clamped():
    """Occupied voxels keep true (possibly negative) max; empty voxels are 0."""
    grid = VoxelGrid.from_bounds([[0, 0, 0], [1, 1, 1]], (2, 2, 2))
    pts = jnp.asarray([[[0.1, 0.1, 0.1], [0.1, 0.1, 0.1]]])
    feats = jnp.asarray([[[-3.0], [-5.0]]])
    vol = np.asarray(grid.scatter_points(pts, feats, "max"))
    assert vol[0, 0, 0, 0, 0] == -3.0
    assert vol[0, 0, 1, 1, 1] == 0.0


def test_scatter_valid_mask_drops_points():
    grid = VoxelGrid.from_bounds([[0, 0, 0], [1, 1, 1]], (2, 2, 2))
    pts = jnp.asarray([[[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]]])
    feats = jnp.asarray([[[1.0], [2.0]]])
    mask = jnp.asarray([[True, False]])
    vol = np.asarray(grid.scatter_points(pts, feats, "max", valid_mask=mask))
    assert vol[0, 0, 0, 0, 0] == 1.0
    assert vol[0, 0, 1, 1, 1] == 0.0


def test_scatter_channels_last_matches_ncdhw():
    """channels_last=True output == transpose of the NCDHW output, for
    packed (C=16) and unpacked (C=3) channel counts, with and without a
    validity mask."""
    grid = VoxelGrid(lower=(-1, -1, -0.1), upper=(1, 1, 1.9),
                     grid_shape=(16, 16, 16))
    rs = np.random.RandomState(3)
    pts = jnp.asarray(rs.uniform(-1.2, 2.0, (2, 400, 3)).astype(np.float32))
    for c in (16, 3):
        feats = jnp.asarray(rs.randn(2, 400, c).astype(np.float32))
        for mask in (None, jnp.asarray(rs.rand(2, 400) > 0.3)):
            cl = np.asarray(grid.scatter_points(
                pts, feats, "max", valid_mask=mask, channels_last=True))
            cf = np.asarray(grid.scatter_points(
                pts, feats, "max", valid_mask=mask))
            np.testing.assert_allclose(cl, cf.transpose(0, 2, 3, 4, 1),
                                       atol=1e-6)


def test_scatter_blocked_cl_matches_space_to_depth():
    """layout="blocked_cl" == space_to_depth_cl of the dense channel-last
    scatter, for both reductions and with a valid_mask: the wide scatter
    row IS the UNet's blocked level-0 input."""
    from semantic_abstraction_tpu.ops.sampling import space_to_depth_cl
    from semantic_abstraction_tpu.ops.voxel import VoxelGrid

    grid = VoxelGrid(lower=(-1.0, -1.0, -0.1), upper=(1.0, 1.0, 1.9),
                     grid_shape=(8, 6, 4))
    rs = np.random.RandomState(3)
    xyz = jnp.asarray(rs.uniform(-1.2, 2.1, (2, 500, 3)).astype(np.float32))
    feats = jnp.asarray(rs.randn(2, 500, 16).astype(np.float32))
    mask = jnp.asarray(rs.rand(2, 500) > 0.3)
    for reduce_method in ("max", "mean"):
        for vm in (None, mask):
            dense = grid.scatter_points(
                xyz, feats, reduce_method=reduce_method, valid_mask=vm,
                channels_last=True,
            )
            blocked = grid.scatter_points(
                xyz, feats, reduce_method=reduce_method, valid_mask=vm,
                layout="blocked_cl",
            )
            assert blocked.shape == (2, 4, 3, 2, 128)
            np.testing.assert_allclose(
                np.asarray(blocked), np.asarray(space_to_depth_cl(dense)),
                atol=1e-6, rtol=1e-6,
                err_msg=f"{reduce_method} mask={vm is not None}",
            )


def test_scatter_blocked_cl_rejects_bad_shapes():
    import pytest as _pytest

    from semantic_abstraction_tpu.ops.voxel import VoxelGrid

    rs = np.random.RandomState(0)
    xyz = jnp.asarray(rs.uniform(-1, 1, (1, 10, 3)).astype(np.float32))
    with _pytest.raises(ValueError, match="8\\*C"):
        VoxelGrid(lower=(-1,) * 3, upper=(1,) * 3, grid_shape=(4, 4, 4)
                  ).scatter_points(xyz, jnp.zeros((1, 10, 8)),
                                   layout="blocked_cl")
    with _pytest.raises(ValueError, match="even"):
        VoxelGrid(lower=(-1,) * 3, upper=(1,) * 3, grid_shape=(5, 4, 4)
                  ).scatter_points(xyz, jnp.zeros((1, 10, 16)),
                                   layout="blocked_cl")
