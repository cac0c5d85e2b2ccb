"""Native loader-kernel tests (skipped when no C++ toolchain)."""
import numpy as np
import pytest

from semantic_abstraction_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native kernels not built"
)


def test_weighted_sample_without_replacement_unique_and_weighted():
    rs = np.random.RandomState(0)
    p = np.ones(1000)
    p[:10] = 1000.0
    p /= p.sum()
    counts = np.zeros(1000)
    for _ in range(200):
        idx = native.weighted_sample(rs, p, 20, replace=False)
        assert len(np.unique(idx)) == 20
        counts[idx] += 1
    # the 10 super-heavy entries should be drawn nearly every time
    assert counts[:10].mean() > 190
    assert counts[10:].mean() < 20


def test_weighted_sample_infeasible_raises():
    rs = np.random.RandomState(1)
    p = np.zeros(100)
    p[:5] = 1.0
    with pytest.raises(ValueError):
        native.weighted_sample(rs, p, 10, replace=False)


def test_weighted_sample_with_replacement_distribution():
    rs = np.random.RandomState(2)
    p = np.array([0.7, 0.2, 0.1])
    idx = native.weighted_sample(rs, p, 30000, replace=True)
    freq = np.bincount(idx, minlength=3) / 30000
    np.testing.assert_allclose(freq, p, atol=0.02)


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32,
                                   np.int64, np.uint8])
def test_gather_rows_matches_numpy(dtype):
    rs = np.random.RandomState(3)
    src = (rs.rand(500, 7) * 100).astype(dtype)
    idx = rs.randint(0, 500, 200)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gather_rows_1d():
    rs = np.random.RandomState(4)
    src = rs.rand(300).astype(np.float32)
    idx = rs.randint(0, 300, 50)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gather_axis1_matches_numpy():
    rs = np.random.RandomState(5)
    src = rs.rand(4, 1000, 3).astype(np.float32)
    idx = rs.randint(0, 1000, 400)
    np.testing.assert_array_equal(native.gather_axis1(src, idx), src[:, idx])


def test_gather_out_of_range_raises():
    src = np.zeros((10, 2), np.float32)
    with pytest.raises(IndexError):
        native.gather_rows(src, np.array([11]))


def test_bounds_mask_bit_identical_to_numpy():
    rs = np.random.RandomState(7)
    pts = (rs.rand(20000, 3).astype(np.float32) - 0.3) * 3
    bounds = np.array([[-1.0, -1.0, -0.1], [1.0, 1.0, 1.9]])
    # exact-boundary rows: inclusive on both ends must match numpy
    pts[:4] = [[-1.0, -1.0, -0.1], [1.0, 1.0, 1.9],
               [-1.0000001, 0.0, 0.0], [1.0000001, 0.0, 0.0]]
    got = native.bounds_mask(pts, bounds)
    ref = np.all((pts >= bounds[0]) & (pts <= bounds[1]), axis=-1)
    np.testing.assert_array_equal(got, ref)


def test_frustum_mask_bit_identical_to_numpy():
    rs = np.random.RandomState(8)
    pts = (rs.rand(20000, 3).astype(np.float32) - 0.5) * 4
    th = 0.3
    pose = np.eye(4)
    pose[:3, :3] = [[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    pose[:3, 3] = [0.1, -0.2, 0.3]
    intr = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    got = native.frustum_mask(pts, (480, 640), pose, intr)
    # the numpy twin's exact arithmetic (transforms.check_pts_in_frustum_np
    # pre-native formulation)
    inv = np.linalg.inv(pose)
    cam = pts @ inv[:3, :3].T + inv[:3, 3]
    z = cam[:, 2]
    sz = np.where(z == 0, 1e-12, z)
    px = intr[0, 0] / sz * cam[:, 0] + intr[0, 2]
    py = intr[1, 1] / sz * cam[:, 1] + intr[1, 2]
    ref = (px >= 0) & (px < 640) & (py >= 0) & (py < 480) & (z > 0)
    np.testing.assert_array_equal(got, ref)
