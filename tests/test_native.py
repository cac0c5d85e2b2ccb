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
