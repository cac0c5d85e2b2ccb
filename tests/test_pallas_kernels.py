"""Pallas kernel tests (interpret mode on CPU)."""
import numpy as np

import jax
import jax.numpy as jnp

from semantic_abstraction_tpu.ops.pallas_kernels import (
    cam_accumulate_reference,
    chefer_cam_accumulate,
)


def test_cam_accumulate_matches_reference():
    rs = np.random.RandomState(0)
    l, b, h, t = 3, 4, 12, 50
    grads = jnp.asarray(rs.randn(l, b, h, t, t).astype(np.float32))
    attn = jnp.asarray(np.abs(rs.randn(l, b, h, t, t)).astype(np.float32))
    r = jnp.asarray(
        np.broadcast_to(np.eye(t, dtype=np.float32), (l, b, t, t)).copy()
    )
    out_k = chefer_cam_accumulate(grads, attn, r, interpret=True)
    out_r = cam_accumulate_reference(grads, attn, r)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=1e-4, rtol=1e-4)


def test_cam_accumulate_iterated():
    """Two accumulation steps compose like the reference loop."""
    rs = np.random.RandomState(1)
    l, b, h, t = 2, 2, 4, 16
    r = jnp.asarray(
        np.broadcast_to(np.eye(t, dtype=np.float32), (l, b, t, t)).copy()
    )
    rk = r
    rr = r
    for seed in (2, 3):
        rs2 = np.random.RandomState(seed)
        g = jnp.asarray(rs2.randn(l, b, h, t, t).astype(np.float32))
        a = jnp.asarray(np.abs(rs2.randn(l, b, h, t, t)).astype(np.float32))
        rk = chefer_cam_accumulate(g, a, rk, interpret=True)
        rr = cam_accumulate_reference(g, a, rr)
    np.testing.assert_allclose(np.asarray(rk), np.asarray(rr), atol=1e-3,
                               rtol=1e-3)


def test_channel_moments_matches_numpy():
    from semantic_abstraction_tpu.ops.pallas_kernels import channel_moments

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(3, 16, 2048).astype(np.float32))
    s1, s2 = channel_moments(x, interpret=True)
    # chunked f32 accumulation vs numpy's pairwise summation: ~1e-4 rel
    np.testing.assert_allclose(np.asarray(s1), np.asarray(x).sum(-1),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), (np.asarray(x) ** 2).sum(-1),
                               rtol=1e-3, atol=1e-3)
    # shape that doesn't fit the blocking -> explicit fallback signal
    assert channel_moments(jnp.zeros((1, 16, 1000))) is None
