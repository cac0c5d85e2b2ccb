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


def test_fused_mha_matches_reference():
    from semantic_abstraction_tpu.ops.pallas_kernels import (
        fused_mha, mha_reference, _fused_mha_plan,
    )

    rs = np.random.RandomState(5)
    b, t, w, heads = 4, 50, 768, 12  # CLIP ViT-B/32 tile shape (small batch)
    assert _fused_mha_plan(b, t, w, heads) is not None
    q = jnp.asarray(rs.randn(b, t, w).astype(np.float32))
    k = jnp.asarray(rs.randn(b, t, w).astype(np.float32))
    v = jnp.asarray(rs.randn(b, t, w).astype(np.float32))
    out_k = fused_mha(q, k, v, heads, True)
    out_r = mha_reference(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-4, rtol=2e-4)


def test_fused_mha_vjp_matches_reference():
    """custom_vjp backward == differentiating the XLA reference directly."""
    from semantic_abstraction_tpu.ops.pallas_kernels import (
        fused_mha, mha_reference,
    )

    rs = np.random.RandomState(6)
    b, t, w, heads = 2, 16, 128, 2
    q, k, v = (jnp.asarray(rs.randn(b, t, w).astype(np.float32))
               for _ in range(3))

    def loss_fused(q, k, v):
        return jnp.sum(jnp.sin(fused_mha(q, k, v, heads, True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(mha_reference(q, k, v, heads)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_fused_mha_plan_rejects_unsupported():
    from semantic_abstraction_tpu.ops.pallas_kernels import _fused_mha_plan

    assert _fused_mha_plan(4, 50, 768, 7) is None      # W % heads != 0
    assert _fused_mha_plan(4, 50, 768, 4) is None      # head_dim 192 > 128
    assert _fused_mha_plan(4, 50, 640, 10) is not None  # hd=64: 2 heads/step
    # awkward batches pad up to a >= 8-row block instead of running a
    # tiny-block grid (90 only divides by 2 below 45)
    bb, _, bp = _fused_mha_plan(90, 50, 768, 12)
    assert bb >= 8 and bp % bb == 0 and bp >= 90


def test_fused_mha_padded_batch_matches_reference():
    """b=90 (divides only by tiny blocks) takes the kernel-local pad path."""
    from semantic_abstraction_tpu.ops.pallas_kernels import (
        fused_mha, mha_reference,
    )

    rs = np.random.RandomState(7)
    b, t, w, heads = 90, 10, 256, 4
    q, k, v = (jnp.asarray(rs.randn(b, t, w).astype(np.float32))
               for _ in range(3))
    out_k = fused_mha(q, k, v, heads, True)
    out_r = mha_reference(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-4, rtol=2e-4)


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
