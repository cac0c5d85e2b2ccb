"""Parity tests: JAX ResidualUNet3D vs the reference torch implementation.

The reference unet3d.py is imported (read-only) via ref_oracle and driven
with converted weights; outputs must match to float tolerance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semantic_abstraction_tpu.models import (
    convert_unet3d_state_dict,
    init_residual_unet3d,
    residual_unet3d,
)
from ref_oracle import ref_root_module

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_unet3d():
    return ref_root_module("unet3d")


def _state_dict_np(net):
    return {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}


@pytest.mark.parametrize(
    "in_ch,out_ch,f_maps,num_levels,num_groups,size",
    [
        (4, 4, 8, 3, 4, 16),
        (2, 5, 4, 2, 2, 8),
    ],
)
def test_residual_unet3d_matches_reference(
    ref_unet3d, in_ch, out_ch, f_maps, num_levels, num_groups, size
):
    torch.manual_seed(0)
    net = ref_unet3d.ResidualUNet3D(
        in_channels=in_ch,
        out_channels=out_ch,
        f_maps=f_maps,
        num_groups=num_groups,
        num_levels=num_levels,
    ).eval()
    x = np.random.RandomState(1).randn(2, in_ch, size, size, size).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()

    params = convert_unet3d_state_dict(_state_dict_np(net))
    out = np.asarray(residual_unet3d(params, jnp.asarray(x), num_groups=num_groups))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_unet3d_init_shapes_match_converted(ref_unet3d):
    torch.manual_seed(0)
    net = ref_unet3d.ResidualUNet3D(
        in_channels=3, out_channels=6, f_maps=8, num_groups=4, num_levels=3
    )
    converted = convert_unet3d_state_dict(_state_dict_np(net))
    ours = init_residual_unet3d(
        jax.random.PRNGKey(0), in_channels=3, out_channels=6, f_maps=8, num_levels=3
    )
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, converted)
    our_shapes = jax.tree_util.tree_map(lambda a: a.shape, ours)
    assert ref_shapes == our_shapes


def test_unet3d_bf16_compute_close_to_fp32(ref_unet3d):
    torch.manual_seed(2)
    net = ref_unet3d.ResidualUNet3D(
        in_channels=2, out_channels=2, f_maps=4, num_groups=2, num_levels=2
    ).eval()
    params = convert_unet3d_state_dict(_state_dict_np(net))
    x = jnp.asarray(np.random.RandomState(3).randn(1, 2, 8, 8, 8).astype(np.float32))
    full = np.asarray(residual_unet3d(params, x, num_groups=2))
    half = np.asarray(
        residual_unet3d(params, x, num_groups=2, compute_dtype=jnp.bfloat16)
    ).astype(np.float32)
    # bf16 matmuls: loose tolerance, but must be structurally the same
    assert np.abs(full - half).mean() < 0.1


@pytest.mark.parametrize("shape,cin,cout", [
    ((2, 5, 8, 10, 12), 5, 7),
    ((1, 16, 16, 16, 16), 16, 16),
])
def test_phase_conv_matches_plain(ref_unet3d, shape, cin, cout):
    """Phase-alternating 2^3 blocked convs == plain same-padding conv in
    BOTH directions (models/unet3d.py phase_conv), incl. gradients."""
    from semantic_abstraction_tpu.models.unet3d import (
        conv3d,
        depth_to_space_odd,
        phase_conv,
        space_to_depth,
        space_to_depth_odd,
    )

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape).astype(np.float32))
    w = jnp.asarray(rs.randn(cout, cin, 3, 3, 3).astype(np.float32))
    ref = np.asarray(conv3d(x, w, padding=1))

    def via_odd_in(w_):  # odd -> even
        out_b = phase_conv(space_to_depth_odd(x), w_, out_parity="even")
        from semantic_abstraction_tpu.models.unet3d import depth_to_space
        return depth_to_space(out_b)

    def via_even_in(w_):  # even -> odd
        out_b = phase_conv(space_to_depth(x), w_, out_parity="odd")
        return depth_to_space_odd(out_b)

    for fn in (via_odd_in, via_even_in):
        np.testing.assert_allclose(np.asarray(fn(w)), ref,
                                   atol=3e-4, rtol=3e-4)
        g1 = jax.grad(lambda w_: conv3d(x, w_, padding=1).sum())(w)
        g2 = jax.grad(lambda w_: fn(w_).sum())(w)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   atol=3e-3, rtol=3e-3)


def test_blocked_group_norm_odd_matches_plain():
    """Odd-basis GN (zero pads + true-count stats + pad re-zeroing) ==
    plain GN computed before blocking."""
    from semantic_abstraction_tpu.models.unet3d import (
        blocked_group_norm_odd,
        group_norm,
        space_to_depth_odd,
    )

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 8, 10, 12).astype(np.float32))
    sc = jnp.asarray(rs.randn(8).astype(np.float32))
    bi = jnp.asarray(rs.randn(8).astype(np.float32))
    want = np.asarray(space_to_depth_odd(group_norm(x, sc, bi, 4)))
    got = np.asarray(blocked_group_norm_odd(space_to_depth_odd(x), sc, bi, 4))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("shape,cin,cout", [
    ((2, 5, 8, 10, 12), 5, 7),
    ((1, 16, 16, 16, 16), 16, 16),
    ((1, 32, 8, 8, 8), 32, 32),
])
def test_conv3d_s2d_matches_plain(ref_unet3d, shape, cin, cout):
    """Space-to-depth conv == plain same-padding conv (models/unet3d.py
    conv3d_s2d), incl. gradients."""
    from semantic_abstraction_tpu.models.unet3d import conv3d, conv3d_s2d

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape).astype(np.float32))
    w = jnp.asarray(rs.randn(cout, cin, 3, 3, 3).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(conv3d_s2d(x, w)), np.asarray(conv3d(x, w, padding=1)),
        atol=3e-4, rtol=3e-4,
    )
    g1 = jax.grad(lambda w_: conv3d(x, w_, padding=1).sum())(w)
    g2 = jax.grad(lambda w_: conv3d_s2d(x, w_).sum())(w)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=3e-3,
                               rtol=3e-3)


def test_residual_unet3d_blocked_io_matches_channels_last():
    """blocked_io (blocked channel-last in/out, kron final matmul) ==
    the channels_last path through space_to_depth_cl on both ends."""
    import jax

    from semantic_abstraction_tpu.models.unet3d import (
        init_residual_unet3d,
        residual_unet3d,
        unet_blocked_io_ok,
    )
    from semantic_abstraction_tpu.ops.sampling import space_to_depth_cl

    rs = np.random.RandomState(5)
    params = init_residual_unet3d(
        jax.random.PRNGKey(0), in_channels=16, out_channels=16,
        f_maps=16, num_levels=3,
    )
    assert unet_blocked_io_ok(params, (16, 16, 16))
    x = jnp.asarray(rs.randn(2, 16, 16, 16, 16).astype(np.float32))
    ref = residual_unet3d(params, x, num_groups=8, remat=False,
                          channels_last=True)
    got_b = residual_unet3d(params, space_to_depth_cl(x), num_groups=8,
                            remat=False, blocked_io=True)
    assert got_b.shape == (2, 8, 8, 8, 128)
    np.testing.assert_allclose(
        np.asarray(got_b), np.asarray(space_to_depth_cl(ref)),
        atol=2e-5, rtol=2e-5,
    )
    # and unsupported shapes are refused, not silently mis-handled
    assert not unet_blocked_io_ok(params, (6, 16, 16))  # dim < 8
    assert not unet_blocked_io_ok(params, (15, 16, 16))  # odd dim
