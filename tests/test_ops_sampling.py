"""Golden tests: trilinear sampling vs torch grid_sample, resizes vs torch/PIL.

torch (CPU-only) serves as the oracle, since the reference's decoder relies
on exact ``grid_sample(mode=bilinear, padding_mode=border,
align_corners=True)`` semantics for checkpoint parity (net.py:233-239).
"""
import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from semantic_abstraction_tpu.ops import (  # noqa: E402
    grid_sample_3d,
    resize_bilinear,
    resize_bicubic_pil,
)


@pytest.mark.parametrize("seed", [0, 1])
def test_grid_sample_3d_matches_torch(seed):
    rng = np.random.default_rng(seed)
    b, c, d, h, w = 2, 5, 6, 7, 8
    n = 400
    vol = rng.normal(size=(b, c, d, h, w)).astype(np.float32)
    # include out-of-range coords to exercise border padding
    coords = rng.uniform(-1.4, 1.4, size=(b, n, 3)).astype(np.float32)

    got = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords)))

    tvol = torch.from_numpy(vol)
    tgrid = torch.from_numpy(coords).view(b, n, 1, 1, 3)
    ref = F.grid_sample(
        tvol, tgrid, mode="bilinear", padding_mode="border", align_corners=True
    )
    ref = ref.view(b, c, n).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_grid_sample_3d_exact_corners():
    vol = np.zeros((1, 1, 3, 4, 5), np.float32)
    vol[0, 0, 2, 0, 0] = 9.0
    coords = jnp.asarray([[[-1.0, -1.0, 1.0]]])  # x->W0, y->H0, z->Dlast
    out = np.asarray(grid_sample_3d(jnp.asarray(vol), coords))
    assert out[0, 0, 0] == 9.0


@pytest.mark.parametrize("in_hw,out_hw", [((7, 7), (96, 96)), ((7, 7), (224, 224)), ((20, 30), (10, 15))])
def test_resize_bilinear_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, *in_hw)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(img), out_hw))
    ref = F.interpolate(
        torch.from_numpy(img), size=out_hw, mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_resize_bicubic_matches_pil_float():
    """Exact weight parity vs PIL's float ('F' mode) bicubic resample.

    PIL's uint8 path additionally rounds+clamps BETWEEN the two 1-D passes,
    which a float pipeline deliberately does not reproduce; the float path
    shares the identical filter weights and is the meaningful oracle.
    """
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(3)
    for in_size in (90, 180, 360, 224, 720):
        img = rng.normal(size=(in_size, in_size)).astype(np.float32)
        ref = np.asarray(Image.fromarray(img, mode="F").resize((224, 224), Image.BICUBIC))
        got = np.asarray(resize_bicubic_pil(jnp.asarray(img), (224, 224)))
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_resize_bicubic_uint8_close_to_pil():
    """Loose check vs PIL's uint8 path (differs only by inter-pass rounding)."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(4)
    img_u8 = rng.integers(0, 256, size=(180, 180, 3), dtype=np.uint8)
    ref = np.asarray(
        Image.fromarray(img_u8).resize((224, 224), Image.BICUBIC), dtype=np.float32
    )
    img_f = jnp.asarray(img_u8.astype(np.float32).transpose(2, 0, 1))
    got = np.clip(np.asarray(resize_bicubic_pil(img_f, (224, 224))), 0, 255)
    assert np.abs(got.transpose(1, 2, 0) - ref).mean() < 0.75


def test_grid_sample_custom_vjp_matches_autodiff():
    """The packed base-corner scatter backward (ops/sampling.py
    _grid_sample_bwd) == plain autodiff through the gather-lerp."""
    import jax

    from semantic_abstraction_tpu.ops.sampling import (
        _grid_sample_prep,
        grid_sample_3d,
    )

    def plain_sample(vol, coords):
        b, c, d, h, w = vol.shape
        x0, y0, z0, fx, fy, fz = _grid_sample_prep((d, h, w), coords)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        z1 = jnp.minimum(z0 + 1, d - 1)
        vol_flat = jnp.transpose(vol, (0, 2, 3, 4, 1)).reshape(b, d * h * w, c)

        def g(zz, yy, xx):
            lin = (zz * h + yy) * w + xx
            return jnp.take_along_axis(vol_flat, lin[..., None], axis=1)

        c000, c001, c010, c011 = g(z0, y0, x0), g(z0, y0, x1), g(z0, y1, x0), g(z0, y1, x1)
        c100, c101, c110, c111 = g(z1, y0, x0), g(z1, y0, x1), g(z1, y1, x0), g(z1, y1, x1)
        fx, fy, fz = fx[..., None], fy[..., None], fz[..., None]
        c00 = c000 * (1 - fx) + c001 * fx
        c01 = c010 * (1 - fx) + c011 * fx
        c10 = c100 * (1 - fx) + c101 * fx
        c11 = c110 * (1 - fx) + c111 * fx
        c0 = c00 * (1 - fy) + c01 * fy
        c1 = c10 * (1 - fy) + c11 * fy
        return c0 * (1 - fz) + c1 * fz

    rs = np.random.RandomState(0)
    vol = jnp.asarray(rs.randn(2, 4, 6, 5, 7).astype(np.float32))
    coords = jnp.asarray(rs.uniform(-1.3, 1.3, (2, 300, 3)).astype(np.float32))
    gout = jnp.asarray(rs.randn(2, 300, 4).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(grid_sample_3d(vol, coords)),
        np.asarray(plain_sample(vol, coords)), atol=1e-5,
    )
    gv1, gc1 = jax.grad(lambda v, c: (grid_sample_3d(v, c) * gout).sum(),
                        argnums=(0, 1))(vol, coords)
    gv2, gc2 = jax.grad(lambda v, c: (plain_sample(v, c) * gout).sum(),
                        argnums=(0, 1))(vol, coords)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2), atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gc1), np.asarray(gc2), atol=1e-4,
                               rtol=1e-3)


def test_grid_sample_channels_last_matches_ncdhw():
    """grid_sample_3d_cl(vol_cl) == grid_sample_3d(vol) values AND custom
    VJP gradients (the channel-last core is the hot path; the NCDHW entry
    is a transpose wrapper)."""
    import jax

    from semantic_abstraction_tpu.ops.sampling import (
        grid_sample_3d,
        grid_sample_3d_cl,
    )

    rs = np.random.RandomState(7)
    vol = jnp.asarray(rs.randn(2, 4, 6, 5, 7).astype(np.float32))
    vol_cl = jnp.transpose(vol, (0, 2, 3, 4, 1))
    coords = jnp.asarray(rs.uniform(-1.2, 1.2, (2, 200, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(grid_sample_3d_cl(vol_cl, coords)),
        np.asarray(grid_sample_3d(vol, coords)),
        atol=1e-5, rtol=1e-5,
    )
    g = jnp.asarray(rs.randn(2, 200, 4).astype(np.float32))

    def loss_cl(v, c):
        return (grid_sample_3d_cl(v, c) * g).sum()

    def loss_cf(v, c):
        return (grid_sample_3d(v, c) * g).sum()

    dv_cl, dc_cl = jax.grad(loss_cl, argnums=(0, 1))(vol_cl, coords)
    dv_cf, dc_cf = jax.grad(loss_cf, argnums=(0, 1))(vol, coords)
    np.testing.assert_allclose(
        np.asarray(dv_cl), np.asarray(dv_cf).transpose(0, 2, 3, 4, 1),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(dc_cl), np.asarray(dc_cf),
                               atol=1e-4, rtol=1e-4)


def test_grid_sample_blocked_matches_channels_last():
    """grid_sample_3d_blocked_cl(s2d(vol)) == grid_sample_3d_cl(vol), values
    AND custom-VJP gradients (d(vol) mapped back through the blocking).
    The blocked form is the 128-lane end-to-end train path: it samples the
    UNet's space-to-depth basis directly, skipping depth_to_space and the
    neighborhood concat ladder."""
    import jax

    from semantic_abstraction_tpu.ops.sampling import (
        grid_sample_3d_blocked_cl,
        grid_sample_3d_cl,
        space_to_depth_cl,
    )

    rs = np.random.RandomState(11)
    # even dims (blocked basis requirement); C=4 -> 32 lanes keeps CPU fast
    vol_cl = jnp.asarray(rs.randn(2, 6, 4, 8, 4).astype(np.float32))
    vol_b = space_to_depth_cl(vol_cl)
    assert vol_b.shape == (2, 3, 2, 4, 32)
    coords = jnp.asarray(rs.uniform(-1.3, 1.3, (2, 300, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(grid_sample_3d_blocked_cl(vol_b, coords)),
        np.asarray(grid_sample_3d_cl(vol_cl, coords)),
        atol=1e-5, rtol=1e-5,
    )

    g = jnp.asarray(rs.randn(2, 300, 4).astype(np.float32))

    def loss_b(v, c):
        return (grid_sample_3d_blocked_cl(v, c) * g).sum()

    def loss_cl(v, c):
        return (grid_sample_3d_cl(v, c) * g).sum()

    dvb, dcb = jax.grad(loss_b, argnums=(0, 1))(vol_b, coords)
    dvc, dcc = jax.grad(loss_cl, argnums=(0, 1))(vol_cl, coords)
    np.testing.assert_allclose(
        np.asarray(dvb), np.asarray(space_to_depth_cl(dvc)),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(dcb), np.asarray(dcc),
                               atol=1e-4, rtol=1e-4)


def test_grid_sample_blocked_border_and_interior_exact():
    """Border clamping through the parity packs: queries outside [-1, 1]
    and exactly on the far faces read the clamped corner (the zero pad
    blocks are only ever reached with exactly-zero lerp weight)."""
    from semantic_abstraction_tpu.ops.sampling import (
        grid_sample_3d_blocked_cl,
        grid_sample_3d_cl,
        space_to_depth_cl,
    )

    rs = np.random.RandomState(12)
    vol_cl = jnp.asarray(rs.randn(1, 4, 4, 4, 2).astype(np.float32))
    vol_b = space_to_depth_cl(vol_cl)
    coords = jnp.asarray(
        np.array(
            [[[-1, -1, -1], [1, 1, 1], [2, -3, 1.5], [1, -1, 1],
              [0.999, 0.999, -0.999], [-2, 2, 0]]],
            np.float32,
        )
    )
    np.testing.assert_allclose(
        np.asarray(grid_sample_3d_blocked_cl(vol_b, coords)),
        np.asarray(grid_sample_3d_cl(vol_cl, coords)),
        atol=1e-6, rtol=1e-6,
    )


def test_blocked_chunked_sampler_map_path_matches_dense():
    """grid_sample_3d_blocked_cl_chunked's lax.map fallback (more than
    max_unroll chunks — eval's all-classes broadcast regime) equals the
    dense channel-last sampler, values and d(vol)."""
    from semantic_abstraction_tpu.ops.sampling import (
        grid_sample_3d_blocked_cl_chunked,
        grid_sample_3d_cl,
        space_to_depth_cl,
    )

    rs = np.random.RandomState(9)
    b = 12  # > max_unroll=8 chunks at chunk=1
    vol = jnp.asarray(rs.randn(b, 8, 8, 8, 16).astype(np.float32))
    vb = space_to_depth_cl(vol)
    coords = jnp.asarray(rs.uniform(-1, 1, (b, 200, 3)).astype(np.float32))
    out_m = grid_sample_3d_blocked_cl_chunked(vb, coords)
    out_d = grid_sample_3d_cl(vol, coords)
    import jax

    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_d),
                               atol=1e-5, rtol=1e-5)
    g = jnp.asarray(rs.randn(b, 200, 16).astype(np.float32))
    dm = jax.vjp(lambda v: grid_sample_3d_blocked_cl_chunked(v, coords), vb)[1](g)[0]
    dd = jax.vjp(lambda v: grid_sample_3d_cl(v, coords), vol)[1](g)[0]
    np.testing.assert_allclose(np.asarray(space_to_depth_cl(dd)),
                               np.asarray(dm), atol=1e-4, rtol=1e-4)
