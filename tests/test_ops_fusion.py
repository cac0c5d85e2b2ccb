"""TSDF fusion + marching tetrahedra tests.

Oracle for integrate(): a direct numpy transcription of the reference
TSDF math (fusion.py:121-195) — the reference module itself needs numba,
absent from this image.
"""
import numpy as np
import pytest

from semantic_abstraction_tpu.ops import (
    TSDFVolume,
    get_view_frustum,
    marching_tetrahedra,
    meshwrite,
    pcwrite,
)


def _make_frame(rs, h=32, w=40):
    depth = rs.uniform(0.5, 2.0, (h, w)).astype(np.float32)
    color = rs.randint(0, 255, (h, w, 3)).astype(np.float32)
    intr = np.array([[35.0, 0, w / 2], [0, 35.0, h / 2], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    return color, depth, intr, pose


def _numpy_tsdf_reference(vol, frames, obs_weight=1.0):
    """Transcribed reference integrate loop (fusion.py:121-195)."""
    dims = tuple(vol.vol_dim)
    n = int(np.prod(dims))
    tsdf = -np.ones(n, np.float32)
    weight = np.zeros(n, np.float32)
    color_rgb = np.zeros((n, 3), np.float32)
    xv, yv, zv = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")
    coords = np.stack([xv.ravel(), yv.ravel(), zv.ravel()], 1).astype(np.float32)
    world = vol.vol_origin[None] + vol.voxel_size * coords
    trunc = 5 * vol.voxel_size
    for color_im, depth_im, intr, pose in frames:
        h, w = depth_im.shape
        inv = np.linalg.inv(pose)
        cam = world @ inv[:3, :3].T + inv[:3, 3]
        pz = cam[:, 2]
        # the reference divides by pz unguarded (fusion.py:160-165); pz<=0
        # voxels are masked out below, so silence the expected inf/nan noise
        with np.errstate(divide="ignore", invalid="ignore"):
            px = np.round(cam[:, 0] * intr[0, 0] / pz + intr[0, 2]).astype(int)
            py = np.round(cam[:, 1] * intr[1, 1] / pz + intr[1, 2]).astype(int)
        valid_pix = (px >= 0) & (px < w) & (py >= 0) & (py < h) & (pz > 0)
        depth_val = np.zeros(n, np.float32)
        depth_val[valid_pix] = depth_im[py[valid_pix], px[valid_pix]]
        diff = depth_val - pz
        valid = (depth_val > 0) & (diff >= -trunc)
        dist = np.clip(diff / trunc, -1, 1)
        w_old = weight[valid]
        w_new = w_old + obs_weight
        tsdf[valid] = (w_old * tsdf[valid] + obs_weight * dist[valid]) / w_new
        newc = color_im[py[valid], px[valid]]
        color_rgb[valid] = np.minimum(
            255.0,
            np.round(
                (w_old[:, None] * color_rgb[valid] + obs_weight * newc)
                / w_new[:, None]
            ),
        )
        weight[valid] = w_new
    return tsdf.reshape(dims), color_rgb.T.reshape((3,) + dims)


def test_tsdf_integrate_matches_numpy_reference():
    rs = np.random.RandomState(0)
    bnds = np.array([[-1.0, 1.0], [-1.0, 1.0], [0.0, 2.0]])
    vol = TSDFVolume(bnds, voxel_size=0.125)
    frames = [_make_frame(rs) for _ in range(3)]
    for f in frames:
        vol.integrate(*f)
    tsdf, color = vol.get_volume()
    ref_tsdf, ref_color = _numpy_tsdf_reference(vol, frames)
    np.testing.assert_allclose(tsdf, ref_tsdf, atol=1e-4, rtol=1e-4)
    # colors are rounded each step; allow tiny off-by-one from fp order
    assert np.mean(np.abs(color.astype(int) - ref_color.astype(int)) > 1) < 0.01


def test_tsdf_volume_bounds_snap():
    bnds = np.array([[-1.0, 1.05], [-1.0, 1.0], [0.0, 1.9]])
    vol = TSDFVolume(bnds, voxel_size=0.25)
    assert (vol.vol_dim == np.ceil(np.array([2.05, 2.0, 1.9]) / 0.25)).all()


def test_marching_tetrahedra_sphere():
    # SDF of a sphere radius 8 centered in a 24^3 grid
    n = 24
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    center = (n - 1) / 2.0
    sdf = np.sqrt(((g - center) ** 2).sum(axis=0)) - 8.0
    verts, faces = marching_tetrahedra(sdf, level=0.0)
    assert len(verts) > 100 and len(faces) > 100
    r = np.sqrt(((verts - center) ** 2).sum(axis=1))
    # all vertices close to the sphere surface
    assert np.abs(r - 8.0).max() < 0.75
    assert faces.max() < len(verts)


def test_marching_tetrahedra_empty():
    verts, faces = marching_tetrahedra(np.ones((8, 8, 8), np.float32), 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_mesh_and_pc_roundtrip(tmp_path):
    rs = np.random.RandomState(1)
    bnds = np.array([[-1.0, 1.0], [-1.0, 1.0], [0.0, 2.0]])
    vol = TSDFVolume(bnds, voxel_size=0.1)
    vol.integrate(*_make_frame(rs))
    verts, faces, norms, colors = vol.get_mesh()
    assert len(verts) > 0
    lens = np.linalg.norm(norms, axis=1)
    # vertices orphaned by degenerate-face removal have zero normals
    assert np.allclose(lens[lens > 1e-6], 1.0, atol=1e-4)
    assert (lens > 1e-6).mean() > 0.95
    meshwrite(str(tmp_path / "m.ply"), verts, faces, norms, colors)
    pc = vol.get_point_cloud()
    assert pc.shape[1] == 6
    pcwrite(str(tmp_path / "p.ply"), pc)
    head = (tmp_path / "m.ply").read_text().splitlines()[0]
    assert head == "ply"


def test_get_view_frustum_shape():
    rs = np.random.RandomState(2)
    _, depth, intr, pose = _make_frame(rs)
    fr = get_view_frustum(depth, intr, pose)
    assert fr.shape == (3, 5)
    # apex at camera origin
    np.testing.assert_allclose(fr[:, 0], pose[:3, 3], atol=1e-6)
