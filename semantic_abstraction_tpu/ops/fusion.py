"""Volumetric TSDF fusion, TPU-native.

Replaces the reference's Numba-JIT TSDF pipeline (reference: fusion.py:34-248
— ``vox2world`` :85-95, ``cam2pix`` :97-108, ``integrate_tsdf`` :110-119,
``integrate`` :121-195, ``get_volume``/``get_point_cloud``/``get_mesh``
:197-248, ``get_view_frustum`` :258-275, ``meshwrite``/``pcwrite``
:278-322).

TPU-first design: the per-frame integration is ONE jitted pure function
over a (tsdf, weight, color) state pytree — embarrassingly parallel over
voxels, no scalar loops, no scatter (every voxel recomputes its own
update). Semantics parity with the reference:

- truncation margin 5 * voxel_size; dist clamped to [-1, 1]
- unobserved voxels start at tsdf = -1 (occupied assumption)
- cumulative-moving-average updates with per-frame obs_weight
- pixel lookup uses round-half-to-even (np.round parity) and the
  identical frustum validity mask
- color averaged per channel with the reference's per-step rounding and
  255 clamp. Departure: color is stored as a (3, X, Y, Z) float volume
  instead of the packed b*65536+g*256+r single float (a GPU-atomics trick
  with no benefit on TPU); ``get_volume`` returns the same (3, ...) uint8
  layout the reference produces after unpacking.

Meshing uses :mod:`.marching` (marching tetrahedra) instead of skimage's
marching-cubes-lewiner; same zero level set, different triangulation.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .marching import marching_tetrahedra


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("im_shape",))
def _integrate_step(
    state: dict,
    color_im: jax.Array,
    depth_im: jax.Array,
    cam_intr: jax.Array,
    cam_pose_inv: jax.Array,
    obs_weight: jax.Array,
    vox_world: jax.Array,
    trunc_margin: float,
    im_shape: Tuple[int, int],
) -> dict:
    im_h, im_w = im_shape
    rot = cam_pose_inv[:3, :3]
    trans = cam_pose_inv[:3, 3]
    cam_pts = vox_world @ rot.T + trans  # (N, 3)
    pix_z = cam_pts[:, 2]
    safe_z = jnp.where(pix_z == 0, 1e-12, pix_z)
    pix_x = jnp.round(cam_pts[:, 0] * cam_intr[0, 0] / safe_z + cam_intr[0, 2]).astype(jnp.int32)
    pix_y = jnp.round(cam_pts[:, 1] * cam_intr[1, 1] / safe_z + cam_intr[1, 2]).astype(jnp.int32)
    valid_pix = (
        (pix_x >= 0) & (pix_x < im_w) & (pix_y >= 0) & (pix_y < im_h) & (pix_z > 0)
    )
    lin = jnp.clip(pix_y, 0, im_h - 1) * im_w + jnp.clip(pix_x, 0, im_w - 1)
    depth_val = jnp.where(valid_pix, depth_im.reshape(-1)[lin], 0.0)
    depth_diff = depth_val - pix_z
    valid = (depth_val > 0) & (depth_diff >= -trunc_margin)
    dist = jnp.clip(depth_diff / trunc_margin, -1.0, 1.0)

    w_old = state["weight"]
    tsdf_old = state["tsdf"]
    w_new = jnp.where(valid, w_old + obs_weight, w_old)
    tsdf_new = jnp.where(
        valid,
        (w_old * tsdf_old + obs_weight * dist) / jnp.maximum(w_new, 1e-12),
        tsdf_old,
    )
    color_new = jnp.where(valid, color_im.reshape(-1, 3)[lin].T, 0.0)  # (3, N)
    color_upd = jnp.minimum(
        255.0,
        jnp.round(
            (w_old[None] * state["color"] + obs_weight * color_new)
            / jnp.maximum(w_new[None], 1e-12)
        ),
    )
    color = jnp.where(valid[None], color_upd, state["color"])
    return {"tsdf": tsdf_new, "weight": w_new, "color": color}


class TSDFVolume:
    """Stateful convenience wrapper over the jitted integrate step.

    Constructor matches the reference API: ``vol_bnds`` (3, 2) xyz min/max
    in meters, ``voxel_size`` in meters (fusion.py:38-83).
    """

    def __init__(self, vol_bnds, voxel_size: float):
        vol_bnds = np.asarray(vol_bnds, dtype=np.float64)
        assert vol_bnds.shape == (3, 2)
        assert (vol_bnds[:, 0] < vol_bnds[:, 1]).all()
        self._voxel_size = float(voxel_size)
        self._trunc_margin = 5.0 * self._voxel_size
        self._vol_dim = np.ceil(
            (vol_bnds[:, 1] - vol_bnds[:, 0]) / self._voxel_size
        ).astype(int)
        vol_bnds[:, 1] = vol_bnds[:, 0] + self._vol_dim * self._voxel_size
        self._vol_bnds = vol_bnds
        self._vol_origin = vol_bnds[:, 0].astype(np.float32)

        n = int(np.prod(self._vol_dim))
        xv, yv, zv = np.meshgrid(
            np.arange(self._vol_dim[0]),
            np.arange(self._vol_dim[1]),
            np.arange(self._vol_dim[2]),
            indexing="ij",
        )
        vox_coords = np.stack(
            [xv.reshape(-1), yv.reshape(-1), zv.reshape(-1)], axis=1
        ).astype(np.float32)
        self._vox_world = jnp.asarray(
            self._vol_origin[None] + self._voxel_size * vox_coords
        )
        self._state = {
            "tsdf": -jnp.ones((n,), jnp.float32),
            "weight": jnp.zeros((n,), jnp.float32),
            "color": jnp.zeros((3, n), jnp.float32),
        }

    @property
    def voxel_size(self) -> float:
        return self._voxel_size

    @property
    def vol_dim(self) -> np.ndarray:
        return self._vol_dim

    @property
    def vol_origin(self) -> np.ndarray:
        return self._vol_origin

    def integrate(self, color_im, depth_im, cam_intr, cam_pose, obs_weight=1.0):
        """Fuse one RGB-D frame (reference fusion.py:121-195)."""
        depth_im = np.asarray(depth_im, dtype=np.float32)
        if color_im is None:
            color_im = np.zeros(depth_im.shape + (3,), np.float32)
        color_im = np.asarray(color_im, dtype=np.float32)
        cam_pose_inv = np.linalg.inv(np.asarray(cam_pose, dtype=np.float64)).astype(
            np.float32
        )
        self._state = _integrate_step(
            self._state,
            jnp.asarray(color_im),
            jnp.asarray(depth_im),
            jnp.asarray(np.asarray(cam_intr, dtype=np.float32)),
            jnp.asarray(cam_pose_inv),
            jnp.asarray(np.float32(obs_weight)),
            self._vox_world,
            self._trunc_margin,
            depth_im.shape,
        )

    def get_volume(self):
        """(tsdf (X,Y,Z) float32, color (3,X,Y,Z) uint8) — reference layout
        after unpacking (fusion.py:197-209, channel order r,g,b)."""
        dims = tuple(self._vol_dim)
        tsdf = np.asarray(self._state["tsdf"]).reshape(dims)
        color = (
            np.asarray(self._state["color"]).reshape((3,) + dims).astype(np.uint8)
        )
        return tsdf, color

    def get_point_cloud(self) -> np.ndarray:
        """(N, 6) [x y z r g b] surface point cloud (fusion.py:211-228)."""
        tsdf, color = self.get_volume()
        verts, _ = marching_tetrahedra(tsdf, level=0.0)
        if len(verts) == 0:
            return np.zeros((0, 6), np.float32)
        vi = np.clip(
            np.round(verts).astype(int), 0, np.asarray(tsdf.shape) - 1
        )
        rgb = color[:, vi[:, 0], vi[:, 1], vi[:, 2]].T
        world = verts * self._voxel_size + self._vol_origin
        return np.hstack([world, rgb.astype(np.float32)])

    def get_mesh(self):
        """(verts, faces, norms, colors) — reference fusion.py:230-248."""
        tsdf, color = self.get_volume()
        verts, faces = marching_tetrahedra(tsdf, level=0.0)
        if len(verts) == 0:
            z3 = np.zeros((0, 3))
            return z3.astype(np.float32), np.zeros((0, 3), np.int32), z3, z3.astype(np.uint8)
        vi = np.clip(np.round(verts).astype(int), 0, np.asarray(tsdf.shape) - 1)
        colors = color[:, vi[:, 0], vi[:, 1], vi[:, 2]].T
        norms = _vertex_normals(verts, faces)
        world = verts * self._voxel_size + self._vol_origin
        return world.astype(np.float32), faces, norms, colors


def _vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals."""
    fn = np.cross(
        verts[faces[:, 1]] - verts[faces[:, 0]],
        verts[faces[:, 2]] - verts[faces[:, 0]],
    )
    vn = np.zeros_like(verts)
    for i in range(3):
        np.add.at(vn, faces[:, i], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(norm, 1e-12)


def rigid_transform(xyz: np.ndarray, transform: np.ndarray) -> np.ndarray:
    """Apply a 4x4 homogeneous transform to (N, 3) points (fusion.py:251-256)."""
    xyz_h = np.hstack([xyz, np.ones((len(xyz), 1), xyz.dtype)])
    return (xyz_h @ np.asarray(transform).T)[:, :3]


def get_view_frustum(depth_im, cam_intr, cam_pose) -> np.ndarray:
    """(3, 5) world-frame view-frustum corners of a depth image
    (reference fusion.py:258-275)."""
    im_h, im_w = depth_im.shape
    max_depth = float(np.max(depth_im))
    cam_intr = np.asarray(cam_intr, dtype=np.float64)
    corners_pix = np.array(
        [[0, 0], [im_w, 0], [im_w, im_h], [0, im_h]], dtype=np.float64
    )
    pts = [np.zeros(3)]
    for u, v in corners_pix:
        x = (u - cam_intr[0, 2]) * max_depth / cam_intr[0, 0]
        y = (v - cam_intr[1, 2]) * max_depth / cam_intr[1, 1]
        pts.append(np.array([x, y, max_depth]))
    pts = np.stack(pts, axis=0)
    return rigid_transform(pts, cam_pose).T


def meshwrite(filename, verts, faces, norms, colors):
    """ASCII PLY mesh writer (reference fusion.py:278-308 output format)."""
    with open(filename, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write(
            "property float x\nproperty float y\nproperty float z\n"
            "property float nx\nproperty float ny\nproperty float nz\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        )
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_index\nend_header\n")
        for v, n, c in zip(verts, norms, colors):
            f.write(
                f"{v[0]:f} {v[1]:f} {v[2]:f} {n[0]:f} {n[1]:f} {n[2]:f} "
                f"{int(c[0])} {int(c[1])} {int(c[2])}\n"
            )
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def pcwrite(filename, xyzrgb):
    """ASCII PLY point-cloud writer (reference fusion.py:311-334 format)."""
    xyz, rgb = xyzrgb[:, :3], xyzrgb[:, 3:].astype(np.uint8)
    with open(filename, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(xyz)}\n")
        f.write(
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        )
        f.write("end_header\n")
        for p, c in zip(xyz, rgb):
            f.write(f"{p[0]:f} {p[1]:f} {p[2]:f} {int(c[0])} {int(c[1])} {int(c[2])}\n")
