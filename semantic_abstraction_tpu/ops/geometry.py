"""Point-cloud geometry primitives, pure JAX.

TPU-native replacement for the reference's numpy/numba geometry layer
(reference: point_cloud.py). Everything here is shape-static, jit-safe and
vmappable; masks are returned instead of ragged filtered arrays so results
stay fixed-shape inside ``jit``.

Parity notes (reference file:line):
- depth_to_pointcloud   <- point_cloud.py:34-66  (get_pointcloud)
- transform_pointcloud  <- point_cloud.py:8-21
- filter_pts_bounds     <- point_cloud.py:24-31
- project_pts_to_2d     <- point_cloud.py:69-85
- check_pts_in_frustum  <- point_cloud.py:88-110
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def transform_pointcloud(xyz_pts: jax.Array, rigid_transform: jax.Array) -> jax.Array:
    """Apply a rigid transform (3x4 or 4x4) to an (..., N, 3) point cloud."""
    rot = rigid_transform[..., :3, :3]
    trans = rigid_transform[..., :3, 3]
    # geometry must not be downcast to bf16 by TPU default matmul precision
    rotated = jnp.einsum(
        "...nj,...ij->...ni", xyz_pts, rot, precision=jax.lax.Precision.HIGHEST
    )
    return rotated + trans[..., None, :]


def filter_pts_bounds(xyz_pts: jax.Array, bounds: jax.Array) -> jax.Array:
    """Boolean mask of points inside axis-aligned ``bounds`` ((2,3): lower, upper).

    Inclusive on both ends, matching the reference.
    """
    lower, upper = bounds[0], bounds[1]
    return jnp.all((xyz_pts >= lower) & (xyz_pts <= upper), axis=-1)


def depth_to_pointcloud(
    depth_img: jax.Array,
    cam_intr: jax.Array,
    cam_pose: jax.Array | None = None,
) -> jax.Array:
    """Unproject an (H, W) depth image to an (H*W, 3) point cloud.

    Points are in camera coordinates, or world coordinates if ``cam_pose``
    (3x4 or 4x4 camera-to-world) is given.
    """
    img_h, img_w = depth_img.shape
    pixel_y, pixel_x = jnp.meshgrid(
        jnp.arange(img_h, dtype=depth_img.dtype),
        jnp.arange(img_w, dtype=depth_img.dtype),
        indexing="ij",
    )
    z = depth_img
    x = (pixel_x - cam_intr[0, 2]) * z / cam_intr[0, 0]
    y = (pixel_y - cam_intr[1, 2]) * z / cam_intr[1, 1]
    cam_pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    if cam_pose is not None:
        cam_pts = transform_pointcloud(cam_pts, cam_pose)
    return cam_pts


def project_pts_to_2d(
    pts: jax.Array, camera_view_matrix: jax.Array, camera_intrinsic: jax.Array
) -> jax.Array:
    """Project (N, 3) world points to (N, 3) of (row, col, depth).

    Follows the reference's OpenGL-style convention: after the world->camera
    view transform, y and z are negated before applying intrinsics, and the
    output is ordered (pix_y, pix_x, cam_z).
    """
    pts_c = transform_pointcloud(pts, camera_view_matrix[:3, :])
    flip = jnp.asarray([1.0, -1.0, -1.0], dtype=pts_c.dtype)
    pts_flipped = pts_c * flip
    coords = jnp.einsum(
        "nj,ij->ni", pts_flipped, camera_intrinsic, precision=jax.lax.Precision.HIGHEST
    )
    pix = coords[:, :2] / coords[:, 2:3]
    return jnp.stack([pix[:, 1], pix[:, 0], pts_flipped[:, 2]], axis=-1)


def check_pts_in_frustum(
    xyz_pts: jax.Array,
    depth_shape: tuple,
    cam_pose: jax.Array,
    cam_intr: jax.Array,
) -> jax.Array:
    """Boolean mask of world points inside the camera view frustum.

    ``depth_shape`` is the static (H, W) of the depth image. The camera pose
    is camera-to-world (4x4); points are moved into camera frame with its
    inverse, then tested against image bounds with z > 0.
    """
    h, w = depth_shape
    cam_pts = transform_pointcloud(xyz_pts, jnp.linalg.inv(cam_pose))
    pix_z = cam_pts[..., 2]
    pix_x = cam_intr[0, 0] / pix_z * cam_pts[..., 0] + cam_intr[0, 2]
    pix_y = cam_intr[1, 1] / pix_z * cam_pts[..., 1] + cam_intr[1, 2]
    return (
        (pix_x >= 0) & (pix_x < w) & (pix_y >= 0) & (pix_y < h) & (pix_z > 0)
    )
