"""Golden tests: geometry ops vs independent numpy implementations.

The numpy oracles below mirror the reference's documented behavior
(point_cloud.py) and are computed with plain numpy so the JAX ops are
validated independently of torch.
"""
import numpy as np
import jax.numpy as jnp

from semantic_abstraction_tpu.ops import (
    transform_pointcloud,
    filter_pts_bounds,
    depth_to_pointcloud,
    project_pts_to_2d,
    check_pts_in_frustum,
)


def random_pose(rng):
    # random rotation via QR + random translation
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pose = np.eye(4)
    pose[:3, :3] = q
    pose[:3, 3] = rng.normal(size=3)
    return pose.astype(np.float32)


def test_transform_pointcloud_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pose = random_pose(rng)
    expected = (pose[:3, :3] @ pts.T).T + pose[:3, 3]
    got = np.asarray(transform_pointcloud(jnp.asarray(pts), jnp.asarray(pose)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_filter_pts_bounds_inclusive():
    bounds = np.array([[-1.0, -1.0, -0.1], [1.0, 1.0, 1.9]], np.float32)
    pts = np.array(
        [[0, 0, 0], [1.0, 1.0, 1.9], [-1.0, -1.0, -0.1], [1.0001, 0, 0], [0, 0, -0.2]],
        np.float32,
    )
    got = np.asarray(filter_pts_bounds(jnp.asarray(pts), jnp.asarray(bounds)))
    np.testing.assert_array_equal(got, [True, True, True, False, False])


def test_depth_to_pointcloud_roundtrip():
    rng = np.random.default_rng(1)
    h, w = 12, 17
    depth = rng.uniform(0.5, 3.0, size=(h, w)).astype(np.float32)
    intr = np.array([[50.0, 0, 8.0], [0, 55.0, 6.0], [0, 0, 1.0]], np.float32)
    pose = random_pose(rng)

    # numpy oracle (reference get_pointcloud semantics)
    px, py = np.meshgrid(np.arange(w), np.arange(h))
    x = (px - intr[0, 2]) * depth / intr[0, 0]
    y = (py - intr[1, 2]) * depth / intr[1, 1]
    cam = np.stack([x, y, depth], -1).reshape(-1, 3)
    world = (pose[:3, :3] @ cam.T).T + pose[:3, 3]

    got = np.asarray(
        depth_to_pointcloud(jnp.asarray(depth), jnp.asarray(intr), jnp.asarray(pose))
    )
    np.testing.assert_allclose(got, world, atol=1e-4)


def test_frustum_check():
    rng = np.random.default_rng(2)
    h, w = 24, 32
    intr = np.array([[30.0, 0, 16.0], [0, 30.0, 12.0], [0, 0, 1.0]], np.float32)
    pose = np.eye(4, dtype=np.float32)  # camera at origin looking +z
    pts = rng.uniform(-3, 3, size=(500, 3)).astype(np.float32)
    got = np.asarray(
        check_pts_in_frustum(jnp.asarray(pts), (h, w), jnp.asarray(pose), jnp.asarray(intr))
    )
    z = pts[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        px = intr[0, 0] / z * pts[:, 0] + intr[0, 2]
        py = intr[1, 1] / z * pts[:, 1] + intr[1, 2]
    expected = (px >= 0) & (px < w) & (py >= 0) & (py < h) & (z > 0)
    np.testing.assert_array_equal(got, expected)


def test_project_pts_to_2d_center():
    intr = np.array([[100.0, 0, 0.0], [0, 100.0, 0.0], [0, 0, 1.0]], np.float32)
    view = np.eye(4, dtype=np.float32)
    # a point on the (flipped) optical axis: world (0, 0, -2) -> cam z=+2 after flip
    pts = np.array([[0.0, 0.0, -2.0]], np.float32)
    out = np.asarray(project_pts_to_2d(jnp.asarray(pts), jnp.asarray(view), jnp.asarray(intr)))
    np.testing.assert_allclose(out, [[0.0, 0.0, 2.0]], atol=1e-6)
