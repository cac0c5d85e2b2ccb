"""Quantitative mesh-parity for ops/marching.py vs the reference mesher's
semantics (skimage marching_cubes_lewiner, reference fusion.py:232-248,
visualize.py:251-280).

skimage is absent from this image and vendoring its 256-case tables would
be a copy, so the tie is made through the INVARIANTS both meshers share —
"the zero level set of the volume, vertices by linear interpolation along
sign-crossing edges, in voxel-index coordinates":

- On a LINEAR field, linear edge interpolation is EXACT, so every vertex
  must sit on the analytic plane to float precision and the patch must
  tile its full cross-section area. Any deviation from the reference's
  interpolation rule shows up here exactly, not within-tolerance.
- On a sphere, the enclosed volume (divergence theorem) and area must
  match the analytic values to discretization error, every vertex must
  lie within interpolation error of the analytic zero set, and the mesh
  must be watertight with Euler characteristic 2.
- On a torus, Euler characteristic 0 — topology-correct extraction, the
  property marching-cubes-lewiner exists to guarantee.
"""
import numpy as np

from semantic_abstraction_tpu.ops.marching import marching_tetrahedra


def _edge_counts(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    und = np.sort(e, axis=1)
    _, counts = np.unique(und, axis=0, return_counts=True)
    return counts, len(np.unique(und, axis=0))


def _signed_volume(verts, faces):
    """Divergence-theorem volume of a closed triangle mesh."""
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    return float(np.einsum("ij,ij->", a, np.cross(b, c)) / 6.0)


def _area(verts, faces):
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    return float(np.linalg.norm(np.cross(b - a, c - a), axis=1).sum() / 2.0)


def test_plane_exact_interpolation():
    """Linear TSDF phi = x - c: interpolated vertices must have x == c to
    float precision (linear interpolation is exact on linear fields — the
    rule both meshers define vertices by), and the triangles must tile the
    full (ny-1)x(nz-1) cross-section."""
    n = 12
    c = 5.3125  # exactly representable, strictly inside a cell
    g = np.arange(n, dtype=np.float32)
    phi = np.broadcast_to(
        (g - c)[:, None, None], (n, n, n)
    ).astype(np.float32)
    verts, faces = marching_tetrahedra(phi, level=0.0)
    assert len(faces) > 0
    np.testing.assert_allclose(verts[:, 0], c, atol=1e-5)
    # the patch covers the full cross-section: area == (n-1)^2 in voxel
    # units (triangles tile the plane without overlap)
    np.testing.assert_allclose(_area(verts, faces), (n - 1) ** 2, rtol=1e-5)
    # y/z verts stay inside the grid
    assert verts[:, 1:].min() >= 0.0 and verts[:, 1:].max() <= n - 1


def test_sphere_volume_area_and_vertex_distance():
    n, r = 40, 14.0
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    center = (n - 1) / 2.0
    phi = np.sqrt(((g - center) ** 2).sum(axis=0)) - r
    verts, faces = marching_tetrahedra(phi, level=0.0)

    # every vertex within linear-interp error of the analytic zero set
    d = np.abs(np.sqrt(((verts - center) ** 2).sum(axis=1)) - r)
    assert d.max() < 0.05, d.max()

    # closed, consistently oriented mesh enclosing the analytic volume
    vol = _signed_volume(verts - center, faces)
    assert abs(abs(vol) - 4.0 / 3.0 * np.pi * r**3) < 0.01 * (
        4.0 / 3.0 * np.pi * r**3
    )
    # area within discretization error of 4*pi*r^2 (piecewise-linear
    # chords slightly underestimate a curved surface)
    area = _area(verts, faces)
    assert abs(area - 4 * np.pi * r**2) < 0.04 * (4 * np.pi * r**2)


def test_sphere_watertight_euler():
    n, r = 24, 8.0
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    center = (n - 1) / 2.0
    phi = np.sqrt(((g - center) ** 2).sum(axis=0)) - r
    verts, faces = marching_tetrahedra(phi, level=0.0)
    counts, n_edges = _edge_counts(faces)
    assert (counts == 2).all(), "mesh not watertight"
    # V - E + F == 2 for a sphere
    assert len(verts) - n_edges + len(faces) == 2


def test_torus_euler_characteristic():
    n = 48
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    center = (n - 1) / 2.0
    x, y, z = g[0] - center, g[1] - center, g[2] - center
    R, r = 14.0, 5.0
    phi = (np.sqrt(x**2 + y**2) - R) ** 2 + z**2 - r**2
    verts, faces = marching_tetrahedra(phi, level=0.0)
    counts, n_edges = _edge_counts(faces)
    assert (counts == 2).all(), "mesh not watertight"
    # V - E + F == 0 for a torus (genus 1)
    assert len(verts) - n_edges + len(faces) == 0
    # and the volume matches 2*pi^2*R*r^2 to discretization error
    vol = abs(_signed_volume(verts - center, faces))
    analytic = 2 * np.pi**2 * R * r**2
    assert abs(vol - analytic) < 0.02 * analytic


def test_world_transform_matches_reference():
    """TSDFVolume.get_mesh maps voxel-index verts to world coordinates as
    ``verts * voxel_size + vol_origin`` (reference fusion.py:236-238)."""
    from semantic_abstraction_tpu.ops.fusion import TSDFVolume

    bnds = np.array([[-1.0, 1.0], [-1.0, 1.0], [0.0, 2.0]])
    vol = TSDFVolume(bnds, voxel_size=0.125)
    dims = tuple(vol.vol_dim)
    g = np.mgrid[0 : dims[0], 0 : dims[1], 0 : dims[2]].astype(np.float32)
    center = (np.asarray(dims, np.float32) - 1) / 2.0
    phi = (
        np.sqrt(((g - center[:, None, None, None]) ** 2).sum(axis=0)) - 5.0
    )
    state = dict(vol._state)
    state["tsdf"] = phi.reshape(state["tsdf"].shape).astype(
        np.asarray(state["tsdf"]).dtype
    )
    vol._state = state
    world_verts, faces, _, _ = vol.get_mesh()
    voxel_verts, faces2 = marching_tetrahedra(phi, level=0.0)
    assert len(faces) == len(faces2)
    np.testing.assert_allclose(
        world_verts,
        voxel_verts * 0.125 + np.asarray(bnds[:, 0], np.float32),
        rtol=1e-6, atol=1e-6,
    )
