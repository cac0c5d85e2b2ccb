"""Parity tests for the implicit decoder and pointing attention.

The reference net.py cannot be imported (it requires torch_scatter /
torchtyping, absent from this image), so the oracle is torch itself:
``torch.nn.functional.grid_sample`` + a transcription of the reference
forward math (net.py:204-316).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semantic_abstraction_tpu.models import (
    implicit_decoder,
    init_implicit_decoder,
    init_pointing_attention,
    pointing_attention,
    pointing_attention_paired,
)
from semantic_abstraction_tpu.ops import VoxelGrid

torch = pytest.importorskip("torch")

SCENE_BOUNDS = ((-1.0, -1.0, -0.1), (1.0, 1.0, 1.9))


def _torch_reference_decoder(params, vol, grid, query_points, concat_xyz):
    """Reference ImplicitVolumetricDecoder.forward (net.py:215-256) in torch."""
    t_vol = torch.from_numpy(vol)
    lower = torch.tensor(grid.lower)
    upper = torch.tensor(grid.upper)
    shape = torch.tensor(grid.grid_shape, dtype=torch.float32)
    qp = torch.from_numpy(query_points)
    idx = (qp - lower) * ((shape - 1) / (upper - lower))
    idx = torch.clamp(idx, torch.zeros(3), shape - 1)
    qn = 2.0 * (idx / shape) - 1.0
    g = qn.view(qn.shape[0], qn.shape[1], 1, 1, 3)
    sampled = torch.nn.functional.grid_sample(
        t_vol, g, mode="bilinear", padding_mode="border", align_corners=True
    )
    sampled = sampled.view(sampled.shape[:3]).permute(0, 2, 1)
    b, n, c = sampled.shape
    feats = sampled.reshape(b * n, c)
    if concat_xyz:
        feats = torch.cat([feats, qn.reshape(b * n, 3)], dim=-1)
    w1 = torch.from_numpy(np.array(params["fc1"]["w"]))
    b1 = torch.from_numpy(np.array(params["fc1"]["b"]))
    w2 = torch.from_numpy(np.array(params["fc2"]["w"]))
    b2 = torch.from_numpy(np.array(params["fc2"]["b"]))
    h = torch.nn.functional.leaky_relu(feats @ w1 + b1)
    out = h @ w2 + b2
    return out.view(b, n, -1).numpy()


@pytest.mark.parametrize("concat_xyz", [False, True])
def test_implicit_decoder_matches_torch(concat_xyz):
    rs = np.random.RandomState(0)
    grid = VoxelGrid(lower=SCENE_BOUNDS[0], upper=SCENE_BOUNDS[1], grid_shape=(6, 5, 7))
    vol = rs.randn(2, 4, 6, 5, 7).astype(np.float32)
    # points both inside and outside the bounds (exercise border clamping)
    pts = rs.uniform(-1.6, 2.4, size=(2, 64, 3)).astype(np.float32)
    params = init_implicit_decoder(jax.random.PRNGKey(0), 4, 3, concat_xyz)
    ref = _torch_reference_decoder(params, vol, grid, pts, concat_xyz)
    out = np.asarray(
        implicit_decoder(params, jnp.asarray(vol), grid, jnp.asarray(pts), concat_xyz)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_pointing_cosine_matches_torch():
    rs = np.random.RandomState(1)
    key = rs.randn(3, 10, 8).astype(np.float32)
    query = rs.randn(3, 1, 8).astype(np.float32)
    # reference prep_input (net.py:275-292): key -> (B, K, 1, D),
    # query -> (B, 1, Q, D)
    ref = (
        torch.cosine_similarity(
            torch.from_numpy(key).unsqueeze(2),
            torch.from_numpy(query).unsqueeze(1),
            dim=-1,
        )
        / 0.07
    ).numpy()
    out = np.asarray(
        pointing_attention({}, jnp.asarray(key), jnp.asarray(query), "cosine_sim")
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_pointing_paired_ovssc_shape():
    # key (B, P, E) paired against query (B, P, M, E): the OVSSC pointer
    rs = np.random.RandomState(2)
    feats = jnp.asarray(rs.randn(2, 3, 11, 8).astype(np.float32))
    classes = jnp.asarray(rs.randn(2, 3, 8).astype(np.float32))
    out = pointing_attention_paired({}, classes, feats, "cosine_sim")
    assert out.shape == (2, 3, 11)
    # row 0 should equal the manual cosine sim
    k = np.asarray(classes[0, 0])
    q = np.asarray(feats[0, 0, 4])
    cos = (k @ q) / (np.linalg.norm(k) * np.linalg.norm(q)) / 0.07
    np.testing.assert_allclose(np.asarray(out)[0, 0, 4], cos, rtol=1e-4)


def test_pointing_dot_and_additive():
    rs = np.random.RandomState(3)
    key = jnp.asarray(rs.randn(2, 5, 4).astype(np.float32))
    query = jnp.asarray(rs.randn(2, 1, 4).astype(np.float32))
    dot = pointing_attention({}, key, query, "dot_product", pointing_dim=4)
    manual = (np.asarray(key)[:, :, None] * np.asarray(query)[:, None]).sum(-1) / 2.0
    np.testing.assert_allclose(np.asarray(dot), manual, atol=1e-5, rtol=1e-5)
    params = init_pointing_attention(jax.random.PRNGKey(0), 4, "additive")
    add = pointing_attention(params, key, query, "additive")
    assert add.shape == (2, 5, 1)
