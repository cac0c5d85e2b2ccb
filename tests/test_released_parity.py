"""Released-checkpoint golden parity — consumed only when fixtures exist.

`scripts/make_parity_fixture.py` converts the reference's released
artifacts (ViT-B-32.pt / ovssc.pth / vool.pth — not shipped in this image)
and freezes golden outputs on fixed batches. These tests re-run the same
batches and assert the outputs are unchanged, turning checkpoint parity
into a CI property the moment the artifacts are dropped into
tests/fixtures/released/. Reference artifacts: README.md:120-173.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "released")


def _fixture(name):
    path = os.path.join(FIXTURE_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"no released-checkpoint fixture at {path} "
                    "(run scripts/make_parity_fixture.py with the artifacts)")
    return np.load(path, allow_pickle=True)


def test_clip_released_golden():
    g = _fixture("clip_golden.npz")
    clip_path = os.environ.get("SEMABS_CLIP_CKPT", "")
    if not os.path.exists(clip_path):
        pytest.skip("set SEMABS_CLIP_CKPT to the ViT-B-32.pt used for the fixture")
    from semantic_abstraction_tpu.clip import load_clip_checkpoint
    from semantic_abstraction_tpu.clip.model import encode_image, encode_text
    from semantic_abstraction_tpu.clip.relevancy import gradcam

    params, cfg = load_clip_checkpoint(clip_path)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    img_feats = np.asarray(encode_image(params, jnp.asarray(g["pixels"]), cfg))
    np.testing.assert_allclose(img_feats, g["img_feats"], atol=1e-4, rtol=1e-3)
    txt_feats = np.asarray(
        encode_text(params["text"], jnp.asarray(g["tokens"]), cfg)
    )
    np.testing.assert_allclose(txt_feats, g["txt_feats"], atol=1e-4, rtol=1e-3)
    zw = txt_feats / np.linalg.norm(txt_feats, axis=-1, keepdims=True)
    rel = np.asarray(
        gradcam(params["visual"], jnp.asarray(g["pixels"]), jnp.asarray(zw.T),
                cfg, num_layers=10)
    )
    np.testing.assert_allclose(rel, g["rel"], atol=1e-4, rtol=1e-3)


def test_ovssc_released_golden():
    g = _fixture("ovssc_golden.npz")
    ckpt = os.environ.get("SEMABS_OVSSC_CKPT", "")
    if not os.path.exists(ckpt):
        pytest.skip("set SEMABS_OVSSC_CKPT to the ovssc.pth used for the fixture")
    from semantic_abstraction_tpu.models import SemAbs3DConfig, semabs3d_forward
    from semantic_abstraction_tpu.models.convert import load_torch_net_checkpoint

    params, _ = load_torch_net_checkpoint(ckpt, "ovssc", "semantic_abstraction")
    logits = np.asarray(
        semabs3d_forward(params, SemAbs3DConfig(), jnp.asarray(g["xyz"]),
                         jnp.asarray(g["feats"]), jnp.asarray(g["out_pts"]),
                         compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(logits, g["logits"], atol=1e-4, rtol=1e-3)


def test_vool_released_golden():
    g = _fixture("vool_golden.npz")
    ckpt = os.environ.get("SEMABS_VOOL_CKPT", "")
    if not os.path.exists(ckpt):
        pytest.skip("set SEMABS_VOOL_CKPT to the vool.pth used for the fixture")
    from semantic_abstraction_tpu.models import (
        SemAbsVOOLConfig,
        semabs_vool_forward,
    )
    from semantic_abstraction_tpu.models.convert import load_torch_net_checkpoint

    params, _ = load_torch_net_checkpoint(ckpt, "vool", "semantic_abstraction")
    logits = np.asarray(
        semabs_vool_forward(params, SemAbsVOOLConfig(), jnp.asarray(g["xyz"]),
                            jnp.asarray(g["tgt"]), jnp.asarray(g["ref"]),
                            jnp.asarray(g["out_pts"]),
                            jnp.asarray(g["rel_id"]),
                            compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(logits, g["logits"], atol=1e-4, rtol=1e-3)
