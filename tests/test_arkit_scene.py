"""The ONE piece of real data in this environment: the reference's README
demo scene ``/root/reference/scene_files/arkit_vn_poster.pkl`` (real ARKit
256x192 portrait RGB-D + 11 OVSSC classes + 3 VOOL descriptions; reference
README.md:262-274, visualize.py:61-154, :301-351).

Three tiers of realism evidence, all offline:

1. the scene file matches the format the reference's prep_data asserts
   (visualize.py:69-76),
2. COMPOSED saliency parity on the REAL image — our pipeline vs the
   imported reference ClipWrapper with identical converted random weights:
   real value distributions and real non-square portrait geometry rather
   than synthetic noise images,
3. end-to-end ``visualize ovssc-inference`` / ``vool-inference`` on the
   real scene (real depth -> pointcloud -> in-bounds filter -> relevancy ->
   dense decode -> meshes), asserting artifacts exist and are finite.
"""
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# re-register the shared small-CLIP fixture (module-scoped there)
from test_saliency_composed_parity import pipelines  # noqa: F401,E402

from semantic_abstraction_tpu.clip.saliency import (  # noqa: E402
    CropSpec,
    SaliencyConfig,
)

SCENE = "/root/reference/scene_files/arkit_vn_poster.pkl"


@pytest.fixture(scope="module")
def scene():
    with open(SCENE, "rb") as f:
        return pickle.load(f)


def test_arkit_scene_format(scene):
    """The exact dtypes/shapes the reference demo asserts
    (visualize.py:69-76) and the fields prep_data consumes."""
    assert scene["rgb"].dtype == np.uint8
    assert scene["rgb"].shape == (256, 192, 3)
    assert scene["depth"].dtype == np.float32
    assert scene["depth"].shape == (256, 192)
    assert scene["cam_intr"].shape == (3, 3)
    assert scene["cam_extr"].shape == (4, 4)
    assert len(scene["ovssc_obj_classes"]) == 14
    assert all(len(d) == 3 for d in scene["descriptions"])
    assert np.isfinite(scene["depth"]).all()


@pytest.mark.slow
def test_arkit_composed_saliency_parity(pipelines, scene):  # noqa: F811
    """Our assembled multi-scale pipeline vs the reference ClipWrapper on
    the REAL 256x192 portrait image (identical converted random weights,
    RNG-free config). Pins real-image value distributions + non-square
    tall geometry the synthetic parity tests never see."""
    W, ours = pipelines
    W.clip_gradcam.templates = ["a photograph of a {} in a home."]
    img = scene["rgb"]
    labels = list(scene["ovssc_obj_classes"][:3]) + [
        scene["descriptions"][0][0]
    ]
    prompts = ["a photograph of a {} in a home."]
    # reference-shaped scales (size//4 strides, ours_config geometry) that
    # fit the 192-wide portrait frame
    crops = [
        {"tile_size": 128, "stride": 32},
        {"tile_size": 64, "stride": 16},
    ]
    ref_maps, _ = W.get_clip_saliency(
        img=img,
        text_labels=labels,
        prompts=prompts,
        horizontal_flipping=False,
        positive_attn_only=True,
        augmentations=0,
        cropping_augmentations=crops,
    )
    ref_maps = ref_maps.float().numpy()

    config = SaliencyConfig(
        crops=(CropSpec(128, 32), CropSpec(64, 16)),
        horizontal_flipping=False,
        augmentations=0,
    )
    maps, _ = ours.get_clip_saliency(img, labels, tuple(prompts), config)
    maps = np.asarray(maps).astype(np.float32)

    assert maps.shape == ref_maps.shape == (len(labels), 256, 192)
    scale = np.abs(ref_maps).max()
    np.testing.assert_allclose(maps, ref_maps, atol=2e-2 * scale, rtol=2e-2)
    cc = np.corrcoef(maps.ravel(), ref_maps.ravel())[0, 1]
    assert cc > 0.999, cc


def _cheap_config(img_dim):
    """ViT-B/32-sized but CPU-affordable sweep for the E2E runs: one real
    multi-tile scale, RNG-free."""
    del img_dim
    return SaliencyConfig(
        crops=(CropSpec(96, 48),), horizontal_flipping=False, augmentations=0
    )


def _assert_finite_mesh(path):
    verts = [
        [float(x) for x in line.split()[1:4]]
        for line in open(path)
        if line.startswith("v ")
    ]
    assert verts, f"{path} has no vertices"
    assert np.isfinite(np.asarray(verts)).all(), path


@pytest.mark.slow
def test_arkit_visualize_ovssc_inference(tmp_path, monkeypatch, scene):
    """README demo, OVSSC half (reference visualize.py:301-351): the real
    pickle through prep_data (real depth -> in-bounds pointcloud), a
    random-weight ViT-B/32 relevancy sweep over all 14 real labels, dense
    inference, and obj export. Artifacts must exist and be finite."""
    from semantic_abstraction_tpu.clip import saliency_configs
    from semantic_abstraction_tpu.cli import visualize

    monkeypatch.setitem(saliency_configs, "chefer_et_al", _cheap_config)
    visualize.main([
        "ovssc-inference", SCENE,
        "--dump-path", str(tmp_path / "vis"),
        "--voxel_shape", "16", "16", "16",
        "--sampling_shape", "24", "24", "24",
        "--num_input_pts", "512",
        "--random-weights", "--saliency_config", "chefer_et_al",
        "--compute_dtype", "float32",
        "--cutoff", "-100",  # random weights: force non-empty prediction
    ])
    out_dir = tmp_path / "vis" / "arkit_vn_poster"
    assert out_dir.exists()
    objs = list(out_dir.rglob("*.obj"))
    assert objs, "no meshes produced from the real scene"
    for p in objs:
        _assert_finite_mesh(p)


@pytest.mark.slow
def test_arkit_visualize_vool_inference(tmp_path, monkeypatch, scene):
    """README demo, VOOL half: the 3 real descriptions ('sun screen bottle
    in pink make up bag', ...) through vool-inference; each must yield a
    finite localization pointcloud plus the scene_rgb export."""
    from semantic_abstraction_tpu.clip import saliency_configs
    from semantic_abstraction_tpu.cli import visualize

    monkeypatch.setitem(saliency_configs, "chefer_et_al", _cheap_config)
    visualize.main([
        "vool-inference", SCENE,
        "--dump-path", str(tmp_path / "vis"),
        "--voxel_shape", "16", "16", "16",
        "--sampling_shape", "16", "16", "16",
        "--num_input_pts", "512",
        "--random-weights", "--saliency_config", "chefer_et_al",
        "--compute_dtype", "float32",
    ])
    out_dir = tmp_path / "vis" / "arkit_vn_poster"
    plys = {p.stem for p in out_dir.glob("*.ply")}
    assert "scene_rgb" in plys
    expected = {
        f"{t}_{r}_{f}".replace(" ", "_")
        for t, r, f in scene["descriptions"]
    }
    # at least every real description produced an artifact
    missing = {e for e in expected if not any(e in p for p in plys)}
    assert not missing, (missing, plys)
