"""Executes the THOR datagen DRIVER end to end against a mock ai2thor
(the Unity binary is absent from this image): run_simulator's teleport
loop + quality heuristics + reflective-depth inpainting + DR captures,
generate_datapoint's resume skip, and main()'s task fan-out — the code
paths test_datagen_pipeline.py (which starts downstream, from a
ready-made datapoint) cannot reach. Reference: generate_thor_data.py
:695-814 (run_simulator), :1021-1186 (task pool + resume).
"""
import os
import pickle

import h5py
import numpy as np
import pytest

import mock_ai2thor
from semantic_abstraction_tpu.data.transforms import compose_affine, euler2mat
from semantic_abstraction_tpu.datagen.naming import class_reduction_rule
from semantic_abstraction_tpu.datagen.scene import (
    TEST_SCENES,
    gt_alignment_transform,
)

DIST = 3.0


@pytest.fixture()
def thor_mock():
    ctrl = mock_ai2thor.install()
    yield ctrl
    mock_ai2thor.uninstall()


def _write_exported_pkl(exp_dir, scene_id, rng):
    """A parse_exported_gt-schema cache for one scene: a GT cloud filling
    the aligned scene bounds whose raw object ids are exactly the mock's
    THOR objectIds (direct-name remap path)."""
    cam_pose = compose_affine(np.zeros(3), euler2mat(0, 0, 0), np.ones(3))
    transform = gt_alignment_transform(cam_pose, DIST)
    inv = np.linalg.inv(transform)
    n = 24000
    world_aligned = rng.uniform([-0.9, -0.9, 0.0], [0.9, 0.9, 1.8], (n, 3))
    original = world_aligned @ inv[:3, :3].T + inv[:3, 3]
    raw_ids = np.array(["empty"] * n, dtype=object)
    raw_ids[: n // 4] = mock_ai2thor.MUG
    raw_ids[n // 4 : n // 2] = mock_ai2thor.TABLE
    raw_ids[n // 2 : 5 * n // 8] = mock_ai2thor.WALL
    raw_ids[5 * n // 8 : 3 * n // 4] = mock_ai2thor.FLOOR
    raw_ids = list(raw_ids)
    unique_ids = sorted(set(raw_ids))
    labels = [class_reduction_rule(r) for r in raw_ids]
    unique_labels = sorted(set(labels))
    gt = {
        "full_xyz_pts": original,
        "full_objid_pts": raw_ids,
        "objids": unique_ids,
        "semantic": np.array([unique_labels.index(l) for l in labels], int),
        "labels": labels,
        "unique_labels": unique_labels,
        "objid_to_class": [class_reduction_rule(u) for u in unique_ids],
        "receptacle_masks": {
            mock_ai2thor.TABLE: np.array(
                [r == mock_ai2thor.TABLE for r in raw_ids]
            ),
        },
    }
    with open(os.path.join(exp_dir, f"{scene_id}.pkl"), "wb") as f:
        pickle.dump(gt, f)


def test_driver_end_to_end(thor_mock, tmp_path):
    from semantic_abstraction_tpu.cli import generate_thor_data
    from semantic_abstraction_tpu.datagen.scene import (
        FOV_W,
        HEIGHT,
        WIDTH,
    )

    exp = tmp_path / "exported"
    out = tmp_path / "out"
    exp.mkdir()
    rng = np.random.RandomState(0)
    for scene_id in TEST_SCENES[:2]:
        _write_exported_pkl(str(exp), scene_id, rng)

    generate_thor_data.main([
        str(out), "--exported-scenes", str(exp),
        "--num-datapoints", "2", "--workers", "1", "--test-only",
        "--num-output-pts", "4000",
    ])

    files = sorted(out.glob("*.hdf5"))
    assert len(files) == 2
    assert {f.name for f in files} == {
        f"{TEST_SCENES[0]}_0.hdf5", f"{TEST_SCENES[1]}_1.hdf5",
    }

    # ctor configuration parity with the reference run_simulator
    assert len(thor_mock.created) == 2
    for kw in thor_mock.created:
        assert kw["width"] == WIDTH and kw["height"] == HEIGHT
        assert kw["fieldOfView"] == FOV_W
        assert kw["renderDepthImage"] and kw["renderInstanceSegmentation"]
        assert kw["gridSize"] == 0.05 and kw["rotateStepDegrees"] == 5
        assert kw["agentMode"] == "default"
        assert kw["platform"] is mock_ai2thor.CloudRendering

    with h5py.File(str(files[0]), "r") as f:
        # reflective strip (>10 m) must be inpainted before storage
        depth = np.array(f["depth"][0])
        assert depth.max() <= 10.0
        # TEST_SCENES run domain-randomized: DR frame captured via the
        # double RandomizeMaterials step
        assert "data/domain_randomized_rgb" in f
        names = np.array(
            f["data/descriptions/target_obj_name"]
        ).astype(str)
        assert len(names) > 0
        classes = np.array(f["data/objid_to_class"]).astype(str)
        assert any("mug" in c for c in classes)

    # the first teleport was wall-dominant -> rejected; driver re-sampled,
    # captured the DR frame with a double RandomizeMaterials, and stopped
    # the controller
    assert all(c["scene"] in TEST_SCENES[:2] for c in thor_mock.created)
    for inst in thor_mock.instances:
        assert inst.teleports >= 2
        assert inst.randomize_calls == 2
        assert inst.stopped

    # resume: a second sweep skips existing files untouched
    mtimes = {f.name: f.stat().st_mtime for f in files}
    generate_thor_data.main([
        str(out), "--exported-scenes", str(exp),
        "--num-datapoints", "2", "--workers", "1", "--test-only",
        "--num-output-pts", "4000",
    ])
    assert len(thor_mock.created) == 2  # no new controllers spawned
    for f in sorted(out.glob("*.hdf5")):
        assert f.stat().st_mtime == mtimes[f.name]
