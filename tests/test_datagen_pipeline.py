"""Full datagen pipeline without the Unity simulator: a synthetic
"datapoint" (what run_simulator returns) + fake exporter dumps ->
scene_data_from_thor_datapoint -> write_scene_hdf5 -> generate_relevancy
dataset -> SceneCompletionDataset -> one train step."""
import os
import pickle

import h5py
import numpy as np
import pytest

from semantic_abstraction_tpu.cli.generate_thor_data import write_scene_hdf5
from semantic_abstraction_tpu.datagen.scene import (
    CAM_INTR,
    HEIGHT,
    WIDTH,
    gt_alignment_transform,
    scene_data_from_thor_datapoint,
)
from semantic_abstraction_tpu.data.transforms import compose_affine, euler2mat

SCENE_ID = "FloorPlan1_physics"
DIST = 3.0


def _fake_world(tmp_path, rng):
    """Exporter dumps: a GT cloud whose ALIGNED coordinates fill the scene
    bounds, plus receptacle boxes."""
    position = [0.0, 0.0, 0.0]
    rotation = [0.0, 0.0, 0.0]
    cam_pose = compose_affine(np.asarray(position, float),
                              euler2mat(0, 0, 0), np.ones(3))
    transform = gt_alignment_transform(cam_pose, DIST)
    inv = np.linalg.inv(transform)
    n = 30000
    world_aligned = rng.uniform([-0.9, -0.9, 0.0], [0.9, 0.9, 1.8], (n, 3))
    original = world_aligned @ inv[:3, :3].T + inv[:3, 3]

    # raw ids: mug cluster, table cluster, empty filler
    ids = np.array(["empty"] * n, dtype=object)
    ids[: n // 4] = "Mug_1"
    ids[n // 4 : n // 2] = "Table_1"
    exp = tmp_path / "exported"
    scene_dir = exp / SCENE_ID
    scene_dir.mkdir(parents=True)
    with open(scene_dir / "full_xyz_pts.txt", "w") as f:
        for p in original:
            f.write(f"{p[0]}|{p[1]}|{p[2]}\n")
    with open(scene_dir / "full_objid_pts.txt", "w") as f:
        f.write("\n".join(ids) + "\n")
    with open(exp / f"{SCENE_ID}_receptacles.txt", "w") as f:
        mat = "(1,0,0,0)(0,1,0,0)(0,0,1,0)(0,0,0,1)"
        f.write(f"Box_1|{mat}|(1,1,1)|(0,0,0)\n")
    return str(exp), position, rotation


def _fake_datapoint(rng, position, rotation):
    h, w = 96, 96  # small camera frame (CAM_INTR still the exporter model)
    rgb = rng.randint(0, 255, (h, w, 3), np.uint8)
    depth = rng.uniform(2.0, 4.0, (h, w)).astype(np.float32)
    instance = np.zeros((h, w, 3), np.uint8)
    instance[:48] = (10, 0, 0)
    instance[48:] = (0, 10, 0)
    return {
        "scene_id": SCENE_ID,
        "rgb": rgb,
        "depth": depth,
        "instance": instance,
        "color_to_object_id": {(10, 0, 0): "Mug_1", (0, 10, 0): "Table_1"},
        "position": position,
        "rotation": rotation,
        "objects_info": [
            {"objectId": "Mug_1", "objectType": "Mug",
             "salientMaterials": ["Ceramic"],
             "parentReceptacles": ["Table_1"]},
            {"objectId": "Table_1", "objectType": "Table",
             "salientMaterials": ["Wood"], "parentReceptacles": None},
        ],
        "domain_randomized_rgb": np.zeros(1),
    }


def test_datagen_to_training_pipeline(tmp_path):
    rng = np.random.RandomState(0)
    exported, position, rotation = _fake_world(tmp_path, rng)
    datapoint = _fake_datapoint(rng, position, rotation)
    scene_data = scene_data_from_thor_datapoint(
        rng, datapoint, DIST, exported, num_output_pts=5000
    )
    assert scene_data is not None
    assert scene_data["full_xyz_pts"].shape == (1, 5000, 3)
    d = scene_data["descriptions"]
    assert "on" in d["spatial_relation_name"]  # mug on a table (receptacle)
    i = d["spatial_relation_name"].index("on")
    assert (d["target_obj_name"][i], d["reference_obj_name"][i]) == (
        "mug", "table",
    )

    out_dir = tmp_path / "dataset"
    out_dir.mkdir()
    scene_path = str(out_dir / f"{SCENE_ID}_0.hdf5")
    write_scene_hdf5(scene_path, scene_data)
    with h5py.File(scene_path, "r") as f:
        assert "data/descriptions/spatial_relation_name" in f
        assert f["data/full_xyz_pts"].shape == (1,)

    # relevancy CLI fills the saliencies (random CLIP weights)
    from semantic_abstraction_tpu.cli import generate_relevancy

    generate_relevancy.main([
        "dataset", str(out_dir), "--random-weights",
        "--saliency_config", "chefer_et_al", "--compute_dtype", "float32",
    ])

    # ...and the training datasets read the result
    from semantic_abstraction_tpu.data import (
        DataConfig,
        ObjectLocalizationDataset,
        SceneCompletionDataset,
    )

    cfg = DataConfig(num_input_pts=256, num_output_pts=256,
                     saliency_config="chefer_et_al",
                     domain_randomization=False)
    ssc = SceneCompletionDataset(str(out_dir), [os.path.basename(scene_path)], cfg)
    s = ssc[0]
    assert s["input_feature_pts"].shape == (4, 256, 1)
    assert s["output_label_pts"].sum() > 0  # GT labels present
    vool = ObjectLocalizationDataset(
        str(out_dir), [os.path.basename(scene_path)], cfg
    )
    v = vool[0]
    assert v["input_target_saliency_pts"].shape == (4, 256, 1)
    assert not v["padding_mask"].all()
