"""Summarize-table unit coverage (VOOL per-relation + mean rows, NYU)."""
import numpy as np
import pandas as pd

from semantic_abstraction_tpu.cli.summarize import (
    NYU_CLASSES,
    summarize_nyu,
    summarize_vool,
)
from semantic_abstraction_tpu.models import RELATIONS


def _fake_vool_stats(rs):
    rows = []
    rels = [r for r in RELATIONS if r != "[pad]"]
    for cutoff in (-2.0, -1.0):
        for rel in rels:
            for split in ("unseen_instances", "unseen_instances_dr",
                          "unseen_instances_synonyms"):
                for room in ("FloorPlan1", "FloorPlan2"):
                    rows.append({
                        "cutoff": cutoff,
                        "spatial_relation_name": rel,
                        "split": split,
                        "scene_id": f"{room}_physics_0",
                        "target_obj_name": "chair",
                        "reference_obj_name": "couch" if
                            split == "unseen_instances_synonyms" else "table",
                        "voxel32x32x32_iou": rs.rand(),
                    })
    return pd.DataFrame(rows)


def test_summarize_vool_mean_rows():
    rs = np.random.RandomState(0)
    table = summarize_vool({"Ours": _fake_vool_stats(rs)})
    rels = set(table["relation"])
    assert "mean" in rels and "behind" in rels
    mean_row = table[table.relation == "mean"].iloc[0]
    per_rel = table[table.relation != "mean"]
    np.testing.assert_allclose(mean_row["novel rooms"],
                               per_rel["novel rooms"].mean())


def test_summarize_nyu_per_class_and_mean():
    rs = np.random.RandomState(1)
    rows = []
    for cutoff in (-2.0, -1.5):
        for c in NYU_CLASSES:
            rows.append({"cutoff": cutoff, "label": c,
                         "voxel60x60x60_iou": rs.rand()})
    table = summarize_nyu({"Ours (Zeroshot)": pd.DataFrame(rows)})
    assert set(NYU_CLASSES) <= set(table.columns)
    row = table.iloc[0]
    np.testing.assert_allclose(
        row["mean"], np.mean([row[c] for c in NYU_CLASSES])
    )
