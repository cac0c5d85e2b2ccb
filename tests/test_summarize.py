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


def test_summarize_vool_mean_interleaved_and_nan_propagating():
    """Reference parity: mean rows splice in AFTER each approach's relation
    block (summarize.py:158-183) and use the NaN-PROPAGATING np mean — a
    missing per-relation cell must surface as a nan mean, not silently
    shrink the denominator (summarize.py:164-166)."""
    rs = np.random.RandomState(2)
    stats = _fake_vool_stats(rs)
    # kill one relation's synonyms rows -> its 'novel vocab' cell is NaN
    drop = (stats.spatial_relation_name == "behind") & (
        stats.split == "unseen_instances_synonyms"
    )
    stats = stats[~drop]
    table = summarize_vool({"Ours": stats, "Semantic Aware": _fake_vool_stats(rs)})
    # interleaved: each approach's block ends with its own mean row
    rel_count = stats.spatial_relation_name.nunique()
    assert table.iloc[rel_count]["relation"] == "mean"
    assert table.iloc[rel_count]["approach"] == "Ours"
    assert table.iloc[-1]["relation"] == "mean"
    assert table.iloc[-1]["approach"] == "Semantic Aware"
    # NaN propagates into the Ours mean (its behind/vocab cell is NaN)
    assert np.isnan(table.iloc[rel_count]["novel vocab"])
    assert not np.isnan(table.iloc[-1]["novel vocab"])


def test_summarize_nyu_mean_ignores_pad_label():
    """The '' pad-label group (static-shape eval padding, all-NaN metrics)
    must not poison the NYU mean; the reference eval path has no padded
    patches at all."""
    rs = np.random.RandomState(3)
    rows = []
    for cutoff in (-2.0, -1.5):
        for c in NYU_CLASSES:
            rows.append({"cutoff": cutoff, "label": c,
                         "voxel60x60x60_iou": rs.rand()})
        rows.append({"cutoff": cutoff, "label": "",
                     "voxel60x60x60_iou": np.nan})
    table = summarize_nyu({"Ours (Zeroshot)": pd.DataFrame(rows)})
    row = table.iloc[0]
    assert not np.isnan(row["mean"])
    np.testing.assert_allclose(
        row["mean"], np.mean([row[c] for c in NYU_CLASSES])
    )
