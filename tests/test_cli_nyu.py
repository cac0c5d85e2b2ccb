"""NYU-shaped E2E: a synthetic NYU-style corpus through the real-photo
pipeline — generate_relevancy dataset (photo-prompt auto-select for paths
containing "nyu", reference generate_relevancy.py:154-158) -> train ->
eval --voxel_shapes 60 (the NYU 60^3 metric, reference README.md:176-230)
-> summarize --table nyu (reference summarize.py:216-268).

The THOR-shaped twin lives in test_cli_train.py; this covers the NYU table
path end to end with NYU semantic classes and non-FloorPlan scene ids.
"""
import logging
import os
import pickle

import h5py
import numpy as np
import pytest

from synthetic_scene import make_scene

NYU_SCENE_CLASSES = ("wall", "floor", "chair")

TINY_ARGS = [
    "--voxel_shape", "16", "16", "16",
    "--unet_f_maps", "4",
    "--unet_num_channels", "8",
    "--unet_num_groups", "2",
    "--unet_num_levels", "3",
    "--pts_feat_extractor_hidden_dim", "16",
    "--num_input_pts", "256",
    "--num_output_pts", "256",
    "--num_warmup_steps", "2",
    "--epochs", "1",
    "--eval_freq", "1",
    "--num_workers", "0",
    "--num_devices", "1",
    "--compute_dtype", "float32",
    "--seed", "0",
]


def _strip_saliencies(path):
    with h5py.File(path, "a") as f:
        if "data/saliencies" in f:
            del f["data/saliencies"]


@pytest.fixture(scope="module")
def nyu_dir(tmp_path_factory):
    # the path must contain "nyu" to exercise the photo-prompt auto-select
    d = tmp_path_factory.mktemp("corpora") / "nyu_ovssc"
    d.mkdir()
    rs = np.random.RandomState(3)
    names = []
    for i, room in enumerate(["kitchen_0004", "bedroom_0112", "office_0021"]):
        # NYU scene ids are not FloorPlan-shaped; nothing in the NYU table
        # path may depend on THOR naming
        name = f"{room}_{i}.hdf5"
        make_scene(d / name, rs, h=32, w=32, classes=NYU_SCENE_CLASSES)
        _strip_saliencies(str(d / name))
        names.append(name)
    splits = {
        "train": names[:2],
        "unseen_instances": names[2:],
        "unseen_instances_dr": [],
        "unseen_instances_synonyms": [],
        "novel_class": [],
    }
    with open(d / "ssc_split.pkl", "wb") as f:
        pickle.dump(splits, f)
    return d


@pytest.mark.slow
def test_nyu_end_to_end(nyu_dir, tmp_path, caplog):
    from semantic_abstraction_tpu.cli import (
        eval as eval_cli,
        generate_relevancy,
        summarize,
        train_ovssc,
    )
    from semantic_abstraction_tpu.cli.generate_relevancy import DEFAULT_PROMPT

    # 1) relevancy writer: photo prompt auto-selected for nyu paths
    with caplog.at_level(logging.INFO):
        generate_relevancy.main([
            "dataset", str(nyu_dir), "--random-weights",
            "--saliency_config", "chefer_et_al",
            "--compute_dtype", "float32",
        ])
    assert any(
        DEFAULT_PROMPT in rec.getMessage() for rec in caplog.records
    ), "photo prompt was not auto-selected for the nyu corpus"
    with h5py.File(str(sorted(nyu_dir.glob("*.hdf5"))[0]), "r") as f:
        labels = np.array(
            f["data/saliencies/rgb|chefer_et_al|saliency_text_labels"]
        ).astype(str)
        assert set(NYU_SCENE_CLASSES) <= set(labels)

    # 2) tiny train on the NYU-shaped corpus
    log = str(tmp_path / "log")
    train_ovssc.main(
        ["--file_path", str(nyu_dir), "--log", log,
         "--saliency_config", "chefer_et_al"] + TINY_ARGS
    )
    assert os.path.exists(os.path.join(log, "latest.ckpt"))

    # 3) eval at the NYU 60^3 voxelization
    eval_cli.main([
        "--file_path", str(nyu_dir),
        "--load", os.path.join(log, "latest.ckpt"),
        "--task", "ovssc", "--max_batches", "2",
        "--voxel_shapes", "60",
    ])
    stats_path = os.path.join(log, "latest_eval_stats.pkl")
    with open(stats_path, "rb") as f:
        df = pickle.load(f)
    assert "voxel60x60x60_iou" in df.columns
    assert set(df.label.unique()) & set(NYU_SCENE_CLASSES)

    # 4) summarize --table nyu from the released stats layout
    mdir = tmp_path / "models" / "ours" / "ovssc"
    os.makedirs(mdir)
    with open(mdir / "ovssc_eval_stats_zs_nyu_merged.pkl", "wb") as f:
        pickle.dump(df, f)
    summarize.main(["--models-dir", str(tmp_path / "models"),
                    "--table", "nyu"])

    # and the table itself: per-class columns + class-mean column
    from semantic_abstraction_tpu.cli.summarize import (
        NYU_CLASSES,
        summarize_nyu,
    )

    table = summarize_nyu({"Ours (Zeroshot)": df})
    assert set(NYU_CLASSES) <= set(table.columns)
    row = table.iloc[0]
    present = [c for c in NYU_SCENE_CLASSES if not np.isnan(row[c])]
    assert present, "no NYU class produced a finite 60^3 IoU"
    assert np.isfinite(row["mean"])
