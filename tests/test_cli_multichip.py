"""Multi-device CLI integration on the virtual 8-CPU mesh: the torchrun
regime (batch 1/device, sharded samplers) end-to-end through the real CLIs.

Reference: utils.py:506-512 (DistributedSampler), README.md:241-255
(torchrun batch-1-per-GPU), eval.py:57-59 (sharded eval).
"""
import os
import pickle

import numpy as np
import pytest

from synthetic_scene import make_scene

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
    "--compute_dtype", "float32",
    "--seed", "0",
]


@pytest.fixture(scope="module")
def dataset8_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("thor8")
    rs = np.random.RandomState(7)
    names = []
    for i in range(10):
        name = f"FloorPlan{i + 1}_physics_{i}.hdf5"
        make_scene(d / name, rs)
        names.append(name)
    splits = {
        "train": names[:8],
        "unseen_instances": names[8:],  # 2 scenes: forces wrap-padding on 8
    }
    with open(d / "ssc_split.pkl", "wb") as f:
        pickle.dump(splits, f)
    return d


def test_train_ovssc_cli_8_devices(dataset8_dir, tmp_path):
    """The FULL train CLI on an 8-device mesh: batch 1/device -> global
    batch 8, one sharded step per epoch, eval split wrap-padded to the
    mesh. Checkpoints + detailed stats as in the single-device path."""
    import jax

    assert len(jax.devices()) >= 8
    from semantic_abstraction_tpu.cli import train_ovssc

    log = str(tmp_path / "log8")
    train_ovssc.main(
        ["--file_path", str(dataset8_dir), "--log", log,
         "--num_devices", "8"] + TINY_ARGS
    )
    assert os.path.exists(os.path.join(log, "latest.ckpt"))
    with open(os.path.join(log, "detailed_stats.pkl"), "rb") as f:
        df = pickle.load(f)
    assert len(df) > 0
    # only 2 real eval scenes: the 6 wrap-padded duplicates must be NaN'd
    assert df["scene_id"].nunique() == 2


def test_eval_cli_sharded_matches_single_device(dataset8_dir, tmp_path):
    """eval --num_devices 8 produces the same per-scene stats as
    --num_devices 1 (the padding duplicates are NaN'd, not double-counted)."""
    from semantic_abstraction_tpu.cli import eval as eval_cli
    from semantic_abstraction_tpu.cli import train_ovssc

    log = str(tmp_path / "log1")
    train_ovssc.main(
        ["--file_path", str(dataset8_dir), "--log", log,
         "--num_devices", "1"] + TINY_ARGS
    )
    ckpt = os.path.join(log, "latest.ckpt")

    def run(n):
        eval_cli.main([
            "--file_path", str(dataset8_dir), "--load", ckpt,
            "--task", "ovssc", "--num_devices", str(n),
            "--voxel_shapes", "32",
        ])
        with open(os.path.join(log, "latest_eval_stats.pkl"), "rb") as f:
            return pickle.load(f)

    single = run(1)
    sharded = run(8)
    key = ["scene_id", "label", "cutoff"]
    metric = "voxel32x32x32_iou"
    a = single.dropna(subset=[metric]).sort_values(key).reset_index(drop=True)
    b = sharded.dropna(subset=[metric]).sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    np.testing.assert_allclose(
        a[metric].to_numpy(), b[metric].to_numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        a["point_iou"].to_numpy(), b["point_iou"].to_numpy(), atol=1e-5
    )
