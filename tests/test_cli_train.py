"""End-to-end CLI integration: synthetic scenes -> train_ovssc ->
eval -> summarize (tiny config, CPU, virtual devices)."""
import os
import pickle

import numpy as np
import pytest

from synthetic_scene import make_scene


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("thor")
    rs = np.random.RandomState(0)
    names = []
    for i in range(4):
        # scene ids follow the FloorPlan<room>_<seed> convention summarize
        # expects (summarize.py room_id parsing)
        name = f"FloorPlan{i + 1}_physics_{i}.hdf5"
        make_scene(d / name, rs)
        names.append(name)
    splits = {
        "train": names[:2],
        "unseen_instances": names[2:3],
        "unseen_instances_dr": [],
        "unseen_instances_synonyms": [],
        "novel_class": names[3:4],
    }
    with open(d / "ssc_split.pkl", "wb") as f:
        pickle.dump(splits, f)
    return d


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
    "--epochs", "2",
    "--eval_freq", "1",
    "--num_workers", "0",
    "--num_devices", "1",
    "--compute_dtype", "float32",
    "--seed", "0",
]


@pytest.mark.slow
def test_eval_loads_reference_pth_directly(dataset_dir, tmp_path):
    """`eval --load <...>.pth` consumes a released-format torch checkpoint
    (reference models.tar.lz4 layout: <dir>/{args.pkl, ovssc.pth}) by
    converting the weights in place."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from ref_oracle import ref_net_module

    refnet = ref_net_module()
    import torch

    from semantic_abstraction_tpu.cli import common, eval as eval_cli

    torch.manual_seed(0)
    net = refnet.SemAbs3D(
        voxel_shape=(16, 16, 16),
        scene_bounds=((-1.0, -1.0, -0.1), (1.0, 1.0, 1.9)),
        network_inputs=["saliency"],
        use_pts_feat_extractor=True,
        pts_feat_extractor_hidden_dim=16,
        reduce_method="max",
        decoder_concat_xyz_pts=True,
        batch_size=1,
        device="cpu",
        unet_num_channels=8,
        unet_f_maps=4,
        unet_num_groups=2,
        unet_num_levels=3,
    ).eval()
    mdir = tmp_path / "models" / "ours" / "ovssc"
    os.makedirs(mdir)
    torch.save({"net": net.state_dict(), "epochs": 7},
               str(mdir / "ovssc.pth"))
    # args.pkl in the released layout: the training flags of the checkpoint
    args = common.config_parser().parse_args(
        ["--file_path", str(dataset_dir)] + TINY_ARGS)
    common.save_args(str(mdir), args)

    eval_cli.main([
        "--task", "ovssc", "--load", str(mdir / "ovssc.pth"),
        "--file_path", str(dataset_dir), "--num_workers", "0",
        "--max_batches", "1",
    ])
    stats = mdir / "ovssc_eval_stats.pkl"
    assert stats.exists()
    with open(stats, "rb") as f:
        df = pickle.load(f)
    assert len(df) > 0


def test_train_ovssc_semantic_aware(dataset_dir, tmp_path):
    from semantic_abstraction_tpu.cli import train_ovssc

    log = str(tmp_path / "log_semaware")
    args = list(TINY_ARGS)
    args[args.index("--epochs") + 1] = "1"
    train_ovssc.main(
        ["--file_path", str(dataset_dir), "--log", log,
         "--approach", "semantic_aware"] + args
    )
    assert os.path.exists(os.path.join(log, "latest.ckpt"))


@pytest.mark.slow
def test_train_ovssc_end_to_end(dataset_dir, tmp_path):
    from semantic_abstraction_tpu.cli import train_ovssc

    log = str(tmp_path / "log")
    train_ovssc.main(
        ["--file_path", str(dataset_dir), "--log", log] + TINY_ARGS
    )
    assert os.path.exists(os.path.join(log, "latest.ckpt"))
    assert os.path.exists(os.path.join(log, "args.pkl"))
    assert os.path.exists(os.path.join(log, "detailed_stats.pkl"))
    with open(os.path.join(log, "detailed_stats.pkl"), "rb") as f:
        df = pickle.load(f)
    assert len(df) > 0
    assert "voxel32x32x32_iou" in df.columns

    # resume restores epoch and keeps training
    from semantic_abstraction_tpu.cli import eval as eval_cli

    eval_cli.main([
        "--file_path", str(dataset_dir),
        "--load", os.path.join(log, "latest.ckpt"),
        "--task", "ovssc", "--max_batches", "1",
    ])
    stats_path = os.path.join(log, "latest_eval_stats.pkl")
    assert os.path.exists(stats_path)
    with open(stats_path, "rb") as f:
        stats = pickle.load(f)
    assert {"scene_id", "label", "cutoff", "split"} <= set(stats.columns)
    # all 25 eval cutoffs present
    assert len(stats["cutoff"].unique()) == 25

    # summarize consumes the eval stats (single-approach table)
    from semantic_abstraction_tpu.cli.summarize import summarize_ovssc

    table = summarize_ovssc({"Ours": stats})
    assert "novel rooms" in table.columns
    assert len(table) == 1


@pytest.fixture(scope="module")
def vool_dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("thor_vool")
    rs = np.random.RandomState(1)
    names = []
    for i in range(3):
        name = f"FloorPlan{i + 1}_physics_{i}.hdf5"
        make_scene(d / name, rs)
        names.append(name)
    splits = {"train": names[:2], "unseen_instances": names[2:]}
    with open(d / "vool_split.pkl", "wb") as f:
        pickle.dump(splits, f)
    return d


@pytest.mark.slow
@pytest.mark.parametrize("approach", ["semantic_abstraction", "clip_spatial"])
def test_train_vool_end_to_end(vool_dataset_dir, tmp_path, approach):
    from semantic_abstraction_tpu.cli import train_vool

    log = str(tmp_path / f"log_{approach}")
    args = list(TINY_ARGS)
    args[args.index("--epochs") + 1] = "1"
    train_vool.main(
        ["--file_path", str(vool_dataset_dir), "--log", log,
         "--approach", approach] + args
    )
    assert os.path.exists(os.path.join(log, "latest.ckpt"))
    with open(os.path.join(log, "detailed_stats.pkl"), "rb") as f:
        df = pickle.load(f)
    assert "spatial_relation_name" in df.columns


@pytest.mark.slow
def test_train_vool_semantic_aware(vool_dataset_dir, tmp_path):
    """semantic_aware VOOL end-to-end: host-side CLIP text-feature cache
    feeds target/reference features into the query MLP (reference
    net.py:582-636; our cli/train_vool.make_text_encoder)."""
    from semantic_abstraction_tpu.cli import train_vool

    log = str(tmp_path / "log_semaware_vool")
    args = list(TINY_ARGS)
    args[args.index("--epochs") + 1] = "1"
    train_vool.main(
        ["--file_path", str(vool_dataset_dir), "--log", log,
         "--approach", "semantic_aware"] + args
    )
    assert os.path.exists(os.path.join(log, "latest.ckpt"))
    with open(os.path.join(log, "detailed_stats.pkl"), "rb") as f:
        df = pickle.load(f)
    assert "target_obj_name" in df.columns


def test_resume_from_checkpoint(dataset_dir, tmp_path):
    """--load restores net+optimizer+epoch (reference utils.py:276-290)."""
    import jax

    from semantic_abstraction_tpu.cli import common
    from semantic_abstraction_tpu.runtime.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from semantic_abstraction_tpu.runtime import (
        init_train_state,
        make_optimizer,
    )
    from semantic_abstraction_tpu.models import SemAbs3DConfig, init_semabs3d

    cfg = SemAbs3DConfig(
        voxel_shape=(16, 16, 16), unet_num_channels=8, unet_f_maps=4,
        unet_num_groups=2, unet_num_levels=3, pts_feat_extractor_hidden_dim=16,
    )
    params = init_semabs3d(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(num_training_steps=10)
    state = init_train_state(params, tx)
    state = state._replace(step=state.step + 7)
    path = str(tmp_path / "latest.ckpt")
    save_checkpoint(path, state, epoch=5, extra={"note": "x"})
    template = init_train_state(init_semabs3d(jax.random.PRNGKey(1), cfg), tx)
    restored, epoch, extra = load_checkpoint(path, template)
    assert epoch == 5
    assert extra["note"] == "x"
    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_eval_vool(vool_dataset_dir, tmp_path):
    from semantic_abstraction_tpu.cli import eval as eval_cli
    from semantic_abstraction_tpu.cli import train_vool

    log = str(tmp_path / "log_eval_vool")
    args = list(TINY_ARGS)
    args[args.index("--epochs") + 1] = "1"
    train_vool.main(
        ["--file_path", str(vool_dataset_dir), "--log", log] + args
    )
    eval_cli.main([
        "--file_path", str(vool_dataset_dir),
        "--load", os.path.join(log, "latest.ckpt"),
        "--task", "vool", "--max_batches", "1",
    ])
    with open(os.path.join(log, "latest_eval_stats.pkl"), "rb") as f:
        stats = pickle.load(f)
    assert {"target_obj_name", "reference_obj_name",
            "spatial_relation_name"} <= set(stats.columns)
    assert "voxel64x64x64_iou" in stats.columns  # detailed-analysis shapes
