"""generate_relevancy CLI integration: image demo + dataset writer whose
output feeds the OVSSC reader (closing the datagen -> training loop)."""
import os
import pickle

import h5py
import numpy as np
import pytest

from synthetic_scene import make_scene


def _strip_saliencies(path):
    """Remove the pre-baked saliencies so the CLI regenerates them."""
    with h5py.File(path, "a") as f:
        del f["data/saliencies"]
        del f["saliencies"]


def test_image_command_writes_overlay(tmp_path, monkeypatch):
    import imageio.v2 as imageio

    from semantic_abstraction_tpu.cli import generate_relevancy

    rs = np.random.RandomState(0)
    img_path = str(tmp_path / "img.png")
    imageio.imwrite(img_path, rs.randint(0, 255, (64, 64, 3), dtype=np.uint8))
    out = str(tmp_path / "grads.png")
    monkeypatch.chdir(tmp_path)
    generate_relevancy.main([
        "image", img_path, "--labels", "chair", "table",
        "--random-weights", "--saliency_config", "chefer_et_al",
        "--compute_dtype", "float32", "--output", out,
    ])
    assert os.path.exists(out)


def test_dataset_command_roundtrip(tmp_path):
    from semantic_abstraction_tpu.cli import generate_relevancy
    from semantic_abstraction_tpu.data import DataConfig, SceneCompletionDataset

    rs = np.random.RandomState(1)
    scene = tmp_path / "FloorPlan1_physics_0.hdf5"
    make_scene(scene, rs, h=32, w=32)
    _strip_saliencies(str(scene))
    # a corrupt scene file (sorts first) must be skipped, not kill the sweep
    # (reference parity: the Ray pool respawns dead actors and continues,
    # generate_relevancy.py:376-390)
    (tmp_path / "FloorPlan0_corrupt_0.hdf5").write_bytes(b"not an hdf5 file")

    generate_relevancy.main([
        "dataset", str(tmp_path), "--random-weights",
        "--saliency_config", "chefer_et_al", "--compute_dtype", "float32",
    ])
    with h5py.File(str(scene), "r") as f:
        labels = np.array(
            f["data/saliencies/rgb|chefer_et_al|saliency_text_labels"]
        ).astype(str)
        assert "mean" in labels
        assert {"chair", "table"} <= set(labels)
        # synonym for sofa generated too (novel-vocab split support)
        assert "couch" in labels
        feats = np.array(
            f["data/saliencies/rgb|chefer_et_al|saliency_text_label_features"]
        )
        assert feats.shape == (len(labels), 512)
        # features stored unit-norm, mean row = normalized mean feature
        # (reference generate_relevancy.py:108-118)
        np.testing.assert_allclose(
            np.linalg.norm(feats, axis=-1), 1.0, atol=1e-5
        )
        mean_row = feats[list(labels).index("mean")]
        assert not np.allclose(mean_row, 0.0)

    # the OVSSC reader consumes the CLI's output directly
    ds = SceneCompletionDataset(
        str(tmp_path), [scene.name],
        DataConfig(num_input_pts=128, num_output_pts=128,
                   saliency_config="chefer_et_al",
                   domain_randomization=False),
    )
    s = ds[0]
    assert s["input_feature_pts"].shape == (4, 128, 1)
    assert np.isfinite(s["input_feature_pts"]).all()

    # resume skip: second run leaves the file untouched
    before = os.path.getmtime(str(scene))
    generate_relevancy.main([
        "dataset", str(tmp_path), "--random-weights",
        "--saliency_config", "chefer_et_al", "--compute_dtype", "float32",
    ])
    assert os.path.getmtime(str(scene)) == before


def test_dataset_command_preallocated_store_shape(tmp_path):
    """A scene whose schema already fixes the `saliencies` store shape
    (the datagen CLI preallocates it at relevancy_shape) wins over any
    --store-shape: the writer downsamples to match instead of crashing
    on the append-shape assert."""
    from semantic_abstraction_tpu.cli import generate_relevancy
    from semantic_abstraction_tpu.data import DataConfig, SceneCompletionDataset

    rs = np.random.RandomState(2)
    scene = tmp_path / "FloorPlan1_physics_0.hdf5"
    make_scene(scene, rs, h=32, w=32, rel_h=16, rel_w=16)
    with h5py.File(str(scene), "a") as f:
        del f["data/saliencies"]  # regenerate refs, keep the empty dataset
        assert f["saliencies"].shape[1:] == (16, 16)

    generate_relevancy.main([
        "dataset", str(tmp_path), "--random-weights",
        "--saliency_config", "chefer_et_al", "--compute_dtype", "float32",
    ])
    with h5py.File(str(scene), "r") as f:
        assert f["saliencies"].shape[1:] == (16, 16)
        ref = f["data/saliencies/rgb|chefer_et_al"][0]
        assert np.array(f["saliencies"][ref]).shape[1:] == (16, 16)

    ds = SceneCompletionDataset(
        str(tmp_path), [scene.name],
        DataConfig(num_input_pts=64, num_output_pts=64,
                   saliency_config="chefer_et_al",
                   domain_randomization=False),
    )
    s = ds[0]
    assert np.isfinite(s["input_feature_pts"]).all()


def test_scene_labels_reference_object_synonym(tmp_path):
    """A description whose ONLY synonym is on the reference object still
    yields the synonym-mapped sentence (reference :301-329 always maps
    both ends; a prior guard tested the relation against the keys)."""
    from semantic_abstraction_tpu.cli.generate_relevancy import _scene_labels

    scene = tmp_path / "FloorPlan1_physics_0.hdf5"
    # classes: chair (no synonym) on a television (-> tv)
    make_scene(scene, np.random.RandomState(3),
               classes=("chair", "television"), num_descs=1)
    with h5py.File(str(scene), "r") as f:
        labels = _scene_labels(f)
    assert "chair on a television" in labels
    assert "chair on a tv" in labels
    assert "tv" in labels  # object-name synonym


def test_dataset_overwrite_truncates_rows(tmp_path):
    """--overwrite restarts the saliencies dataset from row 0 when every
    existing group is being rewritten: the readers fetch the 'mean'
    relevancy by ABSOLUTE row index (reference quirk, dataset.py:824-834),
    so append-on-rewrite would silently subtract a stale first-write map
    (and leak rows)."""
    from semantic_abstraction_tpu.cli import generate_relevancy

    rs = np.random.RandomState(5)
    scene = tmp_path / "FloorPlan1_physics_0.hdf5"
    make_scene(scene, rs, h=32, w=32)
    _strip_saliencies(str(scene))
    cli_args = ["dataset", str(tmp_path), "--random-weights",
                "--saliency_config", "chefer_et_al",
                "--compute_dtype", "float32"]
    generate_relevancy.main(cli_args)
    with h5py.File(str(scene), "r") as f:
        rows1 = f["saliencies"].shape[0]
        labels = np.array(
            f["data/saliencies/rgb|chefer_et_al|saliency_text_labels"]
        ).astype(str).tolist()
    generate_relevancy.main(cli_args + ["--overwrite", "--seed", "1"])
    with h5py.File(str(scene), "r") as f:
        assert f["saliencies"].shape[0] == rows1  # truncated, not appended
        mean_idx = labels.index("mean")
        absolute = np.array(f["saliencies"][mean_idx])
        ref = f["data/saliencies/rgb|chefer_et_al"][mean_idx]
        via_ref = np.array(f["saliencies"][ref])[0]
        np.testing.assert_array_equal(absolute, via_ref)


def test_dataset_sharded_sweep_disjoint_and_complete(tmp_path):
    """--num-shards/--shard-id: the Ray-pool replacement's scaling story
    (reference generate_relevancy.py:161-391 runs one actor pool; here one
    process per chip takes every Nth scene). Two shards must touch
    DISJOINT scene sets, their union must cover the corpus, and every
    output must be reader-valid.

    Per-chip launch recipe (one process per TPU chip/host):
      for i in 0..N-1:  python -m semantic_abstraction_tpu.cli.generate_relevancy \
          dataset DIR --num-shards N --shard-id $i  (device i via
          JAX_DEFAULT_DEVICE / one-chip-per-process topology)
    """
    from semantic_abstraction_tpu.cli import generate_relevancy
    from semantic_abstraction_tpu.data import DataConfig, SceneCompletionDataset

    rs = np.random.RandomState(7)
    names = [f"FloorPlan{i}_physics_0.hdf5" for i in range(4)]
    for name in names:
        make_scene(tmp_path / name, rs, h=32, w=32)
        _strip_saliencies(str(tmp_path / name))

    def has_saliency(path):
        with h5py.File(str(path), "r") as f:
            return "data/saliencies" in f and any(
                k.endswith("saliency_text_labels")
                for k in f["data/saliencies"].keys()
            )

    common = ["--random-weights", "--saliency_config", "chefer_et_al",
              "--compute_dtype", "float32", "--num-shards", "2"]
    generate_relevancy.main(
        ["dataset", str(tmp_path)] + common + ["--shard-id", "0"])
    done_after_0 = {n for n in names if has_saliency(tmp_path / n)}
    # sorted order: shard 0 takes indices 0, 2
    assert done_after_0 == {names[0], names[2]}, done_after_0

    generate_relevancy.main(
        ["dataset", str(tmp_path)] + common + ["--shard-id", "1"])
    assert all(has_saliency(tmp_path / n) for n in names)

    # every shard's output is reader-valid through the real dataset reader
    ds = SceneCompletionDataset(
        str(tmp_path), names,
        DataConfig(num_input_pts=64, num_output_pts=64,
                   saliency_config="chefer_et_al",
                   domain_randomization=False),
    )
    for i in range(len(names)):
        s = ds[i]
        assert np.isfinite(s["input_feature_pts"]).all()


def test_nearest_exact_device_matches_host():
    """The writer's on-device store-time downsample == the host
    nearest-exact gather (same indices; pure gather)."""
    import jax.numpy as jnp

    from semantic_abstraction_tpu.cli.generate_relevancy import (
        _nearest_exact_device,
    )
    from semantic_abstraction_tpu.data.transforms import (
        resize_nearest_exact_np,
    )

    rs = np.random.RandomState(13)
    maps = rs.randn(5, 48, 64).astype(np.float16)
    dev = np.asarray(_nearest_exact_device((48, 64), (24, 32))(jnp.asarray(maps)))
    host = resize_nearest_exact_np(maps, (24, 32))
    np.testing.assert_array_equal(dev, host)
