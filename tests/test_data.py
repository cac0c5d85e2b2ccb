"""Dataset layer tests over synthetic THOR-schema scene files."""
import numpy as np
import pytest

from semantic_abstraction_tpu.data import (
    DataConfig,
    DataLoader,
    ObjectLocalizationDataset,
    SceneCompletionDataset,
    ShardedSampler,
    SYNONYMS,
    collate,
    transform_filter_subsample,
)
from semantic_abstraction_tpu.models.nets import RELATIONS
from synthetic_scene import make_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scenes")
    rs = np.random.RandomState(0)
    for i in range(3):
        make_scene(d / f"scene_{i}.hdf5", rs)
    return d


def _cfg(**kw):
    base = dict(
        num_input_pts=256,
        num_output_pts=512,
        num_patches=4,
        num_descs=4,
        domain_randomization=True,
    )
    base.update(kw)
    return DataConfig(**base)


def test_ovssc_sample_shapes(scene_dir):
    ds = SceneCompletionDataset(
        str(scene_dir), [f"scene_{i}.hdf5" for i in range(3)], _cfg()
    )
    s = ds[0]
    assert s["input_xyz_pts"].shape == (256, 3)
    assert s["input_feature_pts"].shape == (4, 256, 1)
    assert s["output_xyz_pts"].shape == (4, 512, 3)  # balanced per-patch
    assert s["output_label_pts"].shape == (4, 512)
    assert s["out_of_bounds_pts"].shape == (4, 512)
    assert s["out_of_frustum_pts_mask"].shape == (4, 512)
    assert s["semantic_class_features"].shape == (4, 512)
    assert len(s["patch_labels"]) == 4
    assert s["padding_mask"].shape == (4,)
    # 3 real classes -> 1 padded patch
    assert s["padding_mask"].sum() == 1
    assert s["patch_labels"][3] == ""


def test_ovssc_balanced_sampling_hits_positives(scene_dir):
    ds = SceneCompletionDataset(
        str(scene_dir), ["scene_0.hdf5"], _cfg(domain_randomization=False)
    )
    s = ds[0]
    # with balanced sampling every non-padded patch should include positives
    for p in range(3):
        assert s["output_label_pts"][p].sum() > 0


def test_ovssc_deterministic_per_epoch(scene_dir):
    ds = SceneCompletionDataset(str(scene_dir), ["scene_0.hdf5"], _cfg())
    a = ds[0]
    b = ds[0]
    np.testing.assert_array_equal(a["input_xyz_pts"], b["input_xyz_pts"])
    ds.set_epoch(1)
    c = ds[0]
    assert not np.array_equal(a["input_xyz_pts"], c["input_xyz_pts"])


def test_ovssc_synonyms(scene_dir):
    ds = SceneCompletionDataset(
        str(scene_dir), ["scene_0.hdf5"], _cfg(), use_synonyms=True
    )
    # synthetic labels (chair/table/sofa): sofa -> couch
    with pytest.raises(AssertionError):
        ds[0]  # "couch" saliency was never generated -> subset assert fires


def test_ovssc_rgb_inputs(scene_dir):
    ds = SceneCompletionDataset(
        str(scene_dir), ["scene_0.hdf5"],
        _cfg(network_inputs=("rgb",), domain_randomization=False),
    )
    s = ds[0]
    assert s["input_feature_pts"].shape == (1, 256, 3)
    assert s["semantic_class_features"].shape == (4, 512)


def test_vool_sample_shapes(scene_dir):
    ds = ObjectLocalizationDataset(
        str(scene_dir), [f"scene_{i}.hdf5" for i in range(3)], _cfg()
    )
    s = ds[0]
    assert s["input_xyz_pts"].shape == (256, 3)
    for k in ("input_target_saliency_pts", "input_reference_saliency_pts",
              "input_description_saliency_pts"):
        assert s[k].shape == (4, 256, 1)
    assert s["input_rgb_pts"].shape == (4, 256, 3)
    assert s["output_xyz_pts"].shape == (4, 512, 3)
    assert s["output_label_pts"].shape == (4, 512)
    assert s["spatial_relation_id"].shape == (4,)
    assert s["padding_mask"].sum() == 1  # 3 descs padded to 4
    assert s["spatial_relation_name"][3] == "[pad]"
    assert RELATIONS[s["spatial_relation_id"][3]] == "[pad]"
    for i in range(3):
        assert RELATIONS[s["spatial_relation_id"][i]] == s["spatial_relation_name"][i]


def test_vool_synonym_filter_empty(scene_dir, tmp_path):
    # scene whose classes have NO synonyms: the novel-vocab filter drops
    # every description and the sample is all padding
    make_scene(tmp_path / "nosyn.hdf5", np.random.RandomState(5),
               classes=("chair", "table", "lamp"))
    ds = ObjectLocalizationDataset(
        str(tmp_path), ["nosyn.hdf5"], _cfg(), use_synonyms=True
    )
    s = ds[0]
    assert s["padding_mask"].all()
    assert s["input_target_saliency_pts"].shape == (4, 256, 1)


def test_transform_filter_subsample_fallback():
    rs = np.random.RandomState(0)
    xyz = rs.uniform(-1, 1, (100, 3)).astype(np.float32)
    bounds = np.array([[-2, -2, -2], [2, 2, 2]], np.float32)
    out = transform_filter_subsample(
        xyz_pts=xyz, scene_bounds=bounds, num_subsample_pts=500,
        subsample_probabilities=np.full(100, 0.01), always_replace_pts=False,
        rng=rs, side=xyz[:, :1],
    )
    # more samples than points without replacement -> falls back to replace
    assert out["xyz_pts"].shape == (500, 3)
    assert out["side"].shape == (500, 1)


def test_transform_filter_subsample_axis1_arrays():
    rs = np.random.RandomState(1)
    xyz = rs.uniform(-1, 1, (50, 3)).astype(np.float32)
    bounds = np.array([[0, -2, -2], [2, 2, 2]], np.float32)  # filters x<0
    per_patch = rs.randn(3, 50).astype(np.float32)
    out = transform_filter_subsample(
        xyz_pts=xyz, scene_bounds=bounds, num_subsample_pts=10,
        subsample_probabilities=np.full(50, 0.02), always_replace_pts=True,
        rng=rs, labels=per_patch,
    )
    assert out["xyz_pts"].shape == (10, 3)
    assert out["labels"].shape == (3, 10)
    assert (out["xyz_pts"][:, 0] >= 0).all()


def test_loader_and_sampler(scene_dir):
    ds = SceneCompletionDataset(
        str(scene_dir), [f"scene_{i}.hdf5" for i in range(3)],
        _cfg(domain_randomization=False),
    )
    dl = DataLoader(ds, batch_size=2, num_workers=2, seed=0)
    batches = list(dl)
    assert len(batches) == 2  # 3 scenes padded to 4 -> 2 batches of 2
    b = batches[0]
    assert b["input_xyz_pts"].shape == (2, 256, 3)
    assert b["output_label_pts"].shape == (2, 4, 512)
    assert isinstance(b["patch_labels"], list) and len(b["patch_labels"]) == 2


def test_sharded_sampler_partition():
    shards = [
        ShardedSampler(10, num_shards=4, shard_id=i, shuffle=True, seed=3)
        for i in range(4)
    ]
    all_idx = np.concatenate([s.indices() for s in shards])
    assert len(all_idx) == 12  # padded to multiple of 4
    assert set(all_idx.tolist()) == set(range(10))
    # same epoch -> same permutation across shards
    again = np.concatenate([s.indices() for s in shards])
    np.testing.assert_array_equal(all_idx, again)


def test_batch_feeds_train_step(scene_dir):
    """End-to-end: synthetic scene -> loader batch -> one OVSSC train step."""
    import jax
    import jax.numpy as jnp

    from semantic_abstraction_tpu.models import SemAbs3DConfig, init_semabs3d
    from semantic_abstraction_tpu.runtime import (
        init_train_state,
        make_optimizer,
        make_train_step,
        ovssc_forward_loss,
    )

    ds = SceneCompletionDataset(
        str(scene_dir), ["scene_0.hdf5"], _cfg(domain_randomization=False)
    )
    batch = collate([ds[0]])
    cfg = SemAbs3DConfig(
        voxel_shape=(16, 16, 16), unet_num_channels=8, unet_f_maps=4,
        unet_num_groups=2, unet_num_levels=3, pts_feat_extractor_hidden_dim=16,
    )
    params = init_semabs3d(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(num_training_steps=10)
    state = init_train_state(params, tx)
    step = make_train_step(ovssc_forward_loss, cfg, tx, compute_dtype=jnp.float32)
    device_batch = {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if isinstance(v, np.ndarray) and k != "rgb" and k != "tsdf_vol"
    }
    state, stats = step(state, device_batch)
    assert np.isfinite(float(stats["loss"]))


def test_ovssc_use_gt_seg(scene_dir):
    """Oracle-mask mode (reference dataset.py:734-783): GT seg masks as
    saliencies, zero text features."""
    ds = SceneCompletionDataset(
        str(scene_dir), ["scene_0.hdf5"],
        _cfg(domain_randomization=False, subtract_mean_relevancy=False),
        use_gt_seg=True,
    )
    s = ds[0]
    assert s["input_feature_pts"].shape == (4, 256, 1)
    # x50 rescale makes oracle features (mask - 0.5): values in {-0.5, 0.5}
    vals = np.unique(np.round(s["input_feature_pts"], 3))
    assert set(vals.tolist()) <= {-0.5, 0.0, 0.5}
    assert (s["semantic_class_features"][:3] == 0).all()


def test_compute_empty_mask_and_balanced_subsample():
    from semantic_abstraction_tpu.data import (
        balanced_class_subsample,
        compute_empty_mask,
    )

    rs = np.random.RandomState(0)
    depth = np.full((32, 32), 1.5, np.float32)
    intr = np.array([[20.0, 0, 16], [0, 20.0, 16], [0, 0, 1]])
    mask = compute_empty_mask(
        [[-1, -1, -0.1], [1, 1, 1.9]], depth, intr, np.eye(4), 10
    )
    assert mask.shape == (10, 10, 10)
    assert mask.any() and not mask.all()

    seg = np.array([0] * 90 + [1] * 10)
    idx = balanced_class_subsample(seg, 20, rs)
    # balancing should draw roughly half from the rare class
    assert (seg[idx] == 1).sum() >= 5


def test_resize_nearest_exact_matches_torch():
    import torch

    from semantic_abstraction_tpu.data.transforms import resize_nearest_exact_np

    rs = np.random.RandomState(0)
    for in_hw, out_hw in [((48, 64), (24, 32)), ((33, 47), (12, 16)),
                          ((16, 16), (24, 24))]:
        maps = rs.randn(3, *in_hw).astype(np.float32)
        got = resize_nearest_exact_np(maps, out_hw)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(maps)[:, None], size=out_hw, mode="nearest-exact"
        )[:, 0].numpy()
        np.testing.assert_array_equal(got, ref)


def test_vool_patch_masks_cutoff_on_x50_scale(scene_dir):
    """Reference QUIRK: the VOOL reader multiplies saliencies by 50 BEFORE
    the patch_mask cutoff (dataset.py:429 then :430-441), so 0.004 acts on
    the x50 scale — unlike the OVSSC reader, which thresholds raw values
    (dataset.py:1031-1047)."""
    files = [f"scene_{i}.hdf5" for i in range(3)]
    kw = dict(domain_randomization=False)
    masks = ObjectLocalizationDataset(
        str(scene_dir), files, _cfg(network_inputs=("patch_masks",), **kw)
    )[0]
    sals = ObjectLocalizationDataset(
        str(scene_dir), files, _cfg(network_inputs=("saliency",), **kw)
    )[0]
    for k in ("input_target_saliency_pts", "input_reference_saliency_pts",
              "input_description_saliency_pts"):
        m = masks[k]
        assert set(np.unique(m)) <= {0.0, 1.0}
        # same (seed, epoch, idx) -> identical subsample draws, so the mask
        # must be the x50-scale threshold of the saliency stream ...
        np.testing.assert_array_equal(m, (sals[k] > 0.004).astype(np.float32))
    # ... and NOT the raw-scale threshold (the pre-fix behavior)
    t = masks["input_target_saliency_pts"]
    raw_scale = (sals["input_target_saliency_pts"] / 50.0 > 0.004)
    assert not np.array_equal(t, raw_scale.astype(np.float32))


def test_dr_transform_failure_falls_back_to_identity(scene_dir, monkeypatch):
    """The reference retries with transform=None on ANY exception
    (dataset.py:558-569, :1207-1211); the real-world trigger raises
    IndexError (empty in-bounds set -> replace=True retry on an empty
    array), so a ValueError-only except would crash the run."""
    from semantic_abstraction_tpu.data import datasets as dmod

    real = dmod.transform_filter_subsample
    raised = []

    def raising(*args, **kwargs):
        if kwargs.get("transform_matrix") is not None:
            raised.append(1)
            raise IndexError("index -1 is out of bounds for axis 0 with size 0")
        return real(*args, **kwargs)

    monkeypatch.setattr(dmod, "transform_filter_subsample", raising)
    files = [f"scene_{i}.hdf5" for i in range(3)]
    cfg = _cfg(domain_randomization=True)
    s = SceneCompletionDataset(str(scene_dir), files, cfg)[0]
    assert s["input_xyz_pts"].shape == (256, 3)
    s = ObjectLocalizationDataset(str(scene_dir), files, cfg)[0]
    assert s["input_xyz_pts"].shape == (256, 3)
    assert raised, "DR never produced a transform; the fallback was not hit"


class _CountingDataset:
    def __init__(self, n):
        self.n = n
        self.calls = 0
        self.lock = __import__("threading").Lock()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        with self.lock:
            self.calls += 1
        return {"x": np.full((4,), i, np.float32)}


def test_loader_early_break_bounds_prefetch():
    """Breaking out of iteration must not keep loading the epoch: the
    in-flight window is num_workers + prefetch, driven by consumption."""
    import time

    ds = _CountingDataset(400)
    loader = DataLoader(ds, batch_size=4, num_workers=2, prefetch=2,
                        shuffle=False)
    seen = 0
    for batch in loader:
        assert batch["x"].shape == (4, 4)
        seen += 1
        if seen == 3:
            break
    time.sleep(0.3)  # let any stray workers run if cancellation failed
    # consumed 3 batches + at most (workers + prefetch + 1) in flight
    assert ds.calls <= (3 + 2 + 2 + 1) * 4, ds.calls
    # iterating again works (fresh pool per __iter__)
    assert sum(1 for _ in loader) == 100


def test_loader_worker_error_propagates():
    class Boom(_CountingDataset):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("corrupt scene")
            return super().__getitem__(i)

    loader = DataLoader(Boom(12), batch_size=2, num_workers=2,
                        shuffle=False)
    with pytest.raises(RuntimeError, match="corrupt scene"):
        list(loader)


def test_sharded_sampler_big_seed_and_empty():
    # date-style seeds must not overflow RandomState
    s = ShardedSampler(10, num_shards=2, shard_id=0, shuffle=True,
                       seed=20260818)
    assert len(s.indices()) == 5
    # an empty dataset yields empty shards, not fabricated index 0
    s = ShardedSampler(0, num_shards=4, shard_id=1, shuffle=False)
    idx, pad = s.indices_with_pad()
    assert len(idx) == 0 and len(pad) == 0


def test_sampler_pad_flag_survives_without_full_batch_padding():
    """The sampler's shard-equalizing duplicate must surface as
    _sample_pad even when the loader itself doesn't wrap-pad batches."""
    ds = _CountingDataset(3)  # 3 samples over 2 shards -> 1 duplicate
    sampler = ShardedSampler(3, num_shards=2, shard_id=1, shuffle=False)
    loader = DataLoader(ds, batch_size=1, num_workers=0, sampler=sampler)
    batches = list(loader)
    assert len(batches) == 2
    pads = [b.get("_sample_pad", np.zeros(1, bool))[0] for b in batches]
    assert sum(pads) == 1
