"""Runtime tests: losses (torch-oracle parity), metrics, schedules (HF
transformers oracle), and the sharded train step on a virtual 8-device
mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semantic_abstraction_tpu.models import SemAbs3DConfig, init_semabs3d
from semantic_abstraction_tpu.parallel import make_mesh, shard_batch
from semantic_abstraction_tpu.runtime import (
    get_bce_weight,
    init_train_state,
    iou,
    make_eval_step,
    make_optimizer,
    make_schedule,
    make_train_step,
    ovssc_forward_loss,
    ovssc_loss,
    point_and_voxel_stats,
    prediction_analysis,
    vool_loss,
    voxelize_points,
)

SCENE_BOUNDS = ((-1.0, -1.0, -0.1), (1.0, 1.0, 1.9))


def test_bce_weight_matches_reference_semantics():
    rs = np.random.RandomState(0)
    labels = (rs.rand(2, 3, 50) > 0.7).astype(np.float32)
    w = np.asarray(get_bce_weight(jnp.asarray(labels), True))
    for b in range(2):
        for p in range(3):
            frac = labels[b, p].mean()
            pos = labels[b, p] > 0
            np.testing.assert_allclose(w[b, p][pos], 1.0 / (frac + 1e-10), rtol=1e-5)
            np.testing.assert_allclose(
                w[b, p][~pos], 1.0 / (1 - frac + 1e-10), rtol=1e-5
            )
    w_off = np.asarray(get_bce_weight(jnp.asarray(labels), False))
    assert (w_off == 1).all()


def test_ovssc_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(1)
    logits = rs.randn(2, 3, 40).astype(np.float32)
    labels = (rs.rand(2, 3, 40) > 0.5).astype(np.float32)
    ignore = rs.rand(2, 3, 40) > 0.8
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits)[~torch.from_numpy(ignore)],
        torch.from_numpy(labels)[~torch.from_numpy(ignore)],
    ).item()
    out = ovssc_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(ignore))
    np.testing.assert_allclose(float(out["loss"]), ref, rtol=1e-5)


def test_vool_loss_unmasked_like_reference():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(2)
    logits = rs.randn(1, 2, 30).astype(np.float32)
    labels = (rs.rand(1, 2, 30) > 0.5).astype(np.float32)
    ignore = rs.rand(1, 2, 30) > 0.5
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    out = vool_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(ignore))
    np.testing.assert_allclose(float(out["loss"]), ref, rtol=1e-5)


def test_prediction_analysis_matches_loop():
    rs = np.random.RandomState(3)
    pred = rs.rand(2, 3, 100) > 0.5
    label = rs.rand(2, 3, 100) > 0.5
    ignore = rs.rand(2, 3, 100) > 0.7
    out = {k: np.asarray(v) for k, v in prediction_analysis(
        jnp.asarray(pred), jnp.asarray(label), jnp.asarray(ignore)
    ).items()}
    for b in range(2):
        for p in range(3):
            m = ~ignore[b, p]
            cp, cl = pred[b, p][m], label[b, p][m]
            tp = (cp & cl).sum()
            union = (cp | cl).sum()
            np.testing.assert_allclose(out["iou"][b, p], tp / union, rtol=1e-5)
            np.testing.assert_allclose(
                out["precision"][b, p],
                tp / cp.sum() if cp.sum() else np.nan, rtol=1e-5,
            )
            np.testing.assert_allclose(
                out["recall"][b, p], tp / cl.sum() if cl.sum() else np.nan,
                rtol=1e-5,
            )
            np.testing.assert_allclose(
                out["false_negative"][b, p], (cl & ~cp).mean(), rtol=1e-5
            )
            np.testing.assert_allclose(
                out["false_positive"][b, p], (~cl & cp).mean(), rtol=1e-5
            )


def test_voxelize_points_semantics():
    rs = np.random.RandomState(4)
    xyz = rs.uniform(-1, 1.9, (1, 1, 200, 3)).astype(np.float32)
    pred = rs.rand(1, 1, 200) > 0.5
    label = rs.rand(1, 1, 200) > 0.5
    ignore = np.zeros((1, 1, 200), bool)
    out = voxelize_points(
        jnp.asarray(pred), jnp.asarray(label), jnp.asarray(xyz),
        (8, 8, 8), SCENE_BOUNDS, jnp.asarray(ignore),
    )
    assert out["prediction"].shape == (1, 1, 512)
    # voxels containing no points must be ignored (missing label)
    covered = np.asarray(out["ignore"])[0, 0]
    assert covered.sum() > 0  # empty voxels exist in a sparse cloud
    # a voxel with a positive label point must be labeled positive
    lab = np.asarray(out["label"])[0, 0]
    assert lab.sum() > 0


def test_cutoff_sweep_shapes():
    rs = np.random.RandomState(5)
    logits = jnp.asarray(rs.randn(1, 2, 100).astype(np.float32))
    labels = jnp.asarray((rs.rand(1, 2, 100) > 0.5))
    xyz = jnp.asarray(rs.uniform(-1, 1.9, (1, 2, 100, 3)).astype(np.float32))
    ignore = jnp.zeros((1, 2, 100), bool)
    cutoffs = tuple(np.arange(-2.5, 0, 0.5))
    out = point_and_voxel_stats(
        logits, labels, xyz, ignore, cutoffs, SCENE_BOUNDS,
        voxel_shapes=((8, 8, 8),),
    )
    assert out["point_iou"].shape == (len(cutoffs), 1, 2)
    assert out["voxel8x8x8_iou"].shape == (len(cutoffs), 1, 2)


@pytest.mark.parametrize(
    "name", ["constant", "constant_with_warmup", "linear", "cosine",
             "cosine_with_restarts"]
)
def test_schedule_matches_transformers(name):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    total, warmup = 200, 20
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    ref_sched = transformers.get_scheduler(
        name, optimizer=opt, num_warmup_steps=warmup, num_training_steps=total
    )
    ours = make_schedule(name, warmup, total)
    for step in range(0, total + 10, 7):
        ref = ref_sched.lr_lambdas[0](step) if hasattr(ref_sched, "lr_lambdas") else None
        if ref is None:
            break
        got = float(ours(step))
        np.testing.assert_allclose(got, ref, atol=1e-6, err_msg=f"{name} step {step}")


TINY = SemAbs3DConfig(
    voxel_shape=(16, 16, 16),
    unet_num_channels=8,
    unet_f_maps=4,
    unet_num_groups=2,
    unet_num_levels=3,
    pts_feat_extractor_hidden_dim=16,
)


def _batch(rs, b):
    return {
        "input_xyz_pts": rs.uniform(-1, 1.9, (b, 64, 3)).astype(np.float32),
        "input_feature_pts": rs.randn(b, 2, 64, 1).astype(np.float32),
        "output_xyz_pts": rs.uniform(-1, 1.9, (b, 2, 128, 3)).astype(np.float32),
        "output_label_pts": rs.randint(0, 2, (b, 2, 128)).astype(np.float32),
        "out_of_bounds_pts": np.zeros((b, 2, 128), np.bool_),
        "out_of_frustum_pts_mask": np.zeros((b, 2, 128), np.bool_),
        "padding_mask": np.zeros((b, 2), np.bool_),
    }


def test_train_step_single_device_decreases_loss():
    rs = np.random.RandomState(6)
    params = init_semabs3d(jax.random.PRNGKey(0), TINY)
    tx = make_optimizer(lr=1e-2, num_warmup_steps=1, num_training_steps=50)
    state = init_train_state(params, tx)
    step = make_train_step(ovssc_forward_loss, TINY, tx,
                           compute_dtype=jnp.float32, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, _batch(rs, 1))
    losses = []
    for _ in range(8):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_train_step_bf16_compute_decreases_loss():
    """The production regime (compute_dtype=bfloat16) trains: exercises the
    bf16 cotangent path of the sampler VJP (bf16 staging grid,
    ops/sampling.py _grid_sample_cl_bwd) end-to-end. The loss must track
    the f32 step closely at step 1 and decrease like it."""
    rs = np.random.RandomState(6)
    params = init_semabs3d(jax.random.PRNGKey(0), TINY)
    batch = jax.tree_util.tree_map(jnp.asarray, _batch(rs, 1))
    losses = {}
    for dt in (jnp.float32, jnp.bfloat16):
        tx = make_optimizer(lr=1e-2, num_warmup_steps=1,
                            num_training_steps=50)
        state = init_train_state(params, tx)
        step = make_train_step(ovssc_forward_loss, TINY, tx,
                               compute_dtype=dt, donate=False)
        ls = []
        for _ in range(8):
            state, stats = step(state, batch)
            ls.append(float(stats["loss"]))
        losses[dt] = ls
    bf = losses[jnp.bfloat16]
    assert np.isfinite(bf).all()
    assert bf[-1] < bf[0]
    np.testing.assert_allclose(bf[0], losses[jnp.float32][0], rtol=2e-2)


def test_train_step_f16_wire_matches_f32():
    """device_batch(wire_dtype=float16) ships coords/features f16 and 0/1
    labels uint8 over the wire (the tunnel-bandwidth mitigation,
    experiment.py _WIRE_COMPRESSIBLE). The uint8 label cast is lossless
    (the loss casts back, losses.py:79); the f16 coordinate quantization
    must stay within bf16-compute tolerance of the f32-wire step."""
    from semantic_abstraction_tpu.runtime.experiment import device_batch

    rs = np.random.RandomState(8)
    params = init_semabs3d(jax.random.PRNGKey(0), TINY)
    raw = _batch(rs, 1)
    losses = {}
    for wire in (None, np.float16):
        b = device_batch(raw, "ovssc", wire_dtype=wire)
        assert b["output_label_pts"].dtype == np.uint8
        if wire is np.float16:
            assert b["input_xyz_pts"].dtype == np.float16
            assert b["output_xyz_pts"].dtype == np.float16
        tx = make_optimizer(lr=1e-2, num_warmup_steps=1,
                            num_training_steps=50)
        state = init_train_state(params, tx)
        step = make_train_step(ovssc_forward_loss, TINY, tx,
                               compute_dtype=jnp.bfloat16, donate=False)
        ls = []
        for _ in range(4):
            state, stats = step(state, b)
            ls.append(float(stats["loss"]))
        losses[wire] = ls
    assert np.isfinite(losses[np.float16]).all()
    np.testing.assert_allclose(losses[np.float16][0], losses[None][0],
                               rtol=2e-2)
    assert losses[np.float16][-1] < losses[np.float16][0]


def test_train_step_sharded_8_devices():
    assert len(jax.devices()) >= 8
    rs = np.random.RandomState(7)
    mesh = make_mesh(8)
    params = init_semabs3d(jax.random.PRNGKey(0), TINY)
    tx = make_optimizer(num_training_steps=10)
    state = init_train_state(params, tx)
    with mesh:
        batch = shard_batch(
            jax.tree_util.tree_map(jnp.asarray, _batch(rs, 8)), mesh
        )
        step = make_train_step(ovssc_forward_loss, TINY, tx, mesh=mesh,
                               compute_dtype=jnp.float32)
        state, stats = step(state, batch)
    assert np.isfinite(float(stats["loss"]))
    assert np.isfinite(float(stats["grad_norm"]))


@pytest.mark.slow
def test_sharded_matches_single_device():
    """DP on 8 chips == single-device on the concatenated batch."""
    rs = np.random.RandomState(8)
    batch_np = _batch(rs, 8)
    params = init_semabs3d(jax.random.PRNGKey(1), TINY)
    tx = make_optimizer(lr=1e-3, num_warmup_steps=1, num_training_steps=10)

    state1 = init_train_state(params, tx)
    step1 = make_train_step(ovssc_forward_loss, TINY, tx,
                            compute_dtype=jnp.float32, donate=False)
    state1, stats1 = step1(state1, jax.tree_util.tree_map(jnp.asarray, batch_np))

    mesh = make_mesh(8)
    state2 = init_train_state(params, tx)
    with mesh:
        sb = shard_batch(jax.tree_util.tree_map(jnp.asarray, batch_np), mesh)
        step2 = make_train_step(ovssc_forward_loss, TINY, tx, mesh=mesh,
                                compute_dtype=jnp.float32, donate=False)
        state2, stats2 = step2(state2, sb)
    np.testing.assert_allclose(
        float(stats1["loss"]), float(stats2["loss"]), rtol=1e-5
    )
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_eval_step():
    rs = np.random.RandomState(9)
    params = init_semabs3d(jax.random.PRNGKey(0), TINY)
    ev = make_eval_step(ovssc_forward_loss, TINY, compute_dtype=jnp.float32)
    aux = ev(params, jax.tree_util.tree_map(jnp.asarray, _batch(rs, 1)))
    assert aux["logits"].shape == (1, 2, 128)
    assert np.isfinite(float(aux["loss"]))


def test_iou_nan_on_empty_union():
    pred = jnp.zeros((1, 5), bool)
    lab = jnp.zeros((1, 5), bool)
    assert np.isnan(float(iou(pred, lab)[0]))


def test_all_gather_host_objects_single_process():
    """Single-process identity of the all_gather_object equivalent
    (reference utils.py:433-435); multi-process exchange is exercised by
    the same pickle/pad round-trip it performs internally."""
    import pandas as pd

    from semantic_abstraction_tpu.parallel.mesh import all_gather_host_objects

    df = pd.DataFrame({"a": [1.0, 2.0], "b": ["x", "y"]})
    out = all_gather_host_objects(df)
    assert len(out) == 1
    pd.testing.assert_frame_equal(out[0], df)
