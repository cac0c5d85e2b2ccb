"""2-process ``jax.distributed`` smoke test: executes the REAL multi-process
branches of parallel/mesh.py (shard_batch's
make_array_from_process_local_data, all_gather_host_objects' DCN gather,
jax.distributed.initialize) that single-process CI otherwise never runs.

Both workers must agree with each other AND with a single-process step on
the same global batch (reference DDP semantics: gradient/loss pmean over
ranks == global-batch mean, utils.py:256-258).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(__file__)
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multihost")
    port = _free_port()
    env = dict(os.environ)
    # workers force CPU via jax.config themselves; scrub any forced device
    # count so each process gets exactly its own 1 device
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = (
        os.path.dirname(HERE) + os.pathsep + env.get("PYTHONPATH", "")
    )
    procs, outs = [], []
    for pid in range(2):
        out = tmp / f"proc{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2", str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    try:
        logs = [p.communicate(timeout=900)[0] for p in procs]
    except subprocess.TimeoutExpired:
        # one worker dying before initialize() leaves its sibling blocked
        # in the coordinator handshake forever — kill BOTH, don't leak a
        # process into the rest of the pytest session
        for p in procs:
            if p.poll() is None:
                p.kill()
        logs = [p.communicate()[0] for p in procs]
        pytest.fail("multihost worker timed out:\n"
                    + "\n---\n".join(log[-2000:] for log in logs))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [json.loads(out.read_text()) for out in outs]


def test_workers_agree(worker_results):
    r0, r1 = sorted(worker_results, key=lambda r: r["process_id"])
    assert r0["gathered_ok"] and r1["gathered_ok"]
    # pmean'd scalars are replicated across processes
    np.testing.assert_allclose(r0["loss"], r1["loss"], rtol=1e-6)
    np.testing.assert_allclose(r0["grad_norm"], r1["grad_norm"], rtol=1e-6)


def test_matches_single_process(worker_results):
    """DDP equivalence: 2-process sharded step == single-device step on the
    concatenated global batch (equal shard sizes -> pmean of per-shard
    means is the global mean)."""
    import jax

    from semantic_abstraction_tpu.models import SemAbs3DConfig, init_semabs3d
    from semantic_abstraction_tpu.runtime import (
        init_train_state,
        make_optimizer,
        make_train_step,
        ovssc_forward_loss,
    )

    cfg = SemAbs3DConfig(
        voxel_shape=(16, 16, 16),
        unet_num_channels=8,
        unet_f_maps=4,
        unet_num_groups=2,
        unet_num_levels=3,
        pts_feat_extractor_hidden_dim=16,
    )
    params = init_semabs3d(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(num_training_steps=100)
    state = init_train_state(params, tx)
    rs = np.random.RandomState(0)
    b = 2
    batch = {
        "input_xyz_pts": rs.uniform(-1, 1.9, (b, 256, 3)).astype(np.float32),
        "input_feature_pts": rs.randn(b, 2, 256, 1).astype(np.float32),
        "output_xyz_pts": rs.uniform(-1, 1.9, (b, 2, 512, 3)).astype(np.float32),
        "output_label_pts": rs.randint(0, 2, (b, 2, 512)).astype(np.float32),
        "out_of_bounds_pts": np.zeros((b, 2, 512), np.bool_),
        "out_of_frustum_pts_mask": np.zeros((b, 2, 512), np.bool_),
        "padding_mask": np.zeros((b, 2), np.bool_),
    }
    step = make_train_step(
        ovssc_forward_loss, cfg, tx, mesh=None, compute_dtype=jax.numpy.float32
    )
    _, stats = step(state, batch)
    single_loss = float(stats["loss"])
    for r in worker_results:
        np.testing.assert_allclose(r["loss"], single_loss, rtol=2e-5)
