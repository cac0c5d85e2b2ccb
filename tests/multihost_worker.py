"""Subprocess worker for the 2-process ``jax.distributed`` smoke test.

Each process owns ONE virtual CPU device and runs the REAL multi-process
branches of parallel/mesh.py: ``jax.distributed.initialize`` (reference
NCCL init, utils.py:131-137), ``shard_batch`` via
``make_array_from_process_local_data`` (the torchrun per-rank DataLoader
equivalent), a sharded OVSSC train step with gradient pmean over the mesh
(DDP, utils.py:256-258), and ``all_gather_host_objects`` of a DataFrame
(dist.all_gather_object, utils.py:433-435).

Usage: python multihost_worker.py <coordinator_port> <process_id>
       <num_processes> <out_json>
"""
import json
import sys


def main():
    port, pid, nprocs, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    # the axon sitecustomize forces JAX_PLATFORMS=axon; config beats env
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs
    assert len(jax.local_devices()) == 1
    assert len(jax.devices()) == nprocs

    import numpy as np
    import pandas as pd

    from semantic_abstraction_tpu.models import SemAbs3DConfig, init_semabs3d
    from semantic_abstraction_tpu.parallel import (
        all_gather_host_objects,
        make_mesh,
        shard_batch,
    )
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

    # the GLOBAL batch is the same deterministic array on every process;
    # each process feeds shard_batch only its local rows (the
    # ShardedSampler regime)
    rs = np.random.RandomState(0)
    b = nprocs
    global_batch = {
        "input_xyz_pts": rs.uniform(-1, 1.9, (b, 256, 3)).astype(np.float32),
        "input_feature_pts": rs.randn(b, 2, 256, 1).astype(np.float32),
        "output_xyz_pts": rs.uniform(-1, 1.9, (b, 2, 512, 3)).astype(np.float32),
        "output_label_pts": rs.randint(0, 2, (b, 2, 512)).astype(np.float32),
        "out_of_bounds_pts": np.zeros((b, 2, 512), np.bool_),
        "out_of_frustum_pts_mask": np.zeros((b, 2, 512), np.bool_),
        "padding_mask": np.zeros((b, 2), np.bool_),
    }
    local_batch = {k: v[pid : pid + 1] for k, v in global_batch.items()}

    mesh = make_mesh(nprocs, backend="cpu")
    step = make_train_step(
        ovssc_forward_loss, cfg, tx, mesh=mesh, compute_dtype=jax.numpy.float32
    )
    with mesh:
        sharded = shard_batch(local_batch, mesh)
        state, stats = step(state, sharded)
    loss = float(stats["loss"])
    grad_norm = float(stats["grad_norm"])

    # detailed-stats DataFrame gather across processes (DCN path)
    df = pd.DataFrame({"process": [pid] * 3, "iou": [0.1 * pid, 0.5, 0.9]})
    gathered = all_gather_host_objects(df)
    assert len(gathered) == nprocs
    gathered_ok = all(
        (gathered[i]["process"] == i).all() and len(gathered[i]) == 3
        for i in range(nprocs)
    )

    with open(out_path, "w") as f:
        json.dump({
            "process_id": pid,
            "loss": loss,
            "grad_norm": grad_norm,
            "gathered_ok": bool(gathered_ok),
        }, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
