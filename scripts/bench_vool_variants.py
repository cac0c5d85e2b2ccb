"""Measure one VOOL train-step variant (remat policy / desc_chunk / batch
chunk) at the full reference regime. One variant per process so an OOM
kills only that measurement.

Round-4 context: the bf16 staging grid halved the decoder-backward HBM
footprint (the largest single allocation of the step), which is new
evidence against two round-2 conclusions that were reached under the old
memory pressure — VOOL's `full` remat (`dots` measured a wash) and the
per-description serialization (all-at-once OOM'd). Re-measured here.

Usage: python scripts/bench_vool_variants.py [--remat full|dots]
       [--desc-chunk 1] [--reps 4]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", default="full", choices=["full", "dots"])
    ap.add_argument("--desc-chunk", type=int, default=1)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--stack", action="store_true",
                    help="stack target+reference into one batch-2 UNet pass")
    ap.add_argument("--no-unroll", action="store_true",
                    help="use the lax.map desc loop instead of the unroll")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from semantic_abstraction_tpu.models import (
        SemAbsVOOLConfig,
        init_semabs_vool,
    )
    from semantic_abstraction_tpu.runtime import (
        init_train_state,
        make_optimizer,
        make_train_step,
        vool_forward_loss,
    )

    base = SemAbsVOOLConfig()
    cfg = dataclasses.replace(
        base,
        completion=dataclasses.replace(
            base.completion, unet_remat_policy=args.remat),
        desc_chunk=args.desc_chunk,
        desc_unroll=not args.no_unroll,
        stack_streams=args.stack,
    )
    params = init_semabs_vool(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(num_training_steps=1000)
    state = init_train_state(params, tx)
    step = make_train_step(vool_forward_loss, cfg, tx,
                           compute_dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    batch = {
        "input_xyz_pts": jnp.asarray(
            rs.uniform(-1, 1.9, (1, 80000, 3)).astype(np.float32)),
        "input_target_saliency_pts": jnp.asarray(
            rs.randn(1, 4, 80000, 1).astype(np.float32)),
        "input_reference_saliency_pts": jnp.asarray(
            rs.randn(1, 4, 80000, 1).astype(np.float32)),
        "output_xyz_pts": jnp.asarray(
            rs.uniform(-1, 1.9, (1, 4, 400000, 3)).astype(np.float32)),
        "output_label_pts": jnp.asarray(
            rs.randint(0, 2, (1, 4, 400000)).astype(np.float32)),
        "spatial_relation_id": jnp.asarray(
            rs.randint(0, 6, (1, 4)).astype(np.int32)),
        "out_of_bounds_pts": jnp.zeros((1, 4, 400000), bool),
        "padding_mask": jnp.zeros((1, 4), bool),
    }
    state, stats = step(state, batch)
    float(stats["loss"])  # readback = the only true sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(args.reps):
        state, stats = step(state, batch)
    float(stats["loss"])
    sps = args.reps / (time.perf_counter() - t0)
    print(f"vool remat={args.remat} desc_chunk={args.desc_chunk} "
          f"unroll={not args.no_unroll} stack={args.stack}: "
          f"{sps:.3f} steps/s ({1e3 / sps:.0f} ms)")


if __name__ == "__main__":
    main()
