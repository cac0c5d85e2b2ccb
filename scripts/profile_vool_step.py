"""Op-level trace of the full-size VOOL train step on the real chip.

Counterpart of profile_train_step.py for the two-stream VOOL model
(reference train_vool.py regime: 128^3 grid, 4 descriptions, 80k/400k
points, per-description serialization). Parse the resulting xplane with
scripts/xplane_opstats.py.

Usage: python scripts/profile_vool_step.py [--steps 2] [--out /tmp/voolprof]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--out", default="/tmp/voolprof")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from semantic_abstraction_tpu.models import SemAbsVOOLConfig, init_semabs_vool
    from semantic_abstraction_tpu.runtime import (
        init_train_state,
        make_optimizer,
        make_train_step,
        vool_forward_loss,
    )

    cfg = SemAbsVOOLConfig()
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
    float(stats["loss"])  # warm compile + first exec
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, stats = step(state, batch)
        float(stats["loss"])
    print("trace written to", args.out)


if __name__ == "__main__":
    main()
