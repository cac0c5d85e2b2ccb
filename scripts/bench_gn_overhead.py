"""Upper-bound the GroupNorm-affine cost in the full OVSSC train step.

VERDICT round-3 item 5 asks whether folding the GN per-channel affine into
the following conv's weights (algebraically possible at batch 1:
conv(x*sc + bi, W) == conv(x, W*sc) + border-aware bias term) would recover
part of the ~20 ms of non-conv UNet overhead seen in round-2 profiles.

Before building the fold (per-step blocked-weight rescale + a border bias
map), this measures its CEILING: the full train step with the affine
replaced by identity (wrong numerics, identical shapes/layouts — every
read/write the affine performs disappears, which is MORE than any fold can
save since a fold still pays the moments). If the delta is small, the fold
is closed as structural.

Usage: python scripts/bench_gn_overhead.py [--reps 6]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def measure(reps):
    from semantic_abstraction_tpu.models import SemAbs3DConfig, init_semabs3d
    from semantic_abstraction_tpu.runtime import (
        init_train_state,
        make_optimizer,
        make_train_step,
        ovssc_forward_loss,
    )

    cfg = SemAbs3DConfig()
    params = init_semabs3d(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(num_training_steps=1000)
    state = init_train_state(params, tx)
    step = make_train_step(ovssc_forward_loss, cfg, tx,
                           compute_dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    batch = {
        "input_xyz_pts": jnp.asarray(
            rs.uniform(-1, 1.9, (1, 80000, 3)).astype(np.float32)),
        "input_feature_pts": jnp.asarray(
            rs.randn(1, 4, 80000, 1).astype(np.float32)),
        "output_xyz_pts": jnp.asarray(
            rs.uniform(-1, 1.9, (1, 4, 400000, 3)).astype(np.float32)),
        "output_label_pts": jnp.asarray(
            rs.randint(0, 2, (1, 4, 400000)).astype(np.float32)),
        "out_of_bounds_pts": jnp.zeros((1, 4, 400000), bool),
        "out_of_frustum_pts_mask": jnp.zeros((1, 4, 400000), bool),
        "padding_mask": jnp.zeros((1, 4), bool),
    }
    state, stats = step(state, batch)
    float(stats["loss"])  # readback = the only true sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(reps):
        state, stats = step(state, batch)
    float(stats["loss"])
    return reps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from semantic_abstraction_tpu.models import unet3d

    sps_base = measure(args.reps)
    print(f"baseline OVSSC step: {sps_base:.3f} steps/s "
          f"({1e3 / sps_base:.1f} ms)", flush=True)

    real_affine = unet3d._group_norm_affine

    def identity_affine(x, gid, num_groups, scale_c, bias_c, eps):
        return x

    unet3d._group_norm_affine = identity_affine
    try:
        sps_noaff = measure(args.reps)
    finally:
        unet3d._group_norm_affine = real_affine
    print(f"identity-GN  OVSSC step: {sps_noaff:.3f} steps/s "
          f"({1e3 / sps_noaff:.1f} ms)", flush=True)
    print(f"GN-affine ceiling: {1e3 / sps_base - 1e3 / sps_noaff:+.1f} ms/step")


if __name__ == "__main__":
    main()
