"""A/B the 128-lane end-to-end basis on the full-size train steps.

Measures OVSSC and VOOL steps/s with blocked_basis on vs off (same
regime as bench.py: 128^3, 4 patches/descs, 80k/400k pts, bf16,
batch 1/chip). Run: python scripts/bench_blocked_basis.py [--skip-vool]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def measure_ovssc(blocked: bool, n: int = 5) -> float:
    from semantic_abstraction_tpu.models import SemAbs3DConfig, init_semabs3d
    from semantic_abstraction_tpu.runtime import (
        init_train_state, make_optimizer, make_train_step, ovssc_forward_loss,
    )

    cfg = SemAbs3DConfig(blocked_basis=blocked)
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
    print(f"ovssc blocked={blocked} loss={float(stats['loss']):.5f} "
          f"gn={float(stats['grad_norm']):.4f}", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(n):
        state, stats = step(state, batch)
    float(stats["loss"])
    return n / (time.perf_counter() - t0)


def measure_vool(blocked: bool, n: int = 4) -> float:
    from semantic_abstraction_tpu.models import (
        SemAbsVOOLConfig, init_semabs_vool,
    )
    from semantic_abstraction_tpu.runtime import (
        init_train_state, make_optimizer, make_train_step, vool_forward_loss,
    )

    cfg = SemAbsVOOLConfig()
    cfg = dataclasses.replace(
        cfg, completion=dataclasses.replace(
            cfg.completion, blocked_basis=blocked))
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
    print(f"vool blocked={blocked} loss={float(stats['loss']):.5f} "
          f"gn={float(stats['grad_norm']):.4f}", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(n):
        state, stats = step(state, batch)
    float(stats["loss"])
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-vool", action="store_true")
    ap.add_argument("--skip-plain", action="store_true")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)
    out = {}
    out["ovssc_blocked"] = round(measure_ovssc(True), 3)
    if not args.skip_plain:
        out["ovssc_plain"] = round(measure_ovssc(False), 3)
    print(json.dumps(out), flush=True)
    if not args.skip_vool:
        out["vool_blocked"] = round(measure_vool(True), 3)
        if not args.skip_plain:
            out["vool_plain"] = round(measure_vool(False), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
