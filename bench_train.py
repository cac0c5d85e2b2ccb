"""Secondary benchmark: full-size OVSSC train steps/sec on one chip.

The driver records bench.py (relevancy maps/s); this script measures the
other headline metric — the 128^3 / 4-patch / 80k-in / 400k-out train
step of SemAbs3D (the reference trains this at batch 1/GPU,
README.md:315) — and prints one JSON line in the same format.

``vs_baseline`` compares against an RTX 3090 estimate of 0.5 steps/s for
the reference torch pipeline (unpublished; the reference's per-step work
is dominated by the same UNet + 400k-point decode).
"""
import json
import time

import numpy as np

REFERENCE_3090_STEPS_PER_SEC = 0.5  # estimated; see docstring


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

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
    float(stats["loss"])  # host readback forces completion (axon tunnel)
    # steady state: the train loop no longer syncs per step (scalars are
    # buffered and flushed every 16 steps), so dispatch runs ahead of the
    # device; measure N chained steps synced once at the end. Each step
    # consumes the previous state (donated), so nothing is memoized and the
    # last loss readback forces the whole chain.
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, stats = step(state, batch)
    float(stats["loss"])
    steps_per_sec = n / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "ovssc_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s (128^3 voxels, 4 patches, 80k/400k pts, bf16)",
        "vs_baseline": round(steps_per_sec / REFERENCE_3090_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
