"""E2E (loader-fed) OVSSC train throughput on the real chip.

bench.py measures the DEVICE step on synthetic device-resident batches;
the reference's regime is loader-fed (gzip-HDF5 scenes -> subsample ->
collate -> H2D, reference utils.py:506-520). This script builds a
full-size synthetic corpus once (480x640 frames, 500k-point full clouds,
random saliencies — the tests' schema-exact generator), then measures

- e2e steps/s: DataLoader (thread prefetch + native subsample kernels)
  feeding the jitted 128^3 train step, N steps of wall-clock
- loader_wait_frac: fraction of the wall spent blocked in next(batch)
  after the device dispatch went ahead — ~0 means the chip is not starved

Run: python scripts/bench_train_e2e.py [--steps 30] [--scenes 6]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np


def build_corpus(root: str, n_scenes: int) -> list:
    from synthetic_scene import make_scene

    os.makedirs(root, exist_ok=True)
    names = []
    for i in range(n_scenes):
        name = f"FloorPlan{i}_physics_0.hdf5"
        path = os.path.join(root, name)
        names.append(name)
        if os.path.exists(path):
            continue
        t0 = time.perf_counter()
        make_scene(path, rs=np.random.RandomState(i), h=480, w=640,
                   rel_h=240, rel_w=320, num_full_pts=500_000)
        print(f"built {name} in {time.perf_counter() - t0:.1f}s "
              f"({os.path.getsize(path) / 1e6:.1f} MB)", file=sys.stderr)
    return names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--scenes", type=int, default=6)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--corpus", default="/tmp/semabs_e2e_corpus")
    ap.add_argument("--wire", choices=["float32", "float16"],
                    default="float16",
                    help="H2D dtype for coords/features (float16 is the "
                         "tunnel-bandwidth regime: ~30 MB/step f32 vs a "
                         "20-100 MB/s tunnel; labels always ship uint8)")
    ap.add_argument("--task", choices=["ovssc", "vool"], default="ovssc")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from semantic_abstraction_tpu.data import (
        DataConfig,
        DataLoader,
        ObjectLocalizationDataset,
        SceneCompletionDataset,
    )
    from semantic_abstraction_tpu.models import (
        SemAbs3DConfig,
        SemAbsVOOLConfig,
        init_semabs3d,
        init_semabs_vool,
    )
    from semantic_abstraction_tpu.runtime import (
        init_train_state,
        make_optimizer,
        make_train_step,
        ovssc_forward_loss,
        vool_forward_loss,
    )

    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)
    names = build_corpus(args.corpus, args.scenes)

    dcfg = DataConfig(num_input_pts=80_000, num_output_pts=400_000)
    if args.task == "ovssc":
        ds = SceneCompletionDataset(args.corpus, names, dcfg)
        cfg = SemAbs3DConfig()
        params = init_semabs3d(jax.random.PRNGKey(0), cfg)
        fwd = ovssc_forward_loss
    else:
        ds = ObjectLocalizationDataset(args.corpus, names, dcfg)
        cfg = SemAbsVOOLConfig()
        params = init_semabs_vool(jax.random.PRNGKey(0), cfg)
        fwd = vool_forward_loss
    loader = DataLoader(ds, batch_size=1, num_workers=args.workers,
                        shuffle=True, seed=0, drop_last=False)

    tx = make_optimizer(num_training_steps=1000)
    state = init_train_state(params, tx)
    step = make_train_step(fwd, cfg, tx, compute_dtype=jnp.bfloat16)

    from semantic_abstraction_tpu.runtime.experiment import (
        device_batch as _device_batch,
    )

    wire = np.float16 if args.wire == "float16" else None

    def device_batch(b):
        return _device_batch(b, args.task, wire_dtype=wire)

    # warm: one step compiles + fills the prefetch window
    it = iter(loader)
    b = device_batch(next(it))
    state, stats = step(state, b)
    float(stats["loss"])

    n = args.steps
    waits = []
    t0 = time.perf_counter()
    done = 1
    while done <= n:
        tw = time.perf_counter()
        try:
            raw = next(it)
        except StopIteration:
            loader.set_epoch(done)
            it = iter(loader)
            raw = next(it)
        waits.append(time.perf_counter() - tw)
        b = device_batch(raw)
        state, stats = step(state, b)
        done += 1
    loss = float(stats["loss"])  # sync the whole chain
    wall = time.perf_counter() - t0
    out = {
        "metric": f"train_steps_per_sec_{args.task}_e2e",
        "value": round(n / wall, 3),
        "unit": "steps/s (loader-fed: gzip-HDF5 + subsample + collate + "
                "H2D + 128^3 train step, batch 1/chip)",
        "loader_wait_frac": round(sum(waits) / wall, 4),
        "loader_wait_s_per_step": round(sum(waits) / n, 4),
        "wall_s": round(wall, 2),
        "final_loss": round(loss, 5),
        "scenes": args.scenes,
        "workers": args.workers,
        "wire": args.wire,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
