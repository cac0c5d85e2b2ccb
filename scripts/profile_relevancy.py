"""Stage-level profile of the headline relevancy workload (bench.py regime).

Breaks the synced per-image wall into its stages, each forced to completion
by a host readback (through the axon tunnel only a readback truly waits):

- tunnel transfer rates (upload f32/uint8, readback f16) and dispatch RTT
- text stage (tokenize host + encode + zeroshot reduce)
- prep stage (uint8 upload + /255 + 5x color jitter)
- each of the 4 per-scale dispatches (tiles -> gradcam -> canvas)
- combine + full (9, 480, 640) f16 map readback
- the 11-block ViT head scan alone at several batch sizes

Run on the real chip: `python scripts/profile_relevancy.py`. Used to
reconcile driver-captured maps/s across rounds (the host live-migrates
across machines and the tunnel rate with it) — see KERNELS.md.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> None:
    np.asarray(x)


def timeit(fn, n=3, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile-batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from semantic_abstraction_tpu.clip import (
        ClipSaliency, VIT_B_32, init_clip_params, ours_config,
    )
    from semantic_abstraction_tpu.clip.saliency import tile_plan

    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)
    labels = [
        "basketball jersey", "nintendo switch", "television",
        "ping pong table", "vase", "fireplace",
        "abstract painting of a vespa", "carpet", "wall",
    ]
    prompts = ["a photograph of a {} in a home."]
    h, w = 480, 640
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (h, w, 3), dtype=np.uint8)
    params = init_clip_params(jax.random.PRNGKey(0), VIT_B_32)
    sal = ClipSaliency(params, VIT_B_32, compute_dtype=jnp.bfloat16,
                       tile_batch_size=args.tile_batch)
    config = ours_config(h)
    out = {}

    # warmup / compile everything
    maps, _ = sal.get_clip_saliency(img, labels, prompts, config,
                                    key=jax.random.PRNGKey(0))
    sync(maps)

    # -- tunnel characterization -------------------------------------------
    tiny = jnp.zeros((), jnp.float32) + 1.0
    sync(tiny)
    add_one = jax.jit(lambda x: x + 1.0)
    add_one(tiny)
    out["dispatch_rtt_ms"] = timeit(lambda: sync(add_one(tiny)), n=5)[0] * 1e3
    print(json.dumps({"dispatch_rtt_ms": out["dispatch_rtt_ms"]}), file=sys.stderr, flush=True)

    up_mb = 8.0
    buf = np.zeros((int(up_mb * 1024 * 1024 // 4),), np.float32)
    probe = jax.jit(lambda x: x[:1])

    def upload():
        d = jnp.asarray(buf)
        sync(probe(d))

    t, _ = timeit(upload, n=args.reps)
    out["upload_MBps"] = up_mb / max(t - out["dispatch_rtt_ms"] / 1e3, 1e-9)
    print(json.dumps({"upload_MBps": out["upload_MBps"]}), file=sys.stderr, flush=True)

    down = jnp.zeros((int(up_mb * 1024 * 1024 // 2),), jnp.float16) + 1
    sync(down)
    t, _ = timeit(lambda: sync(down), n=args.reps)
    out["readback_MBps"] = up_mb / max(t, 1e-9)
    print(json.dumps({"readback_MBps": out["readback_MBps"]}), file=sys.stderr, flush=True)

    # -- stages -------------------------------------------------------------
    t, _ = timeit(lambda: sync(sal.zeroshot_weights(labels, prompts)),
                  n=args.reps)
    out["text_stage_s"] = t
    print(json.dumps({"text_stage_s": t}), file=sys.stderr, flush=True)

    base_u8 = jnp.asarray(np.ascontiguousarray(img.transpose(2, 0, 1)),
                          jnp.uint8)
    n_images = 1 + config.augmentations
    keys = jax.random.split(jax.random.PRNGKey(0), config.augmentations)
    prep = jax.jit(sal._prep_body(config.augmentations))

    def prep_stage():
        b = jnp.asarray(np.ascontiguousarray(img.transpose(2, 0, 1)), jnp.uint8)
        sync(probe(prep(b, keys).ravel()))

    out["prep_stage_s"] = timeit(prep_stage, n=args.reps)[0]
    print(json.dumps({"prep_stage_s": out["prep_stage_s"]}), file=sys.stderr, flush=True)

    images = prep(base_u8, keys)
    sync(probe(images.ravel()))
    zw = sal.zeroshot_weights(labels, prompts)
    plans = tile_plan((h, w), config.crops, n_images)
    out["scales"] = []
    for plan in plans:
        fn = sal._scale_fn((h, w), plan, config, int(zw.shape[1]), n_images)

        def run_scale(fn=fn):
            sync(probe(fn(sal.params["visual"], images, zw).ravel()))

        t, ts = timeit(run_scale, n=args.reps)
        out["scales"].append({
            "tile_size": plan.tile_size,
            "tiles": int(plan.offsets.shape[0]) * n_images,
            "best_s": t,
            "all_s": [round(x, 4) for x in ts],
        })
        print(json.dumps(out["scales"][-1]), file=sys.stderr, flush=True)

    # full map readback alone (canvases already computed on device)
    maps, _ = sal.get_clip_saliency(img, labels, prompts, config,
                                    key=jax.random.PRNGKey(7))
    sync(maps)
    t, _ = timeit(lambda: sync(maps), n=args.reps, warmup=0)
    out["map_readback_s"] = t
    out["map_readback_MB"] = maps.size * 2 / 1e6
    print(json.dumps({"map_readback_s": out["map_readback_s"]}), file=sys.stderr, flush=True)

    # whole image, synced (bench latency regime)
    def full():
        m, _ = sal.get_clip_saliency(img, labels, prompts, config,
                                     key=jax.random.PRNGKey(11))
        sync(m)

    out["full_synced_s"] = timeit(full, n=args.reps)[0]
    print(json.dumps({"full_synced_s": out["full_synced_s"]}), file=sys.stderr, flush=True)

    # -- ViT head scan alone ------------------------------------------------
    from semantic_abstraction_tpu.clip.relevancy import _vit_head
    out["head_scan"] = []
    # params passed as an ARGUMENT: closing over them bakes 87M f32 weights
    # into the HLO as constants and the remote compile request 413s
    f = jax.jit(
        lambda v, t: _vit_head(v, t, VIT_B_32, jnp.bfloat16, 11)
    )
    for b in (64, 96, 128, 192):
        tiles = jnp.asarray(rs.randn(b, 3, 224, 224).astype(np.float32),
                            jnp.bfloat16)
        visual = sal.params["visual"]
        sync(probe(f(visual, tiles).ravel()))

        def run(tiles=tiles):
            sync(probe(f(visual, tiles).ravel()))

        t, _ = timeit(run, n=args.reps)
        rtt = out["dispatch_rtt_ms"] / 1e3
        # 2 dispatches (scan + probe) per run; subtract RTT once
        dev = max(t - rtt, 1e-9)
        flops = b * 8.8e9 * 11 / 12
        out["head_scan"].append({
            "batch": b, "best_s": t, "tflops_per_s": flops / dev / 1e12,
        })
        print(json.dumps(out["head_scan"][-1]), file=sys.stderr, flush=True)

    stage_sum = (out["text_stage_s"] + out["prep_stage_s"]
                 + sum(s["best_s"] for s in out["scales"])
                 + out["map_readback_s"])
    out["stage_sum_s"] = stage_sum
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
