"""Measure the per-image dispatch-chain variants on the real chip.

Compares the headline relevancy image across dispatch structures:
- chain: 2 dispatches/image (prep+small-scales fused, big-scale+combine
  fused) — the default after round 5's _dispatch_fns restructure
- fused: 1 dispatch/image (fuse_scales=True, one mono program)

For each: synced latency, and pipelined maps/s at depths 2/3/4 with
copy_to_host_async readbacks. Run: python scripts/bench_dispatch_chain.py
"""
import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


LABELS = [
    "basketball jersey", "nintendo switch", "television",
    "ping pong table", "vase", "fireplace",
    "abstract painting of a vespa", "carpet", "wall",
]
PROMPTS = ["a photograph of a {} in a home."]


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from semantic_abstraction_tpu.clip import (
        ClipSaliency, VIT_B_32, init_clip_params, ours_config,
    )

    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)
    h, w = 480, 640
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (h, w, 3), dtype=np.uint8)
    params = init_clip_params(jax.random.PRNGKey(0), VIT_B_32)
    config = ours_config(h)

    variants = [("chain", False)]
    if os.environ.get("SEMABS_SKIP_FUSED") != "1":
        variants.append(("fused", True))
    for name, fuse in variants:
        sal = ClipSaliency(params, VIT_B_32, compute_dtype=jnp.bfloat16,
                           tile_batch_size=64, fuse_scales=fuse)
        t0 = time.perf_counter()
        try:
            maps, _ = sal.get_clip_saliency(
                img, LABELS, PROMPTS, config, key=jax.random.PRNGKey(0))
            np.asarray(maps)
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            continue
        compile_s = time.perf_counter() - t0
        n_disp = [n for _, n in sal._dispatch_jit.values()]

        lat = []
        for i in range(3):
            t0 = time.perf_counter()
            maps, _ = sal.get_clip_saliency(
                img, LABELS, PROMPTS, config, key=jax.random.PRNGKey(i + 1))
            np.asarray(maps)
            lat.append(time.perf_counter() - t0)

        depths = {}
        k = 6
        for depth in (2, 3, 4):
            walls = []
            for p in range(2):
                t0 = time.perf_counter()
                pending = collections.deque()
                for i in range(k):
                    m, _ = sal.get_clip_saliency(
                        img, LABELS, PROMPTS, config,
                        key=jax.random.PRNGKey(1000 + p * k + i))
                    try:
                        m.copy_to_host_async()
                    except Exception:
                        pass
                    pending.append(m)
                    if len(pending) > depth:
                        np.asarray(pending.popleft())
                while pending:
                    np.asarray(pending.popleft())
                walls.append(time.perf_counter() - t0)
            depths[depth] = {
                "maps_per_s": round(k * len(LABELS) / min(walls), 2),
                "walls": [round(x, 3) for x in walls],
            }
        print(json.dumps({
            "variant": name, "first_call_s": round(compile_s, 1),
            "dispatches": n_disp,
            "latency_s": round(min(lat), 3),
            "latency_all": [round(x, 3) for x in lat],
            "pipelined": depths,
        }), flush=True)


if __name__ == "__main__":
    main()
