"""Headline benchmark: multi-scale relevancy maps/sec/chip.

Reproduces the reference's flagship workload — ``generate_relevancy.py
image`` (reference: generate_relevancy.py:394-451): a 9-label multi-scale
"ours"-config saliency extraction over a 640x480 image (4 crop scales x
(1 + 5 jitter augs) x horizontal flip, reference CLIP/clip/__init__.py:19-31)
with ViT-B/32 — and measures end-to-end maps/sec on one chip.

The reference publishes no throughput number (BASELINE.md); the only
instrumentation is the un-recorded wall-clock print at
generate_relevancy.py:431. ``vs_baseline`` is an ESTIMATE, derived from
counted work rather than a guessed wall-clock:

- Tiling (exact reference create_tiles math, CLIP/clip/__init__.py:257-276,
  ours config at 480x640): 2+15+35+208 = 260 tiles/image x 6 jitter images
  = 1,560 tiles, x2 for the horizontal-flip pass = 3,120 ViT-B/32 forwards.
- Host preprocess: the reference PIL-crops + BICUBIC-resizes every tile on
  the host, single-threaded (its own comment calls this "currently biggest
  bottleneck", __init__.py:275). Measured here: ~2.9 ms/tile -> ~4.5 s for
  the 1,560 tiles.
- Device: 3,120 fp16 ViT-B/32 forwards at an optimistic 2,000 img/s
  (published 3090 fp16 batch-32 inference benchmarks run 1.5-2.5k img/s)
  ~= 1.6 s, plus 9 per-label ``torch.autograd.grad`` tail backwards per
  tile batch (head + final block ~= 0.2 fwd-equiv each, clip_gradcam.py:
  90-97) ~= 2.8 s -> ~4.4 s device.
- Serial host/device interleave (the reference overlaps nothing) ->
  ~8.9 s / 9 maps ~= 1.0 maps/s as the OPTIMISTIC 3090 floor. Observed
  wall-clocks reported by users are tens of seconds (0.3-0.4 maps/s); the
  floor is used as the baseline denominator to keep the multiple honest.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np


# derived optimistic 3090 floor: 9 maps / (4.5 s host tiling + 4.4 s device)
# — see module docstring for the counted derivation; an estimate, not a
# measurement (no 3090 in this environment)
REFERENCE_3090_MAPS_PER_SEC = 1.0


def main():
    import jax

    # persistent compile cache: first-ever run pays remote compiles once;
    # driver re-runs then start hot
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from semantic_abstraction_tpu.clip import (
        ClipSaliency,
        VIT_B_32,
        init_clip_params,
        ours_config,
    )

    labels = [
        "basketball jersey", "nintendo switch", "television",
        "ping pong table", "vase", "fireplace",
        "abstract painting of a vespa", "carpet", "wall",
    ]
    h, w = 480, 640
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (h, w, 3), dtype=np.uint8)

    params = init_clip_params(jax.random.PRNGKey(0), VIT_B_32)
    sal = ClipSaliency(params, VIT_B_32, compute_dtype=jnp.bfloat16,
                       tile_batch_size=64)
    config = ours_config(h)

    # warmup: compile every (scale, chunk) shape once.
    # NOTE: realize to HOST (np.asarray), not block_until_ready — through
    # the axon tunnel block_until_ready returns before execution finishes
    # and only a host readback actually waits for the device.
    maps, _ = sal.get_clip_saliency(
        img, labels, ["a photograph of a {} in a home."], config,
        key=jax.random.PRNGKey(0),
    )
    np.asarray(maps)

    # latency: fully-synced per-image wall (best of 3)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        maps, _ = sal.get_clip_saliency(
            img, labels, ["a photograph of a {} in a home."], config,
            key=jax.random.PRNGKey(i + 1),
        )
        np.asarray(maps)
        times.append(time.perf_counter() - t0)
    latency = min(times)

    # throughput: one-image-deep software pipeline (the dataset writer's
    # regime, cli/generate_relevancy.py): image i's host readback overlaps
    # image i+1's device compute. Keys differ per image so nothing is
    # memoized; the final readback is inside the timed region.
    k = 4
    t0 = time.perf_counter()
    pending = None
    for i in range(k):
        maps, _ = sal.get_clip_saliency(
            img, labels, ["a photograph of a {} in a home."], config,
            key=jax.random.PRNGKey(100 + i),
        )
        if pending is not None:
            np.asarray(pending)
        pending = maps
    np.asarray(pending)
    wall = time.perf_counter() - t0
    maps_per_sec = k * len(labels) / wall

    print(json.dumps({
        "metric": "relevancy_maps_per_sec_per_chip",
        "value": round(maps_per_sec, 3),
        "unit": "maps/s (ours config, 480x640, 9 labels, ViT-B/32, "
                "pipelined readback)",
        "vs_baseline": round(maps_per_sec / REFERENCE_3090_MAPS_PER_SEC, 2),
        "latency_s_per_image": round(latency, 3),
        "baseline_note": "estimated 3090 floor 1.0 maps/s from counted "
                         "work (3120 ViT fwd + tail bwds + 4.5s host "
                         "tiling); see bench.py docstring",
    }))


if __name__ == "__main__":
    main()
