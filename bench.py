"""Headline benchmark: multi-scale relevancy maps/sec/chip (+ train steps/s).

Reproduces the reference's flagship workload — ``generate_relevancy.py
image`` (reference: generate_relevancy.py:394-451): a 9-label multi-scale
"ours"-config saliency extraction over a 640x480 image (4 crop scales x
(1 + 5 jitter augs) x horizontal flip, reference CLIP/clip/__init__.py:19-31)
with ViT-B/32 — and measures end-to-end maps/sec on one chip. Also measures
the secondary headlines: full-size OVSSC AND VOOL train steps/s (batch
1/chip, 128^3, 4 patches/descriptions, 80k in / 400k out pts — the
reference's regime, README.md:315; VOOL is the expensive two-UNet-stream
step), plus an analytic ``relevancy_tflops_per_sec`` (counted fwd-only ViT
FLOPs / synced latency — a deterministic MFU hook).

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

Resilience (round-2 postmortem): round 2 ended with no captured number
because a libtpu client/terminal version skew poisoned the persistent AOT
compile cache and backend init died (BENCH_r02.json rc=1). This script now
runs the measurement in a CHILD process with an init heartbeat + hard
timeout (a hanging tunnel init can't wedge the bench), checkpoints the
headline relevancy JSON before the secondary train measure (a train
failure/hang can't void a captured headline), salvages any JSON the child
printed before being killed, retries once (clearing ``.jax_cache`` only on
actual ERRORS — hangs and timeouts keep the cache, which a timed-out first
attempt has already warmed), and on a second failure prints a one-line
diagnostic JSON (``value: null`` + ``error``) with exit 0 so the round is
never blind.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import shutil
import subprocess
import sys
import time


# derived optimistic 3090 floor: 9 maps / (4.5 s host tiling + 4.4 s device)
# — see module docstring for the counted derivation; an estimate, not a
# measurement (no 3090 in this environment)
REFERENCE_3090_MAPS_PER_SEC = 1.0

CACHE_DIR = "/root/repo/.jax_cache"

# the headline 9-label workload (shared with scripts/bench_reference_cpu.py)
HEADLINE_LABELS = (
    "basketball jersey", "nintendo switch", "television",
    "ping pong table", "vase", "fireplace",
    "abstract painting of a vespa", "carpet", "wall",
)
HEADLINE_PROMPTS = ("a photograph of a {} in a home.",)
CHILD_TIMEOUT_S = int(os.environ.get("SEMABS_BENCH_TIMEOUT", "3000"))
# 3000 s: a cold persistent AOT cache pays every remote compile (the
# fused per-image saliency program + text encoder + the 128^3 OVSSC train
# step + the two-stream VOOL train step) before measuring.


def _tunnel_probe():
    """Timed tunnel characterization recorded IN the bench artifact.

    The headline is hostage to tunnel placement (this host live-migrates;
    measured windows range 20-100 MB/s and 7-75 ms RTT — see KERNELS.md's
    round-4 reconciliation), so every capture carries its own probe: a
    slow window is then attributable from the artifact alone, and the
    pipeline depth adapts to it (see _measure_relevancy).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    tiny = jnp.zeros((), jnp.float32) + 1.0
    np.asarray(tiny)
    add_one = jax.jit(lambda x: x + 1.0)
    np.asarray(add_one(tiny))  # compile outside the timed loop
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(add_one(tiny))
        rtts.append(time.perf_counter() - t0)
    rtt_s = min(rtts)

    mb = 4.0
    buf = np.random.RandomState(0).rand(
        int(mb * 1024 * 1024 // 4)).astype(np.float32)
    first = jax.jit(lambda x: x[:1])
    up_t = []
    for _ in range(2):
        t0 = time.perf_counter()
        d = jnp.asarray(buf)
        np.asarray(first(d))
        up_t.append(time.perf_counter() - t0)
    up_mbps = mb / max(min(up_t) - rtt_s, 1e-9)
    # readback: a FRESH device array per rep — jax.Array caches its host
    # copy after the first np.asarray, so re-reading one array measures
    # nothing (the round-5 first capture recorded 648 GB/s that way).
    # Measured PIPELINED (3 overlapping transfers): single-transfer
    # bandwidth understates what the pipeline's queued copy_to_host_async
    # transfers sustain (observed 28.5 maps/s minutes after a 7.2 MB/s
    # single-transfer probe).
    big = jnp.zeros((int(mb * 1024 * 1024 // 2),), jnp.float16)
    make = jax.jit(lambda b, s: b + s)
    np.asarray(make(big, jnp.float16(0)))  # compile outside the timing
    down_t = []
    for i in range(2):
        outs = [make(big, jnp.float16(3 * i + j + 1)) for j in range(3)]
        t0 = time.perf_counter()
        for o in outs:
            try:
                o.copy_to_host_async()
            except Exception:
                pass
        for o in outs:
            np.asarray(o)
        down_t.append(time.perf_counter() - t0)
    down_mbps = 3 * mb / max(min(down_t) - rtt_s, 1e-9)
    return {
        "tunnel_rtt_ms": round(rtt_s * 1e3, 2),
        "tunnel_upload_MBps": round(up_mbps, 1),
        "tunnel_readback_MBps": round(down_mbps, 1),
    }


# per-image wire bytes of the headline workload: 9 full-res f16 maps down,
# one uint8 frame + jitter params up
_MAP_READBACK_MB = 9 * 480 * 640 * 2 / 1e6
_IMG_UPLOAD_MB = 480 * 640 * 3 / 1e6


def _wire_ceiling(probe):
    """Physical maps/s ceiling of the probed tunnel: no pipeline can beat
    bytes/bandwidth. Recorded in the artifact so a wire-bound capture
    (value ~= ceiling) is attributable at a glance."""
    wire_s = (_MAP_READBACK_MB / max(probe["tunnel_readback_MBps"], 1e-6)
              + _IMG_UPLOAD_MB / max(probe["tunnel_upload_MBps"], 1e-6))
    return 9.0 / wire_s


def _probe_with_retry():
    """Tunnel probe with bounded retry. This host live-migrates; windows
    below ~20 MB/s readback make the 5.5 MB/image map readback the hard
    cap (e.g. 9.6 MB/s caps ANY full-res pipeline at ~15 maps/s
    regardless of compute). A catastrophic probe is re-taken up to 4
    times, 45 s apart, until one clears the threshold or retries run
    out; the LAST probe (the conditions closest in time to the
    measurement) is what the artifact reports, and every probe lands in
    probe_history so the capture conditions are never hidden."""
    history = []
    probe = _tunnel_probe()
    history.append(dict(probe))
    tries = 0
    # 28 MB/s on the PIPELINED probe scale: a 21 MB/s window measured
    # 19.9 maps/s (FIFO serialization takes ~35% off the bytes/bandwidth
    # ceiling), so clearing the 20-maps/s bar wants ~25+ MB/s
    while probe["tunnel_readback_MBps"] < 28.0 and tries < 4:
        print(f"tunnel probe degraded ({probe}); retrying in 45 s",
              file=sys.stderr, flush=True)
        time.sleep(45)
        probe = _tunnel_probe()
        history.append(dict(probe))
        tries += 1
    # measure under the LAST probe's conditions (closest in time to the
    # measurement itself) — never report an earlier, better window's probe
    probe = dict(probe)
    probe["probe_history"] = history
    return probe


def _measure_relevancy(probe):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from semantic_abstraction_tpu.clip import (
        ClipSaliency,
        VIT_B_32,
        init_clip_params,
        ours_config,
    )

    labels = list(HEADLINE_LABELS)
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
        img, labels, list(HEADLINE_PROMPTS), config,
        key=jax.random.PRNGKey(0),
    )
    np.asarray(maps)

    # latency: fully-synced per-image wall (best of 3)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        maps, _ = sal.get_clip_saliency(
            img, labels, list(HEADLINE_PROMPTS), config,
            key=jax.random.PRNGKey(i + 1),
        )
        np.asarray(maps)
        times.append(time.perf_counter() - t0)
    latency = min(times)

    # throughput: software-pipelined (the dataset writer's regime,
    # cli/generate_relevancy.py): image i's readback overlaps image i+1's
    # device compute. Each finished image's D2H starts IMMEDIATELY
    # (copy_to_host_async) so transfers ride under later images' compute;
    # np.asarray then just completes it. Depth (images in flight) adapts
    # to the probed tunnel: per-image host exposure is ~2 dispatch RTTs +
    # a 5.5 MB f16 map readback, and on a degraded tunnel (slow RTT or
    # <40 MB/s readback) a deeper queue keeps the device fed while
    # transfers drain. SEMABS_BENCH_PIPELINE overrides. Keys differ per
    # image so nothing is memoized; the final readbacks are inside the
    # timed region. MEDIAN of 3 passes (advisor round 3): the pipeline's
    # host thread is contention-sensitive — a single stalled pass must not
    # be the headline, and min-of-N would bias optimistic.
    import collections
    env_depth = os.environ.get("SEMABS_BENCH_PIPELINE")
    if env_depth:
        depth = int(env_depth)
    else:
        degraded = (probe["tunnel_rtt_ms"] > 15.0
                    or probe["tunnel_readback_MBps"] < 40.0)
        depth = 4 if degraded else 3
    k = 6

    def realize(m):
        np.asarray(m)

    walls = []
    for p in range(3):
        t0 = time.perf_counter()
        pending = collections.deque()
        for i in range(k):
            maps, _ = sal.get_clip_saliency(
                img, labels, list(HEADLINE_PROMPTS), config,
                key=jax.random.PRNGKey(100 + p * k + i),
            )
            try:
                maps.copy_to_host_async()
            except Exception:
                pass  # non-PjRt arrays: np.asarray below still syncs
            pending.append(maps)
            if len(pending) > depth:
                realize(pending.popleft())
        while pending:
            realize(pending.popleft())
        walls.append(time.perf_counter() - t0)
    walls.sort()

    # supplementary: device-compute rate with a 9-float readback per image
    # (per-label map means — execution of the full saliency still runs;
    # only the 5.5 MB transfer is omitted). On a catastrophically degraded
    # tunnel the headline is wire-bound (see _wire_ceiling); this field
    # shows what the CHIP did in the same window. Clearly labeled — it is
    # NOT the headline.
    reduce_fn = jax.jit(lambda m: jnp.mean(m, axis=(-2, -1)))
    np.asarray(reduce_fn(maps))  # compile outside the timing
    pending = collections.deque()
    t0 = time.perf_counter()
    for i in range(k):
        maps, _ = sal.get_clip_saliency(
            img, labels, list(HEADLINE_PROMPTS), config,
            key=jax.random.PRNGKey(900 + i),
        )
        pending.append(reduce_fn(maps))
        if len(pending) > depth:
            np.asarray(pending.popleft())
    while pending:
        np.asarray(pending.popleft())
    compute_rate = k * len(labels) / (time.perf_counter() - t0)

    # supplementary: the DATASET WRITER's regime — since the writer
    # downsamples to the store resolution ON DEVICE before readback
    # (cli/generate_relevancy._nearest_exact_device; the reference
    # interpolates on-GPU the same way, generate_relevancy.py:96-104),
    # its per-image readback is store-res (240x320 f16, ~1.4 MB) not
    # full-res. Clearly labeled — the headline `value` stays the
    # full-res image-demo regime.
    from semantic_abstraction_tpu.cli.generate_relevancy import (
        _nearest_exact_device,
    )

    ds_resize = _nearest_exact_device((h, w), (h // 2, w // 2))
    np.asarray(ds_resize(maps))  # compile outside the timing
    pending = collections.deque()
    t0 = time.perf_counter()
    for i in range(k):
        maps, _ = sal.get_clip_saliency(
            img, labels, list(HEADLINE_PROMPTS), config,
            key=jax.random.PRNGKey(950 + i),
        )
        m = ds_resize(maps)
        try:
            m.copy_to_host_async()
        except Exception:
            pass
        pending.append(m)
        if len(pending) > depth:
            np.asarray(pending.popleft())
    while pending:
        np.asarray(pending.popleft())
    writer_rate = k * len(labels) / (time.perf_counter() - t0)

    return (k * len(labels) / walls[1], latency, walls, depth, compute_rate,
            writer_rate)


def _measure_train():
    """Full-size OVSSC train steps/s (reference regime, README.md:315)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    return n / (time.perf_counter() - t0)


def _measure_train_vool():
    """Full-size VOOL train steps/s — the EXPENSIVE step (two completion
    streams through the UNet, reference net.py:528-557; regime
    README.md:315: batch 1/chip, 4 descriptions, 80k/400k pts)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    float(stats["loss"])  # host readback forces completion (axon tunnel)
    n = 4
    t0 = time.perf_counter()
    for _ in range(n):
        state, stats = step(state, batch)
    float(stats["loss"])
    return n / (time.perf_counter() - t0)


# Counted ViT-B/32 FLOPs of ONE headline image (fwd-only lower bound; the
# single-tail gradcam's extra per-label work and the resize matmuls are
# excluded, so the derived TFLOP/s understates the chip): 260 tiles x 6
# jitter images x 2 flip passes = 3120 forwards x ~8.82 GFLOP each
# (patchify 49x3072x768x2 + 12 blocks x [qkv 50x768x2304x2 + attn
# 2x50x50x768x2 + proj 50x768^2x2 + mlp 2x50x768x3072x2]).
VIT_B32_FWD_FLOPS = 2 * (
    49 * 3072 * 768
    + 12 * (50 * 768 * 2304 + 2 * 50 * 50 * 768 + 50 * 768 * 768
            + 2 * 50 * 768 * 3072)
)
HEADLINE_IMAGE_FLOPS = 3120 * VIT_B32_FWD_FLOPS


HEARTBEAT = "SEMABS_BENCH_BACKEND_OK"
INIT_TIMEOUT_S = int(os.environ.get("SEMABS_BENCH_INIT_TIMEOUT", "300"))


def _child_main():
    import jax

    if os.environ.get("SEMABS_BENCH_NO_CACHE") != "1":
        # persistent compile cache: first-ever run pays remote compiles
        # once; driver re-runs then start hot
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)

    # backend-init heartbeat: the orchestrator kills us fast if this never
    # arrives (a dead axon tunnel HANGS in init rather than erroring)
    devs = jax.devices()
    platform = devs[0].platform.lower()
    if platform not in ("tpu", "axon") and not os.environ.get(
        "SEMABS_BENCH_ALLOW_CPU"
    ):
        # never record a silent CPU-fallback number as if it were TPU
        print(f"refusing to bench on platform={platform!r} "
              f"(set SEMABS_BENCH_ALLOW_CPU=1 to override)", file=sys.stderr)
        sys.exit(3)
    print(HEARTBEAT, flush=True)

    probe = _probe_with_retry()
    (maps_per_sec, latency, walls, depth, compute_rate,
     writer_rate) = _measure_relevancy(probe)

    result = {
        "metric": "relevancy_maps_per_sec_per_chip",
        "value": round(maps_per_sec, 3),
        "unit": "maps/s (ours config, 480x640, 9 labels, ViT-B/32, "
                "pipelined readback, median of 3 passes)",
        "vs_baseline": round(maps_per_sec / REFERENCE_3090_MAPS_PER_SEC, 2),
        "latency_s_per_image": round(latency, 3),
        # analytic MFU hook: counted fwd-only ViT FLOPs over the SYNCED
        # per-image wall (deterministic numerator; see HEADLINE_IMAGE_FLOPS)
        "relevancy_tflops_per_sec": round(
            HEADLINE_IMAGE_FLOPS / latency / 1e12, 2),
        # per-pass walls (6 images each): spread >> min flags a contended
        # run in the artifact itself instead of silently absorbing it
        "pipeline_walls_s": [round(x, 3) for x in walls],
        "pipeline_depth": depth,
        # device-compute maps/s in the SAME window with a 9-float readback
        # per image (full saliency still executes; only the 5.5 MB map
        # transfer is omitted) — NOT the headline, shows the chip's rate
        # when the tunnel is the binding constraint
        "maps_per_sec_compute_bound": round(compute_rate, 3),
        # the dataset writer's regime: store-resolution (half-res f16)
        # readback after the writer's on-device nearest-exact downsample
        # — the production sweep's actual wire format (NOT the headline)
        "maps_per_sec_dataset_writer": round(writer_rate, 3),
        # physical wire ceiling of the probed tunnel (bytes/bandwidth):
        # value ~= ceiling means the capture was wire-bound, not chip-bound
        "wire_ceiling_maps_per_sec": round(_wire_ceiling(probe), 2),
        # tunnel probe fields: a slow capture window is attributable from
        # the artifact alone (clean windows: ~7-25 ms RTT, 20-100 MB/s;
        # probe_history shows the retry sequence when the first probe was
        # catastrophic)
        **probe,
        "baseline_note": "estimated 3090 floor 1.0 maps/s from counted "
                         "work (3120 ViT fwd + tail bwds + 4.5s host "
                         "tiling); see bench.py docstring",
    }
    # checkpoint the headline metric NOW: if a secondary train measure
    # dies or hangs, the parent salvages this line (it scans for the LAST
    # parseable JSON, so each later print supersedes it on success)
    result["train_steps_per_sec_ovssc"] = None
    result["train_steps_per_sec_vool"] = None
    result["train_error"] = "not reached"
    print(json.dumps(result), flush=True)

    try:
        train_sps = _measure_train()
        result["train_steps_per_sec_ovssc"] = round(train_sps, 3)
        result["train_unit"] = ("steps/s (128^3 voxels, 4 patches/descs, "
                                "80k/400k pts, bf16, batch 1/chip)")
        del result["train_error"]
    except Exception as e:  # secondary metric must not void the headline
        result["train_error"] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps(result), flush=True)

    try:
        vool_sps = _measure_train_vool()
        result["train_steps_per_sec_vool"] = round(vool_sps, 3)
    except Exception as e:
        result["vool_error"] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps(result), flush=True)


def _run_child(extra_env):
    import threading

    env = dict(os.environ, **extra_env)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )
    out_lines, err_chunks = [], []
    got_heartbeat = threading.Event()

    def _read_out():
        for line in proc.stdout:
            line = line.rstrip("\n")
            out_lines.append(line)
            if line.strip() == HEARTBEAT:
                got_heartbeat.set()

    def _read_err():
        err_chunks.append(proc.stderr.read())

    to = threading.Thread(target=_read_out, daemon=True)
    te = threading.Thread(target=_read_err, daemon=True)
    to.start()
    te.start()

    def _scan_json():
        # the result is the LAST stdout line that parses (the child
        # checkpoints a headline-only line before the train measure)
        for line in reversed(list(out_lines)):
            try:
                parsed = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
            if isinstance(parsed, dict) and "metric" in parsed:
                return line
        return None

    # phase 1: backend init must heartbeat quickly (a dead tunnel hangs)
    deadline = time.monotonic() + INIT_TIMEOUT_S
    while not got_heartbeat.is_set() and proc.poll() is None:
        if time.monotonic() > deadline:
            proc.kill()
            proc.wait()
            return None, (f"HUNG: no backend heartbeat within "
                          f"{INIT_TIMEOUT_S}s (dead tunnel blocks in init)")
        time.sleep(0.5)
    init_errored = proc.poll() is not None and not got_heartbeat.is_set()
    # phase 2: measurements + compiles get the long budget
    timed_out = False
    try:
        proc.wait(timeout=CHILD_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        timed_out = True
    to.join(timeout=10)
    te.join(timeout=10)
    line = _scan_json()
    if line is not None:
        # salvage a checkpointed/complete result even if the child then
        # hung in teardown through a wedged tunnel or died on a secondary
        return line, None
    if timed_out:
        return None, f"MEASURE_TIMEOUT: after {CHILD_TIMEOUT_S}s, no JSON"
    tail = ("".join(err_chunks) or "\n".join(out_lines)).strip().splitlines()[-8:]
    kind = "INIT_ERROR" if init_errored else "MEASURE_ERROR"
    return None, (f"{kind}: rc={proc.returncode}: " + " | ".join(tail))[-600:]


def main():
    if "--child" in sys.argv:
        _child_main()
        return

    line, err1 = _run_child({})
    if line is not None:
        print(line)
        return
    # Retry once. On an actual ERROR (init or measurement), suspect the
    # round-2 failure mode — a libtpu client/terminal version skew leaving
    # stale AOT executables that poison the run — so clear AND disable the
    # persistent cache. On a HANG (dead tunnel) or a measurement TIMEOUT
    # the cache is innocent and is the retry's best asset: a timed-out
    # first attempt has already persisted most compiled executables, so
    # the retry starts warm and fits the budget.
    if err1.startswith(("INIT_ERROR", "MEASURE_ERROR")):
        shutil.rmtree(CACHE_DIR, ignore_errors=True)
        retry_env = {"SEMABS_BENCH_NO_CACHE": "1"}
        retry_note = "cache cleared"
    else:
        retry_env = {}
        retry_note = "cache kept"
    line, err2 = _run_child(retry_env)
    if line is not None:
        print(line)
        return
    print(json.dumps({
        "metric": "relevancy_maps_per_sec_per_chip",
        "value": None,
        "unit": "maps/s",
        "vs_baseline": None,
        "error": f"attempt1: {err1}; attempt2 ({retry_note}): {err2}",
    }))


if __name__ == "__main__":
    main()
