"""Op-level trace of the full-size OVSSC train step on the real chip.

Captures a jax.profiler trace around chained steady-state steps and, if
tensorboard-plugin-profile is present, converts the xplane to per-op
statistics (top self-time ops) to locate the non-conv time in the step.

Usage: python scripts/profile_train_step.py [--steps 3] [--out /tmp/tsprof]
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/tsprof")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

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
    float(stats["loss"])  # warm compile + first exec

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, stats = step(state, batch)
        float(stats["loss"])
    print("trace captured", file=sys.stderr)

    planes = glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                       recursive=True)
    if not planes:
        print("no xplane files found under", args.out)
        return
    path = max(planes, key=os.path.getmtime)
    print("xplane:", path, file=sys.stderr)

    def opstats_fallback(reason):
        # the baked TF's C++ protobuf bindings reject the plugin's
        # generated protos — at import OR at call time (the plugin can
        # import fine and still die in _pywrap_profiler); xplane_opstats.py
        # parses the XSpace directly under the pure-python protobuf
        # implementation, so BOTH failure modes chain to it
        print("tensorboard_plugin_profile unusable:", reason, file=sys.stderr)
        print("falling back to scripts/xplane_opstats.py", file=sys.stderr)
        env = dict(os.environ, PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python")
        import subprocess
        raise SystemExit(subprocess.call(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "xplane_opstats.py"),
             path, "--top", str(args.top), "--steps", str(args.steps)],
            env=env))

    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:
        opstats_fallback(e)
    any_tool_ok = False
    for tool in ("framework_op_stats^", "op_profile^", "overview_page^"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data([path], tool, {})
            out_path = os.path.join(args.out, tool.strip("^") + ".json")
            if isinstance(data, bytes):
                data = data.decode("utf-8", "replace")
            with open(out_path, "w") as f:
                f.write(data)
            print("wrote", out_path, file=sys.stderr)
            any_tool_ok = True
        except Exception as e:
            print(f"{tool}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
    if not any_tool_ok:
        opstats_fallback("all tool conversions raised at call time")

    # framework_op_stats is a JSON table; print top self-time rows
    fos = os.path.join(args.out, "framework_op_stats.json")
    if os.path.exists(fos):
        try:
            tbl = json.load(open(fos))
            # gviz table: [ {cols, rows}, ... ]
            t0 = tbl[0] if isinstance(tbl, list) else tbl
            cols = [c.get("label", c.get("id", "?")) for c in t0["cols"]]
            rows = [[c.get("v") for c in r["c"]] for r in t0["rows"]]
            try:
                sti = next(i for i, c in enumerate(cols)
                           if "self" in c.lower() and "time" in c.lower())
            except StopIteration:
                sti = 2
            rows.sort(key=lambda r: -(r[sti] or 0))
            print("\t".join(map(str, cols)))
            for r in rows[: args.top]:
                print("\t".join(str(x) for x in r))
        except Exception as e:
            print("could not summarize framework_op_stats:", e)


if __name__ == "__main__":
    main()
