"""Aggregate per-op self-times from a jax.profiler xplane.pb capture.

tensorboard-plugin-profile's converter is unusable in this image (its
`_pywrap_profiler.xspace_to_tools_data` binding is absent from the baked
TF), so this parses the XSpace proto directly. The TPU device plane has
two op timelines: "XLA Ops" (the serial tensor-core timeline — its events
can NEST, e.g. a `while` encloses its body ops) and "Async XLA Ops"
(DMA copies that overlap compute). This reports:

- per-step wall from the "XLA Modules" line,
- nesting-aware SELF times on the sync line, grouped by HLO category,
  by repo source line (from `source_stack`), and by op,
- the async-copy total separately (overlapped; not added to sync time).

Usage: python scripts/xplane_opstats.py /path/to/xplane.pb_or_dir
         [--top 40] [--json OUT] [--steps N  # divide by N for per-step]
"""
import argparse
import collections
import glob
import json
import os
import re
import sys


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def tpu_plane(xs):
    for p in xs.planes:
        if p.name.startswith("/device:") and "CUSTOM" not in p.name:
            return p
    sys.exit("no device plane found")


def _stat_map(plane, ev):
    sn = plane.stat_metadata
    md = plane.event_metadata[ev.metadata_id]
    out = {}
    for st in list(ev.stats) + list(md.stats):
        k = sn[st.metadata_id].name if st.metadata_id in sn else "?"
        if st.str_value:
            out[k] = st.str_value
        elif st.ref_value and st.ref_value in sn:
            out[k] = sn[st.ref_value].name
        elif st.int64_value or st.uint64_value:
            out[k] = st.int64_value or st.uint64_value
        elif st.double_value:
            out[k] = st.double_value
    return out


def _repo_frame(stack: str) -> str:
    """First source_stack frame inside the package (most specific)."""
    for ln in stack.splitlines():
        m = re.match(r"(.*?/semantic_abstraction_tpu/.*?):(\d+)", ln)
        if m:
            return f"{m.group(1).split('semantic_abstraction_tpu/')[-1]}:{m.group(2)}"
    first = stack.splitlines()[0] if stack else ""
    return first.rsplit(":", 1)[0] if first else "?"


def self_times(plane, line_name="XLA Ops"):
    """Nesting-aware self times: child durations are subtracted from the
    innermost enclosing event (events on a TC line nest by interval)."""
    out = []
    for line in plane.lines:
        if line.name != line_name:
            continue
        evs = sorted(line.events, key=lambda e: (e.offset_ps, -e.duration_ps))
        stack = []  # (end_ps, index into out)
        for ev in evs:
            start, end = ev.offset_ps, ev.offset_ps + ev.duration_ps
            while stack and stack[-1][0] <= start:
                stack.pop()
            out.append([ev, ev.duration_ps])
            if stack:
                out[stack[-1][1]][1] -= ev.duration_ps
            stack.append((end, len(out) - 1))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("xplane", help="xplane.pb path or a dir to search")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--json", default=None)
    ap.add_argument("--steps", type=int, default=None,
                    help="divide totals by N (per-step view)")
    args = ap.parse_args()
    path = args.xplane
    if os.path.isdir(path):
        cands = glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                          recursive=True)
        if not cands:
            sys.exit(f"no xplane.pb under {path}")
        path = max(cands, key=os.path.getmtime)
        print(f"# {path}", file=sys.stderr)
    xs = load_xspace(path)
    plane = tpu_plane(xs)

    module_walls = []
    for line in plane.lines:
        if line.name == "XLA Modules":
            module_walls = [e.duration_ps / 1e9 for e in line.events]
    n = args.steps or (len(module_walls) or 1)
    print(f"module executions: {len(module_walls)}; "
          f"walls(ms): {[round(w, 1) for w in module_walls]}")

    rows = self_times(plane)
    per_cat = collections.defaultdict(int)
    per_src = collections.defaultdict(lambda: [0, 0, ""])
    per_op = collections.defaultdict(lambda: [0, 0, "", ""])
    total = 0
    for ev, self_ps in rows:
        stats = _stat_map(plane, ev)
        cat = stats.get("hlo_category", "?")
        src = _repo_frame(stats.get("source_stack", ""))
        md = plane.event_metadata[ev.metadata_id]
        name = md.display_name or md.name
        base = name.split(".")[0]
        per_cat[cat] += self_ps
        r = per_src[src]
        r[0] += self_ps
        r[1] += 1
        r[2] = cat
        o = per_op[base]
        o[0] += self_ps
        o[1] += 1
        o[2] = cat
        o[3] = src
        total += self_ps

    async_total = sum(d for _, d in self_times(plane, "Async XLA Ops"))

    print(f"\nsync TC self-time total: {total / 1e9 / n:.1f} ms/step"
          f" (async-DMA overlapped: {async_total / 1e9 / n:.1f} ms/step)")
    print("\n== by HLO category (self, ms/step) ==")
    for cat, ps in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"{ps / 1e9 / n:9.2f} ms {100 * ps / total:5.1f}%  {cat}")
    print(f"\n== top {args.top} source lines (self, ms/step) ==")
    srows = sorted(per_src.items(), key=lambda kv: -kv[1][0])
    for src, (ps, cnt, cat) in srows[: args.top]:
        print(f"{ps / 1e9 / n:9.2f} ms {100 * ps / total:5.1f}% x{cnt:<5d}"
              f" [{cat:<20s}] {src}")
    print(f"\n== top {args.top} ops (self, ms/step) ==")
    orows = sorted(per_op.items(), key=lambda kv: -kv[1][0])
    for name, (ps, cnt, cat, src) in orows[: args.top]:
        print(f"{ps / 1e9 / n:9.2f} ms {100 * ps / total:5.1f}% x{cnt:<5d}"
              f" [{cat:<20s}] {name}  <{src}>")
    if args.json:
        payload = {
            "module_walls_ms": module_walls,
            "n_steps": n,
            "sync_self_total_ps": total,
            "async_total_ps": async_total,
            "by_category": dict(per_cat),
            "by_source": {k: {"ps": v[0], "count": v[1], "category": v[2]}
                          for k, v in srows},
            "by_op": {k: {"ps": v[0], "count": v[1], "category": v[2],
                          "source": v[3]} for k, v in orows},
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
