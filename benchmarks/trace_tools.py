"""Profiler-trace aggregation for the bench legs.

The reference has no profiler at all (SURVEY §5.1 — ad-hoc wall-clock
prints); every optimization in ``PERF_NOTES.md`` was driven by
``jax.profiler`` traces of the self-play step.  The interval aggregation
used for those logs lived in throwaway scripts; this is the committed
version.

Usage:
    BENCH_TRACE_DIR=/tmp/tr BENCH_SKIP_TTT=1 ... python bench.py
    python benchmarks/trace_tools.py /tmp/tr [--top 40] [--by line|cat|op]

Reads the newest ``*.trace.json.gz`` under the dir, keeps TensorCore-lane
complete events, and prints exclusive-time totals grouped by op name,
HLO category, or source line — the view that exposes serialized gathers,
layout copies ("transpose"/"copy" fusions) and the per-op long tail that
aggregate wall-clock hides.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def find_trace(root: str) -> str:
    paths = glob.glob(
        os.path.join(root, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {root}")
    return max(paths, key=os.path.getmtime)


def load_events(path: str):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Map pid/tid -> line name so we can keep device compute lanes only.
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
    out = []
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = names.get((e.get("pid"), e.get("tid")), "")
        out.append((lane, e))
    return out


def device_steps(events, lane_contains=("XLA Ops", "Steps", "TensorCore")):
    return [
        e for lane, e in events
        if any(s in lane for s in lane_contains) or "/device:" in lane
    ]


def aggregate(events, by: str = "op"):
    """Exclusive time per key.  Device op lanes don't nest in practice, so
    exclusive == duration; keyed by op name / hlo_category / source line."""
    totals = collections.Counter()
    counts = collections.Counter()
    for e in events:
        args = e.get("args", {}) or {}
        if by == "cat":
            key = args.get("hlo_category", args.get("tf_op", e["name"]))
        elif by == "line":
            key = args.get(
                "source_info",
                args.get("source", args.get("hlo_category", e["name"])),
            )
        else:
            key = e["name"]
        dur = float(e.get("dur", 0.0))
        totals[key] += dur
        counts[key] += 1
    return totals, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=["op", "cat", "line"], default="op")
    args = ap.parse_args()

    path = find_trace(args.trace_dir)
    events = load_events(path)
    dev = device_steps(events)
    totals, counts = aggregate(dev, by=args.by)
    grand = sum(totals.values()) or 1.0
    print(f"# {path}")
    print(f"# {len(dev)} device events, {grand / 1e3:.1f} ms total")
    print(f"{'us_total':>12} {'pct':>6} {'count':>8}  key")
    for key, us in totals.most_common(args.top):
        print(f"{us:12.0f} {100 * us / grand:6.2f} {counts[key]:8d}  {key}")


if __name__ == "__main__":
    main()
