#!/usr/bin/env python
"""Capture + aggregate a TPU profiler trace for any jitted callable.

The reference relies on torch.profiler / nsys; the JAX-native equivalent is
``jax.profiler.trace`` + this aggregator, which parses the exported
Perfetto JSON and reports where device time goes (op category, individual
fusions with shapes). This is the exact workflow that found the fp32
feature-map materialization documented in PERF.md.

Library use:
    from tools.profile_trace import capture, aggregate
    trace_dir = capture(lambda: fn(*args))        # runs fn under the tracer
    report = aggregate(trace_dir, steps=N)        # ms/step per op
    print(format_report(report))

CLI (aggregate an existing trace dir):
    python tools/profile_trace.py /tmp/jaxtrace --steps 5 --top 20
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def capture(fn, trace_dir: str | None = None) -> str:
    """Run ``fn()`` under jax.profiler.trace; returns the trace dir.
    Call the jitted function once BEFORE capture so compile time is
    excluded."""
    import jax

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="jaxtrace_")
    with jax.profiler.trace(trace_dir):
        out = fn()
        jax.block_until_ready(out)
    return trace_dir


def _find_trace_json(trace_dir: str) -> str:
    hits = sorted(
        glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    )
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    return hits[-1]


def aggregate(trace_dir: str, steps: int = 1) -> dict:
    """Parse the trace and return {categories, top_ops, while_ms}:
    durations summed over complete events that carry an HLO long_name
    (device op lanes), divided by ``steps``."""
    events = json.load(gzip.open(_find_trace_json(trace_dir)))["traceEvents"]
    cat = collections.Counter()
    cat_n = collections.Counter()
    ops = collections.defaultdict(float)
    while_ms = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if not e.get("args", {}).get("long_name"):
            continue
        name = e["name"]
        if name.startswith("while"):
            while_ms = max(while_ms, e["dur"] / 1e3)
            continue
        base = re.sub(r"[.\d]+$", "", name)
        cat[base] += e["dur"]
        cat_n[base] += 1
        ops[(name, e["args"]["long_name"][:160])] += e["dur"]
    total = sum(cat.values())
    return {
        "steps": steps,
        "total_ms_per_step": total / 1e3 / steps,
        "while_ms_per_step": while_ms / steps,
        "categories": [
            {
                "op": b,
                "ms_per_step": d / 1e3 / steps,
                "pct": 100.0 * d / total if total else 0.0,
                "count": cat_n[b],
            }
            for b, d in cat.most_common()
        ],
        "top_ops": [
            {"name": n, "ms_per_step": d / 1e3 / steps, "hlo": hlo}
            for (n, hlo), d in sorted(ops.items(), key=lambda kv: -kv[1])
        ],
    }


def format_report(report: dict, top: int = 15) -> str:
    lines = [
        f"device op time: {report['total_ms_per_step']:.2f} ms/step"
        + (
            f" (outer while: {report['while_ms_per_step']:.2f})"
            if report["while_ms_per_step"]
            else ""
        ),
        "-- categories --",
    ]
    for c in report["categories"][:top]:
        lines.append(
            f"{c['ms_per_step']:9.2f} ms ({c['pct']:4.1f}%)  x{c['count']:5d}  {c['op']}"
        )
    lines.append("-- top ops --")
    for o in report["top_ops"][:top]:
        lines.append(f"{o['ms_per_step']:9.2f} ms  {o['name']}")
        lines.append(f"           {o['hlo'][:120]}")
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("trace_dir")
    p.add_argument("--steps", type=int, default=1,
                   help="divide durations by this (e.g. scan length)")
    p.add_argument("--top", type=int, default=15)
    args = p.parse_args(argv)
    print(format_report(aggregate(args.trace_dir, args.steps), args.top))


if __name__ == "__main__":
    main()
