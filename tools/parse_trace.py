"""Summarize a jax.profiler device trace by op.

Usage: python tools/parse_trace.py /tmp/jax_trace [top_n]

Finds the newest *.trace.json.gz under the trace dir, groups device-side
events by `args.tf_op` (falling back to the event name), and prints the
top-N ops by total duration plus the grand total. Events appear once per
executed step (dispatches x scan length) — divide by that to get
per-step numbers; the tool prints totals and the event count so either
view is recoverable.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def load_events(trace_dir: str):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        doc = json.load(f)
    return paths[-1], doc.get("traceEvents", [])


def device_pids(events) -> set:
    """Process ids whose name marks them as a device (TPU/accelerator)."""
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if any(k in name.lower() for k in ("tpu", "device", "accel")):
                pids.add(e.get("pid"))
    return pids


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    path, events = load_events(trace_dir)
    pids = device_pids(events)
    per_op = collections.defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (pids and e.get("pid") not in pids):
            continue
        # only leaf device ops carry tf_op; container rows (jit_*, while,
        # per-dispatch frames) would double-count their children
        op = e.get("args", {}).get("tf_op")
        if not op:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        per_op[op][0] += dur
        per_op[op][1] += 1
        total += dur
    print(f"# {path}")
    print(f"# device total: {total:.2f} ms over "
          f"{sum(c for _, c in per_op.values())} events")
    print(f"{'total_ms':>10} {'events':>7} {'%':>6}  op")
    for op, (ms, n) in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top_n]:
        print(f"{ms:10.2f} {n:7d} {100 * ms / max(total, 1e-9):6.1f}  {op}")


if __name__ == "__main__":
    main()
