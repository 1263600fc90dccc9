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


# container/meta rows that would double-count their children if summed
_CONTAINER_PREFIXES = ("jit(", "jit_", "pjit", "XLA Modules", "Steps",
                       "while", "body", "condition")

# rollup buckets for the full-step accounting table (--categories).
# Matched in order against "tf_op | hlo name" lowercased; first hit wins.
_CATEGORIES = (
    ("pallas_xl_attention", ("xl_attention", "xl_rel")),
    ("pallas_fused_attention", ("fused_attention", "attention_kernel",
                                "flash")),
    ("detection_heads", ("cls_head", "reg_head", "head/")),
    ("ffn_matmul", ("mlp", "ffn", "fc1", "fc2", "dense")),
    ("attention_xla", ("attn", "attention", "softmax")),
    ("conv_stem_branch", ("conv", "stem", "branch", "embd")),
    ("matmul_other", ("dot", "einsum", "matmul")),
    ("optimizer", ("adam", "optimizer", "opt_update", "fusedadam",
                   "update_step", "clip_by_global_norm", "global_norm")),
    ("norm", ("layer_norm", "layernorm", "group_norm", "rsqrt", "norm")),
    ("loss_assign", ("loss", "label", "assign", "iou", "focal", "one_hot",
                     "sigmoid", "log1p")),
    ("copy_reshape_transpose", ("copy", "reshape", "transpose", "slice",
                                "concatenate", "pad", "gather", "scatter",
                                "dynamic-update", "bitcast", "broadcast")),
    ("elementwise_fusion", ("fusion", "add", "mul", "sub", "div", "select",
                            "convert", "exp", "tanh", "max", "min", "cmp")),
    ("infeed_outfeed_host", ("infeed", "outfeed", "host", "transfer")),
)


def categorize(op: str) -> str:
    s = op.lower()
    for cat, keys in _CATEGORIES:
        if any(k in s for k in keys):
            return cat
    return "other"


def main():
    argv = [a for a in sys.argv[1:] if a != "--categories"]
    by_cat = "--categories" in sys.argv[1:]
    trace_dir = argv[0] if argv else "/tmp/jax_trace"
    top_n = int(argv[1]) if len(argv) > 1 else 25
    path, events = load_events(trace_dir)
    pids = device_pids(events)
    per_op = collections.defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (pids and e.get("pid") not in pids):
            continue
        name = e.get("name", "")
        # leaf device ops carry tf_op; fall back to the HLO name for the
        # rest (fusions etc.) so the table accounts for the WHOLE step,
        # but skip container rows (jit_*, while, per-dispatch frames)
        # that would double-count their children
        op = e.get("args", {}).get("tf_op")
        if not op:
            if any(name.startswith(p) for p in _CONTAINER_PREFIXES):
                continue
            op = name
        if not op:
            continue
        key = f"{op} | {name}" if by_cat else op
        dur = e.get("dur", 0) / 1e3  # us -> ms
        per_op[key][0] += dur
        per_op[key][1] += 1
        total += dur
    print(f"# {path}")
    print(f"# device total: {total:.2f} ms over "
          f"{sum(c for _, c in per_op.values())} events")
    if by_cat:
        cats = collections.defaultdict(lambda: [0.0, 0])
        for op, (ms, n) in per_op.items():
            c = categorize(op)
            cats[c][0] += ms
            cats[c][1] += n
        print(f"{'total_ms':>10} {'events':>7} {'%':>6}  category")
        for cat, (ms, n) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
            print(f"{ms:10.2f} {n:7d} {100 * ms / max(total, 1e-9):6.1f}  "
                  f"{cat}")
        print("# top uncategorized ops:")
        for op, (ms, n) in sorted(
                ((o, v) for o, v in per_op.items()
                 if categorize(o) == "other"),
                key=lambda kv: -kv[1][0])[:10]:
            print(f"  {ms:8.2f}  {op[:100]}")
        return
    print(f"{'total_ms':>10} {'events':>7} {'%':>6}  op")
    for op, (ms, n) in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top_n]:
        print(f"{ms:10.2f} {n:7d} {100 * ms / max(total, 1e-9):6.1f}  {op}")


if __name__ == "__main__":
    main()
