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


def xla_op_lanes(events) -> set:
    """(pid, tid) pairs whose thread is the per-op lane ('XLA Ops'),
    excluding the 'Steps' / 'XLA Modules' container lanes that mirror
    the whole dispatch as one event."""
    lanes = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            if "xla ops" in e.get("args", {}).get("name", "").lower():
                lanes.add((e.get("pid"), e.get("tid")))
    return lanes


def self_times(events):
    """Per-event SELF duration on one lane: events nest (a fusion/region
    row spans its children), so attributing raw durations double-counts
    — sort by (ts, -dur), maintain the containment stack, and subtract
    each child's span from its parent. Totals then sum to the true
    device-busy time (interval union)."""
    evs = sorted(events, key=lambda e: (e["ts"], -e.get("dur", 0)))
    out = []  # (event, self_dur_us)
    stack = []  # indices into out
    for e in evs:
        ts, dur = e["ts"], e.get("dur", 0)
        while stack and ts >= out[stack[-1]][0]["ts"] + \
                out[stack[-1]][0].get("dur", 0) - 1e-9:
            stack.pop()
        out.append([e, float(dur)])
        if stack:
            out[stack[-1]][1] -= dur
        stack.append(len(out) - 1)
    return out


# container/meta rows that would double-count their children if summed
_CONTAINER_PREFIXES = ("jit(", "jit_", "pjit", "XLA Modules", "Steps",
                       "while", "body", "condition")

# rollup buckets for the full-step accounting table (--categories).
# Matched in order against "tf_op | hlo name" lowercased; first hit wins.
# Keys reflect this repo's module names (PointTransformer flagship).
_CATEGORIES = (
    ("pallas_xl_attention", ("xl_rel_attention",)),
    ("pallas_fused_attention", ("fused_attention", "banded_attention",
                                "flash")),
    ("detection_heads", ("cls_head", "reg_head", "/offsets", "/logits")),
    ("ffn_matmul", ("mlp_fc", "ff1", "ff2", "channel_attn")),
    ("qkv_proj_matmul", ("qkv", "/proj", "btc,chd", "bthd,hdc",
                         "r_proj", "txt_proj")),
    ("attention_xla", ("attn", "softmax", "bhqk", "bqhd")),
    ("conv_embed_branch", ("conv_general", "embd", "branch", "depthwise",
                           "downsample", "stem")),
    ("optimizer", ("adam", "optimizer", "opt_update", "fusedadam",
                   "update_step", "clip_by_global_norm", "global_norm",
                   "sched")),
    ("norm", ("layer_norm", "layernorm", "group_norm", "ln_", "/ln",
              "rsqrt")),
    ("loss_assign_decode", ("loss", "label", "assign", "iou", "focal",
                            "one_hot", "log1p", "take_along_axis",
                            "cumsum", "sort", "top_k", "nms")),
    ("copy_reshape_transpose", ("copy", "reshape", "transpose", "slice",
                                "concatenate", "pad", "gather", "scatter",
                                "dynamic-update", "bitcast", "broadcast")),
    ("convert_dtype", ("convert_element_type", "convert")),
    ("scan_while_overhead", ("while", "body", "condition", "iota",
                             "select_n")),
    ("matmul_other", ("dot_general", "einsum", "matmul")),
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
    lanes = xla_op_lanes(events)
    raw = [e for e in events
           if e.get("ph") == "X"
           and (not pids or e.get("pid") in pids)
           and (not lanes or (e.get("pid"), e.get("tid")) in lanes)]
    per_op = collections.defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e, self_us in self_times(raw):
        name = e.get("name", "")
        # group by tf_op (source attribution) with the HLO name as the
        # fallback; SELF time only, so nested rows don't double-count
        op = e.get("args", {}).get("tf_op") or name
        if not op:
            continue
        key = f"{op} | {name}" if by_cat else op
        dur = self_us / 1e3  # us -> ms
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
