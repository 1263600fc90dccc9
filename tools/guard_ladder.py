"""CL method quality-guard ladder (VERDICT r4 #4).

Runs the synthetic 3-task MQ ladder for ALL seven CL methods — including
mas, l2p and the full vilco recipe, which the round-4 ladder omitted —
with the EWC/MAS penalty at the reference's shipped lambda=3000
(MQ/configs/mq_ewc_all_larger.yaml:66 / mq_mas_all_2.yaml:66; the
synthetic tiny config defaults reg_lambda=0, which made the round-4 ewc
row IDENTICAL to naive — the penalty was a no-op).

Each row is one `vilco_tpu.bin.train_cl --synthetic` episode at identical
seed/dims; writes one JSON line per method to the output file as it goes.

Usage: python tools/guard_ladder.py [out.jsonl] [--tasks 3] [--epochs 4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

METHODS = [
    ("naive", []),
    ("ewc", ["--reg-lambda", "3000"]),
    ("mas", ["--reg-lambda", "3000"]),
    ("icarl", []),
    ("bic", []),
    ("l2p", []),
    ("vilco", []),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out", nargs="?", default="/tmp/guard_ladder.jsonl")
    p.add_argument("--tasks", type=int, default=3)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args()

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"

    with open(args.out, "w") as f:
        f.write("")
    for method, extra in METHODS:
        wd = tempfile.mkdtemp(prefix=f"guard_{method}_")
        cmd = [sys.executable, "-m", "vilco_tpu.bin.train_cl",
               "--synthetic", "--method", method,
               "--num-tasks", str(args.tasks),
               "--epochs", str(args.epochs),
               "--workdir", wd] + extra
        if args.seed is not None:
            cmd += ["--seed", str(args.seed)]
        t0 = time.time()
        r = subprocess.run(cmd, capture_output=True, text=True, env=env)
        row = {"method": method, "extra": extra,
               "wall_s": round(time.time() - t0, 1)}
        if r.returncode != 0:
            row["error"] = r.stderr[-2000:]
        else:
            last = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")][-1]
            row.update(json.loads(last))
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
