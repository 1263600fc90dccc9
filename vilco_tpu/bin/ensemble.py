"""NLQ multi-model prediction ensembling CLI (NLQ/ensemble.py:104-153).

Reads N prediction JSONs ({"results": [{..., "predicted_times":
[[s, e, score], ...]}, ...]}), fuses each query's proposals across models
(top-1 center-cluster merge + per-model top-k append + temporal NMS to
exactly 5 spans — ops/ensemble.py), and writes a challenge submission
JSON.

  python -m vilco_tpu.bin.ensemble pred_a.json pred_b.json pred_c.json \
      --out ensemble_test.json [--max-input 4] [--top1-max-input 1]
"""

from __future__ import annotations

import argparse
import json

from vilco_tpu.ops.ensemble import ensemble_predictions


def fuse_files(predictions_per_model, max_input=4, top1_max_input=1):
    """predictions_per_model: list of N `results` lists (same query order).
    Returns fused results with exactly-5 predicted_times per query."""
    fused = []
    for items in zip(*predictions_per_model):
        per_model = [it["predicted_times"] for it in items]
        out = dict(items[0])
        out["predicted_times"] = ensemble_predictions(
            per_model, max_input=max_input, top1_max_input=top1_max_input,
        )
        fused.append(out)
    return fused


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("predictions", nargs="+",
                   help="two or more prediction json files")
    p.add_argument("--out", required=True)
    p.add_argument("--max-input", type=int, default=4)
    p.add_argument("--top1-max-input", type=int, default=1)
    args = p.parse_args(argv)
    if len(args.predictions) < 2:
        p.error("need at least two prediction files to ensemble")

    models = []
    for path in args.predictions:
        with open(path) as f:
            d = json.load(f)
        models.append(d["results"] if "results" in d else d)

    fused = fuse_files(models, args.max_input, args.top1_max_input)
    with open(args.out, "w") as f:
        json.dump({
            "version": "1.0",
            "challenge": "ego4d_nlq_challenge",
            "results": fused,
        }, f)
    print(f"wrote {args.out}: {len(fused)} queries x 5 spans")


if __name__ == "__main__":
    main()
