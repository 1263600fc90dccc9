"""MQ annotation preprocessing utilities.

Equivalents of the reference's data-prep helpers:
  - clean-labels + narrative prompt construction
    (MQ/preprocess.py:16-123, clean_up_label_and_build_prompt): '/'->'or',
    '_'->' ' label cleanup; a positive prompt narrating the clip's actions
    in temporal order with overlap/sequence connectives; 31 negative
    prompts (27 class-substituted + 4 instance-added). The CLIP encoding of
    these prompts is the extractors' job (extractors/clip_text.py) — the
    reference ships that part commented out too.
  - class co-occurrence adjacency graph (MQ/preprocess.py:125-148,
    build_adj_graph)
  - per-val-clip label histogram (MQ/get_val_labels.py)

  python -m vilco_tpu.bin.preprocess prompts --annotations anno.json \
      --classes classes.json --out anno_clean.json [--seed 0]
  python -m vilco_tpu.bin.preprocess adj --annotations anno_clean.json \
      --out adj_graph.pkl [--num-classes 110]
  python -m vilco_tpu.bin.preprocess val-labels --annotations anno.json \
      --out candidate_val_label.pkl
"""

from __future__ import annotations

import argparse
import json
import pickle
from collections import defaultdict

import numpy as np


def _clean(label: str) -> str:
    return label.replace("/", "or").replace("_", " ")


OVERLAP_WORDS = ["meanwhile ", "simultaneously ", "same time ", "meantime "]
SEQUENCE_WORDS = ["then ", "later ", "afterwards ", "after "]


def build_prompts(record: dict, class_names, rng: np.random.Generator):
    """Positive narrative prompt + 31 negatives for one clip record."""
    actions = sorted(record["annotations"], key=lambda a: a["segment"][0])
    prompt = ""
    last_end = -1.0
    exist = {}
    cleaned = []
    for idx, a in enumerate(actions):
        name = _clean(a["label"])
        if name not in exist:
            s, e = a["segment"]
            if s < last_end - 1:
                prompt += OVERLAP_WORDS[rng.integers(len(OVERLAP_WORDS))]
            elif s >= last_end + 1 and idx != 0:
                prompt += SEQUENCE_WORDS[rng.integers(len(SEQUENCE_WORDS))]
            prompt += f"I {name} ."
            last_end = e
            exist[name] = 1
        cleaned.append({"segment": a["segment"],
                        "label_id": int(a["label_id"]), "label": name})

    candidates = [c for c in class_names if c not in exist]
    negatives = []
    # 27 class-substituted negatives
    for _ in range(27):
        cur = prompt
        for idx, name in enumerate(exist):
            if idx == 0 or rng.random() > 0.5:
                cur = cur.replace(
                    name, candidates[rng.integers(len(candidates))]
                )
        negatives.append(cur)
    # 4 instance-added negatives
    for _ in range(4):
        add = candidates[rng.integers(len(candidates))]
        negatives.append(f"I {add} . Then " + prompt)
    return prompt, negatives, cleaned


def clean_labels_and_build_prompts(anno: dict, classes: dict,
                                   seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    class_names = [_clean(c) for c in classes]
    out = {}
    for vid, v in anno.items():
        prompt, negatives, cleaned = build_prompts(v, class_names, rng)
        out[vid] = {
            **{k: v[k] for k in ("subset", "duration", "fps", "video_id",
                                 "clip_id", "parent_start_sec",
                                 "parent_end_sec", "v_duration")
               if k in v},
            "annotations": cleaned,
            "prompt": prompt,
            "negative_prompt": negatives,
        }
    return out


def build_adj_graph(anno: dict, num_classes: int = 110) -> dict:
    """Log co-occurrence adjacency over classes: two classes co-occur when
    their segments overlap in time within a clip (second-resolution masks,
    preprocess.py:125-148)."""
    adj = np.zeros((num_classes, num_classes), np.float64)
    nums = np.zeros((num_classes,), np.float64)
    for v in anno.values():
        t = max(int(v["duration"]), 1)
        mask = np.zeros((num_classes, t), np.float32)
        for a in v["annotations"]:
            c = int(a["label_id"])
            s, e = int(a["segment"][0]), int(a["segment"][1])
            mask[c, s:e] = 1.0
            nums[c] += 1
        co = mask @ mask.T
        co[co > 0] = 1.0
        adj += co
        adj[np.arange(num_classes), np.arange(num_classes)] = 0.0
    adj = np.log(adj, where=adj > 0, out=np.zeros_like(adj))
    return {"adj": adj, "nums": nums}


def val_label_histogram(anno: dict) -> dict:
    """Per-val-clip {label_id: count} (get_val_labels.py)."""
    out = {}
    for v in anno.values():
        if v.get("subset") in ("train", "test"):
            continue
        hist = defaultdict(int)
        for a in v["annotations"]:
            hist[int(a["label_id"])] += 1
        out[v["clip_id"]] = dict(hist)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pp = sub.add_parser("prompts")
    pp.add_argument("--annotations", required=True)
    pp.add_argument("--classes", required=True,
                    help="classes.json ({name: id})")
    pp.add_argument("--out", required=True)
    pp.add_argument("--seed", type=int, default=0)
    pa = sub.add_parser("adj")
    pa.add_argument("--annotations", required=True)
    pa.add_argument("--out", required=True)
    pa.add_argument("--num-classes", type=int, default=110)
    pv = sub.add_parser("val-labels")
    pv.add_argument("--annotations", required=True)
    pv.add_argument("--out", required=True)
    args = p.parse_args(argv)

    with open(args.annotations) as f:
        anno = json.load(f)
    if args.cmd == "prompts":
        with open(args.classes) as f:
            classes = json.load(f)
        out = clean_labels_and_build_prompts(anno, classes, args.seed)
        with open(args.out, "w") as f:
            json.dump(out, f)
        print(f"wrote {args.out}: {len(out)} clips with prompts")
    elif args.cmd == "adj":
        out = build_adj_graph(anno, args.num_classes)
        with open(args.out, "wb") as f:
            pickle.dump(out, f)
        print(f"wrote {args.out}: adj {out['adj'].shape}")
    else:
        out = val_label_histogram(anno)
        with open(args.out, "wb") as f:
            pickle.dump(out, f)
        print(f"wrote {args.out}: {len(out)} val clips")


if __name__ == "__main__":
    main()
