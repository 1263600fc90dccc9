"""Generate query-incremental CL task splits from annotation files.

TPU-native equivalent of the reference's offline split generators:
  - scripts/split_mq.py:27-120  (110 MQ classes -> 5 tasks of 22; rewrites
    per-task label_dict + dict_db)
  - scripts/split_nlq.py:10-40+ (13 NLQ templates grouped by TF-IDF
    similarity of the template strings)
  - scripts/split_vq.py:26+     (2000 VQ object categories -> 5 x ~400)

Output is the split-pkl format consumed by the CL engine
({'train': {task: {'label_dict', 'dict_db'}}, 'val': ...} for MQ/VQ,
{'train': {template: [records]}} for NLQ), the same shape the reference
pickles (MQ/train_cl.py:103).

Usage:
  python -m vilco_tpu.bin.make_splits mq  --annotations ego4d_clip_annotations.json --num-tasks 5 --out mq_split.pkl
  python -m vilco_tpu.bin.make_splits nlq --train-jsonl train.jsonl --val-jsonl val.jsonl --out nlq_split.pkl
  python -m vilco_tpu.bin.make_splits vq  --annotations vq_annotations.json --num-tasks 5 --out vq_split.pkl
"""

from __future__ import annotations

import argparse
import json
import pickle
from collections import defaultdict
from typing import Dict, List

import numpy as np


def split_mq(annotations: dict, num_tasks: int, seed: int = 0,
             class_order: str = "id") -> dict:
    """Group classes into `num_tasks` contiguous chunks and emit per-task
    {label_dict, dict_db} for train/val subsets."""
    # collect class name -> id over all annotations
    label_dict: Dict[str, int] = {}
    for key, v in annotations.items():
        for ann in v.get("annotations", []):
            label_dict.setdefault(ann["label"], int(ann["label_id"]))
    classes = sorted(label_dict.items(), key=lambda kv: kv[1])
    if class_order == "random":
        rng = np.random.default_rng(seed)
        classes = [classes[i] for i in rng.permutation(len(classes))]
    per = (len(classes) + num_tasks - 1) // num_tasks
    task_classes = [
        dict(classes[i * per:(i + 1) * per]) for i in range(num_tasks)
    ]

    def build(split_names):
        tasks = {}
        for t, cls in enumerate(task_classes):
            ids = set(cls.values())
            dict_db = []
            for key, v in annotations.items():
                if v.get("subset", "").lower() not in split_names:
                    continue
                segs, labels = [], []
                for ann in v.get("annotations", []):
                    if int(ann["label_id"]) in ids:
                        segs.append([float(ann["segment"][0]),
                                     float(ann["segment"][1])])
                        labels.append(int(ann["label_id"]))
                if segs:
                    dict_db.append({
                        "id": key,
                        "fps": float(v.get("fps", 30.0)),
                        "duration": float(v["duration"]),
                        "segments": np.asarray(segs, np.float32),
                        "labels": np.asarray(labels, np.int64),
                        "subset": v.get("subset"),
                    })
            tasks[t] = {"label_dict": dict(cls), "dict_db": dict_db}
        return tasks

    return {
        "train": build(("train", "training")),
        "val": build(("val", "validation")),
    }


def split_nlq(train_records: List[dict], val_records: List[dict],
              num_tasks: int = 13) -> dict:
    """Group queries by template. The reference clusters the 13 canonical
    templates via TF-IDF cosine similarity of template strings
    (scripts/split_nlq.py); with template labels present we group directly,
    falling back to TF-IDF clustering of the query strings otherwise."""

    def by_template(records):
        groups = defaultdict(list)
        for r in records:
            groups[r.get("query_type") or r.get("template", "unknown")].append(r)
        return dict(groups)

    train_g = by_template(train_records)
    if len(train_g) <= 1 and len(train_records) > 0:
        # no template labels: TF-IDF + k-means over query strings
        from sklearn.cluster import KMeans
        from sklearn.feature_extraction.text import TfidfVectorizer

        texts = [r.get("query", "") for r in train_records]
        X = TfidfVectorizer().fit_transform(texts)
        km = KMeans(n_clusters=num_tasks, n_init=4, random_state=0).fit(X)
        train_g = defaultdict(list)
        for r, c in zip(train_records, km.labels_):
            r = dict(r, query_type=f"cluster_{c}")
            train_g[f"cluster_{c}"].append(r)
        train_g = dict(train_g)
    val_g = by_template(val_records)
    # align val groups to train template order
    order = sorted(train_g)
    return {
        "train": {t: train_g.get(t, []) for t in order},
        "val": {t: val_g.get(t, []) for t in order},
    }


def split_vq(annotations: List[dict], num_tasks: int, seed: int = 0) -> dict:
    """Object categories -> num_tasks groups (scripts/split_vq.py)."""
    cats = sorted({a.get("object_title", a.get("category", "unknown"))
                   for a in annotations})
    rng = np.random.default_rng(seed)
    cats = [cats[i] for i in rng.permutation(len(cats))]
    per = (len(cats) + num_tasks - 1) // num_tasks
    cat_task = {}
    for t in range(num_tasks):
        for c in cats[t * per:(t + 1) * per]:
            cat_task[c] = t

    def build(split_names):
        tasks = {t: defaultdict(list) for t in range(num_tasks)}
        for a in annotations:
            if a.get("subset", "train") not in split_names:
                continue
            cat = a.get("object_title", a.get("category", "unknown"))
            t = cat_task[cat]
            tasks[t][cat].append(a)
        return {t: dict(v) for t, v in tasks.items()}

    return {
        "train": build(("train", "training")),
        "val": build(("val", "validation")),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["mq", "nlq", "vq"])
    p.add_argument("--annotations")
    p.add_argument("--train-jsonl")
    p.add_argument("--val-jsonl")
    p.add_argument("--num-tasks", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    if args.task == "mq":
        with open(args.annotations) as f:
            ann = json.load(f)
        out = split_mq(ann, args.num_tasks, args.seed)
    elif args.task == "nlq":
        def load_jsonl(path):
            with open(path) as f:
                return [json.loads(l) for l in f if l.strip()]

        out = split_nlq(load_jsonl(args.train_jsonl),
                        load_jsonl(args.val_jsonl), args.num_tasks)
    else:
        with open(args.annotations) as f:
            ann = json.load(f)
        out = split_vq(ann, args.num_tasks, args.seed)

    with open(args.out, "wb") as f:
        pickle.dump(out, f)
    n_train = len(out["train"])
    print(f"wrote {args.out}: {n_train} tasks")


if __name__ == "__main__":
    main()
