"""Ego4D annotation converters: raw release JSON -> pipeline formats.

MQ (equivalent of scripts/convert_annotation.py = MQ/convert_annotation.py):
merge moments_{train,val,test}.json, map each clip to its parent video
(duration/fps from ego4d.json), rebase segment times from video to clip
coordinates, and emit the clip-annotation dict that split_mq / the MQ
dataset consume ({clip_id: {video_id, duration, parent_start/end_sec, fps,
subset, annotations: [{label, label_id, segment}]}}).

  python -m vilco_tpu.bin.convert_annotations \
      --moments moments_train.json moments_val.json \
      --info ego4d.json --out ego4d_clip_annotations.json

NLQ (equivalent of NLQ/ego4d_data/reformat_data.py:8-28): flatten the
official nlq_{train,val}.json (videos -> clips -> annotations ->
language_queries) into the per-query jsonl records that
tasks/nlq.py::load_nlq_tasks and bin/make_splits.py consume.

  python -m vilco_tpu.bin.convert_annotations \
      --nlq nlq_train.json --out ego4d_nlq_train_v2.jsonl
  # unannotated test split (no timestamps): add --test-split
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List


def convert(
    moment_files: List[dict],
    video_info: dict,
    label_dict: Dict[str, int] | None = None,
    default_fps: float = 1.8741513727840071,
) -> dict:
    durations = {
        v["video_uid"]: v["duration_sec"]
        for v in video_info.get("videos", [])
    }
    # build a label dict over all annotations if not given
    if label_dict is None:
        names = set()
        for mf in moment_files:
            for video in mf.get("videos", []):
                for clip in video.get("clips", []):
                    for ann in clip.get("annotations", []):
                        for lab in ann.get("labels", []):
                            if lab.get("primary", True):
                                names.add(lab["label"])
        label_dict = {n: i for i, n in enumerate(sorted(names))}

    out = {}
    for mf in moment_files:
        for video in mf.get("videos", []):
            vid = video["video_uid"]
            fps = default_fps
            for clip in video.get("clips", []):
                cid = clip["clip_uid"]
                if cid not in out:
                    out[cid] = {
                        "video_id": vid,
                        "clip_id": cid,
                        "duration": clip["video_end_sec"]
                        - clip["video_start_sec"],
                        "parent_start_sec": clip["video_start_sec"],
                        "parent_end_sec": clip["video_end_sec"],
                        "v_duration": durations.get(vid),
                        "fps": fps,
                        "subset": video.get("split", "train"),
                        "annotations": [],
                    }
                for ann in clip.get("annotations", []):
                    for lab in ann.get("labels", []):
                        if not lab.get("primary", True):
                            continue
                        if lab["label"] not in label_dict:
                            continue
                        # rebase from video to clip time
                        s = lab["video_start_time"] - clip["video_start_sec"]
                        e = lab["video_end_time"] - clip["video_start_sec"]
                        s = max(s, 0.0)
                        e = min(e, out[cid]["duration"])
                        if e <= s:
                            continue
                        out[cid]["annotations"].append({
                            "label": lab["label"],
                            "label_id": label_dict[lab["label"]],
                            "segment": [s, e],
                        })
    # drop clips with no annotations in annotated splits
    return {
        k: v for k, v in out.items()
        if v["annotations"] or "test" in str(v.get("subset", ""))
    }


def convert_nlq(raw: dict, test_split: bool = False) -> List[dict]:
    """Official Ego4D nlq json -> flat per-query records.

    Same semantics as NLQ/ego4d_data/reformat_data.py:8-28 (query_id =
    f"{annotation_uid}_{query_idx}", duration from the clip span, empty
    queries skipped, no timestamps on the unannotated test split), plus
    `annotation_uid`/`query_idx`/`clip_uid` kept explicitly (the official
    scorer keys on them) and the `template` label when present (the CL
    splitter groups by it directly instead of re-deriving via TF-IDF).
    """
    out = []
    for video in raw.get("videos", []):
        for clip in video.get("clips", []):
            for ann in clip.get("annotations", []):
                anno_id = ann["annotation_uid"]
                for qid, q in enumerate(ann.get("language_queries", [])):
                    if not q.get("query"):
                        continue
                    rec = {
                        "query": q["query"],
                        "query_id": f"{anno_id}_{qid}",
                        "annotation_uid": anno_id,
                        "query_idx": qid,
                        "duration": clip["video_end_sec"]
                        - clip["video_start_sec"],
                        "video_id": clip["clip_uid"],
                        "clip_uid": clip["clip_uid"],
                        "query_type": "nlq",
                    }
                    if q.get("template"):
                        rec["template"] = q["template"]
                    if not test_split:
                        rec["timestamps"] = [
                            [q["clip_start_sec"], q["clip_end_sec"]]
                        ]
                    out.append(rec)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--moments", nargs="+",
                   help="MQ mode: moments_{train,val,...}.json files")
    p.add_argument("--info", help="MQ mode: ego4d.json video info")
    p.add_argument("--nlq",
                   help="NLQ mode: official nlq_{train,val}.json -> jsonl")
    p.add_argument("--test-split", action="store_true",
                   help="NLQ mode: unannotated test split (no timestamps)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    if args.nlq and args.moments:
        p.error("--nlq and --moments are mutually exclusive")
    if args.nlq:
        with open(args.nlq) as f:
            raw = json.load(f)
        recs = convert_nlq(raw, test_split=args.test_split)
        with open(args.out, "w") as f:
            for rec in recs:
                f.write(json.dumps(rec) + "\n")
        print(f"wrote {args.out}: {len(recs)} queries")
        return
    if not args.moments or not args.info:
        p.error("MQ mode needs --moments and --info (or use --nlq)")
    mfs = []
    for path in args.moments:
        with open(path) as f:
            mfs.append(json.load(f))
    with open(args.info) as f:
        info = json.load(f)
    out = convert(mfs, info)
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out}: {len(out)} clips")


if __name__ == "__main__":
    main()
