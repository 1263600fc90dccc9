"""Ego4D MQ annotation converter: video-level moments -> clip-level JSON.

Equivalent of scripts/convert_annotation.py (= MQ/convert_annotation.py):
merge moments_{train,val,test}.json, map each clip to its parent video
(duration/fps from ego4d.json), rebase segment times from video to clip
coordinates, and emit the clip-annotation dict that split_mq / the MQ
dataset consume ({clip_id: {video_id, duration, parent_start/end_sec, fps,
subset, annotations: [{label, label_id, segment}]}}).

  python -m vilco_tpu.bin.convert_annotations \
      --moments moments_train.json moments_val.json \
      --info ego4d.json --out ego4d_clip_annotations.json
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--moments", nargs="+", required=True)
    p.add_argument("--info", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
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
