"""Tests: Ego4D video-level -> clip-level MQ annotation conversion."""

import json

from vilco_tpu.bin.convert_annotations import convert, main


def _moments(split="train"):
    return {
        "videos": [
            {
                "video_uid": "vidA",
                "split": split,
                "clips": [
                    {
                        "clip_uid": "clipA1",
                        "video_start_sec": 100.0,
                        "video_end_sec": 580.0,
                        "annotations": [
                            {
                                "labels": [
                                    {  # fully inside the clip
                                        "label": "use_phone",
                                        "primary": True,
                                        "video_start_time": 110.0,
                                        "video_end_time": 130.0,
                                    },
                                    {  # straddles the clip start -> clamp
                                        "label": "cook",
                                        "primary": True,
                                        "video_start_time": 90.0,
                                        "video_end_time": 120.0,
                                    },
                                    {  # non-primary -> dropped
                                        "label": "walk",
                                        "primary": False,
                                        "video_start_time": 200.0,
                                        "video_end_time": 220.0,
                                    },
                                    {  # entirely before the clip -> dropped
                                        "label": "cook",
                                        "primary": True,
                                        "video_start_time": 10.0,
                                        "video_end_time": 50.0,
                                    },
                                ]
                            }
                        ],
                    },
                    {  # a clip with no surviving annotations -> dropped
                        "clip_uid": "clipA2",
                        "video_start_sec": 600.0,
                        "video_end_sec": 900.0,
                        "annotations": [],
                    },
                ],
            }
        ]
    }


def _info():
    return {"videos": [{"video_uid": "vidA", "duration_sec": 1000.0}]}


def test_convert_rebases_and_clamps():
    out = convert([_moments()], _info())
    assert set(out) == {"clipA1"}
    rec = out["clipA1"]
    assert rec["video_id"] == "vidA"
    assert rec["duration"] == 480.0
    assert rec["parent_start_sec"] == 100.0
    assert rec["v_duration"] == 1000.0
    assert rec["subset"] == "train"
    segs = sorted(a["segment"] for a in rec["annotations"])
    # clamp [90,120] -> [0,20]; rebase [110,130] -> [10,30]
    assert segs == [[0.0, 20.0], [10.0, 30.0]]
    labels = {a["label"]: a["label_id"] for a in rec["annotations"]}
    assert labels == {"cook": 0, "use_phone": 1}  # sorted label dict


def test_convert_respects_given_label_dict():
    out = convert([_moments()], _info(), label_dict={"use_phone": 7})
    anns = out["clipA1"]["annotations"]
    assert [a["label_id"] for a in anns] == [7]  # "cook" not in dict


def test_cli_roundtrip(tmp_path):
    mp = tmp_path / "moments_train.json"
    ip = tmp_path / "ego4d.json"
    op = tmp_path / "out.json"
    mp.write_text(json.dumps(_moments()))
    ip.write_text(json.dumps(_info()))
    main(["--moments", str(mp), "--info", str(ip), "--out", str(op)])
    out = json.loads(op.read_text())
    assert "clipA1" in out and len(out["clipA1"]["annotations"]) == 2
