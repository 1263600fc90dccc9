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


def _nlq_raw():
    """Tiny official-format nlq json (videos -> clips -> annotations ->
    language_queries)."""
    return {
        "videos": [
            {
                "video_uid": "vidA",
                "clips": [
                    {
                        "clip_uid": "clipA1",
                        "video_start_sec": 100.0,
                        "video_end_sec": 160.0,
                        "annotations": [
                            {
                                "annotation_uid": "annX",
                                "language_queries": [
                                    {
                                        "query": "where did I put the keys?",
                                        "template": "Where is object X?",
                                        "clip_start_sec": 5.0,
                                        "clip_end_sec": 9.0,
                                    },
                                    {"query": ""},  # empty -> dropped
                                    {
                                        "query": "who did I talk to?",
                                        "clip_start_sec": 20.0,
                                        "clip_end_sec": 30.0,
                                    },
                                ],
                            }
                        ],
                    }
                ],
            }
        ]
    }


def test_convert_nlq_flattens_and_keys(tmp_path):
    from vilco_tpu.bin.convert_annotations import convert_nlq

    recs = convert_nlq(_nlq_raw())
    assert len(recs) == 2  # the empty query is dropped
    r0, r1 = recs
    assert r0["query_id"] == "annX_0" and r1["query_id"] == "annX_2"
    assert r0["annotation_uid"] == "annX" and r0["query_idx"] == 0
    assert r0["duration"] == 60.0 and r0["video_id"] == "clipA1"
    assert r0["timestamps"] == [[5.0, 9.0]]
    assert r0["template"] == "Where is object X?"
    assert "template" not in r1
    # unannotated test split: no timestamps
    assert "timestamps" not in convert_nlq(_nlq_raw(), test_split=True)[0]


def test_convert_nlq_cli_roundtrips_into_pipeline(tmp_path):
    """--nlq jsonl output feeds load_nlq_tasks/adapt_query_record."""
    from vilco_tpu.tasks.nlq import adapt_query_record, load_nlq_tasks

    raw = tmp_path / "nlq_train.json"
    out = tmp_path / "nlq_train_v2.jsonl"
    raw.write_text(json.dumps(_nlq_raw()))
    main(["--nlq", str(raw), "--out", str(out)])
    tasks = load_nlq_tasks(str(out))
    recs = [r for t in tasks.values() for r in t]
    assert len(recs) == 2
    v = adapt_query_record(recs[0]["raw"] if "raw" in recs[0] else recs[0])
    assert v["query_key"] == ("clipA1", "annX", 0)
    assert v["duration"] == 60.0
    assert v["segments"].shape == (1, 2)
