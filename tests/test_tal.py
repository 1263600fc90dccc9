"""TAL dataset adapter (thumos/anet/charades/multithumos schema)."""

import json

import numpy as np

from vilco_tpu.core.registry import DATASETS
from vilco_tpu.tasks.tal import (
    TAL_ATTRIBUTES,
    load_tal_database,
    remove_duplicate_annotations,
)


def _db(tmp_path):
    db = {"database": {
        "vid_a": {
            "subset": "Training", "fps": 30.0, "duration": 10.0,
            "annotations": [
                {"label": "run", "label_id": 1, "segment": [1.0, 3.0]},
                {"label": "run", "label_id": 1, "segment": [1.0, 3.0]},  # dup
                {"label": "jump", "label_id": 0, "segment": [4.0, 6.0]},
            ],
        },
        "vid_b": {
            "subset": "validation", "fps": 30.0, "duration": 8.0,
            "annotations": [
                {"label": "jump", "label_id": 0, "segment": [2.0, 5.0]},
            ],
        },
    }}
    p = tmp_path / "db.json"
    p.write_text(json.dumps(db))
    return str(p)


def test_dedup():
    ants = [{"label_id": 1, "segment": [1.0, 3.0]},
            {"label_id": 1, "segment": [1.0, 3.0004]},
            {"label_id": 2, "segment": [1.0, 3.0]}]
    assert len(remove_duplicate_annotations(ants)) == 2


def test_load_and_splits(tmp_path):
    path = _db(tmp_path)
    train, label_dict = load_tal_database(path, ("training",))
    assert [v["id"] for v in train] == ["vid_a"]
    assert label_dict == {"run": 1, "jump": 0}
    v = train[0]
    assert v["segments"].shape == (2, 2)  # duplicate removed
    assert list(v["labels"]) == [1, 0]

    val, _ = load_tal_database(path, ("validation",))
    assert [v["id"] for v in val] == ["vid_b"]

    # single-class mode collapses labels (NLQ-style heads)
    one, _ = load_tal_database(path, ("training",), num_classes=1)
    assert set(one[0]["labels"]) == {0}


def test_registered_factories(tmp_path):
    path = _db(tmp_path)
    for name in ("thumos", "anet", "charades", "multithumos"):
        assert name in DATASETS
    out = DATASETS.make("thumos", path, split="train")
    assert out["videos"] and np.allclose(
        out["attributes"]["tiou_thresholds"], np.linspace(0.3, 0.7, 5)
    )


def test_feeds_clip_dataset(tmp_path):
    """TAL records flow through the standard padded pipeline."""
    from vilco_tpu.core.config import Config
    from vilco_tpu.data.pipeline import ClipDataset

    path = _db(tmp_path)
    videos, _ = load_tal_database(path, ("training",))
    cfg = Config.from_dict({
        "dataset": {"num_classes": 2, "max_seq_len": 64, "input_dim": 8,
                    "max_segments": 8, "force_upsampling": False,
                    "center_offset": False,
                    "feat_stride": 16, "num_frames": 16},
        "model": {"backbone_arch": (1, 1, 2), "embd_dim": 16,
                  "fpn_dim": 16, "head_dim": 16, "n_head": 2,
                  "regression_range": ((0, 4), (2, 8), (4, 10000))},
    }).derived()
    # features at fps/feat_stride = 30/16 Hz over the 10 s video
    feats = {v["id"]: np.random.default_rng(0).standard_normal(
        (int(v["duration"] * v["fps"] / 16), 8)).astype(np.float32)
        for v in videos}
    ds = ClipDataset(videos, cfg, lambda v: feats[v["id"]],
                     is_training=True)
    s = ds[0]
    assert s["feats"].shape[1] == 8
    assert s["segments"].shape[0] == 2
    # seconds -> grid coords used the database fps
    assert np.isfinite(s["segments"]).all()
