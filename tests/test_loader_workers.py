"""Threaded prefetching loader == single-threaded loader, batch for batch."""

import numpy as np

from vilco_tpu.data.pipeline import (
    BatchIterator,
    ClipDataset,
    SyntheticFeatureSource,
)
from vilco_tpu.data.synthetic import make_synthetic_cl_split, tiny_config


def _loader(cfg, videos, workers, training, crop=False):
    if crop:
        cfg = cfg.updated(dataset=cfg.dataset.updated(crop_ratio=(0.9, 1.0)))
    ds = ClipDataset(videos, cfg, SyntheticFeatureSource(cfg.dataset.input_dim),
                     is_training=training)
    return BatchIterator(ds, cfg, 4, is_training=training, seed=3,
                         num_workers=workers, prefetch=2)


def _videos():
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    train_tasks, _ = make_synthetic_cl_split(rng, cfg)
    vids = [v for t in train_tasks.values() for v in t["dict_db"]]
    return cfg, vids


def _collect(it):
    out = []
    for batch, meta in it:
        out.append((batch, meta))
    return out

def test_workers_match_single_thread():
    cfg, vids = _videos()
    for training in (True, False):
        for crop in ((False, True) if training else (False,)):
            a = _collect(_loader(cfg, vids, 0, training, crop))
            b = _collect(_loader(cfg, vids, 3, training, crop))
            assert len(a) == len(b) and len(a) > 1
            for (ba, ma), (bb, mb) in zip(a, b):
                assert ma["pad"] == mb["pad"]
                assert sorted(ba) == sorted(bb)
                for k in ba:
                    np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def test_epoch_reshuffles():
    cfg, vids = _videos()
    it = _loader(cfg, vids, 2, True)
    first = [m["video_id"] for _, m in it]
    it.set_epoch(1)
    second = [m["video_id"] for _, m in it]
    assert first != second
