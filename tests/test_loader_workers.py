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


def test_fused_heads_match_per_level_loop():
    """ClsHead/RegHead run levels fused in one concatenated pass; verify
    exact equality with the per-level loop (incl. the LN-revives-masked-
    positions semantics of the reference)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from vilco_tpu.models.point_transformer import ClsHead, RegHead
    from vilco_tpu.models.layers import LayerNormC, MaskedConv, Scale

    rng = np.random.default_rng(0)
    B, C = 2, 16
    lens = [32, 16, 8]
    feats = [jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
             for T in lens]
    masks = [jnp.asarray(np.arange(T)[None, :] < np.array([[T], [T - 3]]))
             for T in lens]

    cls = ClsHead(feat_dim=C, num_classes=5)
    p = cls.init(jax.random.PRNGKey(0), feats, masks)
    fused = cls.apply(p, feats, masks)

    def per_level(params, f, m):
        h = f
        for i in range(2):
            kern = params["params"][f"head_{i}"]
            from vilco_tpu.ops.masked import channel_layernorm, masked_conv1d
            h, _ = masked_conv1d(h, m, kern["kernel"])
            ln = params["params"][f"norm_{i}"]
            h = channel_layernorm(h, ln["weight"], ln["bias"])
            h = jax.nn.relu(h)
        kern = params["params"]["cls"]
        out, _ = masked_conv1d(h, m, kern["kernel"], kern["bias"])
        return out

    for fu, f, m in zip(fused, feats, masks):
        ref = per_level(p, f, m)
        np.testing.assert_allclose(np.asarray(fu), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    reg = RegHead(feat_dim=C, num_levels=len(lens))
    pr = reg.init(jax.random.PRNGKey(1), feats, masks)
    fused_r = reg.apply(pr, feats, masks)
    assert len(fused_r) == len(lens)
    for fu, T in zip(fused_r, lens):
        assert fu.shape == (B, T, 2)
        assert (np.asarray(fu) >= 0).all()


def test_dir_feature_source_aligns_folder_lengths(tmp_path):
    """Multi-folder features with different strides align to the longest
    before channel concat (ego4d.py:702-716 upsampling semantics)."""
    import os

    import numpy as np

    from vilco_tpu.data.pipeline import DirFeatureSource

    a, b = tmp_path / "fa", tmp_path / "fb"
    os.makedirs(a), os.makedirs(b)
    np.save(a / "clip1.npy", np.ones((8, 3), np.float32))
    np.save(b / "clip1.npy", np.full((4, 2), 2.0, np.float32))
    src = DirFeatureSource([str(a), str(b)], [".npy", ".npy"])
    out = src({"id": "clip1"})
    assert out.shape == (8, 5)
    assert np.allclose(out[:, 3:], 2.0)


class _LongSource:
    """Features twice as long as max_seq_len, regardless of the video."""

    def __init__(self, input_dim, t_in):
        self.input_dim = input_dim
        self.t_in = t_in

    def __call__(self, video):
        rng = np.random.default_rng(abs(hash(video["id"])) % 2**32)
        return rng.standard_normal((self.t_in, self.input_dim)).astype(
            np.float32)


def test_overlength_clips_eval_resize_and_train_window():
    """Clips longer than max_seq_len: eval compresses onto the static grid
    with an adjusted stride (full duration covered); training crops a
    random max_seq_len window via truncate_feats — including windows that
    the old first-T pre-truncation could never reach."""
    cfg = tiny_config()
    cfg = cfg.updated(dataset=cfg.dataset.updated(
        force_upsampling=False, feat_stride=16.0, num_frames=16.0))
    T = cfg.dataset.max_seq_len
    t_in = 2 * T
    fps = 30.0
    dur = t_in * 16.0 / fps
    # the only action sits at the very END of the clip
    end_t = dur - 2.0
    videos = [{"id": f"v{i}", "duration": dur, "fps": fps,
               "segments": np.array([[end_t - 6.0, end_t]], np.float32),
               "labels": np.array([1], np.int64)} for i in range(4)]
    src = _LongSource(cfg.dataset.input_dim, t_in)

    # ---- eval: full clip compressed to T, stride doubled, action kept
    ds = ClipDataset(videos, cfg, src, is_training=False)
    s = ds[0]
    assert s["t_len"] == T
    assert s["feats"].shape[0] == T
    np.testing.assert_allclose(
        s["feat_stride"], ((t_in - 1) * 16.0 + 16.0) / T)
    assert len(s["segments"]) == 1
    # the end-of-clip action maps inside the compressed grid
    assert 0 < s["segments"][0][1] <= T + 1

    # ---- train: random window of exactly T containing the action
    ds = ClipDataset(videos, cfg, src, is_training=True)
    it = BatchIterator(ds, cfg, 4, is_training=True, seed=0)
    batch, meta = next(iter(it))
    assert batch["feats"].shape[1] == T
    # every sample kept its end-of-clip action => the window started past
    # the first-T prefix (the old pre-truncation would have dropped it)
    assert batch["gt_valid"][:, 0].all()
    assert (batch["gt_segments"][:, 0, 1] > 0).all()
