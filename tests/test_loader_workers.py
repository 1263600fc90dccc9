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
