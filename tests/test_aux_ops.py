"""Tests: roi_align_1d, deformable conv, ext-score fusion, metrics logger."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from vilco_tpu.ops.deform_conv import PackedDeformConv, deform_conv1d
from vilco_tpu.ops.ext_scores import fuse_external_scores
from vilco_tpu.ops.roi_align import roi_align_1d


def test_roi_align_exact_on_linear_ramp():
    # features linear in t -> align must reproduce the midpoint values
    T, C = 32, 3
    feats = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.float32)[None, :, None], (1, T, C)
    )
    rois = jnp.asarray([[0, 4.0, 12.0]])
    out = roi_align_1d(feats, rois, out_size=4, sampling_ratio=2)
    # bins of [4,12): centers at 5, 7, 9, 11
    np.testing.assert_allclose(
        np.asarray(out)[0, :, 0], [5.0, 7.0, 9.0, 11.0], atol=1e-5
    )


def test_roi_align_is_differentiable():
    feats = jnp.ones((1, 16, 2))
    rois = jnp.asarray([[0, 2.0, 10.0]])
    g = jax.grad(lambda f: roi_align_1d(f, rois, 4).sum())(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert np.asarray(g).sum() > 0


def test_deform_conv_zero_offsets_equals_conv(rng):
    B, T, Cin, Cout, K = 2, 16, 4, 5, 3
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    w = rng.standard_normal((K, Cin, Cout)).astype(np.float32)
    out = deform_conv1d(
        jnp.asarray(x), jnp.zeros((B, T, K)), jnp.asarray(w)
    )
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1,), [(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    # zero offsets reduce to a standard conv except at the clamped borders
    np.testing.assert_allclose(
        np.asarray(out)[:, 1:-1], np.asarray(ref)[:, 1:-1], atol=1e-4
    )


def test_packed_deform_conv_runs():
    m = PackedDeformConv(8)
    x = jnp.ones((2, 16, 4))
    mask = jnp.ones((2, 16), bool)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    out, _ = m.apply(params, x, mask)
    assert out.shape == (2, 16, 8)


def test_ext_score_fusion():
    preds = {"v0": {
        "segments": np.array([[0, 5.0], [10, 15.0]]),
        "scores": np.array([0.64, 0.25]),
        "labels": np.array([3, 3]),
    }}
    cls_scores = {"v0": [0.0, 0.25, 0.0, 0.0, 1.0]}
    out = fuse_external_scores(preds, cls_scores, topk=2)
    v = out["v0"]
    assert len(v["scores"]) == 4
    # top external classes are 4 then 1; geometric mean of scores
    assert set(v["labels"].tolist()) == {4, 1}
    np.testing.assert_allclose(
        sorted(v["scores"])[-1], np.sqrt(1.0 * 0.64), atol=1e-9
    )


def test_metrics_logger(tmp_path):
    from vilco_tpu.core.logging import MetricsLogger

    ml = MetricsLogger(str(tmp_path / "m.jsonl"))
    ml.log("train", step=1, loss=0.5)
    ml.log("eval", step=2, mAP=0.7, note="x")
    ml.close()
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert recs[0]["loss"] == 0.5
    assert recs[1]["kind"] == "eval" and recs[1]["note"] == "x"


def test_ensemble_predictions():
    from vilco_tpu.ops.ensemble import ensemble_predictions, top1_cluster_merge

    # distinct centers (the reference keys a dict by center; identical
    # centers collide — a quirk we reproduce)
    m1 = [[10.0, 20.0, 0.9], [40.0, 45.0, 0.5]]
    m2 = [[10.5, 19.9, 0.8], [70.0, 75.0, 0.4]]
    m3 = [[11.0, 21.0, 0.7]]
    merged = top1_cluster_merge([m1[0], m2[0], m3[0]])
    # all three top-1 centers within 2s -> one cluster with summed score
    assert len(merged) == 1
    assert np.isclose(merged[0][-1], 0.9 + 0.8 + 0.7)
    out = ensemble_predictions([m1, m2, m3])
    assert len(out) == 5
    # the dominant cluster around [10, 20] must rank first
    assert 9.0 <= out[0][0] <= 12.0 and 18.0 <= out[0][1] <= 22.0


def test_mesh_sharding_rules():
    import jax
    from jax.sharding import PartitionSpec as P
    from vilco_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    import jax.numpy as jnp

    mesh = make_mesh(8, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    params = {
        "attn": {"query": {"kernel": jnp.ones((32, 32))},
                 "proj": {"kernel": jnp.ones((32, 32))}},
        "norm": {"weight": jnp.ones((32,))},
    }
    sharded = shard_params(params, mesh)
    assert sharded["attn"]["query"]["kernel"].sharding.spec == P(None, "model")
    assert sharded["attn"]["proj"]["kernel"].sharding.spec == P("model", None)
    batch = {"feats": jnp.ones((8, 16, 4))}
    sb = shard_batch(batch, mesh)
    assert sb["feats"].sharding.spec == P("data", None, None)


def test_make_mesh_errors_on_insufficient_devices():
    import pytest
    from vilco_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="requested 16"):
        make_mesh(16)  # the virtual CPU mesh only has 8
    with pytest.raises(ValueError, match="model_parallel"):
        make_mesh(8, model_parallel=3)


def test_vq_augment_batch(rng):
    from vilco_tpu.data.vq_augment import augment_vq_batch, hflip_clip

    B, T, S = 2, 3, 8
    batch = {
        "clip": jnp.asarray(rng.random((B, T, S, S, 3)).astype(np.float32)),
        "query": jnp.asarray(rng.random((B, S, S, 3)).astype(np.float32)),
        "clip_bbox": jnp.asarray(
            np.tile(np.array([0.2, 0.3, 0.6, 0.8], np.float32), (B, T, 1))
        ),
        "clip_with_bbox": jnp.ones((B, T)),
        "before_query": jnp.ones((B, T)),
    }
    key = jax.random.PRNGKey(0)
    out = jax.jit(lambda k, b: augment_vq_batch(k, b))(key, batch)
    assert out["clip"].shape == batch["clip"].shape
    # boxes stay valid xyxy in [0, 1]
    bb = np.asarray(out["clip_bbox"])
    assert (bb[..., 2] >= bb[..., 0]).all()
    assert (bb >= -1e-6).all() and (bb <= 1 + 1e-6).all()
    # deterministic flip: force p=1 flips boxes exactly
    clip2, bb2 = hflip_clip(key, batch["clip"], batch["clip_bbox"], p=1.0)
    np.testing.assert_allclose(
        np.asarray(bb2)[0, 0], [1 - 0.6, 0.3, 1 - 0.2, 0.8], atol=1e-6
    )


def test_ensemble_cli(tmp_path):
    from vilco_tpu.bin.ensemble import main

    def preds(shift):
        return {"results": [{
            "clip_uid": "c1",
            "predicted_times": [[10.0 + shift, 20.0 + shift, 0.9],
                                 [40.0, 45.0, 0.5], [70.0, 75.0, 0.3],
                                 [90.0, 95.0, 0.2], [100.0, 105.0, 0.1]],
        }]}

    paths = []
    for i, s in enumerate((0.0, 0.5, 1.0)):
        p = tmp_path / f"p{i}.json"
        p.write_text(json.dumps(preds(s)))
        paths.append(str(p))
    out = tmp_path / "fused.json"
    main(paths + ["--out", str(out)])
    r = json.loads(out.read_text())
    assert len(r["results"]) == 1
    spans = r["results"][0]["predicted_times"]
    assert len(spans) == 5
    # the agreeing cluster around [10, 20] must rank first
    assert 9.5 <= spans[0][0] <= 11.5 and 19.5 <= spans[0][1] <= 21.5


def test_temporal_nms_enclosing_matches_reference_semantics():
    """The ensemble NMS overlap divides by the ENCLOSING span
    (NLQ/temporal_nms.py) — two touching segments under a true-IoU NMS
    would both survive, but a long low-score segment enclosing the top
    one is suppressed more aggressively."""
    import numpy as np

    from vilco_tpu.ops.ensemble import temporal_nms_enclosing

    segs = np.array([[0.0, 10.0],    # top score
                     [2.0, 8.0],     # inside: inter 6 / span 10 = 0.6 > 0.5
                     [9.0, 30.0]],   # inter 1 / span 30 = 0.03 -> kept
                    np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = temporal_nms_enclosing(segs, scores, nms_thd=0.5, max_out=5)
    assert keep == [0, 2]

    # reference quirk: enclosing-union also suppresses NON-overlapping
    # near segments more than true IoU would never do? No overlap -> 0.
    segs2 = np.array([[0.0, 5.0], [6.0, 10.0]], np.float32)
    keep2 = temporal_nms_enclosing(segs2, np.array([0.9, 0.8], np.float32),
                                   nms_thd=0.5, max_out=5)
    assert keep2 == [0, 1]


def test_checkpoint_tagged_format_roundtrip(tmp_path):
    """The pickle-free checkpoint format round-trips the full CL episode
    state: arrays, tuples, None, bools, and int/tuple dict keys."""
    import numpy as np

    from vilco_tpu.core.checkpoint import load_checkpoint, save_checkpoint

    tree = {
        "params": {"dense": {"kernel":
                             np.arange(6, dtype=np.float32).reshape(2, 3)}},
        "task": 3, "none": None, "flag": True,
        "reg_list": [({"w": np.ones(2)}, {"w": np.zeros(2)}, "ewc")],
        "bwf": {0: {0: 0.5, 1: 0.25}},
        "tup": (1, "a", None),
        "query_keyed": {("clip", "ann", 0): [1.0, 2.0]},
        "scalar": np.float32(1.5),
        # exotic dtype: bf16 optimizer state (mu_dtype default) must
        # round-trip exactly, not degrade to raw void
        "mu": jnp.asarray([1.5, -2.25, 0.375], jnp.bfloat16),
    }
    p = str(tmp_path / "x.ckpt")
    save_checkpoint(p, tree)
    # it really is the safe zip format, not a pickle
    with open(p, "rb") as f:
        assert f.read(2) == b"PK"
    out = load_checkpoint(p)
    assert out["task"] == 3 and out["none"] is None and out["flag"] is True
    assert isinstance(out["reg_list"][0], tuple)
    assert out["reg_list"][0][2] == "ewc"
    assert out["bwf"] == {0: {0: 0.5, 1: 0.25}}
    assert out["tup"] == (1, "a", None)
    assert out["query_keyed"] == {("clip", "ann", 0): [1.0, 2.0]}
    assert float(out["scalar"]) == 1.5
    np.testing.assert_array_equal(out["params"]["dense"]["kernel"],
                                  tree["params"]["dense"]["kernel"])
    assert out["mu"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out["mu"], np.float32),
                                  [1.5, -2.25, 0.375])


def test_vq_random_resized_crop_bbox_consistency(rng):
    """The crop's bbox remap must track the pixels: paint the box region
    white on black, crop, and recover the box from the bright pixels."""
    from vilco_tpu.data.vq_augment import random_resized_crop_clip

    B, T, S = 4, 2, 64
    clip = np.zeros((B, T, S, S, 3), np.float32)
    box = np.array([0.375, 0.25, 0.625, 0.5], np.float32)  # x1 y1 x2 y2
    x1, y1, x2, y2 = (box * S).astype(int)
    clip[:, :, y1:y2, x1:x2, :] = 1.0
    bbox = np.tile(box, (B, T, 1)).astype(np.float32)
    with_bbox = np.ones((B, T), np.float32)

    out_clip, out_bbox, out_wb = jax.jit(random_resized_crop_clip)(
        jax.random.PRNGKey(42), jnp.asarray(clip), jnp.asarray(bbox),
        jnp.asarray(with_bbox))
    out_clip = np.asarray(out_clip)
    out_bbox = np.asarray(out_bbox)
    out_wb = np.asarray(out_wb)
    assert out_clip.shape == clip.shape

    tol = 2.5 / S  # bilinear edge blur
    for b in range(B):
        for t in range(T):
            ys, xs = np.where(out_clip[b, t, :, :, 0] > 0.5)
            if not out_wb[b, t]:
                continue
            assert len(xs) > 0, "valid box but no bright pixels survived"
            got = np.array([xs.min() / S, ys.min() / S,
                            (xs.max() + 1) / S, (ys.max() + 1) / S])
            np.testing.assert_allclose(out_bbox[b, t], got, atol=tol)


def test_vq_crop_invalidates_out_of_frame_boxes():
    from vilco_tpu.data.vq_augment import random_resized_crop_clip

    # a crop window that excludes the box must flip with_bbox to 0:
    # brute-force keys until one crop misses the corner box
    B, T, S = 8, 1, 16
    clip = np.zeros((B, T, S, S, 3), np.float32)
    bbox = np.tile(np.array([0.0, 0.0, 0.08, 0.08], np.float32), (B, T, 1))
    wb = np.ones((B, T), np.float32)
    flipped_any = False
    for seed in range(6):
        _, out_bbox, out_wb = random_resized_crop_clip(
            jax.random.PRNGKey(seed), jnp.asarray(clip), jnp.asarray(bbox),
            jnp.asarray(wb), scale=(0.3, 0.5))
        out_wb = np.asarray(out_wb)
        flipped_any |= (out_wb == 0).any()
        # clamped boxes stay in range either way
        ob = np.asarray(out_bbox)
        assert (ob >= 0).all() and (ob <= 1).all()
    assert flipped_any, "no crop ever invalidated the corner box"


def _np_roi_align_2d(feats, rois, out_size, ratio):
    """NumPy transcription of torchvision's CPU roi_align (aligned=False):
    per-bin ratio x ratio bilinear samples averaged, samples outside
    [-1, dim] contribute 0, coords clamped, roi sides clamped to >= 1."""
    B, H, W, C = feats.shape
    oh, ow = out_size
    out = np.zeros((len(rois), oh, ow, C), np.float64)

    def bilin(img, y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros((C,), np.float64)
        y = min(max(y, 0.0), H - 1)
        x = min(max(x, 0.0), W - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        return (img[y0, x0] * (1 - ly) * (1 - lx)
                + img[y0, x1] * (1 - ly) * lx
                + img[y1, x0] * ly * (1 - lx)
                + img[y1, x1] * ly * lx)

    for n, (b, x1_, y1_, x2_, y2_) in enumerate(rois):
        img = feats[int(b)].astype(np.float64)
        rw, rh = max(x2_ - x1_, 1.0), max(y2_ - y1_, 1.0)
        bh, bw = rh / oh, rw / ow
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros((C,), np.float64)
                for iy in range(ratio):
                    for ix in range(ratio):
                        y = y1_ + i * bh + (iy + 0.5) * bh / ratio
                        x = x1_ + j * bw + (ix + 0.5) * bw / ratio
                        acc += bilin(img, y, x)
                out[n, i, j] = acc / ratio**2
    return out


def test_roi_align_2d_matches_numpy_transcription():
    from vilco_tpu.ops.roi_align import roi_align_2d

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((2, 9, 11, 4)).astype(np.float32)
    rois = np.asarray([
        [0, 1.0, 2.0, 8.5, 7.0],     # interior roi
        [1, -0.5, -0.5, 5.0, 5.0],   # clips the border-zero rule
        [0, 3.0, 3.0, 3.2, 3.1],     # degenerate -> clamped to >= 1
        [1, 6.0, 2.5, 12.0, 9.5],    # runs past the right/bottom edge
    ], np.float32)
    for out_size in [(4, 4), (3, 5)]:
        want = _np_roi_align_2d(feats, rois, out_size, ratio=2)
        got = roi_align_2d(jnp.asarray(feats), jnp.asarray(rois),
                           out_size, sampling_ratio=2)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_roi_align_2d_identity_full_image():
    # full-image roi at matching out_size with ratio 1 samples bin centers
    from vilco_tpu.ops.roi_align import roi_align_2d

    H = W = 6
    feats = jnp.broadcast_to(
        jnp.arange(H, dtype=jnp.float32)[None, :, None, None], (1, H, W, 1))
    rois = jnp.asarray([[0, 0.0, 0.0, float(W), float(H)]])
    out = roi_align_2d(feats, rois, (H, W), sampling_ratio=1)
    # bin centers 0.5..5.5; the last sample clamps to the H-1 border row
    # exactly like torchvision's kernel
    want = np.minimum(np.arange(H) + 0.5, H - 1)
    np.testing.assert_allclose(np.asarray(out)[0, :, 0, 0], want, atol=1e-5)
