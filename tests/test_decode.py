"""Decode parity: our global-topk jitted decode + on-device NMS vs a numpy
transcription of the reference's per-level procedure
(inference_single_video + postprocessing, meta_archs.py:1594-1736)."""

import numpy as np

import jax.numpy as jnp

from vilco_tpu.ops.assign import generate_points
from vilco_tpu.ops.decode import decode_and_nms_batch, grid_to_seconds
from tests.test_nms import np_softnms


def _reference_decode(points, level_lengths, cls_logits, offsets,
                      pre_nms_thresh, pre_nms_topk, duration_thresh,
                      num_classes):
    """Per-level threshold -> top-k -> segments (meta_archs.py:1644-1692)."""
    segs_all, scores_all, cls_all = [], [], []
    start = 0
    for T_l in level_lengths:
        pts = points[start:start + T_l]
        cl = cls_logits[start:start + T_l]
        off = offsets[start:start + T_l]
        start += T_l
        prob = 1.0 / (1.0 + np.exp(-cl))
        flat = prob.flatten()
        keep = np.where(flat > pre_nms_thresh)[0]
        vals = flat[keep]
        order = np.argsort(-vals, kind="stable")[:pre_nms_topk]
        idx = keep[order]
        pt_idx = idx // num_classes
        cls_idx = idx % num_classes
        seg_l = pts[pt_idx, 0] - off[pt_idx, 0] * pts[pt_idx, 3]
        seg_r = pts[pt_idx, 0] + off[pt_idx, 1] * pts[pt_idx, 3]
        dur_keep = (seg_r - seg_l) > duration_thresh
        segs_all.append(np.stack([seg_l, seg_r], -1)[dur_keep])
        scores_all.append(flat[idx][dur_keep])
        cls_all.append(cls_idx[dur_keep])
    return (np.concatenate(segs_all), np.concatenate(scores_all),
            np.concatenate(cls_all))


def test_decode_nms_matches_reference_procedure(rng):
    level_lengths = [32, 16, 8]
    strides = [1, 2, 4]
    rr = [(0, 4), (4, 8), (8, 10000)]
    C = 5
    P = sum(level_lengths)
    points = generate_points(level_lengths, strides, rr)
    cls_logits = rng.standard_normal((P, C)).astype(np.float32) * 2 - 2
    offsets = np.abs(rng.standard_normal((P, 2))).astype(np.float32) + 0.3

    kw = dict(pre_nms_thresh=0.01, pre_nms_topk=512, duration_thresh=0.05)
    det = decode_and_nms_batch(
        jnp.asarray(points), jnp.asarray(cls_logits[None]),
        jnp.asarray(offsets[None]), jnp.ones((1, P), bool),
        jnp.ones((C,), bool),
        num_classes=C, max_seg_num=20, iou_threshold=0.1,
        min_score=0.01, nms_sigma=0.9, voting_thresh=0.0,
        use_soft_nms=True, multiclass=True, **kw,
    )

    segs, scores, cls_idx = _reference_decode(
        points, level_lengths, cls_logits, offsets,
        kw["pre_nms_thresh"], kw["pre_nms_topk"], kw["duration_thresh"], C,
    )
    # reference: per-class soft-NMS over all candidates, global sort, cap 20
    ref = []
    for c in range(C):
        sel = cls_idx == c
        if not sel.any():
            continue
        dets, _ = np_softnms(segs[sel].copy(), scores[sel].copy(),
                             0.1, 0.9, 0.01, method=2)
        for d in dets[:20]:
            ref.append((d[0], d[1], d[2], c))
    ref.sort(key=lambda d: -d[2])
    ref = ref[:20]

    valid = np.asarray(det.valid[0])
    got = sorted(
        zip(np.asarray(det.segs[0])[valid, 0],
            np.asarray(det.segs[0])[valid, 1],
            np.asarray(det.scores[0])[valid],
            np.asarray(det.labels[0])[valid]),
        key=lambda d: -d[2],
    )
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g[:3], r[:3], rtol=1e-4, atol=1e-4)
        assert int(g[3]) == int(r[3])


def test_grid_to_seconds_clamps():
    segs = jnp.asarray([[-2.0, 10.0], [50.0, 80.0]])
    out = np.asarray(grid_to_seconds(segs, stride=2.0, num_frames=4.0,
                                     fps=2.0, duration=30.0))
    assert (out >= 0).all() and (out <= 30.0).all()
    np.testing.assert_allclose(out[0, 1], (10 * 2 + 2) / 2.0)
