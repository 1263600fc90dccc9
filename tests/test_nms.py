"""Unit tests: on-device NMS vs a numpy transcription of the reference C++ op
(MQ/libs/utils/csrc/nms_cpu.cpp) and the python wrapper (libs/utils/nms.py).
"""

import numpy as np
import torch

import jax.numpy as jnp

from vilco_tpu.ops import nms as NMS


def np_softnms(segs, scores, iou_threshold, sigma, min_score, method):
    """Transcription of softnms_1d_cpu (nms_cpu.cpp:67-160)."""
    x1 = segs[:, 0].copy()
    x2 = segs[:, 1].copy()
    sc = scores.copy()
    areas = x2 - x1 + 1e-6
    nsegs = len(segs)
    dets = np.zeros((nsegs, 3), np.float32)
    inds = np.arange(nsegs)

    i = 0
    while i < nsegs:
        max_pos = i + np.argmax(sc[i:nsegs])
        for arr in (x1, x2, sc, areas, inds):
            arr[i], arr[max_pos] = arr[max_pos], arr[i]
        dets[i] = (x1[i], x2[i], sc[i])
        pos = i + 1
        while pos < nsegs:
            xx1 = max(x1[i], x1[pos])
            xx2 = min(x2[i], x2[pos])
            inter = max(0.0, xx2 - xx1)
            ovr = inter / (areas[i] + areas[pos] - inter)
            w = 1.0
            if method == 0:
                if ovr >= iou_threshold:
                    w = 0.0
            elif method == 1:
                if ovr >= iou_threshold:
                    w = 1 - ovr
            else:
                w = np.exp(-(ovr * ovr) / sigma)
            sc[pos] *= w
            if sc[pos] < min_score:
                for arr in (x1, x2, sc, areas, inds):
                    arr[pos] = arr[nsegs - 1]
                nsegs -= 1
                pos -= 1
            pos += 1
        i += 1
        if i >= nsegs:
            break
    return dets[:nsegs], inds[:nsegs]


def test_soft_nms_matches_cpp_transcription(rng):
    M = 40
    starts = rng.uniform(0, 50, M).astype(np.float32)
    segs = np.stack([starts, starts + rng.uniform(1, 10, M)], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, M).astype(np.float32)

    out = NMS.soft_nms_1d(
        jnp.asarray(segs), jnp.asarray(scores), jnp.ones(M, bool),
        max_out=M, iou_threshold=0.1, sigma=0.7, min_score=0.05,
        method="gaussian",
    )
    dets, _ = np_softnms(segs, scores, 0.1, 0.7, 0.05, method=2)
    n = len(dets)
    assert int(np.asarray(out.valid).sum()) == n
    np.testing.assert_allclose(np.asarray(out.segs)[:n], dets[:, :2], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.scores)[:n], dets[:, 2], atol=1e-4)


def test_hard_nms_matches_cpp_transcription(rng):
    M = 30
    starts = rng.uniform(0, 30, M).astype(np.float32)
    segs = np.stack([starts, starts + rng.uniform(1, 8, M)], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, M).astype(np.float32)

    out = NMS.soft_nms_1d(
        jnp.asarray(segs), jnp.asarray(scores), jnp.ones(M, bool),
        max_out=M, iou_threshold=0.3, sigma=0.5, min_score=0.0,
        method="hard",
    )
    # nms_1d_cpu keeps original scores, returns them sorted descending
    dets, inds = np_softnms(segs, scores, 0.3, 0.5, 1e-9, method=0)
    n = len(dets)
    assert int(np.asarray(out.valid).sum()) == n
    np.testing.assert_allclose(np.asarray(out.segs)[:n], dets[:, :2], atol=1e-4)


def test_batched_nms_multiclass(rng):
    M, C = 60, 4
    starts = rng.uniform(0, 40, M).astype(np.float32)
    segs = np.stack([starts, starts + rng.uniform(1, 6, M)], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, M).astype(np.float32)
    cls_idx = rng.integers(0, C, M).astype(np.int32)

    out = NMS.batched_nms(
        jnp.asarray(segs), jnp.asarray(scores), jnp.asarray(cls_idx),
        jnp.ones(M, bool), num_classes=C, max_seg_num=20,
        iou_threshold=0.1, min_score=0.01, nms_sigma=0.9,
        voting_thresh=0.0, use_soft_nms=True, multiclass=True,
    )

    # reference: per-class soft-NMS then global sort + cap (nms.py:124-190)
    all_dets = []
    for c in range(C):
        sel = cls_idx == c
        if not sel.any():
            continue
        dets, _ = np_softnms(segs[sel], scores[sel], 0.1, 0.9, 0.01, method=2)
        dets = dets[:20]
        for d in dets:
            all_dets.append((d[0], d[1], d[2], c))
    all_dets.sort(key=lambda d: -d[2])
    all_dets = all_dets[:20]

    valid = np.asarray(out.valid)
    got = sorted(
        zip(np.asarray(out.segs)[valid, 0], np.asarray(out.segs)[valid, 1],
            np.asarray(out.scores)[valid], np.asarray(out.labels)[valid]),
        key=lambda d: -d[2],
    )
    assert len(got) == len(all_dets)
    for g, r in zip(got, all_dets):
        np.testing.assert_allclose(g[:3], r[:3], atol=1e-4)
        assert int(g[3]) == r[3]


def test_seg_voting_matches_torch(rng):
    M, K = 30, 5
    starts = rng.uniform(0, 20, M).astype(np.float32)
    segs = np.stack([starts, starts + rng.uniform(1, 5, M)], -1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, M).astype(np.float32)
    nms_segs = segs[:K].copy()

    out = NMS.seg_voting(
        jnp.asarray(nms_segs), jnp.asarray(segs), jnp.asarray(scores),
        jnp.ones(M, bool), iou_threshold=0.3,
    )

    # torch transcription of seg_voting (nms.py:67-101). NOTE: the
    # reference computes offset_scores = scores + 1.5 but never uses it
    # (:78 vs :98) — vote weights are RAW score x IoU; pinned against the
    # real reference path in test_inference_lockstep.py
    tn, ta = torch.from_numpy(nms_segs), torch.from_numpy(segs)
    ts = torch.from_numpy(scores)
    ex_n = tn[:, None].expand(K, M, 2)
    ex_a = ta[None, :].expand(K, M, 2)
    left = torch.maximum(ex_n[:, :, 0], ex_a[:, :, 0])
    right = torch.minimum(ex_n[:, :, 1], ex_a[:, :, 1])
    inter = (right - left).clamp(min=0)
    iou = inter / ((ex_n[:, :, 1] - ex_n[:, :, 0]) +
                   (ex_a[:, :, 1] - ex_a[:, :, 0]) - inter)
    w = (iou >= 0.3).float() * ts[None, :] * iou
    w = w / w.sum(dim=1, keepdim=True)
    ref = w @ ta
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_bucketed_multiclass_matches_full(rng):
    """The class-partitioned fast path (per-class buckets + unrolled pick
    loop) must reproduce the exact full-array multiclass NMS — including
    tie-breaks (equal scores) and a skewed class — for both soft and hard
    methods and any unroll factor. See ops/nms.py::_partition_by_class."""
    M, C = 900, 16
    for method_soft in (True, False):
        segs = np.sort(rng.uniform(0, 300, (M, 2)).astype(np.float32), axis=1)
        scores = rng.uniform(0.001, 1.0, M).astype(np.float32)
        scores[::6] = 0.75  # ties exercise first-occurrence argmax order
        cls = rng.integers(0, C, M).astype(np.int32)
        cls[: M // 5] = 5   # skewed class (~180 cands), within the auto
                            # bucket cap (256 for C=16, M=900, k=50)
        valid = rng.uniform(size=M) > 0.1
        kw = dict(num_classes=C, max_seg_num=50, iou_threshold=0.1,
                  min_score=0.001, nms_sigma=0.9, voting_thresh=0.9,
                  use_soft_nms=method_soft, multiclass=True)
        args = (jnp.asarray(segs), jnp.asarray(scores), jnp.asarray(cls),
                jnp.asarray(valid))
        full = NMS.batched_nms(*args, per_class_capacity=0, unroll=1, **kw)
        for cap, unroll in ((512, 8), (512, 16), (None, 16)):
            fast = NMS.batched_nms(*args, per_class_capacity=cap,
                                   unroll=unroll, **kw)
            for name in ("segs", "scores", "labels", "valid"):
                a = np.asarray(getattr(full, name))
                b = np.asarray(getattr(fast, name))
                assert np.array_equal(a, b), (method_soft, cap, unroll, name)


def test_bucket_overflow_drops_lowest_scores_only():
    """When one class exceeds the bucket capacity, only its lowest-
    initial-score surplus is dropped; with a pick budget far below the
    capacity the emitted detections still match the full path."""
    M, C, cap = 300, 8, 128
    rng = np.random.default_rng(3)
    starts = np.arange(M, dtype=np.float32) * 10.0  # disjoint: no decay
    segs = np.stack([starts, starts + 5.0], axis=1)
    # the decode feeds candidates in global score-desc top-k order; the
    # bucket's overflow-drop semantics assume that order (ops/nms.py)
    scores = np.sort(rng.uniform(0.01, 1.0, M).astype(np.float32))[::-1].copy()
    cls = np.zeros(M, np.int32)  # all candidates in one class: M > cap
    valid = np.ones(M, bool)
    kw = dict(num_classes=C, max_seg_num=20, iou_threshold=0.1,
              min_score=0.001, nms_sigma=0.9, voting_thresh=0.9,
              use_soft_nms=True, multiclass=True)
    args = (jnp.asarray(segs), jnp.asarray(scores), jnp.asarray(cls),
            jnp.asarray(valid))
    full = NMS.batched_nms(*args, per_class_capacity=0, unroll=1, **kw)
    fast = NMS.batched_nms(*args, per_class_capacity=cap, unroll=8, **kw)
    # bucket keeps the 128 highest-score candidates; the 20-pick output over
    # disjoint segments is the global top-20, identical either way
    order = np.argsort(-scores, kind="stable")[:20]
    np.testing.assert_allclose(
        np.asarray(fast.scores)[np.asarray(fast.valid)],
        np.sort(scores[order])[::-1], atol=0)
    for name in ("segs", "scores", "labels", "valid"):
        assert np.array_equal(np.asarray(getattr(full, name)),
                              np.asarray(getattr(fast, name)))
