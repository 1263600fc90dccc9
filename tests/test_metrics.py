"""Metric-parity tests: our numpy evaluators vs direct transcriptions of the
reference implementations (pandas/torch forms of MQ/libs/utils/metrics.py and
get_retrieval_performance.py, NLQ/libs/utils/metrics.py)."""

import numpy as np
import pandas as pd

from vilco_tpu.evals.anet_map import (
    ANETDetection,
    compute_average_precision_detection,
    cumulative_cl_gt,
)
from vilco_tpu.evals.retrieval import (
    BwfTracker,
    ReferringRecall,
    moment_retrieval_recall,
    span_iou_matrix,
)


def _ref_ap_pandas(gt_df, pred_df, tiou_thresholds):
    """Transcription of compute_average_precision_detection
    (MQ/libs/utils/metrics.py:274-356)."""
    ap = np.zeros(len(tiou_thresholds))
    if pred_df.empty:
        return ap
    npos = float(len(gt_df))
    lock_gt = np.ones((len(tiou_thresholds), len(gt_df))) * -1
    sort_idx = pred_df["score"].values.argsort()[::-1]
    pred_df = pred_df.loc[sort_idx].reset_index(drop=True)
    tp = np.zeros((len(tiou_thresholds), len(pred_df)))
    fp = np.zeros((len(tiou_thresholds), len(pred_df)))
    gbvn = gt_df.groupby("video-id")

    def seg_iou(target, cands):
        tt1 = np.maximum(target[0], cands[:, 0])
        tt2 = np.minimum(target[1], cands[:, 1])
        inter = (tt2 - tt1).clip(0)
        union = (cands[:, 1] - cands[:, 0]) + (target[1] - target[0]) - inter
        return inter.astype(float) / union

    for idx, this_pred in pred_df.iterrows():
        try:
            gt_vid = gbvn.get_group(this_pred["video-id"])
        except Exception:
            fp[:, idx] = 1
            continue
        this_gt = gt_vid.reset_index()
        tiou_arr = seg_iou(
            this_pred[["t-start", "t-end"]].values.astype(float),
            this_gt[["t-start", "t-end"]].values.astype(float),
        )
        tiou_sorted_idx = tiou_arr.argsort()[::-1]
        for tidx, thr in enumerate(tiou_thresholds):
            for jdx in tiou_sorted_idx:
                if tiou_arr[jdx] < thr:
                    fp[tidx, idx] = 1
                    break
                if lock_gt[tidx, this_gt.loc[jdx]["index"]] >= 0:
                    continue
                tp[tidx, idx] = 1
                lock_gt[tidx, this_gt.loc[jdx]["index"]] = idx
                break
            if fp[tidx, idx] == 0 and tp[tidx, idx] == 0:
                fp[tidx, idx] = 1

    tp_c = np.cumsum(tp, axis=1)
    fp_c = np.cumsum(fp, axis=1)
    rec = tp_c / npos
    prec = tp_c / (tp_c + fp_c)

    def interp(prec, rec):
        mprec = np.hstack([[0], prec, [0]])
        mrec = np.hstack([[0], rec, [1]])
        for i in range(len(mprec) - 1)[::-1]:
            mprec[i] = max(mprec[i], mprec[i + 1])
        idx = np.where(mrec[1:] != mrec[:-1])[0] + 1
        return np.sum((mrec[idx] - mrec[idx - 1]) * mprec[idx])

    for t in range(len(tiou_thresholds)):
        ap[t] = interp(prec[t], rec[t])
    return ap


def _random_dets(rng, n_vid=6, n_gt=20, n_pred=60, n_cls=4):
    gt = {"video-id": [], "t-start": [], "t-end": [], "label": []}
    for _ in range(n_gt):
        s = rng.uniform(0, 50)
        gt["video-id"].append(f"v{rng.integers(n_vid)}")
        gt["t-start"].append(s)
        gt["t-end"].append(s + rng.uniform(1, 10))
        gt["label"].append(int(rng.integers(n_cls)))
    preds = {"video-id": [], "t-start": [], "t-end": [], "label": [],
             "score": []}
    for _ in range(n_pred):
        # half the preds perturb a GT, half are random
        if rng.random() < 0.5 and len(gt["video-id"]):
            i = int(rng.integers(n_gt))
            s = gt["t-start"][i] + rng.normal(0, 2)
            e = gt["t-end"][i] + rng.normal(0, 2)
            v, c = gt["video-id"][i], gt["label"][i]
        else:
            s = rng.uniform(0, 50)
            e = s + rng.uniform(1, 10)
            v, c = f"v{rng.integers(n_vid)}", int(rng.integers(n_cls))
        preds["video-id"].append(v)
        preds["t-start"].append(min(s, e))
        preds["t-end"].append(max(s, e) + 0.5)
        preds["label"].append(c)
        preds["score"].append(float(rng.random()))
    return gt, preds


def test_ap_matches_reference_transcription(rng):
    gt, preds = _random_dets(rng)
    tious = np.linspace(0.1, 0.5, 5)
    ev = ANETDetection(gt, tious)
    mAP, avg = ev.evaluate(preds)

    gt_df = pd.DataFrame(gt)
    pred_df = pd.DataFrame(preds)
    aps = []
    for c in sorted(set(gt["label"])):
        ref = _ref_ap_pandas(
            gt_df[gt_df.label == c].reset_index(drop=True),
            pred_df[pred_df.label == c].reset_index(drop=True),
            tious,
        )
        aps.append(ref)
    ref_map = np.stack(aps, axis=1).mean(axis=1)
    np.testing.assert_allclose(mAP, ref_map, atol=1e-9)
    assert 0 <= avg <= 1


def test_moment_retrieval_recall(rng):
    gt = {
        "vidA": {"c1": [[0, 5], [20, 30]], "c2": [[8, 12]]},
        "vidB": {"c1": [[2, 4]]},
    }
    preds = {
        "vidA": {
            "c1": [[0.5, 5.2, 0.9], [40, 45, 0.8], [19, 29, 0.7],
                   [1, 2, 0.6]],
            "c2": [[50, 55, 0.9]],
        },
        # vidB missing entirely -> all misses
    }
    res = moment_retrieval_recall(gt, preds, tious=(0.1, 0.5), recalls=(1, 2))
    # total instances = 4. R@1x, tIoU 0.5:
    #   vidA/c1: first 1*2=2 preds; gt[0] hit by pred0 (IoU~0.9), gt[1] not
    #   vidA/c2: miss; vidB/c1: miss -> 1/4
    assert res.shape == (2, 2)
    assert np.isclose(res[1, 0], 1 / 4)
    # R@2x tIoU 0.5: vidA/c1 first 4 preds: gt1 hit by pred2 -> 2/4
    assert np.isclose(res[1, 1], 2 / 4)


def test_span_iou_union_semantics():
    # reference "union" is the enclosing span, not set union
    pred = np.array([[0.0, 2.0]])
    gt = np.array([[8.0, 10.0]])
    # disjoint: inter 0, union span 10 -> 0
    assert span_iou_matrix(pred, gt)[0, 0] == 0.0
    pred = np.array([[0.0, 10.0]])
    gt = np.array([[2.0, 4.0]])
    assert np.isclose(span_iou_matrix(pred, gt)[0, 0], 2.0 / 10.0)


def test_referring_recall():
    gt = {("c1", "a1", 0): [10.0, 20.0], ("c1", "a1", 1): [0.0, 5.0]}
    preds = [
        {"query_key": ("c1", "a1", 0),
         "predicted_times": [[50, 60], [11, 19], [0, 1]]},
        {"query_key": ("c1", "a1", 1), "predicted_times": [[0.2, 4.8]]},
    ]
    ev = ReferringRecall(gt)
    res = ev.evaluate(preds)
    assert res.shape == (2, 3)
    # R@1 @0.3: q0 top-1 [50,60] misses; q1 hits -> 0.5
    assert np.isclose(res[0, 0], 0.5)
    # R@5 @0.3: q0's rank-2 [11,19] IoU 0.8 hits -> 1.0
    assert np.isclose(res[0, 1], 1.0)


def test_bwf_tracker():
    bwf = BwfTracker()
    assert bwf.update(0, {0: 0.5}) == 0.0
    # task 1: task0 dropped to 0.3 -> forgetting 0.2
    v = bwf.update(1, {0: 0.3, 1: 0.6})
    assert np.isclose(v, 0.2)
    # task 2: task0 at 0.4 (forget 0.1), task1 at 0.5 (forget 0.1)
    v = bwf.update(2, {0: 0.4, 1: 0.5, 2: 0.7})
    assert np.isclose(v, 0.1)


def test_cumulative_cl_gt():
    tasks = {
        0: {"label_dict": {"a": 0, "b": 1}, "dict_db": [
            {"id": "v0", "labels": [0, 1],
             "segments": np.array([[0, 1], [2, 3.0]])},
        ]},
        1: {"label_dict": {"c": 5}, "dict_db": [
            {"id": "v1", "labels": [5], "segments": np.array([[4, 6.0]])},
        ]},
    }
    gts = cumulative_cl_gt(tasks)
    assert len(gts) == 2
    assert len(gts[0]["video-id"]) == 2
    assert len(gts[1]["video-id"]) == 3          # cumulative
    assert gts[1]["activity_index"] == {0: 0, 1: 1, 5: 2}
    assert gts[1]["label"] == [0, 1, 2]
