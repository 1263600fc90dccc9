"""Multi-model prediction ensembling for NLQ submissions.

Port of NLQ/ensemble.py: per query, (1) cluster the models' top-1 proposals
by center distance (< 2s) and merge each cluster into a new proposal
(elementwise mean of the cluster's middle- and max-score members, score =
cluster score sum, top1_generator :30-102); (2) append each model's top-k
proposals; (3) temporal NMS (IoU 0.5) and pad/cap to exactly 5
(post_processing_mr_nms :7-28).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from vilco_tpu.ops.nms_host import nms_1d_host


def temporal_nms_enclosing(segs: np.ndarray, scores: np.ndarray,
                           nms_thd: float, max_out: int) -> List[int]:
    """Greedy NMS with the reference's ENCLOSING-SPAN overlap
    (NLQ/temporal_nms.py:6-22: union = max(e) - min(s), which its own
    comment calls 'not the correct union' — reproduced for parity).
    Returns kept indices into score-descending order."""
    order = np.argsort(-scores, kind="stable")
    keep: List[int] = []
    alive = list(order)
    while alive and len(keep) < max_out:
        top = alive.pop(0)
        keep.append(int(top))
        s0, e0 = segs[top]
        nxt = []
        for i in alive:
            s1, e1 = segs[i]
            inter = max(0.0, min(e0, e1) - max(s0, s1))
            union = max(e0, e1) - min(s0, s1)
            if union <= 0 or inter / union <= nms_thd:
                nxt.append(i)
        alive = nxt
    return keep


def top1_cluster_merge(proposals: Sequence[Sequence[float]],
                       distance: float = 2.0) -> List[List[float]]:
    """proposals: [[s, e, score], ...] (the models' top-1s). Returns merged
    proposals sorted by descending summed score."""
    if not proposals:
        return []
    center = {(p[0] + p[1]) / 2.0: list(p) for p in proposals}
    centers = sorted(center)
    clusters: List[List[float]] = [[centers[0]]]
    for c in centers[1:]:
        if c - clusters[-1][-1] < distance:
            clusters[-1].append(c)
        else:
            clusters.append([c])

    merged = []
    for cl in clusters:
        scores = [center[c][-1] for c in cl]
        total = float(sum(scores))
        max_prop = center[cl[int(np.argmax(scores))]]
        if len(cl) % 2 == 0:
            i = len(cl) // 2
            middle = center[cl[i]] if center[cl[i]][-1] > center[cl[i - 1]][-1] \
                else center[cl[i - 1]]
        else:
            middle = center[cl[(len(cl) - 1) // 2]]
        new = [(a + b) / 2.0 for a, b in zip(middle, max_prop)]
        new[-1] = total
        merged.append(new)
    return sorted(merged, key=lambda p: -p[-1])


def ensemble_predictions(
    per_model: Sequence[Sequence[Sequence[float]]],
    max_input: int = 4,
    top1_max_input: int = 1,
    nms_thd: float = 0.5,
    max_after_nms: int = 5,
    iou_mode: str = "enclosing",
) -> List[List[float]]:
    """per_model: for each model, its ranked [[s, e, score], ...] for one
    query. Returns exactly `max_after_nms` fused [s, e] proposals.

    iou_mode "enclosing" reproduces the reference's nonstandard NMS
    overlap (temporal_nms.py); "standard" uses true IoU via the native
    host op."""
    top1_pool = []
    fused = []
    for preds in per_model:
        top1_pool.extend(list(p) for p in preds[:top1_max_input])
        fused.extend(list(p) for p in preds[:max_input])
    fused.extend(top1_cluster_merge(top1_pool))

    fused.sort(key=lambda p: -p[-1])
    segs = np.asarray([[p[0], p[1]] for p in fused], np.float32)
    scores = np.asarray([p[-1] for p in fused], np.float32)
    if iou_mode == "enclosing":
        keep = temporal_nms_enclosing(segs, scores, nms_thd,
                                      max_out=max_after_nms)
    else:
        keep = nms_1d_host(segs, scores, iou_threshold=nms_thd,
                           max_out=max_after_nms)
    out = [[float(segs[i, 0]), float(segs[i, 1])] for i in keep]
    if out and len(out) < max_after_nms:
        out.extend([out[-1]] * (max_after_nms - len(out)))
    return out[:max_after_nms]
