"""On-device 1-D (Soft-)NMS, segment voting, and prediction decoding.

TPU-native replacement for the reference's compiled C++ CPU op and its Python
wrapper:
  - nms_1d_cpu / softnms_1d_cpu    MQ/libs/utils/csrc/nms_cpu.cpp:19-160
  - NMSop / SoftNMSop / batched_nms / seg_voting
                                   MQ/libs/utils/nms.py:8-190
  - top-k candidate decode         MQ/libs/modeling/meta_archs.py:1594-1692

The reference rounds segments through the CPU for a sequential greedy loop.
Here the greedy pick/decay recurrence runs as a bounded `lax.fori_loop`
directly on device (soft-NMS's score decay is inherently sequential, but the
loop is only `max_out` steps and each step is a fused vector op), and the
per-class "multiclass NMS" python loop becomes a `vmap` over the class axis.
A C++/OpenMP host fallback with the same semantics lives in native/nms_cpu.cc
for host-side tooling parity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG = -1e9


def _iou_1d(seg, segs, eps: float = 1e-6):
    """IoU of one segment (2,) against many (M, 2), nms_cpu.cpp semantics
    (areas get +1e-6, intersection clamped at 0)."""
    l, r = seg[0], seg[1]
    area = r - l + eps
    areas = segs[:, 1] - segs[:, 0] + eps
    inter = jnp.maximum(
        0.0, jnp.minimum(r, segs[:, 1]) - jnp.maximum(l, segs[:, 0])
    )
    return inter / (area + areas - inter)


class NMSResult(NamedTuple):
    segs: jax.Array     # (K, 2)
    scores: jax.Array   # (K,)
    valid: jax.Array    # (K,) bool


@functools.partial(
    jax.jit, static_argnames=("max_out", "method", "unroll")
)
def soft_nms_1d(
    segs: jax.Array,      # (M, 2)
    scores: jax.Array,    # (M,)
    valid: jax.Array,     # (M,) bool
    max_out: int,
    iou_threshold: float = 0.1,
    sigma: float = 0.75,
    min_score: float = 0.001,
    method: str = "gaussian",   # gaussian | linear | hard
    unroll: int = 1,
) -> NMSResult:
    """Greedy (soft-)NMS as a bounded on-device loop.

    Semantics match softnms_1d_cpu (nms_cpu.cpp:67-160): repeatedly pick the
    highest-scoring remaining segment, decay the scores of the rest by the
    method's weight, and drop remaining segments whose decayed score falls
    below `min_score`. Picked segments report their decayed-at-pick score.
    `method='hard'` matches nms_1d_cpu (zero-out at iou >= threshold, original
    scores reported).
    """
    M = segs.shape[0]
    f32 = jnp.float32
    segs = segs.astype(f32)
    scores = scores.astype(f32)

    def body(k, carry):
        cur_scores, alive, out_segs, out_scores, out_valid = carry
        masked = jnp.where(alive, cur_scores, NEG)
        i = jnp.argmax(masked)
        s = masked[i]
        any_alive = s > NEG / 2

        seg_i = segs[i]
        iou = _iou_1d(seg_i, segs)
        if method == "hard":
            # nms_1d_cpu:19-58 — drop overlapping, keep original scores
            new_scores = cur_scores
            new_alive = alive & (iou < iou_threshold)
        else:
            if method == "gaussian":
                w = jnp.exp(-jnp.square(iou) / sigma)
            else:  # linear
                w = jnp.where(iou >= iou_threshold, 1.0 - iou, 1.0)
            new_scores = jnp.where(alive, cur_scores * w, cur_scores)
            new_alive = alive & (new_scores >= min_score)
        new_alive = new_alive.at[i].set(False)
        # freeze state if nothing was alive this round
        cur_scores = jnp.where(any_alive, new_scores, cur_scores)
        alive = jnp.where(any_alive, new_alive, alive)

        out_segs = out_segs.at[k].set(jnp.where(any_alive, seg_i, 0.0))
        out_scores = out_scores.at[k].set(jnp.where(any_alive, s, 0.0))
        out_valid = out_valid.at[k].set(any_alive)
        return cur_scores, alive, out_segs, out_scores, out_valid

    # hard NMS pre-filters by min_score (NMSop, nms.py:15-21); soft-NMS only
    # drops segments whose *decayed* score falls below it.
    init_alive = (
        valid & (scores > min_score) if method == "hard" else valid & (scores > 0)
    )
    init = (
        scores,
        init_alive,
        jnp.zeros((max_out, 2), f32),
        jnp.zeros((max_out,), f32),
        jnp.zeros((max_out,), jnp.bool_),
    )
    _, _, out_segs, out_scores, out_valid = jax.lax.fori_loop(
        0, max_out, body, init, unroll=unroll
    )
    return NMSResult(out_segs, out_scores, out_valid)


def seg_voting(
    nms_segs: jax.Array,    # (K, 2)
    all_segs: jax.Array,    # (M, 2)
    all_scores: jax.Array,  # (M,)
    all_valid: jax.Array,   # (M,) bool
    iou_threshold: float,
    score_offset: float = 1.5,
) -> jax.Array:
    """Bounding-segment voting refinement; matches seg_voting
    (MQ/libs/utils/nms.py:67-101). Note the reference computes
    `offset_scores = all_scores + score_offset` but never uses it (nms.py:78
    vs :98 — the vote weight is raw score x IoU); `score_offset` is kept in
    the signature for parity but is intentionally dead here too, pinned
    against the real reference path in tests/test_inference_lockstep.py.
    """
    del score_offset
    l = jnp.maximum(nms_segs[:, None, 0], all_segs[None, :, 0])
    r = jnp.minimum(nms_segs[:, None, 1], all_segs[None, :, 1])
    inter = jnp.clip(r - l, 0.0, None)
    len_n = nms_segs[:, 1] - nms_segs[:, 0]
    len_a = all_segs[:, 1] - all_segs[:, 0]
    iou = inter / jnp.maximum(len_n[:, None] + len_a[None, :] - inter, 1e-9)
    w = (iou >= iou_threshold).astype(jnp.float32) * all_scores[None, :] * iou
    w = w * all_valid[None, :].astype(jnp.float32)
    denom = jnp.sum(w, axis=1, keepdims=True)
    w = w / jnp.where(denom == 0, 1.0, denom)
    refined = w @ all_segs
    # keep original segment where no neighbour voted
    return jnp.where(denom > 0, refined, nms_segs)


class Detections(NamedTuple):
    segs: jax.Array     # (K, 2) feature-grid coords
    scores: jax.Array   # (K,)
    labels: jax.Array   # (K,) int32
    valid: jax.Array    # (K,) bool


def _partition_by_class(segs, scores, valid, cls_idx, num_classes, cap):
    """Scatter candidates into per-class buckets of `cap` slots each.

    The multiclass NMS previously ran every class lane over the FULL
    (M,) candidate array with a class mask — (B, C, M) f32 state touched
    ~5x per pick iteration. At the MQ flagship (B=16, C=110, M=5000,
    200 picks) that is ~35 GB of HBM traffic per eval call, measured at
    58 ms (~62% of the call; RESULTS.md round 5). But the M candidates
    are a single global top-k split across classes (~M/C each), so each
    lane only needs its own bucket: (B, C, cap) state cuts traffic by
    ~M/cap (~10x at cap=512).

    Within-class candidate order is preserved, so the greedy argmax
    tie-break sequence is identical to the full-array form and the
    result is EXACT for arbitrary input order whenever no class holds
    more than `cap` valid candidates. On overflow the surplus beyond
    `cap` is dropped in input order — the decode feeds candidates in
    global score-desc top-k order (ops/decode.py), so what is dropped
    is that class's lowest-initial-score tail (the reference gathers
    per-class with no cap, MQ/libs/utils/nms.py:103-190 — deviation
    documented in PARITY.md).
    """
    M = scores.shape[0]
    cls_eff = jnp.where(valid, cls_idx, num_classes)  # invalid -> sentinel
    onehot = (cls_eff[:, None] == jnp.arange(num_classes)[None, :])
    rank_all = jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1  # (M, C)
    rank = jnp.where(
        valid,
        jnp.take_along_axis(
            rank_all, jnp.clip(cls_eff, 0, num_classes - 1)[:, None], axis=1
        )[:, 0],
        cap,
    )
    keep = valid & (rank < cap)
    slot = jnp.where(keep, cls_eff * cap + rank, num_classes * cap)
    b_scores = jnp.zeros((num_classes * cap,), scores.dtype).at[slot].set(
        scores, mode="drop")
    b_segs = jnp.zeros((num_classes * cap, 2), segs.dtype).at[slot].set(
        segs, mode="drop")
    b_valid = jnp.zeros((num_classes * cap,), jnp.bool_).at[slot].set(
        keep, mode="drop")
    return (
        b_segs.reshape(num_classes, cap, 2),
        b_scores.reshape(num_classes, cap),
        b_valid.reshape(num_classes, cap),
    )


def _auto_class_cap(num_classes: int, m: int, k_per: int) -> int | None:
    """Bucket capacity policy: generous headroom (~8x the mean per-class
    share and >=2x the pick budget, rounded up to a power of two), or
    None when bucketing would not reduce the working set (few classes /
    small M, e.g. NLQ's single-class decode stays on the exact path)."""
    want = max(k_per, 4 * -(-m // num_classes), 64)
    cap = 1
    while cap < want:
        cap *= 2
    if cap >= m or num_classes < 8:
        return None
    return cap


def batched_nms(
    segs: jax.Array,       # (M, 2)
    scores: jax.Array,     # (M,)
    cls_idx: jax.Array,    # (M,) int
    valid: jax.Array,      # (M,) bool
    num_classes: int,
    max_seg_num: int,
    iou_threshold: float,
    min_score: float,
    nms_sigma: float,
    voting_thresh: float,
    use_soft_nms: bool = True,
    multiclass: bool = True,
    per_class_out: int | None = None,
    per_class_capacity: int | None = None,
    unroll: int = 16,
) -> Detections:
    """Multiclass / class-agnostic NMS + global top-k.

    Matches batched_nms (MQ/libs/utils/nms.py:103-190): per-class NMS via vmap
    over the class axis (the reference loops unique classes in Python),
    class-agnostic NMS additionally applies segment voting, then a global sort
    caps results at max_seg_num.

    `per_class_capacity`: bucket size for the class-partitioned fast path
    (None = auto policy `_auto_class_cap`; 0 = force the exact full-array
    path). See `_partition_by_class` for the traffic analysis.
    """
    method = "gaussian" if use_soft_nms else "hard"
    if multiclass:
        k_per = per_class_out or max_seg_num
        M = segs.shape[0]
        cap = per_class_capacity
        if cap is None:
            cap = _auto_class_cap(num_classes, M, k_per)
        if cap:
            b_segs, b_scores, b_valid = _partition_by_class(
                segs, scores, valid, cls_idx, num_classes, cap)

            def per_bucket(s2, sc, va):
                return soft_nms_1d(
                    s2, sc, va, max_out=k_per,
                    iou_threshold=iou_threshold, sigma=nms_sigma,
                    min_score=min_score, method=method, unroll=unroll,
                )

            res = jax.vmap(per_bucket)(b_segs, b_scores, b_valid)
        else:
            def per_class(c):
                v = valid & (cls_idx == c)
                return soft_nms_1d(
                    segs, scores, v, max_out=k_per,
                    iou_threshold=iou_threshold, sigma=nms_sigma,
                    min_score=min_score, method=method, unroll=unroll,
                )

            res = jax.vmap(per_class)(jnp.arange(num_classes))
        out_segs = res.segs.reshape(-1, 2)
        out_scores = res.scores.reshape(-1)
        out_valid = res.valid.reshape(-1)
        out_labels = jnp.repeat(jnp.arange(num_classes, dtype=jnp.int32), k_per)
    else:
        res = soft_nms_1d(
            segs, scores, valid, max_out=max_seg_num,
            iou_threshold=iou_threshold, sigma=nms_sigma,
            min_score=min_score, method=method, unroll=unroll,
        )
        out_segs, out_scores, out_valid = res
        if voting_thresh > 0:
            out_segs = jnp.where(
                out_valid[:, None],
                seg_voting(out_segs, segs, scores, valid, voting_thresh),
                out_segs,
            )
        out_labels = jnp.zeros((max_seg_num,), jnp.int32)

    order_scores = jnp.where(out_valid, out_scores, NEG)
    top_scores, top_idx = jax.lax.top_k(order_scores, max_seg_num)
    return Detections(
        segs=out_segs[top_idx],
        scores=out_scores[top_idx],
        labels=out_labels[top_idx],
        valid=out_valid[top_idx],
    )
