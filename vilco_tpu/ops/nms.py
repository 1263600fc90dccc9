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
    jax.jit, static_argnames=("max_out", "method")
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
        0, max_out, body, init
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
) -> Detections:
    """Multiclass / class-agnostic NMS + global top-k.

    Matches batched_nms (MQ/libs/utils/nms.py:103-190): per-class NMS via vmap
    over the class axis (the reference loops unique classes in Python),
    class-agnostic NMS additionally applies segment voting, then a global sort
    caps results at max_seg_num.
    """
    method = "gaussian" if use_soft_nms else "hard"
    if multiclass:
        k_per = per_class_out or max_seg_num

        def per_class(c):
            v = valid & (cls_idx == c)
            return soft_nms_1d(
                segs, scores, v, max_out=k_per,
                iou_threshold=iou_threshold, sigma=nms_sigma,
                min_score=min_score, method=method,
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
            min_score=min_score, method=method,
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
