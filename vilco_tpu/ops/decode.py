"""Decode head outputs into candidate segments + full postprocessing.

TPU-native equivalent of inference_single_video + postprocessing
(MQ/libs/modeling/meta_archs.py:1594-1736). The reference filters by
threshold, takes per-level top-k with dynamic shapes, then ships everything to
the CPU C++ NMS. Here decoding is a single static-shape top-k over the
flattened (points x classes) score grid followed by the on-device NMS of
vilco_tpu/ops/nms.py, so the whole eval path stays jitted on TPU.

Deviation (documented): the reference keeps up to `pre_nms_topk` candidates
*per pyramid level*; we keep a single global `pre_nms_topk` over all levels.
NMS emits at most `max_seg_num` (200 / 5 / ...) far below either cap, so
results are insensitive; tests/test_decode.py checks agreement against a
transcription of the reference procedure.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .nms import Detections, batched_nms


class Candidates(NamedTuple):
    segs: jax.Array     # (K, 2) grid coords
    scores: jax.Array   # (K,)
    labels: jax.Array   # (K,) int32
    valid: jax.Array    # (K,) bool


def decode_candidates(
    points: jax.Array,       # (P, 4) [t, lo, hi, stride]
    cls_logits: jax.Array,   # (P, C)
    offsets: jax.Array,      # (P, 2)
    fpn_mask: jax.Array,     # (P,) bool
    class_mask: jax.Array,   # (C,) bool — CL seen-classes mask
    pre_nms_topk: int,
    pre_nms_thresh: float,
    duration_thresh: float,
) -> Candidates:
    """Single-video candidate decode (meta_archs.py:1644-1692)."""
    P, C = cls_logits.shape
    prob = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    prob = prob * fpn_mask[:, None].astype(jnp.float32)
    prob = prob * class_mask[None, :].astype(jnp.float32)
    flat = prob.reshape(-1)

    k = min(pre_nms_topk, P * C)
    top_scores, top_idx = jax.lax.top_k(flat, k)
    pt_idx = top_idx // C
    cls_idx = (top_idx % C).astype(jnp.int32)

    t = points[pt_idx, 0]
    stride = points[pt_idx, 3]
    off = offsets[pt_idx]
    seg_l = t - off[:, 0] * stride
    seg_r = t + off[:, 1] * stride
    segs = jnp.stack([seg_l, seg_r], axis=-1)

    valid = (top_scores > pre_nms_thresh) & (
        (seg_r - seg_l) > duration_thresh
    )
    return Candidates(segs, top_scores, cls_idx, valid)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_classes", "pre_nms_topk", "pre_nms_thresh", "duration_thresh",
        "max_seg_num", "iou_threshold", "min_score", "nms_sigma",
        "voting_thresh", "use_soft_nms", "multiclass",
    ),
)
def decode_and_nms_batch(
    points: jax.Array,       # (P, 4)
    cls_logits: jax.Array,   # (B, P, C)
    offsets: jax.Array,      # (B, P, 2)
    fpn_mask: jax.Array,     # (B, P)
    class_mask: jax.Array,   # (C,)
    *,
    num_classes: int,
    pre_nms_topk: int,
    pre_nms_thresh: float,
    duration_thresh: float,
    max_seg_num: int,
    iou_threshold: float,
    min_score: float,
    nms_sigma: float,
    voting_thresh: float,
    use_soft_nms: bool,
    multiclass: bool,
) -> Detections:
    """Full batched decode + NMS, the jitted eval-path postprocessor."""

    def single(cl, off, fm):
        cand = decode_candidates(
            points, cl, off, fm, class_mask,
            pre_nms_topk, pre_nms_thresh, duration_thresh,
        )
        return batched_nms(
            cand.segs, cand.scores, cand.labels, cand.valid,
            num_classes=num_classes,
            max_seg_num=max_seg_num,
            iou_threshold=iou_threshold,
            min_score=min_score,
            nms_sigma=nms_sigma,
            voting_thresh=voting_thresh,
            use_soft_nms=use_soft_nms,
            multiclass=multiclass,
        )

    return jax.vmap(single)(cls_logits, offsets, fpn_mask)


def grid_to_seconds(segs, stride, num_frames, fps, duration):
    """Convert feature-grid segments to clamped seconds
    (meta_archs.py:1722-1728): t_sec = (t * stride + 0.5 * nframes) / fps.
    """
    out = (segs * stride + 0.5 * num_frames) / fps
    out = jnp.clip(out, 0.0, None)
    return jnp.where(out >= duration, duration, out)
