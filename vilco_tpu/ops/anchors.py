"""2-D anchor generation, IoU, and label assignment for the VQ tracker.

TPU-native equivalents of VQ/utils/anchor_utils.py:
  - generate_anchor_boxes_on_regions :5-41 (R x R regions, 4 base sizes x 3
    aspect ratios = 12 anchors per region, [cy, cx, h, w])
  - calculate_iou :130-169
  - assign_labels :99-128 + process_labels top-k fallback

Assignment is fully vectorized/jittable: IoU > threshold, with a global
top-k fallback when no anchor passes (the reference flips the top-k IoU
anchors positive when none pass, process_labels).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

BASE_SIZES = np.array(
    [[16, 16], [32, 32], [64, 64], [128, 128]], np.float32
)
ASPECT_RATIOS = np.array([0.5, 1.0, 2.0], np.float32)


def generate_anchors(
    image_size: int, num_regions: int,
    base_sizes: np.ndarray = BASE_SIZES,
    aspect_ratios: np.ndarray = ASPECT_RATIOS,
) -> np.ndarray:
    """(R*R*N*M, 4) anchors as [cy, cx, h, w] in pixels."""
    n, m = len(base_sizes), len(aspect_ratios)
    base = np.zeros((n * m, 4), np.float32)
    for i in range(n):
        for j in range(m):
            w = np.sqrt(base_sizes[i, 0] * base_sizes[i, 1] /
                        aspect_ratios[j])
            h = aspect_ratios[j] * w
            base[i * m + j] = [0.0, 0.0, h, w]
    region = image_size / num_regions
    out = []
    for i in range(num_regions):
        for j in range(num_regions):
            b = base.copy()
            b[:, 0] += (i + 0.5) * region
            b[:, 1] += (j + 0.5) * region
            out.append(b)
    return np.concatenate(out, axis=0)


def xyhw_to_xyxy(boxes):
    """[cy, cx, h, w] -> [y1, x1, y2, x2] (anchor hw is the full extent,
    dataset_utils bbox_xyhwToxyxy semantics)."""
    c = boxes[..., :2]
    hw = boxes[..., 2:] * 0.5
    return jnp.concatenate([c - hw, c + hw], axis=-1) if isinstance(
        boxes, jnp.ndarray
    ) else np.concatenate([c - hw, c + hw], axis=-1)


def box_iou(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """IoU of (..., N, 4) xyxy boxes against (..., 4) single boxes ->
    (..., N). Matches calculate_iou (anchor_utils.py:130-169)."""
    b2 = boxes2[..., None, :]
    tl = jnp.maximum(boxes1[..., :2], b2[..., :2])
    br = jnp.minimum(boxes1[..., 2:], b2[..., 2:])
    wh = jnp.clip(br - tl, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (boxes1[..., 2] - boxes1[..., 0]) * (boxes1[..., 3] - boxes1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    union = a1 + a2 - inter
    return inter / jnp.maximum(union, 1e-9)


def assign_anchor_labels(
    anchors_xyxy: jax.Array,   # (N, 4)
    gt_boxes: jax.Array,       # (B, T, 4) xyxy
    iou_threshold: float = 0.5,
    topk: int = 5,
) -> jax.Array:
    """(B, T, N) bool positives; if NO anchor anywhere passes the threshold,
    the top-k IoU anchors (over the flattened batch) become positive
    (assign_labels + process_labels, anchor_utils.py:99-128,171+)."""
    iou = box_iou(anchors_xyxy[None, None], gt_boxes)     # (B, T, N)
    labels = iou > iou_threshold
    any_pos = jnp.any(labels)

    flat = iou.reshape(-1)
    k = min(topk, flat.shape[0])
    _, top_idx = jax.lax.top_k(flat, k)
    fallback = jnp.zeros_like(flat, bool).at[top_idx].set(True)
    fallback = fallback.reshape(labels.shape)
    return jnp.where(any_pos, labels, fallback)


def giou(pred: jax.Array, gt: jax.Array, eps: float = 1e-9):
    """Generalized IoU of matching (..., 4) xyxy boxes -> (iou, giou).

    Pred corners are re-ordered (min/max per axis) first, as the reference
    GiouLoss does (VQ/utils/loss_utils.py:231-237) — the anchor-refinement
    head can emit negative h/w early in training, and the re-order keeps
    the GIoU (and its gradient) defined instead of clamping to zero area.
    """
    x1 = jnp.minimum(pred[..., 0], pred[..., 2])
    x2 = jnp.maximum(pred[..., 0], pred[..., 2])
    y1 = jnp.minimum(pred[..., 1], pred[..., 3])
    y2 = jnp.maximum(pred[..., 1], pred[..., 3])
    pred = jnp.stack([x1, y1, x2, y2], axis=-1)
    tl = jnp.maximum(pred[..., :2], gt[..., :2])
    br = jnp.minimum(pred[..., 2:], gt[..., 2:])
    wh = jnp.clip(br - tl, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = jnp.clip(pred[..., 2] - pred[..., 0], 0, None) * jnp.clip(
        pred[..., 3] - pred[..., 1], 0, None
    )
    a2 = (gt[..., 2] - gt[..., 0]) * (gt[..., 3] - gt[..., 1])
    union = a1 + a2 - inter
    iou_ = inter / jnp.maximum(union, eps)
    # enclosing box
    etl = jnp.minimum(pred[..., :2], gt[..., :2])
    ebr = jnp.maximum(pred[..., 2:], gt[..., 2:])
    ewh = jnp.clip(ebr - etl, 0.0, None)
    earea = ewh[..., 0] * ewh[..., 1]
    giou_ = iou_ - (earea - union) / jnp.maximum(earea, eps)
    return iou_, giou_
