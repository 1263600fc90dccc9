"""Detection losses: sigmoid focal, 1-D GIoU / DIoU.

TPU-native equivalents of MQ/libs/modeling/losses.py (sigmoid_focal_loss :5-51,
ctr_giou_loss_1d :55-107, ctr_diou_loss_1d :109-160). All are elementwise /
reduction-free so callers can apply Gaussian label weights and masked sums, as
the reference loss wiring does (meta_archs.py:1374-1524).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jax.Array,
    targets: jax.Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jax.Array:
    """Elementwise focal loss (RetinaNet). Matches losses.py:5-51."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    # numerically-stable BCE-with-logits
    ce = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def _iou_1d(input_offsets, target_offsets, eps):
    lp, rp = input_offsets[..., 0], input_offsets[..., 1]
    lg, rg = target_offsets[..., 0], target_offsets[..., 1]
    lkis = jnp.minimum(lp, lg)
    rkis = jnp.minimum(rp, rg)
    intsctk = rkis + lkis
    unionk = (lp + rp) + (lg + rg) - intsctk
    iouk = intsctk / jnp.maximum(unionk, eps)
    return iouk, (lp, rp, lg, rg)


def ctr_giou_loss_1d(input_offsets, target_offsets, eps: float = 1e-8):
    """1-D GIoU loss on (l, r) center offsets; reduces to 1 - IoU
    (losses.py:55-107). Elementwise over the leading dims.
    """
    input_offsets = input_offsets.astype(jnp.float32)
    target_offsets = target_offsets.astype(jnp.float32)
    iouk, _ = _iou_1d(input_offsets, target_offsets, eps)
    return 1.0 - iouk


def ctr_diou_loss_1d(input_offsets, target_offsets, eps: float = 1e-8):
    """1-D Distance-IoU loss (losses.py:109-160):
    loss = 1 - IoU + rho^2 / len_c^2 with rho the center distance and len_c
    the enclosing length.
    """
    input_offsets = input_offsets.astype(jnp.float32)
    target_offsets = target_offsets.astype(jnp.float32)
    iouk, (lp, rp, lg, rg) = _iou_1d(input_offsets, target_offsets, eps)
    lc = jnp.maximum(lp, lg)
    rc = jnp.maximum(rp, rg)
    len_c = lc + rc
    rho = 0.5 * (rp - lp - rg + lg)
    loss = 1.0 - iouk + jnp.square(rho) / jnp.square(jnp.maximum(len_c, eps))
    return loss
