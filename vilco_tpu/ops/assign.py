"""Point generation and training-target assignment.

TPU-native equivalents of:
  - PointGenerator            MQ/libs/modeling/loc_generators.py:27-93
  - label_points / label_points_single_video
                              MQ/libs/modeling/meta_archs.py:1224-1344
  - normal_distribution       MQ/libs/modeling/meta_archs.py:20-21

Unlike the reference (a Python loop over the batch on concatenated level
lists), assignment here is a single vectorized function over padded GT
(B, N, ...) so it jits into the training step. Gaussian weights keep gradients
flowing to the learnable per-class (mu, sigma), exactly as in the reference
(the normal probs are not detached there).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

INF = 1e9


def generate_points(
    level_lengths: Sequence[int],
    fpn_strides: Sequence[int],
    regression_ranges: Sequence[Tuple[float, float]],
    use_offset: bool = False,
) -> np.ndarray:
    """All FPN-level points concatenated: (P, 4) rows [t, reg_lo, reg_hi, stride].

    Matches PointGenerator (loc_generators.py:27-93): t = arange(T_l) * stride
    (+ 0.5*stride with use_offset).
    """
    rows = []
    for t_len, stride, (lo, hi) in zip(level_lengths, fpn_strides, regression_ranges):
        t = np.arange(t_len, dtype=np.float32) * stride
        if use_offset:
            t += 0.5 * stride
        row = np.stack(
            [
                t,
                np.full_like(t, lo),
                np.full_like(t, hi),
                np.full_like(t, stride),
            ],
            axis=-1,
        )
        rows.append(row)
    return np.concatenate(rows, axis=0)


def normal_distribution(x, mu, sigma):
    """exp(-(x-mu)^2 / (2 sigma^2)) — meta_archs.py:20-21."""
    return jnp.exp(-jnp.square(x - mu) / (2.0 * jnp.square(sigma)))


class Targets(NamedTuple):
    cls: jax.Array          # (B, P, C) one/zero (possibly multi-hot)
    reg: jax.Array          # (B, P, 2) stride-normalized offsets
    prob_cls: jax.Array     # (B, P) Gaussian cls weight of the assigned seg
    prob_reg_left: jax.Array   # (B, P)
    prob_reg_right: jax.Array  # (B, P)
    pos_mask: jax.Array     # (B, P) bool: point has a positive assignment


def label_points(
    points: jax.Array,        # (P, 4)
    gt_segments: jax.Array,   # (B, N, 2) in feature-grid coords
    gt_labels: jax.Array,     # (B, N) int
    gt_valid: jax.Array,      # (B, N) bool (padding mask)
    num_classes: int,
    gaussians: Tuple[jax.Array, ...],  # mu, sigma, mu_l, sig_l, mu_r, sig_r each (C,)
    center_sample: str = "radius",
    center_sample_radius: float = 1.5,
) -> Targets:
    """Vectorized center-sampling assignment with learned Gaussian weighting.

    Follows label_points_single_video (meta_archs.py:1253-1344):
      1. candidate points are those inside the (radius-clamped) center window
         and whose max regression distance falls in the level's range;
      2. ambiguous points take the shortest valid segment;
      3. cls target is the multi-hot over segments tied within 1e-3 of the
         shortest; reg target is the argmin segment's offsets / stride.
    """
    if gaussians is None:
        # NLQ variant: the reference model has no learnable Gaussians and
        # never weights by them (use_gaussian_weights=False); neutral
        # constants keep the prob_* outputs well-defined (and unused)
        C = num_classes
        ones = jnp.ones((C,), jnp.float32)
        gaussians = (jnp.zeros((C,), jnp.float32), ones,
                     jnp.full((C,), -0.5, jnp.float32), ones,
                     jnp.full((C,), 0.5, jnp.float32), ones)
    mu, sigma, mu_l, sig_l, mu_r, sig_r = gaussians

    t = points[:, 0][None, :, None]          # (1, P, 1)
    reg_lo = points[:, 1][None, :, None]
    reg_hi = points[:, 2][None, :, None]
    stride = points[:, 3][None, :, None]

    seg_l = gt_segments[..., 0][:, None, :]  # (B, 1, N)
    seg_r = gt_segments[..., 1][:, None, :]
    lens = (seg_r - seg_l)                   # (B, 1, N)

    left = t - seg_l                         # (B, P, N)
    right = seg_r - t
    dist2center = (right - left) / 2.0

    # learned Gaussian weights; x normalized by stride * length.
    # Padded GT rows can have zero length — guard the division so no
    # inf/NaN enters the graph (NaN gradients poison mu/sigma otherwise).
    seg_ok = gt_valid[:, None, :] & (lens > 0)
    lens_safe = jnp.where(lens > 0, lens, 1.0)
    xn = jnp.where(seg_ok, dist2center / (stride * lens_safe), 0.0)
    lbl = jnp.clip(gt_labels, 0, num_classes - 1)
    g = lambda m, s: normal_distribution(xn, m[lbl][:, None, :], s[lbl][:, None, :])
    prob_cls_all = g(mu, sigma)              # (B, P, N)
    prob_reg_l_all = g(mu_l, sig_l)
    prob_reg_r_all = g(mu_r, sig_r)

    if center_sample == "radius":
        center = 0.5 * (seg_l + seg_r)
        t_min = jnp.maximum(center - stride * center_sample_radius, seg_l)
        t_max = jnp.minimum(center + stride * center_sample_radius, seg_r)
        inside = jnp.minimum(t - t_min, t_max - t) > 0
    else:
        inside = jnp.minimum(left, right) > 0

    max_reg_dist = jnp.maximum(left, right)
    in_range = (max_reg_dist >= reg_lo) & (max_reg_dist <= reg_hi)

    valid = inside & in_range & gt_valid[:, None, :]
    lens_masked = jnp.where(valid, jnp.broadcast_to(lens, valid.shape), INF)

    min_len = jnp.min(lens_masked, axis=-1)              # (B, P)
    min_idx = jnp.argmin(lens_masked, axis=-1)           # (B, P)
    min_len_mask = (lens_masked <= (min_len[..., None] + 1e-3)) & (
        lens_masked < INF
    )                                                    # (B, P, N)

    onehot = jax.nn.one_hot(lbl, num_classes, dtype=jnp.float32)  # (B, N, C)
    cls_t = jnp.einsum("bpn,bnc->bpc", min_len_mask.astype(jnp.float32), onehot)
    cls_t = jnp.clip(cls_t, 0.0, 1.0)

    take = lambda a: jnp.take_along_axis(a, min_idx[..., None], axis=-1)[..., 0]
    reg_t = jnp.stack([take(left), take(right)], axis=-1) / stride  # (B, P, 2)

    return Targets(
        cls=cls_t,
        reg=reg_t,
        prob_cls=take(prob_cls_all),
        prob_reg_left=take(prob_reg_l_all),
        prob_reg_right=take(prob_reg_r_all),
        pos_mask=jnp.any(min_len_mask, axis=-1),
    )
