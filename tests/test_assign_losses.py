"""Unit tests: label assignment + losses vs torch transcriptions of the
reference algorithms (MQ/libs/modeling/meta_archs.py:1253-1344, losses.py).
"""

import numpy as np
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from vilco_tpu.ops import assign as ASN
from vilco_tpu.ops import losses as L


def _torch_label_points_single(concat_points, gt_segment, gt_label,
                               gaussians, num_classes, radius=1.5):
    """Transcription of label_points_single_video (meta_archs.py:1253-1344)."""
    mu, sigma, mu_l, sig_l, mu_r, sig_r = [torch.from_numpy(g) for g in gaussians]
    concat_points = torch.from_numpy(concat_points)
    gt_segment = torch.from_numpy(gt_segment)
    gt_label = torch.from_numpy(gt_label)
    num_pts = concat_points.shape[0]
    num_gts = gt_segment.shape[0]

    lens = gt_segment[:, 1] - gt_segment[:, 0]
    lens = lens[None, :].repeat(num_pts, 1)
    gt_segs = gt_segment[None].expand(num_pts, num_gts, 2)
    left = concat_points[:, 0, None] - gt_segs[:, :, 0]
    right = gt_segs[:, :, 1] - concat_points[:, 0, None]
    dist2center = (right - left) / 2.0

    def nd(x, m, s):
        return (-(x - m) ** 2 / (2 * s ** 2)).exp()

    xn = dist2center / (concat_points[:, 3, None] * lens)
    p_cls = nd(xn, mu[gt_label].permute(1, 0), sigma[gt_label].permute(1, 0))
    p_l = nd(xn, mu_l[gt_label].permute(1, 0), sig_l[gt_label].permute(1, 0))
    p_r = nd(xn, mu_r[gt_label].permute(1, 0), sig_r[gt_label].permute(1, 0))
    reg_targets = torch.stack((left, right), dim=-1)

    center_pts = 0.5 * (gt_segs[:, :, 0] + gt_segs[:, :, 1])
    t_mins = center_pts - concat_points[:, 3, None] * radius
    t_maxs = center_pts + concat_points[:, 3, None] * radius
    cb_l = concat_points[:, 0, None] - torch.maximum(t_mins, gt_segs[:, :, 0])
    cb_r = torch.minimum(t_maxs, gt_segs[:, :, 1]) - concat_points[:, 0, None]
    inside = torch.stack((cb_l, cb_r), -1).min(-1)[0] > 0

    max_reg = reg_targets.max(-1)[0]
    in_range = (max_reg >= concat_points[:, 1, None]) & (
        max_reg <= concat_points[:, 2, None]
    )
    lens = lens.masked_fill(inside == 0, float("inf"))
    lens = lens.masked_fill(in_range == 0, float("inf"))
    min_len, min_idx = lens.min(dim=1)
    min_len_mask = ((lens <= (min_len[:, None] + 1e-3)) &
                    (lens < float("inf"))).float()

    one_hot = TF.one_hot(gt_label, num_classes).float()
    cls_t = (min_len_mask @ one_hot).clamp(0.0, 1.0)
    reg_t = reg_targets[range(num_pts), min_idx]
    reg_t = reg_t / concat_points[:, 3, None]
    pick = lambda p: p[range(num_pts), min_idx]
    return (cls_t.numpy(), reg_t.numpy(), pick(p_cls).numpy(),
            pick(p_l).numpy(), pick(p_r).numpy())


def test_label_points_matches_reference(rng):
    C = 6
    points = ASN.generate_points(
        [16, 8, 4], [1, 2, 4], [(0, 4), (4, 8), (8, 10000)]
    )
    gaussians = tuple(
        g.astype(np.float32)
        for g in [np.zeros(C), np.ones(C), -0.5 * np.ones(C), np.ones(C),
                  0.5 * np.ones(C), np.ones(C)]
    )
    # jitter the gaussians so the test is sensitive to indexing
    gaussians = tuple(g + rng.standard_normal(C).astype(np.float32) * 0.1
                      for g in gaussians)

    B, N = 3, 4
    segs = np.zeros((B, N, 2), np.float32)
    labels = rng.integers(0, C, size=(B, N)).astype(np.int64)
    valid = np.zeros((B, N), bool)
    for b in range(B):
        n = rng.integers(1, N + 1)
        starts = rng.uniform(0, 12, size=n)
        lens_ = rng.uniform(0.5, 6, size=n)
        segs[b, :n, 0] = starts
        segs[b, :n, 1] = starts + lens_
        valid[b, :n] = True

    out = ASN.label_points(
        jnp.asarray(points), jnp.asarray(segs), jnp.asarray(labels),
        jnp.asarray(valid), C,
        tuple(jnp.asarray(g) for g in gaussians),
    )

    for b in range(B):
        n = int(valid[b].sum())
        g2 = tuple(g[:, None] for g in gaussians)  # (C,1) like reference params
        cls_t, reg_t, pc, pl, pr = _torch_label_points_single(
            points, segs[b, :n], labels[b, :n], g2, C
        )
        np.testing.assert_allclose(np.asarray(out.cls[b]), cls_t, atol=1e-5)
        pos = cls_t.sum(-1) > 0
        np.testing.assert_allclose(
            np.asarray(out.reg[b])[pos], reg_t[pos], atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(out.prob_cls[b])[pos], pc[pos],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.prob_reg_left[b])[pos],
                                   pl[pos], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.prob_reg_right[b])[pos],
                                   pr[pos], atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out.pos_mask[b]), pos)


def test_focal_loss_matches_torch(rng):
    x = rng.standard_normal((50, 6)).astype(np.float32) * 3
    t = (rng.random((50, 6)) < 0.3).astype(np.float32)
    out = L.sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(t))

    tx, tt = torch.from_numpy(x), torch.from_numpy(t)
    p = torch.sigmoid(tx)
    ce = TF.binary_cross_entropy_with_logits(tx, tt, reduction="none")
    p_t = p * tt + (1 - p) * (1 - tt)
    ref = ce * ((1 - p_t) ** 2.0)
    ref = (0.25 * tt + 0.75 * (1 - tt)) * ref
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_diou_giou_match_torch(rng):
    inp = rng.uniform(0.01, 5, size=(40, 2)).astype(np.float32)
    tgt = rng.uniform(0.01, 5, size=(40, 2)).astype(np.float32)

    lp, rp = torch.from_numpy(inp[:, 0]), torch.from_numpy(inp[:, 1])
    lg, rg = torch.from_numpy(tgt[:, 0]), torch.from_numpy(tgt[:, 1])
    lkis, rkis = torch.min(lp, lg), torch.min(rp, rg)
    inter = rkis + lkis
    union = (lp + rp) + (lg + rg) - inter
    iou = inter / union.clamp(min=1e-8)
    ref_giou = 1.0 - iou
    lc, rc = torch.max(lp, lg), torch.max(rp, rg)
    len_c = lc + rc
    rho = 0.5 * (rp - lp - rg + lg)
    ref_diou = 1.0 - iou + torch.square(rho / len_c.clamp(min=1e-8))

    np.testing.assert_allclose(
        np.asarray(L.ctr_giou_loss_1d(jnp.asarray(inp), jnp.asarray(tgt))),
        ref_giou.numpy(), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(L.ctr_diou_loss_1d(jnp.asarray(inp), jnp.asarray(tgt))),
        ref_diou.numpy(), atol=1e-5,
    )
