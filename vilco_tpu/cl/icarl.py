"""iCaRL exemplar means + nearest-mean candidate filtering.

TPU-native equivalent of PtTransformer.classify
(MQ/libs/modeling/meta_archs.py:1060-1131) and its use in
inference_single_video (:1626-1643): per FPN level, each class's exemplar
mean is the globally-normalized average of the (globally-normalized) FPN
feature maps of its rehearsal-memory videos; at inference the squared
distance between the video's normalized features and each class mean gives
per-(point, class) distances, and candidates whose distance is below the
per-level mean distance are kept (ranked by ascending distance in the
reference; here the surviving candidates keep their sigmoid scores, which
is equivalent up to pre-NMS ranking since the top-k cap is far above the
survivor count — deviation documented).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def _gnorm(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    return x / (np.linalg.norm(x) + eps)


def compute_exemplar_means(
    feats_fn: Callable[[List[dict]], List[np.ndarray]],
    class_videos: Dict[int, List[dict]],
    num_classes: int,
) -> List[np.ndarray]:
    """Returns per-level (C, T_l, D) means (+inf-distance marker for classes
    without exemplars encoded as zero rows + a validity mask).

    feats_fn(videos) -> list over fpn levels of (n_videos, T_l, D).
    """
    means_per_level: List[np.ndarray] = []
    valid = np.zeros((num_classes,), bool)
    per_class_feats: Dict[int, List[List[np.ndarray]]] = {}
    for c, videos in class_videos.items():
        if not videos:
            continue
        feats = feats_fn(videos)          # list of (n, T_l, D)
        per_class_feats[int(c)] = [
            np.stack([_gnorm(f) for f in level]) for level in feats
        ]
        valid[int(c)] = True

    if not per_class_feats:
        return [], valid

    n_levels = len(next(iter(per_class_feats.values())))
    for lvl in range(n_levels):
        any_c = next(iter(per_class_feats.values()))[lvl]
        T_l, D = any_c.shape[1:]
        means = np.zeros((num_classes, T_l, D), np.float32)
        for c, levels in per_class_feats.items():
            mu = levels[lvl].mean(0)
            means[c] = _gnorm(mu)
        means_per_level.append(means)
    return means_per_level, valid


def distance_keep_mask(
    fpn_feats: Sequence[np.ndarray],     # per level (B, T_l, D)
    means_per_level: Sequence[np.ndarray],  # per level (C, T_l, D)
    class_valid: np.ndarray,             # (C,) bool
) -> np.ndarray:
    """(B, P, C) keep-mask: dist < per-level mean dist over valid classes
    (inference_single_video :1626-1643 keep_idxs1)."""
    keeps = []
    for f, m in zip(fpn_feats, means_per_level):
        fn = np.stack([_gnorm(x) for x in np.asarray(f)])      # (B, T, D)
        # dists[b, t, c] = || fn[b,t] - m[c,t] ||^2
        diff = fn[:, None] - m[None]                           # (B, C, T, D)
        dists = np.square(diff).sum(-1).transpose(0, 2, 1)     # (B, T, C)
        dists = np.where(class_valid[None, None, :], dists, np.inf)
        finite = np.where(np.isfinite(dists), dists, np.nan)
        thr = np.nanmean(finite.reshape(len(fn), -1), axis=1)  # (B,)
        keeps.append(dists < thr[:, None, None])
    return np.concatenate(keeps, axis=1)                       # (B, P, C)
