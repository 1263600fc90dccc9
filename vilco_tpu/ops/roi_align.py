"""1-D temporal ROI align.

TPU-native replacement for the reference's CUDA op (component N2:
MQ/libs/modeling/roi_align/src/roi_align_kernel.cu + the autograd wrapper
roi_align/roi_align.py:9-78). The only consumer in the reference is the
*disabled* segment-level contrastive loss (meta_archs.py:607 commented,
`_to_roi_align_format` :1849) — this exists for capability parity.

Implemented as gather + linear interpolation, fully jittable and
differentiable (no custom backward needed — XLA transposes the gather).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align_1d(
    feats: jax.Array,     # (B, T, C)
    rois: jax.Array,      # (N, 3): [batch_idx, start, end] in grid coords
    out_size: int,
    sampling_ratio: int = 2,
) -> jax.Array:
    """(N, out_size, C) ROI-aligned features.

    Each output bin averages `sampling_ratio` linearly-interpolated samples,
    matching the CUDA kernel's bin-sampling scheme.
    """
    B, T, C = feats.shape
    batch_idx = rois[:, 0].astype(jnp.int32)          # (N,)
    start = rois[:, 1]
    end = rois[:, 2]
    length = jnp.maximum(end - start, 1e-6)           # (N,)
    bin_size = length / out_size                      # (N,)

    # sample positions: (N, out_size, S)
    s = jnp.arange(sampling_ratio, dtype=feats.dtype)
    offs = (s + 0.5) / sampling_ratio                 # (S,)
    bins = jnp.arange(out_size, dtype=feats.dtype)    # (out,)
    pos = (
        start[:, None, None]
        + (bins[None, :, None] + offs[None, None, :]) * bin_size[:, None, None]
    )                                                 # (N, out, S)

    lo = jnp.clip(jnp.floor(pos), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    frac = (pos - lo).astype(feats.dtype)
    lo = lo.astype(jnp.int32)
    hi = hi.astype(jnp.int32)

    rows = feats[batch_idx]                           # (N, T, C)
    take = lambda idx: jnp.take_along_axis(
        rows, idx.reshape(idx.shape[0], -1, 1), axis=1
    ).reshape(idx.shape + (C,))
    v = take(lo) * (1 - frac[..., None]) + take(hi) * frac[..., None]
    return v.mean(axis=2)                             # (N, out, C)


def roi_align_2d(
    feats: jax.Array,     # (B, H, W, C)
    rois: jax.Array,      # (N, 5): [batch_idx, x1, y1, x2, y2] pixel coords
    out_size,             # (out_h, out_w)
    sampling_ratio: int = 2,
) -> jax.Array:
    """(N, out_h, out_w, C) bilinear ROI align, torchvision semantics
    (aligned=False: no half-pixel offset, roi sides clamped to >= 1,
    samples outside [-1, dim] contribute zero).

    The reference's only 2-D consumer is the defaults-off `use_query_roi`
    query-feature crop (VQ model :399-403, config.train.use_query_roi =
    False in every shipped config) via torchvision.ops.roi_align. Fixed
    `sampling_ratio` (torchvision's adaptive -1 would make the sample grid
    data-dependent — unjittable); the 2 x 2 grid matches torchvision
    exactly whenever roi/out bin ratios are <= 2, which holds for the
    reference's (h, w) -> (h, w) full-feature resample.
    """
    B, H, W, C = feats.shape
    out_h, out_w = out_size
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1, y1, x2, y2 = rois[:, 1], rois[:, 2], rois[:, 3], rois[:, 4]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)

    def axis_pos(start, size, out_len):
        bin_sz = size / out_len                        # (N,)
        s = (jnp.arange(sampling_ratio, dtype=feats.dtype) + 0.5
             ) / sampling_ratio
        grid = jnp.arange(out_len, dtype=feats.dtype)
        # (N, out_len * ratio)
        return (start[:, None, None]
                + (grid[None, :, None] + s[None, None, :])
                * bin_sz[:, None, None]).reshape(start.shape[0], -1)

    ys = axis_pos(y1, roi_h, out_h)                    # (N, OHr)
    xs = axis_pos(x1, roi_w, out_w)                    # (N, OWr)

    def weights(pos, dim):
        valid = (pos >= -1.0) & (pos <= dim)           # torchvision border
        p = jnp.clip(pos, 0.0, dim - 1)
        lo = jnp.floor(p)
        frac = p - lo
        lo = lo.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, dim - 1)
        return lo, hi, frac.astype(feats.dtype), valid

    ylo, yhi, wy, vy = weights(ys, H)
    xlo, xhi, wx, vx = weights(xs, W)

    f = feats[batch_idx]                               # (N, H, W, C)
    take_y = lambda idx: jnp.take_along_axis(
        f, idx[:, :, None, None], axis=1)              # (N, OHr, W, C)
    fy = take_y(ylo) * (1 - wy)[..., None, None] \
        + take_y(yhi) * wy[..., None, None]
    take_x = lambda g, idx: jnp.take_along_axis(
        g, idx[:, None, :, None], axis=2)              # (N, OHr, OWr, C)
    v = take_x(fy, xlo) * (1 - wx)[:, None, :, None] \
        + take_x(fy, xhi) * wx[:, None, :, None]
    v = v * (vy[:, :, None, None] & vx[:, None, :, None]).astype(v.dtype)

    r = sampling_ratio
    N = v.shape[0]
    v = v.reshape(N, out_h, r, out_w, r, C)
    return v.mean(axis=(2, 4))
