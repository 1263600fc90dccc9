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
