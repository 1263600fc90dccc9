"""Masked 1-D sequence ops.

TPU-native equivalents of the reference building blocks in
MQ/libs/modeling/blocks.py (MaskedConv1D :57, LayerNorm :133,
get_sinusoid_encoding :177). Layout is (B, T, C) ("NWC") throughout — channels
last puts C on the TPU lane dimension so convs/matmuls tile onto the MXU.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def masked_conv1d(
    x: jax.Array,          # (B, T, C_in)
    mask: jax.Array,       # (B, T) bool
    kernel: jax.Array,     # (K, C_in, C_out)  ("WIO")
    bias: jax.Array | None = None,
    stride: int = 1,
    groups: int = 1,
):
    """Masked 1-D convolution, same semantics as MaskedConv1D
    (MQ/libs/modeling/blocks.py:57-131): conv with `same` padding, output
    multiplied by the (possibly downsampled) mask; mask downsampling is
    nearest-neighbour, i.e. mask[:, ::stride].

    Returns (out (B, T', C_out), out_mask (B, T') bool).
    """
    # explicit symmetric padding (K//2 each side) — XLA's "SAME" pads
    # asymmetrically for stride > 1, torch's Conv1d(padding=K//2) does not.
    # No preferred_element_type upcast: the TPU MXU accumulates bf16 convs
    # in f32 internally, and an explicit f32 output breaks the conv
    # transpose rule's dtype matching under autodiff.
    k = kernel.shape[0]
    cin = x.shape[-1]
    cout = kernel.shape[-1]
    if groups == cin == cout and k <= 7:
        # depthwise conv as shifted elementwise multiplies: grouped convs
        # lower poorly on the TPU (VPU scalar loops); K shifted FMAs fuse
        # into one VPU pass. out[t, c] = sum_k xp[t*stride + k, c] * w[k, c]
        T = x.shape[1]
        pad = k // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        w = kernel[:, 0, :]                       # (K, C)
        out = None
        for i in range(k):
            sl = xp[:, i: i + T: stride, :] * w[i][None, None, :]
            out = sl if out is None else out + sl
    else:
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(stride,),
            padding=[(k // 2, k // 2)],
            feature_group_count=groups,
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
    if bias is not None:
        out = out + bias
    out_mask = mask[:, ::stride] if stride > 1 else mask
    out = out * out_mask[..., None].astype(out.dtype)
    return out, out_mask


def channel_layernorm(x: jax.Array, weight=None, bias=None, eps: float = 1e-5):
    """LayerNorm over the channel dim for (B, T, C) input.

    The reference normalizes dim=1 of (B, C, T) (blocks.py:133-175); in our
    channels-last layout that is the final axis.
    """
    dt = x.dtype
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    res = x - mu
    sigma = jnp.mean(res * res, axis=-1, keepdims=True)
    out = res * jax.lax.rsqrt(sigma + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dt)


def sinusoid_encoding(n_position: int, d_hid: int) -> np.ndarray:
    """Sinusoid position table, (n_position, d_hid).

    Matches get_sinusoid_encoding (blocks.py:177-190).
    """
    position = np.arange(n_position)[:, None].astype(np.float64)
    hid_j = np.arange(d_hid)[None, :]
    angle = position / np.power(10000.0, 2 * (hid_j // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


def masked_max_pool1d(x: jax.Array, mask: jax.Array, kernel: int, stride: int):
    """MaxPool1d with torch-style symmetric padding, used for the stride-2
    residual path (blocks.py:519-526: MaxPool1d(kernel=s+1, stride=s,
    padding=(s+1)//2)).

    Torch pads with -inf conceptually (ignores padded positions).
    """
    pad = (kernel) // 2
    # -inf init lets JAX recognize this as max-pool for autodiff
    out = jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (pad, pad), (0, 0)),
    )
    out_mask = mask[:, ::stride]
    return out * out_mask[..., None].astype(out.dtype), out_mask


def masked_mean(x: jax.Array, mask: jax.Array, axis: int):
    """Mean over `axis` counting only mask==True positions; empty -> 0.

    Mirrors the masked mean-pools in the narration-SSL wiring
    (MQ/libs/modeling/meta_archs.py:794-811).
    """
    m = mask.astype(x.dtype)
    if m.ndim < x.ndim:
        m = jnp.expand_dims(m, axis=-1)
    total = jnp.sum(x * m, axis=axis)
    count = jnp.sum(m, axis=axis)
    count = jnp.where(count == 0.0, 1.0, count)
    return total / count
