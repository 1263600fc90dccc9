"""Masked multi-head attention ops (dense + banded/sliding-window).

TPU-native equivalents of the reference attention stack:
  - MaskedMHA (self & cross)       MQ/libs/modeling/blocks.py:194-270
  - MaskedMHCA attention core      MQ/libs/modeling/blocks.py:272-411
  - LocalMaskedMHCA (Longformer)   MQ/libs/modeling/blocks.py:871-1208
  - ChannelAttention               MQ/libs/modeling/blocks.py:412-437

The reference implements the sliding window via `as_strided` chunk tricks;
here the banded form is a blocked matmul over window chunks (see
`banded_attention`), which is what the Pallas kernel in
vilco_tpu/kernels/banded_attention.py implements fused.

All functions take (B, T, H, D) q/k/v ("BTHD") and (B, T) boolean masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def masked_attention(
    q: jax.Array,        # (B, Tq, H, D)
    k: jax.Array,        # (B, Tk, H, D)
    v: jax.Array,        # (B, Tk, H, D)
    kv_mask: jax.Array,  # (B, Tk) bool — keys the queries may attend to
    q_mask: jax.Array | None = None,  # (B, Tq) bool — zero out invalid queries
):
    """Dense masked MHA. Matches MaskedMHA/MaskedMHCA semantics: scores of
    invalid keys are -inf before softmax, values of invalid keys are zeroed
    (blocks.py:256-263, :392-399), and invalid query rows are zeroed.
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32)).astype(q.dtype)
    att = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                     preferred_element_type=jnp.float32)
    att = jnp.where(kv_mask[:, None, None, :], att, NEG_INF)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    vm = v * kv_mask[:, :, None, None].astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, vm,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    if q_mask is not None:
        out = out * q_mask[:, :, None, None].astype(out.dtype)
    return out


def banded_attention(
    q: jax.Array,        # (B, T, H, D)
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array,  # (B, T) bool
    window: int,         # half-window; token i attends to [i-window, i+window]
):
    """Sliding-window (banded) attention, O(T * window).

    Equivalent to LocalMaskedMHCA (blocks.py:871-1208): each query attends to
    keys within +-window positions.  Implemented as a blocked computation:
    queries are chunked into blocks of `window` and each block attends to the
    3 neighbouring key chunks, which keeps every matmul MXU-shaped instead of
    materializing T x T scores.
    """
    B, T, H, D = q.shape
    w = window
    if w <= 0:
        return masked_attention(q, k, v, kv_mask)
    if 2 * w + 1 >= T:
        # band wider than the sequence: a dense matmul is cheapest, but
        # the band STILL cuts the corners (position 0 must not see
        # positions > w). The reference's Longformer chunks enforce this
        # at every T (_mask_invalid_locations); dropping it shifted the
        # deepest NLQ level (T=8, w=4) by 3e-1 — caught by
        # test_nlq_trajectory's lockstep.
        idx = jnp.arange(T)
        band = jnp.abs(idx[:, None] - idx[None, :]) <= w       # (T, T)
        banded_kv = kv_mask[:, None, :] & band[None]           # (B, T, T)
        d = q.shape[-1]
        scale = (1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))).astype(
            q.dtype)
        att = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                         preferred_element_type=jnp.float32)
        att = jnp.where(banded_kv[:, None], att, NEG_INF)
        att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
        vz = v * kv_mask[:, :, None, None].astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, vz,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        # Zero invalid query rows, matching the blocked path below and the
        # fused kernel (a fully-masked row softmaxes to uniform over zeroed
        # vz, but keep the semantics identical across T regimes).
        return out * kv_mask[:, :, None, None].astype(out.dtype)
    assert T % w == 0, f"T={T} must be divisible by window={w}"

    # Query block size: the largest multiple of w that is <= 128 and divides
    # T — keeps every matmul MXU-tile sized even for tiny windows (w=4 for
    # NLQ would otherwise produce 4-wide matmuls).
    S = w
    for cand in range(min(128, T), w - 1, -1):
        if cand % w == 0 and T % cand == 0:
            S = cand
            break
    nb = T // S

    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32)).astype(q.dtype)

    # Block queries: (B, nb, S, H, D)
    qb = q.reshape(B, nb, S, H, D) * scale

    # Keys/values with a w-halo on each side: (B, nb, S + 2w, H, D)
    kv_m = kv_mask
    vz = v * kv_m[:, :, None, None].astype(v.dtype)
    span = S + 2 * w

    def halo(x, pad_value=0.0):
        # x: (B, T, ...) -> (B, nb, S + 2w, ...)
        pad = [(0, 0), (w, w)] + [(0, 0)] * (x.ndim - 2)
        xp = jnp.pad(x, pad, constant_values=pad_value)
        idx = (jnp.arange(nb)[:, None] * S + jnp.arange(span)[None, :])
        return xp[:, idx]

    kb = halo(k)                           # (B, nb, span, H, D)
    vb = halo(vz)
    mb = halo(kv_m.astype(jnp.bool_), pad_value=False)   # (B, nb, span)

    att = jnp.einsum("bnqhd,bnkhd->bnhqk", qb, kb,
                     preferred_element_type=jnp.float32)  # (B,nb,H,S,span)

    # Band mask inside the halo: query position i (0..S-1) in the block may
    # attend to halo position j (0..span-1) iff |(j - w) - i| <= w.
    qi = jnp.arange(S)[:, None]
    kj = jnp.arange(span)[None, :]
    band = jnp.abs((kj - w) - qi) <= w      # (S, span)
    allow = band[None, None, :, :] & mb[:, :, None, :]    # (B,nb,S,span)
    att = jnp.where(allow[:, :, None, :, :], att, NEG_INF)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    # A fully-masked row (query outside kv_mask support) softmaxes to uniform;
    # vz is zeroed there so the output is 0, matching the reference's
    # out * qx_mask.
    out = jnp.einsum("bnhqk,bnkhd->bnqhd", att, vb,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    out = out.reshape(B, T, H, D)
    out = out * kv_mask[:, :, None, None].astype(out.dtype)
    return out


def channel_attention(qkv: jax.Array, n_head: int):
    """Transposed ("channel") attention from ChannelAttention
    (blocks.py:412-437): attention matrix is (D x D) over head-channels,
    computed from the full sequence.

    qkv: (B, T, 3, H, Dh) already projected. Returns (B, T, H, Dh).
    """
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # (B, T, H, Dh)
    dh = q.shape[-1]
    scale = dh ** -0.5
    k = k * scale
    # attention over channels: k^T v -> (B, H, Dh, Dh)
    att = jnp.einsum("bthd,bthe->bhde", k, v, preferred_element_type=jnp.float32)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    # (attention @ q^T)^T -> (B, T, H, Dh): out[t, d] = sum_e att[d, e] q[t, e]
    out = jnp.einsum("bhde,bthe->bthd", att, q,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out
