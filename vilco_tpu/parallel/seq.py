"""Sequence (time-axis) parallelism: halo-exchange sharded sequence ops.

The reference handles long sequences purely algorithmically on one device
(Longformer-style LocalMaskedMHCA, MQ/libs/modeling/blocks.py:871-1208, and
the stride-2 pyramid) — it has no sequence parallelism at all (SURVEY.md
§2.3). On TPU the natural extension is to shard the TIME axis over a mesh
axis and exchange w-token halos between neighbouring shards over ICI with
`lax.ppermute` — a ring-attention-style scheme specialized to the banded
case, where each query only ever needs +-window keys so ONE hop of halo
exchange replaces the full ring pass.

These functions are written to run INSIDE `shard_map` with the time axis
sharded over `axis_name`; each device holds a (B, T/n, ...) shard. They are
numerically identical to their unsharded counterparts in ops/masked.py and
ops/attention.py (tested on an 8-device CPU mesh in
tests/test_seq_parallel.py).

Intended use: sequences too long for one chip's HBM at the backbone's
finest level — beyond reference capability, opt-in via
`parallel.seq_shard_ops`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _ring_perms(n: int, shift: int):
    """ppermute pairs sending shard i -> shard i+shift (mod n)."""
    return [(i, (i + shift) % n) for i in range(n)]


def halo_exchange(x: jax.Array, w: int, axis_name: str):
    """Exchange w-wide halos of a (B, Ts, ...) time-shard with ring
    neighbours. Returns (left, right), each (B, w, ...): `left` holds the
    LAST w rows of the previous shard, `right` the FIRST w rows of the next.
    Boundary shards get zeros (matching the zero padding the unsharded ops
    apply at the true sequence ends)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    left = jax.lax.ppermute(x[:, -w:], axis_name, _ring_perms(n, 1))
    right = jax.lax.ppermute(x[:, :w], axis_name, _ring_perms(n, -1))
    left = jnp.where(idx == 0, jnp.zeros_like(left), left)
    right = jnp.where(idx == n - 1, jnp.zeros_like(right), right)
    return left, right


def seq_masked_conv1d(
    x: jax.Array,          # (B, Ts, C_in) — local time shard
    mask: jax.Array,       # (B, Ts) bool
    kernel: jax.Array,     # (K, C_in, C_out) "WIO"
    bias: jax.Array | None = None,
    stride: int = 1,
    groups: int = 1,
    *,
    axis_name: str = "seq",
):
    """Time-sharded masked_conv1d (ops/masked.py): VALID conv over the
    halo-extended shard == SAME conv over the full sequence. Requires
    Ts % stride == 0 so every shard produces Ts // stride outputs."""
    k = kernel.shape[0]
    w = k // 2
    if w > 0:
        lx, rx = halo_exchange(x, w, axis_name)
        xe = jnp.concatenate([lx, x, rx], axis=1)    # (B, Ts + 2w, C)
    else:
        xe = x
    out = jax.lax.conv_general_dilated(
        xe, kernel, window_strides=(stride,), padding="VALID",
        feature_group_count=groups,
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        out = out + bias
    out_mask = mask[:, ::stride] if stride > 1 else mask
    out = out * out_mask[..., None].astype(out.dtype)
    return out, out_mask


def seq_banded_attention(
    q: jax.Array,          # (B, Ts, H, D) — local time shard
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array,    # (B, Ts) bool
    window: int,
    *,
    axis_name: str = "seq",
):
    """Time-sharded sliding-window attention == ops.attention.banded_attention
    over the full sequence. One w-halo exchange of k/v/mask, then the same
    blocked band computation as the unsharded op; requires Ts % window == 0
    and Ts >= window."""
    B, Ts, H, D = q.shape
    w = window
    assert w > 0 and Ts % w == 0 and Ts >= w, (Ts, w)

    vz = v * kv_mask[:, :, None, None].astype(v.dtype)
    mb = kv_mask.astype(jnp.bool_)
    lk, rk = halo_exchange(k, w, axis_name)
    lv, rv = halo_exchange(vz, w, axis_name)
    lm, rm = halo_exchange(mb[..., None], w, axis_name)
    ke = jnp.concatenate([lk, k, rk], axis=1)        # (B, Ts + 2w, H, D)
    ve = jnp.concatenate([lv, vz, rv], axis=1)
    me = jnp.concatenate([lm, mb[..., None], rm], axis=1)[..., 0]

    # blocked band over the extended keys — same tiling rule as
    # banded_attention: largest query block S <= 128 dividing Ts
    S = w
    for cand in range(min(128, Ts), w - 1, -1):
        if cand % w == 0 and Ts % cand == 0:
            S = cand
            break
    nb = Ts // S
    span = S + 2 * w
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32)).astype(q.dtype)
    qb = q.reshape(B, nb, S, H, D) * scale
    idx = jnp.arange(nb)[:, None] * S + jnp.arange(span)[None, :]
    kb, vb, mbb = ke[:, idx], ve[:, idx], me[:, idx]

    att = jnp.einsum("bnqhd,bnkhd->bnhqk", qb, kb,
                     preferred_element_type=jnp.float32)
    qi = jnp.arange(S)[:, None]
    kj = jnp.arange(span)[None, :]
    band = jnp.abs((kj - w) - qi) <= w
    allow = band[None, None, :, :] & mbb[:, :, None, :]
    att = jnp.where(allow[:, :, None, :, :], att, NEG_INF)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    out = jnp.einsum("bnhqk,bnkhd->bnqhd", att, vb,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    out = out.reshape(B, Ts, H, D)
    return out * kv_mask[:, :, None, None].astype(out.dtype)


def seq_channel_layernorm(x, weight=None, bias=None, eps: float = 1e-5):
    """channel_layernorm is pointwise over time — shard-local already; alias
    provided so time-sharded blocks read uniformly."""
    from vilco_tpu.ops.masked import channel_layernorm

    return channel_layernorm(x, weight, bias, eps)
