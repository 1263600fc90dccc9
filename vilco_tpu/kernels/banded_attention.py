"""Pallas TPU kernel: fused sliding-window (banded) attention.

The centerpiece kernel of the perf pass (SURVEY.md section 7 step 5): the
reference implements Longformer-style banded attention with `as_strided`
chunk tricks (LocalMaskedMHCA, MQ/libs/modeling/blocks.py:871-1208 — chunked
score assembly :1038-1101, banded A.V :1103-1138). Here the whole band
(scores -> mask -> softmax -> A.V) is fused into one Pallas kernel:

  grid = (B * H, T / BLOCK_Q); each program holds one query block
  (BLOCK_Q, D) in VMEM plus the full (padded) K/V rows for its (batch, head)
  and computes the (BLOCK_Q, BLOCK_Q + 2w) banded tile on the MXU — no
  (T, T) scores ever materialize in HBM.

Backward reuses the blocked XLA formulation (ops/attention.banded_attention)
via custom_vjp — the band is re-computed, which is the standard
flash-attention trade.

K/V rows per (b, h) are ~T * D * 2 bytes; for the NLQ flagship
(T=2560, D=96, bf16) that is ~0.5 MB, comfortably inside the ~16 MB VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vilco_tpu.ops.attention import banded_attention as banded_attention_xla

NEG_INF = -1e9


def _pick_block(T: int, w: int, target: int = 256) -> int:
    best = w
    for cand in range(min(target, T), w - 1, -1):
        if cand % w == 0 and T % cand == 0:
            best = cand
            break
    return best


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, w: int, block_q: int):
    i = pl.program_id(1)
    span = block_q + 2 * w
    q = q_ref[0]                                   # (BQ, D)
    start = i * block_q
    k = k_ref[0, pl.ds(start, span), :]            # (span, D)
    v = v_ref[0, pl.ds(start, span), :]
    m = m_ref[0, 0, pl.ds(start, span)]            # (span,)

    # MXU operands stay in the input dtype (bf16 hot path) with f32
    # accumulation; softmax stays f32 (see kernels/attention.py note)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                      # (BQ, span) f32

    qi = jax.lax.broadcasted_iota(jnp.int32, (block_q, span), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (block_q, span), 1)
    band = jnp.abs((kj - w) - qi) <= w
    allow = band & (m[None, :] > 0)
    s = jnp.where(allow, s, NEG_INF)

    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom

    vz = v * (m[:, None] > 0).astype(v.dtype)
    o = jax.lax.dot_general(
        p.astype(v.dtype), vz, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _forward(q, k, v, kv_mask, window: int, block_q: int, interpret: bool):
    B, T, H, D = q.shape
    w = window
    BQ = block_q

    # (B, T, H, D) -> (B*H, T, D)
    fold = lambda x: jnp.swapaxes(x, 1, 2).reshape(B * H, T, D)
    qf, kf, vf = fold(q), fold(k), fold(v)
    pad = [(0, 0), (w, w), (0, 0)]
    kp = jnp.pad(kf, pad)
    vp = jnp.pad(vf, pad)
    mp = jnp.pad(kv_mask.astype(jnp.int32), [(0, 0), (w, w)])
    mp = jnp.repeat(mp, H, axis=0)[:, None, :]     # (B*H, 1, T+2w)

    grid = (B * H, T // BQ)
    out = pl.pallas_call(
        functools.partial(_kernel, w=w, block_q=BQ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T + 2 * w, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T + 2 * w, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T + 2 * w), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        interpret=interpret,
    )(qf, kp, vp, mp)

    out = out.reshape(B, H, T, D).swapaxes(1, 2)   # (B, T, H, D)
    out = out * kv_mask[:, :, None, None].astype(out.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def banded_attention_fused(q, k, v, kv_mask, window: int,
                           block_q: int = 0, interpret: bool = False):
    """Fused banded attention; identical semantics to
    ops.attention.banded_attention (LocalMaskedMHCA)."""
    B, T, H, D = q.shape
    if window <= 0 or 2 * window + 1 >= T:
        return banded_attention_xla(q, k, v, kv_mask, window)
    bq = block_q or _pick_block(T, window)
    return _forward(q, k, v, kv_mask, window, bq, interpret)


def _fwd(q, k, v, kv_mask, window, block_q, interpret):
    out = banded_attention_fused(q, k, v, kv_mask, window, block_q,
                                 interpret)
    return out, (q, k, v, kv_mask)


def _bwd(window, block_q, interpret, res, g):
    q, k, v, kv_mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: banded_attention_xla(q_, k_, v_, kv_mask, window),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


banded_attention_fused.defvjp(_fwd, _bwd)
