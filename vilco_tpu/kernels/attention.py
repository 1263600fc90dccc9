"""Pallas TPU kernel: fused full masked attention (fwd + bwd).

The MQ flagship runs FULL attention at T=1024 (n_mha_win_size=-1 in
configs/mq_vilco.yaml): the XLA form materializes f32 (B, H, T, T) score
tensors in HBM (134 MB per block at the flagship shape), making the step
HBM-bound. At these sequence lengths a whole (T, D) head fits in VMEM, so
both passes run as single-program-per-(batch, head) kernels with scores
living only in VMEM:

  forward:  S = qk^T -> mask -> softmax -> O = P v
  backward: recompute P, then
            dV = P^T dO
            dP = dO V^T
            dS = P * (dP - rowsum(dP * P))
            dQ = dS K * scale ; dK = dS^T Q * scale

VMEM budget at the flagship shape (T=1024, D=64): Q/K/V/dO ~128 KB each
(bf16) + S/P/dP 4 MB each (f32) — well under ~16 MB. Larger T*T falls back
to the XLA path automatically.

Semantics match ops.attention.masked_attention (MaskedMHA/MaskedMHCA,
MQ/libs/modeling/blocks.py:256-263, 392-399).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vilco_tpu.ops.attention import masked_attention as masked_attention_xla

NEG_INF = -1e9
# S/P tensors are f32 in VMEM; keep them within a conservative budget
MAX_VMEM_SCORE_BYTES = 6 * 1024 * 1024


def _fwd_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)              # (Tq, D)
    k = k_ref[0].astype(jnp.float32)              # (Tk, D)
    v = v_ref[0].astype(jnp.float32)
    m = m_ref[0, 0]                                # (Tk,)

    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (Tq, Tk)
    s = jnp.where(m[None, :] > 0, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    vz = v * (m[:, None] > 0)
    o = jax.lax.dot_general(
        p, vz, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, m_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    m = m_ref[0, 0]
    do = do_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = jnp.where(m[None, :] > 0, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)     # (Tq, Tk)

    vz = v * (m[:, None] > 0)
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )                                              # (Tk, D)
    dv = dv * (m[:, None] > 0)                     # masked keys got zeroed v
    dp = jax.lax.dot_general(
        do, vz, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )                                              # (Tq, Tk)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _fold(x):
    B, T, H, D = x.shape
    return jnp.swapaxes(x, 1, 2).reshape(B * H, T, D)


def _unfold(x, B, H):
    BH, T, D = x.shape
    return x.reshape(B, H, T, D).swapaxes(1, 2)


def _run_fwd(q, k, v, kv_mask, interpret):
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    mf = jnp.repeat(kv_mask.astype(jnp.int32), H, axis=0)[:, None, :]

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Tq, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tq, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Tq, D), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, mf)
    return _unfold(out, B, H)


def _run_bwd(q, k, v, kv_mask, g, interpret):
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    qf, kf, vf, gf = _fold(q), _fold(k), _fold(v), _fold(g)
    mf = jnp.repeat(kv_mask.astype(jnp.int32), H, axis=0)[:, None, :]

    spec_q = pl.BlockSpec((1, Tq, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, Tk, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[
            spec_q, spec_k, spec_k,
            pl.BlockSpec((1, 1, Tk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_q,
        ],
        out_specs=(spec_q, spec_k, spec_k),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Tq, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Tk, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Tk, D), v.dtype),
        ),
        interpret=interpret,
    )(qf, kf, vf, mf, gf)
    return (_unfold(dq, B, H), _unfold(dk, B, H), _unfold(dv, B, H))


def _fits_vmem(q, k) -> bool:
    Tq, Tk = q.shape[1], k.shape[1]
    return Tq * Tk * 4 <= MAX_VMEM_SCORE_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention(q, k, v, kv_mask, interpret: bool = False):
    """Fused masked attention; q (B,Tq,H,D), k/v (B,Tk,H,D), kv_mask (B,Tk).
    Falls back to the XLA form when the score tile exceeds the VMEM budget.
    Invalid-query rows are NOT zeroed (callers multiply by their own query
    mask, as in ops.attention.masked_attention)."""
    if not _fits_vmem(q, k):
        return masked_attention_xla(q, k, v, kv_mask)
    return _run_fwd(q, k, v, kv_mask, interpret)


def _vjp_fwd(q, k, v, kv_mask, interpret):
    return fused_attention(q, k, v, kv_mask, interpret), (q, k, v, kv_mask)


def _vjp_bwd(interpret, res, g):
    q, k, v, kv_mask = res
    if not _fits_vmem(q, k):
        _, vjp = jax.vjp(
            lambda q_, k_, v_: masked_attention_xla(q_, k_, v_, kv_mask),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
    else:
        dq, dk, dv = _run_bwd(q, k, v, kv_mask, g, interpret)
    return dq, dk, dv, None


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)


def flash_attention_jax(q, k, v, kv_mask):
    """JAX's production TPU flash-attention kernel
    (jax.experimental.pallas.ops.tpu.flash_attention) with key-padding
    expressed as segment ids. Self-attention only (Tq == Tk).

    q/k/v: (B, T, H, D); kv_mask: (B, T) bool. Invalid query rows attend
    valid keys (harmless — callers re-mask outputs).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention as _flash,
    )

    B, T, H, D = q.shape
    if T < 128:
        # deep pyramid levels are shorter than the kernel's min block
        return masked_attention_xla(q, k, v, kv_mask)
    fold = lambda x: jnp.swapaxes(x, 1, 2)       # (B, H, T, D)
    seg_kv = jnp.where(kv_mask, 1, 2).astype(jnp.int32)
    seg_q = jnp.ones((B, T), jnp.int32)
    out = _flash(
        fold(q), fold(k), fold(v),
        segment_ids=SegmentIds(q=seg_q, kv=seg_kv),
        sm_scale=1.0 / (D ** 0.5),
    )
    return jnp.swapaxes(out, 1, 2)
