"""Pallas TPU kernel: fused full masked attention (fwd + bwd).

The MQ flagship runs FULL attention in the stem/branch blocks
(n_mha_win_size=-1 in configs/mq_vilco.yaml): the XLA form materializes
(B, H, T, T) score tensors in HBM, and the train step is bandwidth-bound
(RESULTS.md roofline). The kernel keeps scores in VMEM with the same
query-blocked (H, B, q-block) grid that the fused XL kernel uses — an
earlier single-program-per-(batch, head) version measured SLOWER than XLA
(41 vs 32 ms at the flagship shape) because each program's full-T score
tile serialized poorly; blocking queries restores pipelining across the
grid.

  forward:  S = qk^T -> mask -> softmax -> O = P v
  backward: recompute P, then
            dV = P^T dO       (accumulated across query blocks)
            dP = dO V^T
            dS = P * (dP - rowsum(dP * P))
            dQ = dS K * scale ; dK = dS^T Q * scale   (dK accumulated)

Semantics match ops.attention.masked_attention (MaskedMHA/MaskedMHCA,
MQ/libs/modeling/blocks.py:256-263, 392-399; no attention-prob dropout —
the reference's attn_pdrop is 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vilco_tpu.ops.attention import masked_attention as masked_attention_xla

NEG_INF = -1e9
LOG2E = 1.4426950408889634
# Row-max floor: masked scores sit at NEG_INF, so clamping the row max at
# -1e8 makes fully-masked rows underflow to e = exp2(s - m) = 0 (otherwise
# s - m == 0 there and every masked key would get weight 1). This removes
# BOTH the v-zeroing multiply and the output q-row masking: e == 0 at every
# masked key kills their contribution to o, dv and dk exactly.
_ROWMAX_FLOOR = -1e8


def _block_size(T: int) -> int:
    # larger query blocks amortize per-program overhead (the ViT's
    # T=1152 at 128-blocks ran 155k ~0.2us programs per forward, ~6x
    # its compute floor); 384 = 3 x 128 keeps Mosaic tiling legal and
    # the f32 score tile (384, T) within VMEM for T <= ~2k
    for s in (384, 256, 128):
        if T % s == 0 and T >= s:
            return s
    return T


def _use_kernel(q, k) -> bool:
    Tq, Tk = q.shape[1], k.shape[1]
    return (Tq >= 128 and Tk >= 128 and Tq % _block_size(Tq) == 0)


def _e_block(q, k, bias, *, scale):
    """Unnormalized softmax numerator e and per-row reciprocal sum r.

    MXU operands stay in the INPUT dtype (bf16 on the hot path) with f32
    accumulation — pre-dot f32 casts measured ~16-27% MXU (f32 MXU runs
    at ~1/4 bf16 throughput on v5e). Softmax stays f32.

    VPU-pass economy (the VQ ViT measured 103 ms/step at 23% MXU with the
    older where/exp/divide form — VPU-softmax-bound, RESULTS.md round 4):
    - scale * log2(e) folds into q BEFORE the dot (an (S, D) pass) so the
      score tile needs no multiply; exp2 is the hardware transcendental.
    - masking is ONE fused broadcast-add of a (1, Tk) bias row instead of
      a (S, Tk) select, and the _ROWMAX_FLOOR clamp makes e == 0 exact at
      masked keys so no v/dv/q-row mask multiplies are needed anywhere.
    - normalization is DEFERRED: callers scale the (S, D) output rows by
      r instead of dividing the (S, Tk) probability tile.
    """
    qs = q * jnp.asarray(scale * LOG2E, q.dtype)      # (S, D) — cheap
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias                                          # (S, Tk) f32
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), _ROWMAX_FLOOR)
    e = jnp.exp2(s - m)                               # masked keys -> 0
    # valid rows have l >= 1 (the max element maps to exp2(0) = 1);
    # fully-masked rows have l == 0 and the tiny epsilon yields o == 0.
    r = 1.0 / (jnp.sum(e, axis=-1) + 1e-30)           # (S,)
    return e, r


def _mask_bias(m):
    # (Tk,) int -> (1, Tk) f32 additive bias, computed once per program
    return jnp.where(m > 0, 0.0, NEG_INF)[None, :].astype(jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale):
    q = q_ref[0, 0]                                   # (S, D)
    k = k_ref[0, 0]                                   # (Tk, D)
    v = v_ref[0, 0]
    e, r = _e_block(q, k, _mask_bias(m_ref[0, 0]), scale=scale)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (S, D) f32
    o_ref[0, 0] = (o * r[:, None]).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, m_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    dt = q_ref.dtype
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    e, r = _e_block(q, k, _mask_bias(m_ref[0, 0]), scale=scale)

    # p = e * r[:, None]; fold the row scale into the SMALL (S, D)
    # operands instead of touching the (S, Tk) tile:
    #   dv = p^T dO          = e^T (dO * r)
    #   ds = p*(dp - c)      = r * t,  t = e*(dp - c),  c = r*rowsum(dp*e)
    #   dq = ds K * scale    = (t K) * (scale * r)
    #   dk = ds^T Q * scale  = t^T (Q * scale * r)
    # e == 0 at masked keys makes the dv/dk rows for them exactly 0.
    dop = (do * r[:, None].astype(do.dtype))
    dv = jax.lax.dot_general(
        e.astype(dt), dop, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (Tk, D) f32
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )                                                 # (S, Tk) f32
    c = jnp.sum(dp * e, axis=-1, keepdims=True) * r[:, None]
    t = (e * (dp - c)).astype(dt)
    sr = (scale * r)[:, None]
    dq = jax.lax.dot_general(
        t, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) * sr
    dk = jax.lax.dot_general(
        t, (q * sr.astype(q.dtype)), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += dk.astype(dk_ref.dtype)
    dv_ref[0, 0] += dv.astype(dv_ref.dtype)


def _fold(x):
    # (B, T, H, D) -> (H, B, T, D)
    return jnp.transpose(x, (2, 0, 1, 3))


def _unfold(x):
    return jnp.transpose(x, (1, 2, 0, 3))


def _specs(Tq, Tk, S, D):
    qspec = pl.BlockSpec((1, 1, S, D), lambda h, b, i: (h, b, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, Tk, D), lambda h, b, i: (h, b, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, Tk), lambda h, b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, mspec


def _run_fwd(q, k, v, kv_mask, interpret):
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    S = _block_size(Tq)
    scale = 1.0 / (D ** 0.5)
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    mf = kv_mask.astype(jnp.int32)[:, None, :]
    qspec, kspec, mspec = _specs(Tq, Tk, S, D)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(H, B, Tq // S),
        in_specs=[qspec, kspec, kspec, mspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((H, B, Tq, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        name="fused_attention_fwd",
    )(qf, kf, vf, mf)
    return _unfold(out)


def _run_bwd(q, k, v, kv_mask, g, interpret):
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    S = _block_size(Tq)
    scale = 1.0 / (D ** 0.5)
    qf, kf, vf, gf = _fold(q), _fold(k), _fold(v), _fold(g)
    mf = kv_mask.astype(jnp.int32)[:, None, :]
    qspec, kspec, mspec = _specs(Tq, Tk, S, D)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(H, B, Tq // S),
        in_specs=[qspec, kspec, kspec, mspec, qspec],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((H, B, Tq, D), q.dtype),
            jax.ShapeDtypeStruct((H, B, Tk, D), jnp.float32),
            jax.ShapeDtypeStruct((H, B, Tk, D), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        name="fused_attention_bwd",
    )(qf, kf, vf, mf, gf)
    return (_unfold(dq), _unfold(dk).astype(k.dtype),
            _unfold(dv).astype(v.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention(q, k, v, kv_mask, interpret: bool = False):
    """Fused masked attention; q (B,Tq,H,D), k/v (B,Tk,H,D), kv_mask (B,Tk).
    Falls back to the XLA form for short sequences (cross-attention onto
    text tokens etc.). Invalid-query rows are NOT zeroed (callers multiply
    by their own query mask, as in ops.attention.masked_attention)."""
    if not _use_kernel(q, k):
        return masked_attention_xla(q, k, v, kv_mask)
    return _run_fwd(q, k, v, kv_mask, interpret)


def _vjp_fwd(q, k, v, kv_mask, interpret):
    return fused_attention(q, k, v, kv_mask, interpret), (q, k, v, kv_mask)


def _vjp_bwd(interpret, res, g):
    q, k, v, kv_mask = res
    if not _use_kernel(q, k):
        _, vjp = jax.vjp(
            lambda q_, k_, v_: masked_attention_xla(q_, k_, v_, kv_mask),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
    else:
        dq, dk, dv = _run_bwd(q, k, v, kv_mask, g, interpret)
    return dq, dk, dv, None


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# channels-last variant: q/k/v stay (B, L, C)
#
# The folded layout above needs (B, L, H, D) -> (H, B, L, D) relayouts on
# every operand and output; at the VQ ViT shape (D=64: the minor-dim split
# 768 -> 12 x 64 is itself a relayout copy) those copies measured ~4 ms per
# block x 12 blocks (round-3 trace). This variant consumes the qkv matmul
# outputs DIRECTLY: blocks are 128 lanes wide (= two D=64 heads, or one
# D=128 head) sliced straight out of the (B, L, C) array, heads split
# in-register inside the kernel, and the output block is (S, 128) in the
# same channels-last layout the proj matmul wants. No relayouts anywhere.


def _fwd_kernel_blc(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, D):
    bias = _mask_bias(m_ref[0, 0])                    # (1, Tk)
    W = q_ref.shape[-1]
    outs = []
    for hh in range(W // D):
        q = q_ref[0][:, hh * D:(hh + 1) * D]          # (S, D)
        k = k_ref[0][:, hh * D:(hh + 1) * D]          # (Tk, D)
        v = v_ref[0][:, hh * D:(hh + 1) * D]
        e, r = _e_block(q, k, bias, scale=scale)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((o * r[:, None]).astype(o_ref.dtype))
    o_ref[0] = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _bwd_kernel_blc(q_ref, k_ref, v_ref, m_ref, do_ref,
                    dq_ref, dk_ref, dv_ref, *, scale, D):
    bias = _mask_bias(m_ref[0, 0])
    dt = q_ref.dtype
    W = q_ref.shape[-1]

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dqs, dks, dvs = [], [], []
    for hh in range(W // D):
        sl = slice(hh * D, (hh + 1) * D)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        do = do_ref[0][:, sl]
        e, r = _e_block(q, k, bias, scale=scale)

        # deferred normalization: see _bwd_kernel for the factoring
        dop = do * r[:, None].astype(do.dtype)
        dv = jax.lax.dot_general(
            e.astype(dt), dop, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        c = jnp.sum(dp * e, axis=-1, keepdims=True) * r[:, None]
        t = (e * (dp - c)).astype(dt)
        sr = (scale * r)[:, None]
        dq = jax.lax.dot_general(
            t, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sr
        dk = jax.lax.dot_general(
            t, (q * sr.astype(q.dtype)), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk)
        dvs.append(dv)

    cat = (lambda xs: xs[0] if len(xs) == 1
           else jnp.concatenate(xs, axis=1))
    dq_ref[0] = cat(dqs)
    dk_ref[0] += cat(dks).astype(dk_ref.dtype)
    dv_ref[0] += cat(dvs).astype(dv_ref.dtype)


def _specs_blc(Tq, Tk, S):
    qspec = pl.BlockSpec((1, S, 128), lambda hp, b, i: (b, i, hp),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, Tk, 128), lambda hp, b, i: (b, 0, hp),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, Tk), lambda hp, b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, mspec


def _run_fwd_blc(q, k, v, kv_mask, num_heads, interpret):
    B, Tq, C = q.shape
    Tk = k.shape[1]
    D = C // num_heads
    S = _block_size_blc(Tq, B)
    scale = 1.0 / (D ** 0.5)
    mf = kv_mask.astype(jnp.int32)[:, None, :]
    qspec, kspec, mspec = _specs_blc(Tq, Tk, S)
    hp = C // 128
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_blc, scale=scale, D=D),
        grid=(hp, B, Tq // S),
        in_specs=[qspec, kspec, kspec, mspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, Tq, C), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        name="fused_attention_blc_fwd",
    )(q, k, v, mf)
    return out


def _run_bwd_blc(q, k, v, kv_mask, num_heads, g, interpret):
    B, Tq, C = q.shape
    Tk = k.shape[1]
    D = C // num_heads
    S = _block_size_blc(Tq, B)
    scale = 1.0 / (D ** 0.5)
    mf = kv_mask.astype(jnp.int32)[:, None, :]
    qspec, kspec, mspec = _specs_blc(Tq, Tk, S)
    hp = C // 128
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_blc, scale=scale, D=D),
        grid=(hp, B, Tq // S),
        in_specs=[qspec, kspec, kspec, mspec, qspec],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tq, C), q.dtype),
            jax.ShapeDtypeStruct((B, Tk, C), jnp.float32),
            jax.ShapeDtypeStruct((B, Tk, C), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        name="fused_attention_blc_bwd",
    )(q, k, v, mf, g)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _block_size_blc(Tq: int, B: int) -> int:
    """Query-block size for the channels-last kernel.

    Callers with a big fused batch (the VQ ViT folds B*T=120 frames, so
    the (C/128, B, Tq/S) grid has parallelism to spare) prefer the
    LARGEST legal block: fewer program prologues and larger dots — HW
    microbench at the ViT shape (120, 1152, 768): S=384 10.41, S=576
    9.94, S=1152 9.86 ms/call. Small-batch callers (MQ stems, B=16) keep
    the 384-first policy — the round-3 measurement showed one-program-
    per-(b,h) serializes there. The f32 score tile (S, Tq) is capped to
    ~6 MB of VMEM."""
    if B >= 32:
        cap = (6 << 20) // (4 * Tq)
        for s in (1152, 1024, 768, 576, 512, 384, 256, 128):
            if s <= cap and Tq % s == 0 and Tq >= s:
                return s
    return _block_size(Tq)


def _use_kernel_blc(q, k, num_heads) -> bool:
    B, Tq, C = q.shape
    D = C // num_heads
    # heads must pack exactly into the 128-lane block width (D in
    # {1..128} dividing 128); wider heads would span block boundaries.
    if C % 128 or D > 128 or 128 % D:
        return False
    return (Tq >= 128 and k.shape[1] >= 128
            and Tq % _block_size_blc(Tq, B) == 0)


def _blc_xla(q, k, v, kv_mask, num_heads):
    B, Tq, C = q.shape
    D = C // num_heads
    r = lambda x: x.reshape(x.shape[0], x.shape[1], num_heads, D)
    out = masked_attention_xla(r(q), r(k), r(v), kv_mask)
    return out.reshape(B, Tq, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention_blc(q, k, v, kv_mask, num_heads: int,
                        interpret: bool = False):
    """Fused masked attention over channels-last inputs.

    q (B, Tq, C), k/v (B, Tk, C) with C = num_heads * head_dim — i.e. the
    raw qkv matmul outputs, no (B, T, H, D) fold. kv_mask (B, Tk) bool.
    Returns (B, Tq, C), directly consumable by the output projection.
    Semantics identical to fused_attention / masked_attention (invalid
    query rows not zeroed). Falls back to the XLA form when shapes don't
    fit the kernel (short sequences, unpackable head_dim).
    """
    if not _use_kernel_blc(q, k, num_heads):
        return _blc_xla(q, k, v, kv_mask, num_heads)
    return _run_fwd_blc(q, k, v, kv_mask, num_heads, interpret)


def _vjp_fwd_blc(q, k, v, kv_mask, num_heads, interpret):
    return (fused_attention_blc(q, k, v, kv_mask, num_heads, interpret),
            (q, k, v, kv_mask))


def _vjp_bwd_blc(num_heads, interpret, res, g):
    q, k, v, kv_mask = res
    if not _use_kernel_blc(q, k, num_heads):
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _blc_xla(q_, k_, v_, kv_mask, num_heads),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
    else:
        dq, dk, dv = _run_bwd_blc(q, k, v, kv_mask, num_heads, g, interpret)
    return dq, dk, dv, None


fused_attention_blc.defvjp(_vjp_fwd_blc, _vjp_bwd_blc)


def flash_attention_jax(q, k, v, kv_mask):
    """JAX's production TPU flash-attention kernel
    (jax.experimental.pallas.ops.tpu.flash_attention) with key-padding
    expressed as segment ids. Self-attention only (Tq == Tk).

    q/k/v: (B, T, H, D); kv_mask: (B, T) bool. Invalid query rows attend
    valid keys (harmless — callers re-mask outputs). Measured 65 vs 77
    clips/s against the XLA path at the MQ flagship shape — kept as an
    opt-in (attention_impl="flash").
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
