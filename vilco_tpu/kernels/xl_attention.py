"""Pallas TPU kernel: fused Transformer-XL relative attention (fwd + bwd).

The MQ flagship's XL stage (models/layers.py::XLRelAttention, the stage the
reference enables by default — MQ/libs/modeling/backbones.py:267-274,
XLNetRelativeAttention modeling_xlnet_x.py:210+) is the single largest HBM
consumer of the whole train step (RESULTS.md roofline): the XLA form
materializes the (B, H, T, T) content scores, the (B, H, T, 2T) position
scores, two relative-shift copies, the softmax probabilities and the
dropout output — ~10 GB/step at the flagship shape, on a step whose total
bandwidth floor is 26 ms.

This kernel keeps the whole score pipeline in VMEM. Per (head, batch,
query-block) program:

    ac   = (q + r_w_bias) k^T                       content scores
    raw  = (q + r_r_bias) r^T                       position scores (S, 2T)
    bd   = rel_shift(raw)                           pltpu.roll, stride=1
    P    = softmax((ac + bd) * scale + key mask)
    out  = dropout(P) @ (v * mask)

The relative shift — shifted[i, j] = raw[i, T + j - g_i] — is ONE
`pltpu.roll(raw, shift=T + i0, axis=1, stride=1, stride_axis=0)` (Mosaic's
strided circular shift rolls row i by shift + i), replacing the XLA form's
two reshape-copies of the (B, H, 2T, T) tensor.

The backward kernel recomputes P in VMEM and emits dq/dk/dv plus the
relative-position gradients: dr and the r_w/r_r bias grads accumulate
across batch and query-block grid steps into per-head buffers (grid is
(H, B, nq) with those outputs indexed by h only, so revisits are
consecutive and Mosaic keeps the accumulator in VMEM).

Dropout on the attention probabilities (the reference applies it there)
uses the in-kernel PRNG seeded per (h, b, q-block); forward and backward
regenerate identical masks from the same seed. Verified on hardware:
same-seed runs are bit-identical, different seeds differ, rate=0 is
seed-independent, and gradients through the dropout path are finite
(the in-kernel PRNG does not lower on CPU, so this path is TPU-only;
CPU tests cover rate=0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _block_size(T: int) -> int:
    for s in (256, 128, 64, 32):
        if T % s == 0 and T >= s:
            return s
    return T


def _keep_mask(shape, rate):
    """In-kernel dropout keep mask; caller must have seeded the PRNG."""
    bits = pltpu.prng_random_bits(shape)  # int32
    # uniform in [0, 2^32) as uint32; keep iff >= rate * 2^32
    thresh = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return bits.astype(jnp.uint32) >= thresh


def _scores(q_ref, k_ref, r_ref, rwb_ref, rrb_ref, m_ref, *, T, S, scale):
    """Shared fwd/bwd score computation: returns (P, vmask_row) in f32.

    MXU dots take the INPUT dtype operands (bf16 on the flagship) with f32
    accumulation — measured 16% MXU with pre-dot f32 casts (f32 MXU runs at
    ~1/4 bf16 throughput on v5e); softmax stays f32, which is strictly MORE
    precise than the XLA path (softmax in x.dtype, layers.py rel_core).
    """
    q = q_ref[0, 0]                                 # (S, D) input dtype
    k = k_ref[0, 0]                                 # (T, D)
    r = r_ref[0]                                    # (2T, D)
    rwb = rwb_ref[0, 0]                             # (D,)
    rrb = rrb_ref[0, 0]
    m = m_ref[0, 0]                                  # (T,) int32

    i0 = pl.program_id(2) * S
    ac = jax.lax.dot_general(
        q + rwb[None, :], k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (S, T)
    raw = jax.lax.dot_general(
        q + rrb[None, :], r, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (S, 2T)
    bd = pltpu.roll(raw, T + i0, axis=1, stride=1, stride_axis=0)[:, :T]
    s = (ac + bd) * scale
    s = jnp.where(m[None, :] > 0, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    return p, m


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, r_ref, rwb_ref, rrb_ref,
                m_ref, o_ref, *, T, S, scale, rate):
    p, m = _scores(q_ref, k_ref, r_ref, rwb_ref, rrb_ref, m_ref,
                   T=T, S=S, scale=scale)
    if rate > 0.0:
        # Mosaic supports at most 2 seed values: fold the grid coords
        pid = (pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)) \
            * pl.num_programs(2) + pl.program_id(2)
        pltpu.prng_seed(seed_ref[0], pid)
        p = jnp.where(_keep_mask(p.shape, rate), p / (1.0 - rate), 0.0)
    v = v_ref[0, 0]
    vz = v * (m[:, None] > 0).astype(v.dtype)
    o = jax.lax.dot_general(
        p.astype(v.dtype), vz, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, r_ref, rwb_ref, rrb_ref,
                m_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dr_ref, drwb_ref, drrb_ref,
                *, T, S, scale, rate):
    p, m = _scores(q_ref, k_ref, r_ref, rwb_ref, rrb_ref, m_ref,
                   T=T, S=S, scale=scale)
    if rate > 0.0:
        # Mosaic supports at most 2 seed values: fold the grid coords
        pid = (pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)) \
            * pl.num_programs(2) + pl.program_id(2)
        pltpu.prng_seed(seed_ref[0], pid)
        keep = _keep_mask(p.shape, rate)
        pd = jnp.where(keep, p / (1.0 - rate), 0.0)
    else:
        pd = p

    # MXU operands stay in the input dtype (bf16 on the flagship) with f32
    # accumulation — mirrors the autodiff of the bf16 XLA path and runs the
    # MXU at full bf16 throughput; no-op for the f32 parity tests.
    dt = q_ref.dtype
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    r = r_ref[0]
    rwb = rwb_ref[0, 0]
    rrb = rrb_ref[0, 0]
    do = do_ref[0, 0]
    vz = v * (m[:, None] > 0).astype(v.dtype)
    i0 = pl.program_id(2) * S

    dv = jax.lax.dot_general(
        pd.astype(dt), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (m[:, None] > 0)                             # (T, D) f32
    dpd = jax.lax.dot_general(
        do, vz, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )                                                # (S, T) f32
    if rate > 0.0:
        dp = jnp.where(keep, dpd / (1.0 - rate), 0.0)
    else:
        dp = dpd
    dpre = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    d_ac_f32 = dpre * scale                          # (S, T) f32
    d_ac = d_ac_f32.astype(dt)

    # inverse relative shift: scatter d_bd back to raw coordinates,
    # d_raw[i, m] = dbd_pad[i, (m + T + g) mod 2T] with g = i0 + i.
    # Mosaic's STRIDED dynamic_rotate (stride = 2T - 1 === -1 mod 2T)
    # MISCOMPILES on hardware — round-3 finding: dq rel err 68% on TPU
    # while interpret mode is exact, and the minimal strided repro crashes
    # the compiler. The per-row shift -(T + g) is instead decomposed into
    # STATIC uniform rotates (verified exact on hardware): one roll by T
    # (-T === +T mod 2T), then for each bit b of g a conditional roll by
    # -(2^b), selected per row. log2(T)+1 VPU rotates of the (S, 2T) f32
    # tile — noise next to the kernel's MXU dots.
    dbd_pad = jnp.concatenate(
        [d_ac_f32, jnp.zeros((S, T), jnp.float32)], axis=1
    )                                                # (S, 2T)
    d_raw_f32 = pltpu.roll(dbd_pad, T, axis=1)
    grow = i0 + jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    bit = 1
    while bit < T:
        rolled = pltpu.roll(d_raw_f32, 2 * T - bit, axis=1)
        d_raw_f32 = jnp.where((grow & bit) != 0, rolled, d_raw_f32)
        bit <<= 1
    d_raw = d_raw_f32.astype(dt)

    t1 = jax.lax.dot_general(                        # ac path: d_ac @ k
        d_ac, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    t2 = jax.lax.dot_general(                        # bd path: d_raw @ r
        d_raw, r, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dq_ref[0, 0] = (t1 + t2).astype(dq_ref.dtype)

    dk = jax.lax.dot_general(                        # d_ac^T (q + rwb)
        d_ac, q + rwb[None, :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dr = jax.lax.dot_general(                        # d_raw^T (q + rrb)
        d_raw, q + rrb[None, :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    first_q = pl.program_id(2) == 0
    first_bq = jnp.logical_and(pl.program_id(1) == 0, first_q)

    @pl.when(first_q)
    def _init_bk():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    @pl.when(first_bq)
    def _init_h():
        dr_ref[0] = jnp.zeros_like(dr_ref[0])
        drwb_ref[0, 0] = jnp.zeros_like(drwb_ref[0, 0])
        drrb_ref[0, 0] = jnp.zeros_like(drrb_ref[0, 0])

    dk_ref[0, 0] += dk.astype(dk_ref.dtype)
    dv_ref[0, 0] += dv.astype(dv_ref.dtype)
    dr_ref[0] += dr.astype(dr_ref.dtype)
    drwb_ref[0, 0] += jnp.sum(t1, axis=0).astype(drwb_ref.dtype)
    drrb_ref[0, 0] += jnp.sum(t2, axis=0).astype(drrb_ref.dtype)


def _specs(B, H, T, S, D):
    qspec = pl.BlockSpec((1, 1, S, D), lambda h, b, i: (h, b, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, T, D), lambda h, b, i: (h, b, 0, 0),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, 2 * T, D), lambda h, b, i: (h, 0, 0),
                         memory_space=pltpu.VMEM)
    # biases travel as (H, 1, D): a (1, D) block over (H, D) violates the
    # (8, 128) sublane/lane divisibility rule
    bspec = pl.BlockSpec((1, 1, D), lambda h, b, i: (h, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, T), lambda h, b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, rspec, bspec, mspec


def _fold(x):
    # (B, T, H, D) -> (H, B, T, D)
    return jnp.transpose(x, (2, 0, 1, 3))


def _unfold(x):
    return jnp.transpose(x, (1, 2, 0, 3))


def _run_fwd(q, k, v, r, rwb, rrb, mask, seed, rate, interpret):
    B, T, H, D = q.shape
    S = _block_size(T)
    scale = 1.0 / (D ** 0.5)
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    rf = jnp.transpose(r, (1, 0, 2))                 # (H, 2T, D)
    mf = mask.astype(jnp.int32)[:, None, :]          # (B, 1, T)
    qspec, kspec, rspec, bspec, mspec = _specs(B, H, T, S, D)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, S=S, scale=scale, rate=rate),
        grid=(H, B, T // S),
        in_specs=[sspec, qspec, kspec, kspec, rspec, bspec, bspec, mspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((H, B, T, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        name="xl_rel_attention_fwd",
    )(seed, qf, kf, vf, rf, rwb[:, None, :], rrb[:, None, :], mf)
    return _unfold(out)


def _run_bwd(q, k, v, r, rwb, rrb, mask, seed, g, rate, interpret):
    B, T, H, D = q.shape
    S = _block_size(T)
    scale = 1.0 / (D ** 0.5)
    qf, kf, vf, gf = _fold(q), _fold(k), _fold(v), _fold(g)
    rf = jnp.transpose(r, (1, 0, 2))
    mf = mask.astype(jnp.int32)[:, None, :]
    qspec, kspec, rspec, bspec, mspec = _specs(B, H, T, S, D)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    f32 = jnp.float32
    dq, dk, dv, dr, drwb, drrb = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, S=S, scale=scale, rate=rate),
        grid=(H, B, T // S),
        in_specs=[sspec, qspec, kspec, kspec, rspec, bspec, bspec, mspec,
                  qspec],
        out_specs=(qspec, kspec, kspec, rspec, bspec, bspec),
        out_shape=(
            jax.ShapeDtypeStruct((H, B, T, D), q.dtype),
            jax.ShapeDtypeStruct((H, B, T, D), f32),
            jax.ShapeDtypeStruct((H, B, T, D), f32),
            jax.ShapeDtypeStruct((H, 2 * T, D), f32),
            jax.ShapeDtypeStruct((H, 1, D), f32),
            jax.ShapeDtypeStruct((H, 1, D), f32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        name="xl_rel_attention_bwd",
    )(seed, qf, kf, vf, rf, rwb[:, None, :], rrb[:, None, :], mf, gf)
    return (_unfold(dq), _unfold(dk).astype(k.dtype),
            _unfold(dv).astype(v.dtype),
            jnp.transpose(dr, (1, 0, 2)).astype(r.dtype),
            drwb[:, 0].astype(rwb.dtype), drrb[:, 0].astype(rrb.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def xl_rel_attention(q, k, v, r, r_w_bias, r_r_bias, mask, seed,
                     rate: float = 0.0, interpret: bool = False):
    """Fused XL relative attention.

    q/k/v: (B, T, H, D); r: (2T, H, D) projected relative-position
    embeddings (positions T..-T+1, matching XLRelAttention's pos_seq);
    r_w_bias/r_r_bias: (H, D); mask: (B, T) bool; seed: (1,) int32 for the
    attention-probability dropout (ignored when rate == 0).

    Returns (B, T, H, D). Invalid query rows are not zeroed (callers apply
    their own query mask, as in the XLA path).
    """
    return _run_fwd(q, k, v, r, r_w_bias, r_r_bias, mask, seed, rate,
                    interpret)


def _vjp_fwd(q, k, v, r, rwb, rrb, mask, seed, rate, interpret):
    out = _run_fwd(q, k, v, r, rwb, rrb, mask, seed, rate, interpret)
    return out, (q, k, v, r, rwb, rrb, mask, seed)


def _vjp_bwd(rate, interpret, res, g):
    q, k, v, r, rwb, rrb, mask, seed = res
    dq, dk, dv, dr, drwb, drrb = _run_bwd(
        q, k, v, r, rwb, rrb, mask, seed, g, rate, interpret
    )
    return dq, dk, dv, dr, drwb, drrb, None, None


xl_rel_attention.defvjp(_vjp_fwd, _vjp_bwd)
