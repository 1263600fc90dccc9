"""Pallas TPU kernels: fused sliding-window (banded) attention, fwd + bwd.

The reference implements Longformer-style banded attention with
`as_strided` chunk tricks (LocalMaskedMHCA, MQ/libs/modeling/blocks.py:
871-1208 — chunked score assembly :1038-1101, banded A.V :1103-1138).
Here the whole band (scores -> mask -> softmax -> A.V) is fused into
Pallas kernels:

  forward: grid = (B * H, T / BLOCK_Q); each program holds one query
  block (BLOCK_Q, D) in VMEM plus the full (padded) K/V rows for its
  (batch, head) and computes the (BLOCK_Q, SPAN) banded tile on the MXU —
  no (T, T) scores ever materialize in HBM. Also emits the per-query
  logsumexp (flash-attention residual).

  backward: two kernels re-using the fwd residuals (q, k, v, mask, out,
  lse) — the standard flash trade, adapted to the band:
    - dq pass, grid (B*H, T/BQ): recompute the banded p from lse, then
      ds = p * (dp - delta), dq = ds @ k_halo.
    - dk/dv pass, grid (B*H, T/BQ): for KV block j the contributing
      queries live in the halo [jS - w, (j+1)S + w); recompute p^T from
      the q/lse halos, dv = p^T @ g_halo, dk = ds^T @ q_halo.
  This replaces the XLA blocked backward whose halo-gather transpose is
  a scatter-add — the single largest op of the NLQ flagship step
  (4 x 5.1 ms/trace at T=2560, round-4 profile).

Mosaic constraints shape the layout (all HW-verified):
  - lane-dim (last-axis) dynamic loads must start at provable multiples
    of 128, so every halo read uses SPAN = BQ + 128 from the aligned
    block start (never BQ + 2w); the band mask excludes the surplus
    columns, and rows are padded to T + 128 (left w, right 128 - w).
    Requires 2w <= 128 — windows beyond that fall back to XLA.
  - q/o/dq/dk/dv blocks are (BQ, D) with BQ % 16 == 0 (bf16 min sublane
    tile) and D equal to the full head dim; full-row blocks (== array
    dim) are always legal. Levels too short for a legal BQ fall back to
    the XLA form (only T=40 in the NLQ pyramid).

K/V rows per (b, h) are ~T * D * 2 bytes; for the NLQ flagship
(T=2560, D=96, bf16) that is ~0.5 MB, comfortably inside the ~16 MB
VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vilco_tpu.ops.attention import banded_attention as banded_attention_xla

NEG_INF = -1e9
ALIGN = 128


def _dkv_fits_vmem(T: int, w: int, D: int) -> bool:
    """The backward's dk/dv accumulators are full-(padded-T, D) f32
    blocks revisited across the query grid — measured VMEM-OOM at
    T=16384, D=96 (span*D*4*2 = 12.7 MB + working blocks > the 16 MB
    scoped limit; tools/bench_banded_longT.py round 5). Cap the
    accumulator footprint at 8 MB and fall back to the XLA blocked form
    beyond it until the dkv pass is re-blocked over kv."""
    span = T + 2 * ((w + ALIGN - 1) // ALIGN) * ALIGN
    return span * D * 4 * 2 <= 8 << 20


def _pick_block(T: int, w: int, target: int = 256) -> int:
    """Largest BQ <= target with BQ % 128 == 0 and T % BQ == 0; 0 if
    none exists or the window exceeds the aligned halo budget. The 128
    comes from Mosaic's lane-dim dynamic loads: every halo read starts
    at i * BQ, which must be a provable multiple of 128 (HW-verified —
    BQ=160 at T=640 fails to compile). Unlike the XLA blocked form, the
    kernel needs no BQ % w relation: the band test is purely
    offset-based."""
    if 2 * w > ALIGN:
        return 0
    for cand in range(min(target, T) // ALIGN * ALIGN, 0, -ALIGN):
        if T % cand == 0:
            return cand
    return 0


def _band(block_q: int, span: int, w: int):
    """(BQ, span) bool: query i of the block may see halo column j.
    Halo column j sits at true offset (j - w) relative to the block, so
    the condition is |（j - w) - i| <= w; columns beyond BQ + 2w (the
    alignment surplus) can never satisfy it."""
    qi = jax.lax.broadcasted_iota(jnp.int32, (block_q, span), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (block_q, span), 1)
    return jnp.abs((kj - w) - qi) <= w


def _fwd_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, lse_ref,
                *, w: int, block_q: int):
    i = pl.program_id(1)
    span = block_q + ALIGN
    q = q_ref[0]                                   # (BQ, D)
    start = i * block_q                            # aligned (BQ % 16*...)
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

    allow = _band(block_q, span, w) & (m[None, :] > 0)
    s = jnp.where(allow, s, NEG_INF)

    smax = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - smax)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    lse_ref[0, 0, pl.ds(start, block_q)] = (
        smax[:, 0] + jnp.log(denom[:, 0]))
    p = p / denom

    vz = v * (m[:, None] > 0).astype(v.dtype)
    o = jax.lax.dot_general(
        p.astype(v.dtype), vz, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _pad_rows(x, w, value=0.0):
    """Pad a (B*H, T, ...) array's time axis to T + ALIGN: w on the left
    (the halo) and ALIGN - w on the right (halo + lane-alignment
    surplus)."""
    pad = [(0, 0), (w, ALIGN - w)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad, constant_values=value)


def _forward(q, k, v, kv_mask, window: int, block_q: int, interpret: bool):
    B, T, H, D = q.shape
    w = window
    BQ = block_q

    # (B, T, H, D) -> (B*H, T, D)
    fold = lambda x: jnp.swapaxes(x, 1, 2).reshape(B * H, T, D)
    qf, kf, vf = fold(q), fold(k), fold(v)
    kp = _pad_rows(kf, w)
    vp = _pad_rows(vf, w)
    mp = _pad_rows(kv_mask.astype(jnp.int32)[:, :], w)
    mp = jnp.repeat(mp, H, axis=0)[:, None, :]     # (B*H, 1, T+ALIGN)

    grid = (B * H, T // BQ)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, w=w, block_q=BQ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T + ALIGN, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T + ALIGN, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T + ALIGN), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BQ, D), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            # full-T row; each i writes its disjoint BQ slice (block ==
            # array dim keeps any T legal for the lane axis)
            pl.BlockSpec((1, 1, T), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, T), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kp, vp, mp)

    outr = out.reshape(B, H, T, D).swapaxes(1, 2)   # (B, T, H, D)
    outr = outr * kv_mask[:, :, None, None].astype(outr.dtype)
    return outr, out, lse


def _dq_kernel(q_ref, k_ref, v_ref, m_ref, g_ref, lse_ref, delta_ref,
               dq_ref, *, w: int, block_q: int):
    i = pl.program_id(1)
    span = block_q + ALIGN
    start = i * block_q
    q = q_ref[0]                                   # (BQ, D)
    k = k_ref[0, pl.ds(start, span), :]
    v = v_ref[0, pl.ds(start, span), :]
    m = m_ref[0, 0, pl.ds(start, span)]
    g = g_ref[0]                                   # (BQ, D)
    lse = lse_ref[0, 0, pl.ds(start, block_q)]     # (BQ,) unpadded coords
    delta = delta_ref[0, 0, pl.ds(start, block_q)]

    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    allow = _band(block_q, span, w) & (m[None, :] > 0)
    s = jnp.where(allow, s, NEG_INF)
    p = jnp.exp(s - lse[:, None])                   # (BQ, span)

    vz = v * (m[:, None] > 0).astype(v.dtype)
    dp = jax.lax.dot_general(
        g, vz, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (BQ, span)
    ds = p * (dp - delta[:, None])                  # f32
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, mk_ref, qp_ref, gp_ref, lsep_ref, deltap_ref,
                dk_ref, dv_ref, *, w: int, block_q: int):
    j = pl.program_id(1)
    span = block_q + ALIGN
    start = j * block_q                            # halo start in padded q
    k = k_ref[0]                                   # (BQ, D) this kv block
    v = v_ref[0]
    mk = mk_ref[0, 0, pl.ds(start, block_q)]       # kv validity, unpadded
    qh = qp_ref[0, pl.ds(start, span), :]          # (span, D) query halo
    gh = gp_ref[0, pl.ds(start, span), :]
    lseh = lsep_ref[0, 0, pl.ds(start, span)]      # (span,)
    deltah = deltap_ref[0, 0, pl.ds(start, span)]

    scale = 1.0 / (k.shape[-1] ** 0.5)
    # s2[jj, ii] = k_jj . q_ii (transposed banded tile)
    s2 = jax.lax.dot_general(
        k, qh, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                      # (BQ, span)
    # true coords: key = jS + kjj, query = jS + (qii - w); |q - k| <= w
    # is the same (kjj, qii) relation as _band with roles swapped
    kjj = jax.lax.broadcasted_iota(jnp.int32, (block_q, span), 0)
    qii = jax.lax.broadcasted_iota(jnp.int32, (block_q, span), 1)
    band = jnp.abs((qii - w) - kjj) <= w
    # the lse halo is padded with NEG_INF, and fully-banned (invalid)
    # query rows also carry lse ~ NEG_INF — both must not contribute
    # (padded q rows are zeros, so exp(s2 - 0) would be spuriously 1)
    mqh = lseh > NEG_INF / 2
    allow = band & (mk[:, None] > 0) & mqh[None, :]
    p_t = jnp.where(allow, jnp.exp(s2 - lseh[None, :]), 0.0)  # (BQ, span)

    dv = jax.lax.dot_general(
        p_t.astype(gh.dtype), gh,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_ref[0] = dv.astype(dv_ref.dtype)

    dp_t = jax.lax.dot_general(
        v, gh, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (BQ, span)
    ds_t = p_t * (dp_t - deltah[None, :])
    dk = jax.lax.dot_general(
        ds_t.astype(qh.dtype), qh,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dk_ref[0] = dk.astype(dk_ref.dtype)


def _backward(q, k, v, kv_mask, out_f, lse, g, window: int, block_q: int,
              interpret: bool):
    B, T, H, D = q.shape
    w = window
    BQ = block_q

    fold = lambda x: jnp.swapaxes(x, 1, 2).reshape(B * H, T, D)
    qf, kf, vf = fold(q), fold(k), fold(v)
    # zero cotangents of invalid queries (the forward zeroes those rows)
    gq = g * kv_mask[:, :, None, None].astype(g.dtype)
    gf = fold(gq)
    delta = jnp.sum(gf.astype(jnp.float32) * out_f.astype(jnp.float32),
                    axis=-1)[:, None, :]           # (B*H, 1, T)

    kp = _pad_rows(kf, w)
    vp = _pad_rows(vf, w)
    qp = _pad_rows(qf, w)
    gp = _pad_rows(gf, w)
    mp = _pad_rows(kv_mask.astype(jnp.int32), w)
    mp = jnp.repeat(mp, H, axis=0)[:, None, :]     # (B*H, 1, T+ALIGN)
    mk = jnp.repeat(kv_mask.astype(jnp.int32), H, axis=0)[:, None, :]
    # lse/delta halos: padding value NEG_INF marks invalid halo rows
    lsep = _pad_rows(lse[:, 0, :], w, value=NEG_INF)[:, None, :]
    deltap = _pad_rows(delta[:, 0, :], w)[:, None, :]

    grid = (B * H, T // BQ)
    full_kv = pl.BlockSpec((1, T + ALIGN, D), lambda bh, i: (bh, 0, 0),
                           memory_space=pltpu.VMEM)
    full_row = pl.BlockSpec((1, 1, T + ALIGN), lambda bh, i: (bh, 0, 0),
                            memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((1, BQ, D), lambda bh, i: (bh, i, 0),
                       memory_space=pltpu.VMEM)
    unpadded_row = pl.BlockSpec((1, 1, T), lambda bh, i: (bh, 0, 0),
                                memory_space=pltpu.VMEM)

    dqf = pl.pallas_call(
        functools.partial(_dq_kernel, w=w, block_q=BQ),
        grid=grid,
        in_specs=[blk, full_kv, full_kv, full_row, blk,
                  unpadded_row, unpadded_row],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        interpret=interpret,
    )(qf, kp, vp, mp, gf, lse, delta)

    dkf, dvf = pl.pallas_call(
        functools.partial(_dkv_kernel, w=w, block_q=BQ),
        grid=grid,
        in_specs=[blk, blk, unpadded_row, full_kv, full_kv,
                  full_row, full_row],
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
                   jax.ShapeDtypeStruct((B * H, T, D), q.dtype)],
        interpret=interpret,
    )(kf, vf, mk, qp, gp, lsep, deltap)

    unfold = lambda x: x.reshape(B, H, T, D).swapaxes(1, 2)
    return unfold(dqf), unfold(dkf), unfold(dvf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def banded_attention_fused(q, k, v, kv_mask, window: int,
                           block_q: int = 0, interpret: bool = False):
    """Fused banded attention; identical semantics to
    ops.attention.banded_attention (LocalMaskedMHCA)."""
    B, T, H, D = q.shape
    if window <= 0 or 2 * window + 1 >= T:
        return banded_attention_xla(q, k, v, kv_mask, window)
    bq = block_q or _pick_block(T, window)
    if bq == 0 or not _dkv_fits_vmem(T, window, D):
        return banded_attention_xla(q, k, v, kv_mask, window)
    out, _, _ = _forward(q, k, v, kv_mask, window, bq, interpret)
    return out


def _fwd(q, k, v, kv_mask, window, block_q, interpret):
    B, T, H, D = q.shape
    bq = block_q or _pick_block(T, window)
    if (window <= 0 or 2 * window + 1 >= T or bq == 0
            or not _dkv_fits_vmem(T, window, D)):
        out, vjp = jax.vjp(
            lambda q_, k_, v_: banded_attention_xla(
                q_, k_, v_, kv_mask, window), q, k, v)
        return out, (vjp, None)
    out, out_f, lse = _forward(q, k, v, kv_mask, window, bq, interpret)
    return out, (None, (q, k, v, kv_mask, out_f, lse, bq))


def _bwd(window, block_q, interpret, res, g):
    vjp, fused_res = res
    if fused_res is None:
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    q, k, v, kv_mask, out_f, lse, bq = fused_res
    dq, dk, dv = _backward(q, k, v, kv_mask, out_f, lse, g, window, bq,
                           interpret)
    return dq, dk, dv, None


banded_attention_fused.defvjp(_fwd, _bwd)
