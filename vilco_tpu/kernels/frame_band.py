"""Pallas TPU kernel: fused frame-banded spatio-temporal attention.

The VQ st-encoder attends over (T frames x FR tokens/frame) sequences with
a FRAME-granular band: a token in frame f sees every token of frames
[f - w, f + w] (the reference builds this as a (T*FR, T*FR) additive mask,
get_mask VQ/model/corr_clip_spatial_transformer2_anchor_2heads_hnm.py:
457-471, window_transformer=5 -> w=2). The band is NOT a token band
(|i - j| <= c) — frame boundaries make it block-banded — so neither
ops.attention.banded_attention nor kernels/banded_attention.py can express
it; the XLA einsum path materializes the full (L, L) scores (~16 ms/step
of the VQ flagship, RESULTS.md round-4 profile).

Layout follows kernels/attention.py's channels-last (BLC) packing — the
st head dim is 32, so four heads pack into each 128-lane block and the
q/k/v matmul outputs are consumed directly with no (B, L, H, D) relayout:

  forward: grid (C/128, B, L/BQ). Each program holds one (BQ, 128) query
  block plus the padded K/V rows for its lane block; the kv window for
  query block i is the aligned slice [i*BQ, i*BQ + BQ + 2*w*FR) of rows
  padded by HALO = w*FR on both sides — every dynamic load starts at
  i*BQ, a provable multiple of 128 (the Mosaic constraint HW-verified in
  kernels/banded_attention.py). Emits the base-2 logsumexp residual.

  backward: flash-style dq pass (recompute p from lse) and dkv pass
  (transposed band over the query halo), mirroring banded_attention.py's
  two-kernel structure.

The in-band frame test is STATIC: with FR | BQ, the query/kv frame offset
inside a block is independent of the block index, so the (BQ, SPAN) band
bias is built once per program from iota; only the sequence-boundary
column bias depends on the block index (out-of-range frames from the row
padding are banned there). Softmax uses the exp2 + row-max-floor economy
of kernels/attention.py (masked columns hit e == 0 exactly; fully-banned
rows cannot occur — every query sees its own frame).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LOG2E = 1.4426950408889634
_ROWMAX_FLOOR = -1e8
ALIGN = 128


def _block_q() -> int:
    # monkeypatch point for interpret-mode tests (real HW needs 128)
    return 128


def supports(L: int, C: int, num_heads: int, fr: int, w: int,
             block_q: int = 0) -> bool:
    """Kernel eligibility. Requirements: lane-packable heads (as in
    fused_attention_blc), FR | BQ (makes the band static per program),
    HALO = w*FR a multiple of 128 (keeps every dynamic load aligned),
    and at least one full query block."""
    bq = block_q or _block_q()
    D = C // num_heads
    if C % 128 or D > 128 or 128 % D:
        return False
    if fr <= 0 or w <= 0 or bq % fr:
        return False
    halo = w * fr
    if halo % ALIGN and not block_q:   # explicit block_q = test override
        return False
    return L % bq == 0 and L // bq >= 1 and 2 * w + 1 < (L // fr)


def _bias_tile(i, *, bq: int, span: int, fr: int, w: int, n_frames: int):
    """(BQ, SPAN) f32 additive bias: 0 in-band, NEG_INF outside.

    Query row jj has frame jj//FR + i*BQ/FR; halo column nn holds the
    unpadded token i*BQ - HALO + nn, i.e. frame (i*BQ + nn)//FR - w. The
    frame DIFFERENCE is independent of i; the 0 <= frame < T boundary
    check is a column-only test on i."""
    qf = jax.lax.broadcasted_iota(jnp.int32, (bq, span), 0) // fr
    kf = jax.lax.broadcasted_iota(jnp.int32, (bq, span), 1) // fr - w
    band = jnp.abs(qf - kf) <= w
    base = i * (bq // fr)
    kv_abs = kf[:1] + base                       # (1, span) frame index
    inrange = (kv_abs >= 0) & (kv_abs < n_frames)
    return jnp.where(band & inrange, 0.0, NEG_INF).astype(jnp.float32)


def _heads(W: int, D: int):
    return [slice(h * D, (h + 1) * D) for h in range(W // D)]


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                *, scale, D, fr, w, n_frames):
    i = pl.program_id(2)
    bq = q_ref.shape[1]
    halo = w * fr
    span = bq + 2 * halo
    start = i * bq                                # padded coords; aligned
    bias = _bias_tile(i, bq=bq, span=span, fr=fr, w=w, n_frames=n_frames)
    kh = k_ref[0, pl.ds(start, span), :]          # (span, 128)
    vh = v_ref[0, pl.ds(start, span), :]
    s2c = jnp.asarray(scale * LOG2E, q_ref.dtype)
    outs, lses = [], []
    for hh, sl in enumerate(_heads(q_ref.shape[-1], D)):
        q = q_ref[0][:, sl] * s2c                 # (BQ, D)
        s = jax.lax.dot_general(
            q, kh[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias                                  # (BQ, span) f32
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), _ROWMAX_FLOOR)
        e = jnp.exp2(s - m)
        l = jnp.sum(e, axis=-1)
        o = jax.lax.dot_general(
            e.astype(vh.dtype), vh[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((o / l[:, None]).astype(o_ref.dtype))
        lses.append(m[:, 0] + jnp.log2(l))
    o_ref[0] = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    lse_ref[0, 0] = jnp.stack(lses, axis=1)       # (BQ, H_blk)


def _dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref,
               *, scale, D, fr, w, n_frames):
    i = pl.program_id(2)
    bq = q_ref.shape[1]
    halo = w * fr
    span = bq + 2 * halo
    start = i * bq
    bias = _bias_tile(i, bq=bq, span=span, fr=fr, w=w, n_frames=n_frames)
    kh = k_ref[0, pl.ds(start, span), :]
    vh = v_ref[0, pl.ds(start, span), :]
    s2c = jnp.asarray(scale * LOG2E, q_ref.dtype)
    dqs = []
    for hh, sl in enumerate(_heads(q_ref.shape[-1], D)):
        q = q_ref[0][:, sl]
        g = g_ref[0][:, sl]
        lse = lse_ref[0, 0, :, hh]                 # (BQ,)
        delta = delta_ref[0, 0, :, hh]
        s = jax.lax.dot_general(
            q * s2c, kh[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        p = jnp.exp2(s - lse[:, None])             # normalized; banned -> 0
        dp = jax.lax.dot_general(
            g, vh[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta[:, None])).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, kh[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dqs.append(dq.astype(dq_ref.dtype))
    dq_ref[0] = dqs[0] if len(dqs) == 1 else jnp.concatenate(dqs, axis=1)


def _dkv_kernel(k_ref, v_ref, qp_ref, gp_ref, lsep_ref, deltap_ref,
                dk_ref, dv_ref, *, scale, D, fr, w, n_frames):
    j = pl.program_id(2)
    bq = k_ref.shape[1]
    halo = w * fr
    span = bq + 2 * halo
    start = j * bq
    # transposed band: kv row jj (frame (j*BQ + jj)//FR), q halo column nn
    # (unpadded token j*BQ - HALO + nn -> frame (j*BQ + nn)//FR - w); the
    # same |frame diff| <= w test with roles swapped, so the SAME bias
    # tile applies transposed: bias_t[jj, nn] = bias[nn', jj'] — rebuild
    # it directly with swapped iota roles.
    kf = jax.lax.broadcasted_iota(jnp.int32, (bq, span), 0) // fr
    qf = jax.lax.broadcasted_iota(jnp.int32, (bq, span), 1) // fr - w
    band = jnp.abs(qf - kf) <= w
    base = j * (bq // fr)
    q_abs = qf[:1] + base
    inrange = (q_abs >= 0) & (q_abs < n_frames)
    bias = jnp.where(band & inrange, 0.0, NEG_INF).astype(jnp.float32)

    qh = qp_ref[0, pl.ds(start, span), :]          # (span, 128)
    gh = gp_ref[0, pl.ds(start, span), :]
    s2c = jnp.asarray(scale * LOG2E, k_ref.dtype)
    dks, dvs = [], []
    for hh, sl in enumerate(_heads(k_ref.shape[-1], D)):
        k = k_ref[0][:, sl]                        # (BQ, D) kv block
        v = v_ref[0][:, sl]
        lseh = lsep_ref[0, 0, pl.ds(start, span), hh]
        deltah = deltap_ref[0, 0, pl.ds(start, span), hh]
        s2 = jax.lax.dot_general(
            k * s2c, qh[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias                                   # (BQ, span)
        p_t = jnp.exp2(s2 - lseh[None, :])         # banned/padded -> 0
        dv = jax.lax.dot_general(
            p_t.astype(gh.dtype), gh[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp_t = jax.lax.dot_general(
            v, gh[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds_t = (p_t * (dp_t - deltah[None, :])).astype(qh.dtype)
        dk = jax.lax.dot_general(
            ds_t, qh[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
    cat = lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=1)
    dk_ref[0] = cat(dks)
    dv_ref[0] = cat(dvs)


def _pad_rows(x, halo, value=0.0):
    pad = [(0, 0), (halo, halo)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad, constant_values=value)


def _specs(L, bq, halo, H_blk):
    Lp = L + 2 * halo
    blk = pl.BlockSpec((1, bq, 128), lambda hp, b, i: (b, i, hp),
                       memory_space=pltpu.VMEM)
    rows = pl.BlockSpec((1, Lp, 128), lambda hp, b, i: (b, 0, hp),
                        memory_space=pltpu.VMEM)
    # per-head residuals live as (HP, B, L, H_blk): the trailing H_blk
    # axis equals the array dim (legal for any H_blk under Mosaic's
    # last-two-dims rule) and each program owns a disjoint block
    res = pl.BlockSpec((1, 1, bq, H_blk), lambda hp, b, i: (hp, b, i, 0),
                       memory_space=pltpu.VMEM)
    res_pad = pl.BlockSpec((1, 1, L + 2 * halo, H_blk),
                           lambda hp, b, i: (hp, b, 0, 0),
                           memory_space=pltpu.VMEM)
    return blk, rows, res, res_pad


def _forward(q, k, v, num_heads, fr, w, bq, interpret):
    B, L, C = q.shape
    D = C // num_heads
    halo = w * fr
    n_frames = L // fr
    scale = 1.0 / (D ** 0.5)
    H_blk = 128 // D
    kp = _pad_rows(k, halo)
    vp = _pad_rows(v, halo)
    blk, rows, res, _ = _specs(L, bq, halo, H_blk)
    grid = (C // 128, B, L // bq)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, D=D, fr=fr, w=w,
                          n_frames=n_frames),
        grid=grid,
        in_specs=[blk, rows, rows],
        out_specs=[blk, res],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, C), q.dtype),
            jax.ShapeDtypeStruct((C // 128, B, L, H_blk), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        name="frame_band_fwd",
    )(q, kp, vp)
    return out, lse


def _backward(q, k, v, num_heads, fr, w, bq, out, lse, g, interpret):
    B, L, C = q.shape
    D = C // num_heads
    halo = w * fr
    n_frames = L // fr
    scale = 1.0 / (D ** 0.5)
    H_blk = 128 // D
    HP = C // 128
    # delta[hp, b, l, hh] = sum_d g * out over head (hp*H_blk + hh)'s
    # lanes — the same (HP, B, L, H_blk) layout the fwd kernel emits lse in
    delta = jnp.einsum(
        "blhd,blhd->blh",
        g.astype(jnp.float32).reshape(B, L, num_heads, D),
        out.astype(jnp.float32).reshape(B, L, num_heads, D),
    ).reshape(B, L, HP, H_blk).transpose(2, 0, 1, 3)
    kp = _pad_rows(k, halo)
    vp = _pad_rows(v, halo)
    blk, rows, res, res_pad = _specs(L, bq, halo, H_blk)
    grid = (C // 128, B, L // bq)
    kw = dict(scale=scale, D=D, fr=fr, w=w, n_frames=n_frames)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **kw),
        grid=grid,
        in_specs=[blk, rows, rows, blk, res, res],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, L, C), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        name="frame_band_dq",
    )(q, kp, vp, g, lse, delta)

    qp = _pad_rows(q, halo)
    gp = _pad_rows(g, halo)
    # lse pad value 0 is safe: padded q columns are banned by the
    # boundary bias, so exp2(NEG_INF - 0) == 0 regardless
    pad_l = [(0, 0), (0, 0), (halo, halo), (0, 0)]
    lsep = jnp.pad(lse, pad_l)
    deltap = jnp.pad(delta, pad_l)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **kw),
        grid=grid,
        in_specs=[blk, blk, rows, rows, res_pad, res_pad],
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((B, L, C), q.dtype),
                   jax.ShapeDtypeStruct((B, L, C), q.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        name="frame_band_dkv",
    )(k, v, qp, gp, lsep, deltap)
    return dq, dk, dv


def _xla_ref(q, k, v, num_heads, fr, w):
    """Dense fallback, identical math to EncoderLayer's einsum + additive
    temporal_band_mask path (models/clip_matcher.py)."""
    B, L, C = q.shape
    D = C // num_heads
    split = lambda x: x.reshape(B, L, num_heads, D)
    scale = D ** -0.5
    a = jnp.einsum("bqhd,bkhd->bhqk", split(q) * scale, split(k),
                   preferred_element_type=jnp.float32)
    f = jnp.arange(L) // fr
    band = (jnp.abs(f[:, None] - f[None, :]) <= w)
    a = jnp.where(band[None, None], a, NEG_INF)
    a = jax.nn.softmax(a, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, split(v),
                   preferred_element_type=jnp.float32).astype(q.dtype)
    return o.reshape(B, L, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def frame_band_attention(q, k, v, num_heads: int, fr: int, w: int,
                         block_q: int = 0, interpret: bool = False):
    """Frame-banded attention over channels-last inputs.

    q/k/v: (B, L, C) with L = n_frames * fr and C = num_heads * head_dim;
    token i (frame i//fr) attends every token of frames within +-w.
    Returns (B, L, C). Falls back to the dense XLA form when the shape
    fails `supports`.
    """
    B, L, C = q.shape
    bq = block_q or _block_q()
    if not supports(L, C, num_heads, fr, w, block_q):
        return _xla_ref(q, k, v, num_heads, fr, w)
    out, _ = _forward(q, k, v, num_heads, fr, w, bq, interpret)
    return out


def _vjp_fwd(q, k, v, num_heads, fr, w, block_q, interpret):
    bq = block_q or _block_q()
    if not supports(q.shape[1], q.shape[2], num_heads, fr, w, block_q):
        out, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_ref(q_, k_, v_, num_heads, fr, w),
            q, k, v)
        return out, (vjp, None)
    out, lse = _forward(q, k, v, num_heads, fr, w, bq, interpret)
    return out, (None, (q, k, v, out, lse, bq))


def _vjp_bwd(num_heads, fr, w, block_q, interpret, res, g):
    vjp, fused = res
    if fused is None:
        return vjp(g)
    q, k, v, out, lse, bq = fused
    return _backward(q, k, v, num_heads, fr, w, bq, out, lse, g, interpret)


frame_band_attention.defvjp(_vjp_fwd, _vjp_bwd)
