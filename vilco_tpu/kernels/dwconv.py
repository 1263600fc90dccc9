"""Pallas TPU kernel: fused depthwise q/k/v conv preprocessing (fwd + bwd).

MaskedMHCA (MQ/libs/modeling/blocks.py:272-411) runs three depthwise
K=3 convs over the SAME input x before the q/k/v projections. The XLA
form (ops/masked.py: K shifted FMAs per conv) reads x once per conv and
its autodiff emits per-tap wgrad reductions — the round-3 step profile
attributes 17.6 ms/step (14.5%) to these "conv-attention XLA remnants"
(dozens of 0.3-0.5 ms fwd/bwd pieces; RESULTS.md). This kernel computes
all three conv outputs in ONE pass over x, and its backward produces dx
plus all three (3-tap) weight grads in ONE pass over (x, dy_q, dy_k,
dy_v):

  forward:  out_j[t] = x[t-1] w_j0 + x[t] w_j1 + x[t+1] w_j2   (zero pad)
  backward: dx[t]    = sum_j dy_j[t+1] w_j0 + dy_j[t] w_j1 + dy_j[t-1] w_j2
            dw_j[i]  = sum_{b,t} x[t-1+i] dy_j[t]   (f32, accumulated
                       across the batch grid axis — revisit-minormost)

Kernel-size-3 at stride 1 (stem blocks) and stride 2 (branch
downsampling blocks, via the even/odd-deinterleaved variant below).
Shifts are uniform sublane rolls with explicit boundary masking —
per-row strided rolls miscompile on HW (see kernels/xl_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _use_kernel(x: jax.Array, w: jax.Array) -> bool:
    B, T, C = x.shape
    if w.shape != (3, 3, C):
        return False
    # full-T blocks: (T, 128) f32 temps must fit VMEM alongside outputs;
    # T % 16 keeps the sublane dim legal for bf16's (16, 128) min tile
    return (T % 16 == 0) and (C % LANES == 0) and 128 <= T <= 4096


def _xla_ref(x: jax.Array, w: jax.Array):
    """Reference math (same K-shifted-FMA form as ops.masked.masked_conv1d,
    no mask/bias): used on unroutable shapes and non-TPU backends."""
    T = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    wj = w.astype(x.dtype)
    outs = []
    for j in range(3):
        out = None
        for i in range(3):
            sl = xp[:, i: i + T, :] * wj[j, i][None, None, :]
            out = sl if out is None else out + sl
        outs.append(out)
    return tuple(outs)


def _shifted(x, T, down: bool):
    """x rolled so row t holds x[t-1] (down) or x[t+1] (up), boundary
    rows zeroed. x: (T, LANES) f32."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 0)
    if down:
        r = pltpu.roll(x, 1, axis=0)
        return jnp.where(rows == 0, 0.0, r)
    r = pltpu.roll(x, T - 1, axis=0)
    return jnp.where(rows == T - 1, 0.0, r)


def _fwd_kernel(x_ref, w_ref, q_ref, k_ref, v_ref):
    x = x_ref[0].astype(jnp.float32)               # (T, LANES)
    T = x.shape[0]
    xm1 = _shifted(x, T, down=True)                # x[t-1]
    xp1 = _shifted(x, T, down=False)               # x[t+1]
    for j, ref in enumerate((q_ref, k_ref, v_ref)):
        # (1, LANES) slices broadcast against (T, LANES) — keep 2-D for
        # Mosaic-friendly layouts
        w0 = w_ref[j, 0:1, :].astype(jnp.float32)
        w1 = w_ref[j, 1:2, :].astype(jnp.float32)
        w2 = w_ref[j, 2:3, :].astype(jnp.float32)
        ref[0] = (xm1 * w0 + x * w1 + xp1 * w2).astype(ref.dtype)


def _bwd_kernel(x_ref, w_ref, dq_ref, dk_ref, dv_ref, dx_ref, dw_ref):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    x = x_ref[0].astype(jnp.float32)               # (T, LANES)
    T = x.shape[0]
    xm1 = _shifted(x, T, down=True)
    xp1 = _shifted(x, T, down=False)
    dx = jnp.zeros_like(x)
    for j, ref in enumerate((dq_ref, dk_ref, dv_ref)):
        dy = ref[0].astype(jnp.float32)
        w0 = w_ref[j, 0:1, :].astype(jnp.float32)
        w1 = w_ref[j, 1:2, :].astype(jnp.float32)
        w2 = w_ref[j, 2:3, :].astype(jnp.float32)
        # transpose conv: dx[t] += dy[t+1] w0 + dy[t] w1 + dy[t-1] w2
        dx = dx + _shifted(dy, T, down=False) * w0 + dy * w1 \
            + _shifted(dy, T, down=True) * w2
        # weight grads: one (T, LANES) reduce per tap, f32 accumulation
        dw_ref[j, 0:1, :] += jnp.sum(xm1 * dy, axis=0, keepdims=True)
        dw_ref[j, 1:2, :] += jnp.sum(x * dy, axis=0, keepdims=True)
        dw_ref[j, 2:3, :] += jnp.sum(xp1 * dy, axis=0, keepdims=True)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _run_fwd(x, w, interpret):
    B, T, C = x.shape
    nc = C // LANES
    spec_x = pl.BlockSpec((1, T, LANES), lambda b, c: (b, 0, c))
    spec_w = pl.BlockSpec((3, 3, LANES), lambda b, c: (0, 0, c))
    out = jax.ShapeDtypeStruct((B, T, C), x.dtype)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, nc),
        in_specs=[spec_x, spec_w],
        out_specs=[spec_x, spec_x, spec_x],
        out_shape=[out, out, out],
        interpret=interpret,
    )(x, w)


def _run_bwd(x, w, dq, dk, dv, interpret):
    B, T, C = x.shape
    nc = C // LANES
    # batch is the MINORMOST grid axis: the dw output block is revisited
    # across consecutive b programs so the += accumulation is legal
    spec_x = pl.BlockSpec((1, T, LANES), lambda c, b: (b, 0, c))
    spec_w = pl.BlockSpec((3, 3, LANES), lambda c, b: (0, 0, c))
    dx, dw = pl.pallas_call(
        _bwd_kernel,
        grid=(nc, B),
        in_specs=[spec_x, spec_w, spec_x, spec_x, spec_x],
        out_specs=[spec_x, spec_w],
        out_shape=[jax.ShapeDtypeStruct((B, T, C), x.dtype),
                   jax.ShapeDtypeStruct((3, 3, C), jnp.float32)],
        interpret=interpret,
    )(x, w, dq, dk, dv)
    return dx, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_dwconv_qkv(x, w, interpret: bool = False):
    """Three depthwise K=3 stride-1 same-pad convs over shared input.

    x (B, T, C); w (3, 3, C) — w[j, i] is tap i of conv j in (q, k, v)
    order (the squeezed (K, 1, C) MaskedConv kernels, astype'd to
    x.dtype by the caller). Returns (q, k, v), each (B, T, C) in
    x.dtype. No mask / bias — MaskedMHCA applies the output mask
    multiply outside, identical to the masked_conv1d path.
    """
    if not _use_kernel(x, w) or not (interpret
                                      or jax.default_backend() == "tpu"):
        return _xla_ref(x, w)
    return tuple(_run_fwd(x, w, interpret))


def _vjp_fwd(x, w, interpret):
    return fused_dwconv_qkv(x, w, interpret), (x, w)


def _vjp_bwd(interpret, res, g):
    x, w = res
    dq, dk, dv = g
    if not _use_kernel(x, w) or not (interpret
                                      or jax.default_backend() == "tpu"):
        _, vjp = jax.vjp(lambda x_, w_: _xla_ref(x_, w_), x, w)
        return vjp((dq, dk, dv))
    dx, dw = _run_bwd(x, w, dq, dk, dv, interpret)
    return dx, dw.astype(w.dtype)


fused_dwconv_qkv.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# stride-2 variant: the branch-level downsampling blocks (n_ds_stride=2,
# kernel_size = stride + 1 = 3). The input is deinterleaved OUTSIDE the
# kernel into even/odd rows (two XLA strided slices — far fewer ops than
# the 9-slice-per-conv XLA form), making the kernel halo-free:
#
#   out[t] = x[2t-1] w0 + x[2t] w1 + x[2t+1] w2        (t < T/2, x[-1]=0)
#          = O[t-1] w0 + E[t] w1 + O[t] w2     with E[t]=x[2t], O[t]=x[2t+1]
#
#   backward:  dE[t] = sum_j dy_j[t] w_j1
#              dO[t] = sum_j dy_j[t] w_j2 + dy_j[t+1] w_j0
#              dx    = interleave(dE, dO)   (stack+reshape outside)
#              dw_j  = (sum O[t-1] dy_j, sum E dy_j, sum O dy_j)
# ---------------------------------------------------------------------------


def _use_kernel_s2(x: jax.Array, w: jax.Array) -> bool:
    B, T, C = x.shape
    if w.shape != (3, 3, C):
        return False
    # halves must satisfy the same tiling bounds as the stride-1 kernel
    return (T % 32 == 0) and (C % LANES == 0) and 256 <= T <= 8192


def _xla_ref_s2(x: jax.Array, w: jax.Array):
    """masked_conv1d's stride-2 shifted-FMA form, no mask/bias."""
    T = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    wj = w.astype(x.dtype)
    outs = []
    for j in range(3):
        out = None
        for i in range(3):
            sl = xp[:, i: i + T: 2, :] * wj[j, i][None, None, :]
            out = sl if out is None else out + sl
        outs.append(out)
    return tuple(outs)


def _fwd_kernel_s2(e_ref, o_ref, w_ref, q_ref, k_ref, v_ref):
    e = e_ref[0].astype(jnp.float32)               # (T/2, LANES) = x[2t]
    o = o_ref[0].astype(jnp.float32)               # x[2t+1]
    Th = e.shape[0]
    om1 = _shifted(o, Th, down=True)               # x[2t-1]
    for j, ref in enumerate((q_ref, k_ref, v_ref)):
        w0 = w_ref[j, 0:1, :].astype(jnp.float32)
        w1 = w_ref[j, 1:2, :].astype(jnp.float32)
        w2 = w_ref[j, 2:3, :].astype(jnp.float32)
        ref[0] = (om1 * w0 + e * w1 + o * w2).astype(ref.dtype)


def _bwd_kernel_s2(e_ref, o_ref, w_ref, dq_ref, dk_ref, dv_ref,
                   de_ref, do_ref, dw_ref):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    e = e_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    Th = e.shape[0]
    om1 = _shifted(o, Th, down=True)
    de = jnp.zeros_like(e)
    do = jnp.zeros_like(o)
    for j, ref in enumerate((dq_ref, dk_ref, dv_ref)):
        dy = ref[0].astype(jnp.float32)
        w0 = w_ref[j, 0:1, :].astype(jnp.float32)
        w1 = w_ref[j, 1:2, :].astype(jnp.float32)
        w2 = w_ref[j, 2:3, :].astype(jnp.float32)
        de = de + dy * w1
        do = do + dy * w2 + _shifted(dy, Th, down=False) * w0
        dw_ref[j, 0:1, :] += jnp.sum(om1 * dy, axis=0, keepdims=True)
        dw_ref[j, 1:2, :] += jnp.sum(e * dy, axis=0, keepdims=True)
        dw_ref[j, 2:3, :] += jnp.sum(o * dy, axis=0, keepdims=True)
    de_ref[0] = de.astype(de_ref.dtype)
    do_ref[0] = do.astype(do_ref.dtype)


def _run_fwd_s2(e, o, w, interpret):
    B, Th, C = e.shape
    nc = C // LANES
    spec_x = pl.BlockSpec((1, Th, LANES), lambda b, c: (b, 0, c))
    spec_w = pl.BlockSpec((3, 3, LANES), lambda b, c: (0, 0, c))
    out = jax.ShapeDtypeStruct((B, Th, C), e.dtype)
    return pl.pallas_call(
        _fwd_kernel_s2,
        grid=(B, nc),
        in_specs=[spec_x, spec_x, spec_w],
        out_specs=[spec_x, spec_x, spec_x],
        out_shape=[out, out, out],
        interpret=interpret,
    )(e, o, w)


def _run_bwd_s2(e, o, w, dq, dk, dv, interpret):
    B, Th, C = e.shape
    nc = C // LANES
    spec_x = pl.BlockSpec((1, Th, LANES), lambda c, b: (b, 0, c))
    spec_w = pl.BlockSpec((3, 3, LANES), lambda c, b: (0, 0, c))
    out = jax.ShapeDtypeStruct((B, Th, C), e.dtype)
    return pl.pallas_call(
        _bwd_kernel_s2,
        grid=(nc, B),
        in_specs=[spec_x, spec_x, spec_w, spec_x, spec_x, spec_x],
        out_specs=[spec_x, spec_x, spec_w],
        out_shape=[out, out, jax.ShapeDtypeStruct((3, 3, C), jnp.float32)],
        interpret=interpret,
    )(e, o, w, dq, dk, dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_dwconv_qkv_s2(x, w, interpret: bool = False):
    """Stride-2 fused depthwise q/k/v convs (branch downsampling blocks).

    x (B, T, C) with T even; w (3, 3, C). Returns (q, k, v), each
    (B, T//2, C). Semantics match masked_conv1d(stride=2, K=3) minus the
    mask/bias, like fused_dwconv_qkv.
    """
    if not _use_kernel_s2(x, w) or not (interpret
                                         or jax.default_backend() == "tpu"):
        return _xla_ref_s2(x, w)
    return tuple(_run_fwd_s2(x[:, ::2], x[:, 1::2], w, interpret))


def _vjp_fwd_s2(x, w, interpret):
    return fused_dwconv_qkv_s2(x, w, interpret), (x, w)


def _vjp_bwd_s2(interpret, res, g):
    x, w = res
    dq, dk, dv = g
    if not _use_kernel_s2(x, w) or not (interpret
                                         or jax.default_backend() == "tpu"):
        _, vjp = jax.vjp(lambda x_, w_: _xla_ref_s2(x_, w_), x, w)
        return vjp((dq, dk, dv))
    de, do, dw = _run_bwd_s2(x[:, ::2], x[:, 1::2], w, dq, dk, dv, interpret)
    dx = jnp.stack([de, do], axis=2).reshape(x.shape)
    return dx, dw.astype(w.dtype)


fused_dwconv_qkv_s2.defvjp(_vjp_fwd_s2, _vjp_bwd_s2)
