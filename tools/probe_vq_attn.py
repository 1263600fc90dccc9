"""Microbench: VQ ViT attention forward kernel variants (round-5 VPU hunt).

The frozen ViT-B attention is the largest VQ bucket (~90 ms/step after the
round-5 exp2/deferred-norm rewrite, still VPU-bound at ~23% MXU). This
probe times forward-kernel variants at the exact ViT shape
(B*T=120 folded frames, L=1152 tokens, C=768, 12 heads of D=64, 1025
valid tokens) to decide which VPU passes are worth removing:

  A. library fused_attention_blc (exp2 + row-max + VPU row-sum)
  B. bound-shift: replace the (S,Tk) row-max pass with the Cauchy-Schwarz
     bound b_row = |q_scaled| * max|k| ((S,D)+(Tk,D) passes instead);
     softmax is shift-invariant so any shift >= rowmax is exact up to
     rounding — but can underflow when |q||k| is huge and unaligned
     (DINOv2's high-norm artifact tokens), hence the numerics check.
  C. mxu-sum: keep row-max; compute the softmax denominator as a bf16
     e @ ones MXU dot instead of the VPU row-sum reduce.
  D. B + C combined.

Prints one JSON line per variant: {variant, ms_per_call, max_rel_err}.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax_tpu")

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vilco_tpu.kernels.attention import (
    LOG2E,
    _block_size_blc,
    _mask_bias,
    _specs_blc,
    fused_attention_blc,
)

B, L, C, H = 120, 1152, 768, 12
D = C // H
VALID = 1025


def _e_variant(q, k, bias, *, scale, bound_shift, mxu_sum):
    qs = q * jnp.asarray(scale * LOG2E, q.dtype)
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias
    if bound_shift:
        qn = jnp.sqrt(jnp.sum(jnp.square(qs.astype(jnp.float32)), axis=-1))
        kn = jnp.sqrt(jnp.max(
            jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1)))
        b = (qn * kn)[:, None]
    else:
        b = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e8)
    e = jnp.exp2(s - b)
    if mxu_sum:
        eb = e.astype(q.dtype)
        ones = jnp.ones((k.shape[0], 128), q.dtype)
        rs = jax.lax.dot_general(
            eb, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :1]
        r2 = 1.0 / (rs + 1e-30)                       # (S, 1)
    else:
        r2 = (1.0 / (jnp.sum(e, axis=-1) + 1e-30))[:, None]
    return e, r2


def _fwd_kernel_v(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale,
                  bound_shift, mxu_sum):
    bias = _mask_bias(m_ref[0, 0])
    W = q_ref.shape[-1]
    outs = []
    for hh in range(W // D):
        q = q_ref[0][:, hh * D:(hh + 1) * D]
        k = k_ref[0][:, hh * D:(hh + 1) * D]
        v = v_ref[0][:, hh * D:(hh + 1) * D]
        e, r2 = _e_variant(q, k, bias, scale=scale,
                           bound_shift=bound_shift, mxu_sum=mxu_sum)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((o * r2).astype(o_ref.dtype))
    o_ref[0] = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def run_variant(q, k, v, kv_mask, *, bound_shift, mxu_sum):
    Bq, Tq, Cq = q.shape
    Tk = k.shape[1]
    S = _block_size_blc(Tq, Bq)
    scale = 1.0 / (D ** 0.5)
    mf = kv_mask.astype(jnp.int32)[:, None, :]
    qspec, kspec, mspec = _specs_blc(Tq, Tk, S)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_v, scale=scale,
                          bound_shift=bound_shift, mxu_sum=mxu_sum),
        grid=(Cq // 128, Bq, Tq // S),
        in_specs=[qspec, kspec, kspec, mspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((Bq, Tq, Cq), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        name=f"probe_blc_bs{int(bound_shift)}_ms{int(mxu_sum)}",
    )(q, k, v, mf)


def xla_ref(q, k, v, kv_mask):
    # 2 batch rows only: the full-B f32 score tensor is 7.6 GB
    b = 2
    r = lambda x: x[:b].reshape(b, L, H, D).astype(jnp.float32)
    s = jnp.einsum("blhd,bmhd->bhlm", r(q) / (D ** 0.5), r(k))
    s = jnp.where(kv_mask[:b, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", p, r(v)).reshape(b, L, C)


def main():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.standard_normal((B, L, C), np.float32) * 2.0, jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    kv_mask = jnp.broadcast_to(jnp.arange(L)[None, :] < VALID, (B, L))
    ref = None

    def timeit(fn, *a):
        out = fn(*a)
        float(jnp.sum(out.astype(jnp.float32)))  # force
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            out = fn(*a)
        float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / n * 1e3, out

    variants = [
        ("A_current",
         lambda q_, k_, v_: fused_attention_blc(q_, k_, v_, kv_mask, H)),
        ("B_bound",
         lambda q_, k_, v_: run_variant(q_, k_, v_, kv_mask,
                                        bound_shift=True, mxu_sum=False)),
        ("C_mxusum",
         lambda q_, k_, v_: run_variant(q_, k_, v_, kv_mask,
                                        bound_shift=False, mxu_sum=True)),
        ("D_both",
         lambda q_, k_, v_: run_variant(q_, k_, v_, kv_mask,
                                        bound_shift=True, mxu_sum=True)),
    ]
    jit_ref = jax.jit(xla_ref)
    ref = np.asarray(jit_ref(q, k, v, kv_mask))[:, :VALID]
    for name, fn in variants:
        jfn = jax.jit(fn)
        ms, out = timeit(jfn, q, k, v)
        got = np.asarray(out.astype(jnp.float32))[:2, :VALID]
        err = np.max(np.abs(got - ref) / (np.abs(ref) + 1e-3))
        print(json.dumps({"variant": name, "ms_per_call": round(ms, 3),
                          "max_rel_err": float(err)}), flush=True)


if __name__ == "__main__":
    main()
