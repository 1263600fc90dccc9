"""Fused AdamW leaf-update Pallas kernel (big parameter leaves).

The round-5 MQ trace shows the per-leaf AdamW update of the 88 BIG leaves
(200M of the flagship's 202M params) spending ~3.95 ms/step in standalone
`convert_element_type` kernels: with bf16-stored moments, XLA materializes
the f32 second-moment EMA once for the rsqrt path and again for the bf16
state write instead of fusing the casts into the update loop (the value is
multi-use, and XLA will not duplicate it across fusions). One Pallas
kernel per leaf performs the whole update — moment EMAs, bias correction,
decoupled weight decay, parameter apply, and the bf16 state in/out casts —
in registers, so the only HBM traffic is the unavoidable
read(p,g,m,v) + write(p',m',v').

Math is expression-for-expression identical to FusedAdamW's jnp path
(vilco_tpu/train/optim.py), including the weak-typed `B1 * m` bf16
rounding, so trajectories are bit-compatible with the optax reference
chain at f32-state settings and with the jnp path at bf16-state settings
(parity-tested in tests/test_pallas_kernels.py).

Reference counterpart: torch.optim.AdamW inside make_optimizer
(MQ/libs/utils/train_utils.py:68-146) — a fused multi-tensor apply is the
standard GPU analogue.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BLOCK_ROWS = (2048, 1024, 512, 256, 128, 64, 32, 16, 8)


def _adamw_kernel(coef_ref, p_ref, g_ref, m_ref, v_ref,
                  po_ref, mo_ref, vo_ref, *, decay, wd, b1, b2, eps):
    lr = coef_ref[0, 0]
    bc1 = coef_ref[0, 1]
    bc2 = coef_ref[0, 2]
    p = p_ref[...]
    g = g_ref[...].astype(jnp.float32)
    m = m_ref[...]
    # weak-typed b1 * m rounds in the STORAGE dtype before the f32 add —
    # matches the jnp path's `self.B1 * m` exactly
    m2 = (1.0 - b1) * g + b1 * m
    v2 = (1.0 - b2) * (g * g) + b2 * v_ref[...].astype(jnp.float32)
    u = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
    if decay:
        u = u + wd * p
    po_ref[...] = p - lr * u
    mo_ref[...] = m2.astype(mo_ref.dtype)
    vo_ref[...] = v2.astype(vo_ref.dtype)


def _plan(n: int):
    """(rows, block_rows) for an n-element leaf, or None -> caller falls
    back to the jnp form (odd sizes; all flagship big leaves qualify)."""
    if n % _LANES:
        return None
    rows = n // _LANES
    for br in _BLOCK_ROWS:
        if rows % br == 0:
            return rows, br
    return None


def adamw_update_leaf(p, g, m, v, *, decay: bool, wd: float, lr, bc1, bc2,
                      b1: float, b2: float, eps: float,
                      mu_dtype, nu_dtype, interpret: bool = False):
    """One fused AdamW update for a single leaf.

    p f32, g f32/bf16, m/v in their storage dtypes; lr/bc1/bc2 traced f32
    scalars (they change every step — passed through SMEM, not baked).
    Returns (p', m', v') with m'/v' in mu_dtype/nu_dtype. Falls back to
    None when the leaf shape doesn't tile (caller keeps the jnp path).
    """
    plan = _plan(p.size)
    if plan is None:
        return None
    rows, br = plan
    shape2 = (rows, _LANES)
    coef = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        jnp.asarray(bc1, jnp.float32),
        jnp.asarray(bc2, jnp.float32),
        jnp.zeros((), jnp.float32),
    ]).reshape(1, 4)
    r2 = lambda x: x.reshape(shape2)
    bspec = pl.BlockSpec((br, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
    po, mo, vo = pl.pallas_call(
        functools.partial(_adamw_kernel, decay=decay, wd=wd,
                          b1=b1, b2=b2, eps=eps),
        grid=(rows // br,),
        in_specs=[cspec, bspec, bspec, bspec, bspec],
        out_specs=(bspec, bspec, bspec),
        out_shape=(
            jax.ShapeDtypeStruct(shape2, p.dtype),
            jax.ShapeDtypeStruct(shape2, mu_dtype),
            jax.ShapeDtypeStruct(shape2, nu_dtype),
        ),
        input_output_aliases={1: 0, 3: 1, 4: 2},
        interpret=interpret,
        name=f"adamw_update_{'wd' if decay else 'nowd'}",
    )(coef, r2(p), r2(g), r2(m), r2(v))
    return po.reshape(p.shape), mo.reshape(p.shape), vo.reshape(p.shape)


def use_pallas_adamw() -> bool:
    """OPT-IN (VILCO_ENABLE_PALLAS_ADAMW=1): measured NEGATIVE end-to-end
    on the MQ flagship — 120.2 vs 117.3 ms/step (batch 16, scan-4) with
    the kernel on. The 88 per-leaf pallas_calls pipeline worse than XLA's
    update+convert fusions they replace: the separate convert kernels'
    HBM traffic overlaps surrounding work, while the monolithic kernels
    serialize. Kept with parity tests as the measured record
    (RESULTS.md round 5)."""
    return (jax.default_backend() == "tpu"
            and bool(os.environ.get("VILCO_ENABLE_PALLAS_ADAMW")))
