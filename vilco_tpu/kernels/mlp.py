"""Pallas TPU kernel: fused transformer MLP (fc1 -> gelu -> fc2), forward.

The VQ ViT's MLP moves ~3.1 GB/layer of HBM traffic that the matmuls
don't need: XLA runs fc1 and fc2 as separate kernels with the (N, 4C)
intermediate written to HBM, read back by the elementwise gelu pass
(measured 2.76 ms/layer at the flagship shape — bandwidth-bound), written
again, and read by fc2. This kernel tiles the token axis and keeps the
intermediate in VMEM: per grid step, load an (S, C) token tile, compute
tile @ W1 + b1 -> tanh-gelu -> @ W2 + b2, store (S, C). Both weight
blocks have constant index maps, so Mosaic keeps them resident across
grid steps.

Backward falls back to the XLA reference (jax.vjp over the unfused form,
recomputing the intermediate) — the flagship use is the FROZEN ViT
backbone where no gradient flows, so the backward path exists only for
correctness when the backbone is unfrozen.

The gelu is the tanh approximation (the compute-path default,
ops/activations.py); exact-erf mode falls back to the XLA form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# token-tile size: (S, 4C) f32 intermediate + both weight blocks must fit
# VMEM (~16 MB); 256 x 3072 f32 = 3.1 MB with ViT-B weights at 9.4 MB bf16
_TILE = 256


def _ref_mlp(x, w1, b1, w2, b2):
    """Unfused reference (tanh gelu — the compute-path form)."""
    h = jnp.dot(x, w1.astype(x.dtype),
                preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    o = jnp.dot(h, w2.astype(x.dtype),
                preferred_element_type=jnp.float32) + b2
    return o.astype(x.dtype)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    o = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _use_kernel(n, c, hdim, dtype) -> bool:
    if not (n >= _TILE and c % 128 == 0 and hdim % 128 == 0):
        return False
    # both weight blocks stay VMEM-resident: gate on the actual footprint
    # (f32 ViT-B weights alone are 18.9 MB and would fail Mosaic allocation)
    itemsize = jnp.dtype(dtype).itemsize
    weights = 2 * c * hdim * itemsize
    tiles = 2 * _TILE * c * itemsize * 2          # x/out, double-buffered
    inter = _TILE * hdim * 4                      # f32 intermediate
    return weights + tiles + inter <= 14 * 1024 * 1024


def _run(x2, w1, b1, w2, b2, interpret):
    n, c = x2.shape
    hdim = w1.shape[1]
    pad = (-n) % _TILE
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    npad = x2.shape[0]
    out = pl.pallas_call(
        _mlp_kernel,
        grid=(npad // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, c), x2.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        name="fused_mlp",
    )(x2, w1.astype(x2.dtype), b1[None].astype(x2.dtype),
      w2.astype(x2.dtype), b2[None].astype(x2.dtype))
    return out[:n] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mlp(x, w1, b1, w2, b2, interpret: bool = False):
    """gelu-MLP on (..., C) tokens: gelu(x @ w1 + b1) @ w2 + b2 with the
    intermediate kept in VMEM. w1 (C, H), b1 (H,), w2 (H, C), b2 (C,).
    Falls back to the XLA form for small/misaligned shapes."""
    lead = x.shape[:-1]
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    if not _use_kernel(x2.shape[0], c, w1.shape[1], x2.dtype):
        return _ref_mlp(x2, w1, b1, w2, b2).reshape(*lead, c)
    return _run(x2, w1, b1, w2, b2, interpret).reshape(*lead, c)


def _vjp_fwd(x, w1, b1, w2, b2, interpret):
    return fused_mlp(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2, b2)


def _vjp_bwd(interpret, res, g):
    # recompute through the XLA reference — the flagship backbone is
    # frozen, so this path only runs when the ViT is unfrozen
    x, w1, b1, w2, b2 = res
    lead = x.shape[:-1]
    c = x.shape[-1]
    _, vjp = jax.vjp(_ref_mlp, x.reshape(-1, c), w1, b1, w2, b2)
    dx, dw1, db1, dw2, db2 = vjp(g.reshape(-1, c))
    return dx.reshape(*lead, c), dw1, db1, dw2, db2


fused_mlp.defvjp(_vjp_fwd, _vjp_bwd)
