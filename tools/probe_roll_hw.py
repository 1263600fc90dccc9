"""HW probe: candidate inverse rel-shift formulations for the XL bwd kernel.

The shipped form (pltpu.roll stride=2T-1) miscompiles on TPU (dq rel 68%;
the minimal repro crashes the compiler). Candidates here use only static
uniform shifts:
  A) pltpu.roll(x, const_shift) uniform, no stride
  B) jnp.roll(x, const_shift, axis=1) (slices+concat)
  C) full inverse shift via bit-decomposition over g = i0 + row:
     y[i, m] = x[i, (m + T + i0 + i) mod 2T]
Each is compared elementwise against numpy on the current backend.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, T = 64, 128          # rows, half-width; W = 2T
W = 2 * T

x = np.random.default_rng(0).standard_normal((S, W)).astype(np.float32)


def run_kernel(kern, xin, grid=None):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(xin.shape, xin.dtype),
    )(xin)


# --- A/B: uniform static shifts ---
for shift in (1, 7, T, W - 1, W - 4):
    def ka(x_ref, o_ref, *, s=shift):
        o_ref[...] = pltpu.roll(x_ref[...], s, axis=1)

    def kb(x_ref, o_ref, *, s=shift):
        o_ref[...] = jnp.roll(x_ref[...], s, axis=1)

    want = np.roll(x, shift, axis=1)
    for name, k in (("pltpu-static", ka), ("jnp-static", kb)):
        try:
            got = np.asarray(run_kernel(k, x))
            d = np.abs(got - want).max()
            print(f"{name} shift={shift}: max|d|={d:.3e}")
        except Exception as e:  # noqa: BLE001
            print(f"{name} shift={shift}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}")

# --- C: full inverse shift with a fake i0 per grid row-block ---
NB = 2  # two q-blocks


def inv_shift(dbd_pad, *, T, S, i0):
    """y[i, m] = dbd_pad[i, (m + T + i0 + i) mod 2T] via static rolls."""
    W = 2 * T
    y = jnp.roll(dbd_pad, T, axis=1)              # -T === +T (mod 2T)
    g = i0 + jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    b = 1
    while b < T:
        rolled = jnp.roll(y, W - b, axis=1)
        y = jnp.where((g & b) != 0, rolled, y)
        b <<= 1
    return y


def kc(x_ref, o_ref, *, T, S):
    i0 = pl.program_id(0) * S
    o_ref[...] = inv_shift(x_ref[...], T=T, S=S, i0=i0)


got = pl.pallas_call(
    functools.partial(kc, T=T, S=S),
    grid=(NB,),
    in_specs=[pl.BlockSpec((S, W), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((S, W), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NB * S, W), jnp.float32),
)(np.concatenate([x, x[::-1]], axis=0))

xin = np.concatenate([x, x[::-1]], axis=0)
want = np.empty_like(xin)
for gi in range(NB * S):
    for m in range(W):
        want[gi, m] = xin[gi, (m + T + gi) % W]
d = np.abs(np.asarray(got) - want).max()
print(f"bit-decomposition inverse shift: max|d|={d:.3e}")
print("backend:", jax.default_backend())
print("DONE")
