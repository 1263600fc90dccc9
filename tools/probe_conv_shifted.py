"""Microbench: 1-D dense conv as conv_general_dilated vs K shifted GEMMs.

The round-5 MQ trace shows the detection-head and embed convs running
2.5-4x above their bf16 GEMM floor (head_1 fwd 0.6 ms for 25 GF; embd_0
fwd 1.5 ms for 116 GF). A stride-1 k=3 conv is exactly
  out[t] = x[t-1] @ W0 + x[t] @ W1 + x[t+1] @ W2
— three MXU-perfect (B*T, Cin)x(Cin, Cout) dots the compiler can tile at
full throughput, if conv_general_dilated's 1-D lowering is the problem.

Times fwd and fwd+bwd at the flagship head/embed shapes, bf16.
Prints one JSON line per (shape, form).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax_tpu")
if "axon" in os.environ.get("JAX_PLATFORMS", ""):
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [
    ("head0", 16, 2021, 1024, 512),
    ("head1", 16, 2021, 512, 512),
    ("embd0", 16, 1024, 2304, 1024),
    ("embd1", 16, 1024, 1024, 1024),
]
K = 3


def conv_form(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((K // 2, K // 2),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def shifted_form(x, w):
    # x (B, T, Cin), w (K, Cin, Cout); pad once, K shifted dots
    pad = K // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    T = x.shape[1]
    out = None
    for j in range(K):
        o = jax.lax.dot_general(
            xp[:, j:j + T], w[j],
            (((2,), (0,)), ((), ())),
        )
        out = o if out is None else out + o
    return out


def main():
    rng = np.random.default_rng(0)
    for name, B, T, Cin, Cout in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, T, Cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, Cin, Cout)) * 0.02,
                        jnp.bfloat16)
        gf = 2 * B * T * K * Cin * Cout / 1e9
        ref = None
        for form_name, form in (("conv", conv_form), ("shifted",
                                                      shifted_form)):
            fwd = jax.jit(form)

            def loss(x_, w_):
                return jnp.sum(form(x_, w_).astype(jnp.float32) ** 2)

            fbwd = jax.jit(jax.grad(loss, argnums=(0, 1)))

            def timeit(fn, *a):
                out = fn(*a)
                float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
                t0 = time.perf_counter()
                n = 20
                for _ in range(n):
                    out = fn(*a)
                float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
                return (time.perf_counter() - t0) / n * 1e3

            ms_f = timeit(fwd, x, w)
            ms_b = timeit(fbwd, x, w)
            out = np.asarray(fwd(x, w).astype(jnp.float32))
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(np.max(np.abs(out - ref))
                            / (np.abs(ref).max() + 1e-6))
            print(json.dumps({
                "shape": name, "form": form_name,
                "fwd_ms": round(ms_f, 3), "fwdbwd_ms": round(ms_b, 3),
                "gflop_fwd": round(gf, 1),
                "fwd_tfs": round(gf / ms_f, 1),
                "max_rel_err_vs_conv": round(err, 5),
            }), flush=True)


if __name__ == "__main__":
    main()
