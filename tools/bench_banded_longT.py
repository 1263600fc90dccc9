import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax_tpu")
if "axon" in os.environ.get("JAX_PLATFORMS", ""):
    os.environ["JAX_PLATFORMS"] = "axon,cpu"
"""Fused vs XLA banded attention at long T (VERDICT r4 #5).

Measures fwd+bwd wall time of kernels/banded_attention.banded_attention_fused
vs ops/attention.banded_attention at T in {2560, 8192, 16384}, half-window
w in {4, 16} (the NLQ flagship ships n_mha_win_size=9 -> w=4; the XLA
blocked form requires w | T, which rules the reference's odd full-window
numbers out of a like-for-like sweep), NLQ-flagship head shape
(B=4, H=4, D=96, bf16) — the long-context regime the "scaling-friendly
form" justification appeals to."""
import time
import numpy as np, jax, jax.numpy as jnp
from vilco_tpu.kernels.banded_attention import banded_attention_fused
from vilco_tpu.ops.attention import banded_attention

B, H, D = 4, 4, 96
rng = np.random.default_rng(0)
for T in (2560, 8192, 16384):
    for w in (4, 16):
        q, k, v = (jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
                   .astype(jnp.bfloat16) for _ in range(3))
        m = jnp.ones((B, T), bool)

        def mk(fn):
            def loss(q_, k_, v_):
                return jnp.sum(fn(q_, k_, v_, m, w).astype(jnp.float32) ** 2)
            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            out = g(q, k, v); jax.block_until_ready(out)
            float(out[0].astype(jnp.float32).sum())   # forced readback
            t0 = time.time()
            for _ in range(10):
                out = g(q, k, v)
            float(out[0].astype(jnp.float32).sum())
            return (time.time() - t0) / 10 * 1e3

        def safe(fn):
            try:
                return mk(fn)
            except Exception as e:
                msg = str(e)
                return ("VMEM-OOM" if "vmem" in msg.lower() else
                        f"FAIL:{type(e).__name__}")

        fused = safe(lambda q_, k_, v_, m_, w_:
                     banded_attention_fused(q_, k_, v_, m_, w_))
        xla = safe(lambda q_, k_, v_, m_, w_:
                   banded_attention(q_, k_, v_, m_, window=w_))
        fmt = lambda x: f"{x:7.2f} ms" if isinstance(x, float) else f"{x:>10s}"
        ratio = (f"  ratio {xla/fused:.2f}x"
                 if isinstance(fused, float) and isinstance(xla, float)
                 else "")
        print(f"T={T:6d} w={w:2d}: fused {fmt(fused)}  xla {fmt(xla)}"
              f"{ratio}", flush=True)
