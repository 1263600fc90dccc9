"""TPU smoke: bf16-operand MXU dots in the fused kernels (fwd + bwd).

Runs the three Pallas kernels at reduced flagship-like shapes in bf16 on
the real chip, compares against the XLA paths (loose tol — bf16 operands),
and prints rough per-call timings via forced scalar readback.
"""
import time

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices())

# health probe
x = jnp.ones((256, 256), jnp.bfloat16)
t0 = time.time()
y = jax.jit(lambda a: a @ a)(x)
print("probe matmul ok", float(y[0, 0]), f"{time.time()-t0:.1f}s")

from vilco_tpu.kernels.attention import fused_attention
from vilco_tpu.kernels.banded_attention import banded_attention_fused
from vilco_tpu.kernels.xl_attention import xl_rel_attention
from vilco_tpu.ops.attention import banded_attention as banded_xla
from vilco_tpu.ops.attention import masked_attention as masked_xla

key = jax.random.PRNGKey(0)
B, T, H, D = 4, 512, 4, 64
ks = jax.random.split(key, 8)
q = jax.random.normal(ks[0], (B, T, H, D), jnp.bfloat16)
k = jax.random.normal(ks[1], (B, T, H, D), jnp.bfloat16)
v = jax.random.normal(ks[2], (B, T, H, D), jnp.bfloat16)
mask = jnp.arange(T)[None, :] < jnp.array([[T], [T - 64], [T // 2], [128]])

def check(name, fn_k, fn_x, *args):
    t0 = time.time()
    f = jax.jit(lambda *a: jnp.sum(fn_k(*a).astype(jnp.float32)))
    g = jax.jit(jax.grad(lambda q_, *a: jnp.sum(fn_k(q_, *a).astype(jnp.float32))))
    s_k = float(f(*args)); dq_k = g(*args); _ = float(dq_k[0, 0, 0, 0])
    fx = jax.jit(lambda *a: jnp.sum(fn_x(*a).astype(jnp.float32)))
    gx = jax.jit(jax.grad(lambda q_, *a: jnp.sum(fn_x(q_, *a).astype(jnp.float32))))
    s_x = float(fx(*args)); dq_x = gx(*args); _ = float(dq_x[0, 0, 0, 0])
    rel = abs(s_k - s_x) / (abs(s_x) + 1e-6)
    gdiff = float(jnp.max(jnp.abs(dq_k.astype(jnp.float32) - dq_x.astype(jnp.float32))))
    print(f"{name}: fwd_sum kernel={s_k:.4f} xla={s_x:.4f} rel={rel:.2e} "
          f"max|dq_k-dq_x|={gdiff:.3e} compile+run {time.time()-t0:.1f}s")

check("fused_attention", fused_attention,
      lambda q_, k_, v_, m_: masked_xla(q_, k_, v_, m_), q, k, v, mask)

check("banded_attention", lambda q_, k_, v_, m_: banded_attention_fused(q_, k_, v_, m_, 64),
      lambda q_, k_, v_, m_: banded_xla(q_, k_, v_, m_, 64), q, k, v, mask)

# NLQ-like small window (w=4): exercises the aligned-halo reads + the
# flash-style fused backward at the shipped window size
check("banded_attention_w4", lambda q_, k_, v_, m_: banded_attention_fused(q_, k_, v_, m_, 4),
      lambda q_, k_, v_, m_: banded_xla(q_, k_, v_, m_, 4), q, k, v, mask)

r = jax.random.normal(ks[3], (2 * T, H, D), jnp.bfloat16)
rwb = jax.random.normal(ks[4], (H, D), jnp.bfloat16) * 0.02
rrb = jax.random.normal(ks[5], (H, D), jnp.bfloat16) * 0.02
seed = jnp.zeros((1,), jnp.int32)

def xl_xla(q_, k_, v_, r_, rwb_, rrb_, m_):
    scale = 1.0 / (D ** 0.5)
    ac = jnp.einsum("bqhd,bkhd->bhqk", q_ + rwb_[None, None], k_)
    bd = jnp.einsum("bqhd,khd->bhqk", q_ + rrb_[None, None], r_)
    bd = bd.reshape(B, H, 2 * T, T)[:, :, 1:, :]
    bd = bd.reshape(B, H, T, 2 * T - 1)[:, :, :, :T]
    att = (ac + bd).astype(jnp.float32) * scale
    att = jnp.where(m_[:, None, None, :], att, -1e9)
    att = jax.nn.softmax(att, axis=-1).astype(q_.dtype)
    vm = v_ * m_[:, :, None, None].astype(v_.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", att, vm)

check("xl_rel_attention",
      lambda q_, k_, v_, r_, rwb_, rrb_, m_: xl_rel_attention(
          q_, k_, v_, r_, rwb_, rrb_, m_, seed, 0.0),
      xl_xla, q, k, v, r, rwb, rrb, mask)

# dropout path: compiles + finite grads, seed determinism
o1 = xl_rel_attention(q, k, v, r, rwb, rrb, mask, jnp.array([7], jnp.int32), 0.1)
o2 = xl_rel_attention(q, k, v, r, rwb, rrb, mask, jnp.array([7], jnp.int32), 0.1)
o3 = xl_rel_attention(q, k, v, r, rwb, rrb, mask, jnp.array([9], jnp.int32), 0.1)
same = bool(jnp.all(o1 == o2)); diff = bool(jnp.any(o1 != o3))
gr = jax.grad(lambda q_: jnp.sum(xl_rel_attention(
    q_, k, v, r, rwb, rrb, mask, jnp.array([7], jnp.int32), 0.1
).astype(jnp.float32)))(q)
fin = bool(jnp.all(jnp.isfinite(gr.astype(jnp.float32))))
print(f"xl dropout: same-seed identical={same} diff-seed differs={diff} grads finite={fin}")
print("SMOKE OK")
