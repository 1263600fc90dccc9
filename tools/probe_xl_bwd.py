"""TPU probe: XL kernel bf16 backward vs bf16-XLA and f32-XLA oracles.

Quantifies whether the smoke's max|dq| gap is bf16 quantization noise or
a real backward bug: prints max/mean relative error of each arm against
the f32 XLA gradient, plus dq magnitudes.
"""
import jax
import jax.numpy as jnp

from vilco_tpu.kernels.xl_attention import xl_rel_attention

B, T, H, D = 4, 512, 4, 64
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
q = jax.random.normal(ks[0], (B, T, H, D), jnp.bfloat16)
k = jax.random.normal(ks[1], (B, T, H, D), jnp.bfloat16)
v = jax.random.normal(ks[2], (B, T, H, D), jnp.bfloat16)
mask = jnp.arange(T)[None, :] < jnp.array([[T], [T - 64], [T // 2], [128]])
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


def grad_of(fn, *args):
    g = jax.jit(jax.grad(
        lambda q_, *a: jnp.sum(fn(q_, *a).astype(jnp.float32))))
    out = g(*args)
    _ = float(out[0, 0, 0, 0])
    return out.astype(jnp.float32)


dq_kern = grad_of(
    lambda q_, k_, v_, r_, rwb_, rrb_, m_: xl_rel_attention(
        q_, k_, v_, r_, rwb_, rrb_, m_, seed, 0.0),
    q, k, v, r, rwb, rrb, mask)
dq_bf = grad_of(xl_xla, q, k, v, r, rwb, rrb, mask)
f32 = [a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a
       for a in (q, k, v, r, rwb, rrb)]
dq_f32 = grad_of(xl_xla, *f32, mask)

scale = jnp.max(jnp.abs(dq_f32))
print("max|dq_f32| =", float(scale), " mean|dq_f32| =",
      float(jnp.mean(jnp.abs(dq_f32))))
for name, dq in (("kernel_bf16", dq_kern), ("xla_bf16", dq_bf)):
    d = jnp.abs(dq - dq_f32)
    print(f"{name}: max|d|={float(jnp.max(d)):.4f} "
          f"mean|d|={float(jnp.mean(d)):.5f} "
          f"max_rel_vs_scale={float(jnp.max(d) / scale):.4f}")
d = jnp.abs(dq_kern - dq_bf)
print(f"kernel_vs_xla_bf16: max|d|={float(jnp.max(d)):.4f} "
      f"mean|d|={float(jnp.mean(d)):.5f}")
