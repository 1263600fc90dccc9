"""TPU probe: XL kernel f32 backward vs XLA autodiff on real hardware.

Discriminates whether the bf16 dq discrepancy (probe_xl_bwd.py) is
bf16-specific or a latent Mosaic roll/dot issue also present at f32.
"""
import jax
import jax.numpy as jnp

from vilco_tpu.kernels.xl_attention import xl_rel_attention

B, T, H, D = 4, 512, 4, 64
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
q = jax.random.normal(ks[0], (B, T, H, D), jnp.float32)
k = jax.random.normal(ks[1], (B, T, H, D), jnp.float32)
v = jax.random.normal(ks[2], (B, T, H, D), jnp.float32)
mask = jnp.arange(T)[None, :] < jnp.array([[T], [T - 64], [T // 2], [128]])
r = jax.random.normal(ks[3], (2 * T, H, D), jnp.float32)
rwb = jax.random.normal(ks[4], (H, D), jnp.float32) * 0.02
rrb = jax.random.normal(ks[5], (H, D), jnp.float32) * 0.02
seed = jnp.zeros((1,), jnp.int32)


def xl_xla(q_, k_, v_, r_, rwb_, rrb_, m_):
    scale = 1.0 / (D ** 0.5)
    ac = jnp.einsum("bqhd,bkhd->bhqk", q_ + rwb_[None, None], k_)
    bd = jnp.einsum("bqhd,khd->bhqk", q_ + rrb_[None, None], r_)
    bd = bd.reshape(B, H, 2 * T, T)[:, :, 1:, :]
    bd = bd.reshape(B, H, T, 2 * T - 1)[:, :, :, :T]
    att = (ac + bd) * scale
    att = jnp.where(m_[:, None, None, :], att, -1e9)
    att = jax.nn.softmax(att, axis=-1)
    vm = v_ * m_[:, :, None, None].astype(v_.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", att, vm)


def grad_of(fn, wrt, *args):
    g = jax.jit(jax.grad(
        lambda x, *a: jnp.sum(fn(*a[:wrt], x, *a[wrt:]).astype(jnp.float32))))
    out = g(args[wrt], *args[:wrt], *args[wrt + 1:])
    _ = float(jnp.asarray(out).ravel()[0])
    return jnp.asarray(out, jnp.float32)


kern = lambda q_, k_, v_, r_, rwb_, rrb_: xl_rel_attention(
    q_, k_, v_, r_, rwb_, rrb_, mask, seed, 0.0)
xla = lambda q_, k_, v_, r_, rwb_, rrb_: xl_xla(
    q_, k_, v_, r_, rwb_, rrb_, mask)

args = (q, k, v, r, rwb, rrb)
names = ("dq", None, None, "dr", None, None)
for i, name in enumerate(names):
    if name is None:
        continue
    gk = grad_of(kern, i, *args)
    gx = grad_of(xla, i, *args)
    scale = float(jnp.max(jnp.abs(gx))) + 1e-9
    d = float(jnp.max(jnp.abs(gk - gx)))
    print(f"{name}: max|d|={d:.3e} scale={scale:.3f} rel={d / scale:.2e}", flush=True)
print("DONE")
