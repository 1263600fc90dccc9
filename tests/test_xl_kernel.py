"""Fused XL relative-attention kernel == the XLA reference math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vilco_tpu.kernels.xl_attention as xlk


def _xla_ref(q, k, v, r, rwb, rrb, mask):
    """The XLRelAttention attention core (models/layers.py), f32."""
    B, T, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    ac = jnp.einsum("bqhd,bkhd->bhqk", q + rwb[None, None], k)
    bd = jnp.einsum("bqhd,khd->bhqk", q + rrb[None, None], r)
    bd = bd.reshape(B, H, 2 * T, T)[:, :, 1:, :]
    bd = bd.reshape(B, H, T, 2 * T - 1)[:, :, :, :T]
    att = (ac + bd) * scale
    att = jnp.where(mask[:, None, None, :], att, -1e9)
    att = jax.nn.softmax(att, axis=-1)
    vm = v * mask[:, :, None, None].astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", att, vm)


def _inputs(rng, B=2, T=32, H=2, D=8):
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    q, k, v = f(B, T, H, D), f(B, T, H, D), f(B, T, H, D)
    r = f(2 * T, H, D)
    rwb, rrb = f(H, D) * 0.1, f(H, D) * 0.1
    lens = rng.integers(T // 2, T + 1, size=B)
    mask = jnp.asarray(np.arange(T)[None, :] < lens[:, None])
    seed = jnp.zeros((1,), jnp.int32)
    return q, k, v, r, rwb, rrb, mask, seed


def test_xl_kernel_forward_matches_xla(rng):
    q, k, v, r, rwb, rrb, mask, seed = _inputs(rng)
    ref = _xla_ref(q, k, v, r, rwb, rrb, mask)
    out = xlk.xl_rel_attention(q, k, v, r, rwb, rrb, mask, seed,
                               0.0, True)
    # compare only valid query rows (kernel leaves invalid rows unmasked,
    # like the XLA path before the final x * mask)
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, atol=2e-5, rtol=2e-5
    )


def test_xl_kernel_multiblock_forward(rng, monkeypatch):
    monkeypatch.setattr(xlk, "_block_size", lambda T: 16)
    q, k, v, r, rwb, rrb, mask, seed = _inputs(rng, T=64)
    ref = _xla_ref(q, k, v, r, rwb, rrb, mask)
    out = xlk.xl_rel_attention(q, k, v, r, rwb, rrb, mask, seed,
                               0.0, True)
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, atol=2e-5, rtol=2e-5
    )


def test_xl_kernel_grads_match_xla(rng, monkeypatch):
    monkeypatch.setattr(xlk, "_block_size", lambda T: 16)
    q, k, v, r, rwb, rrb, mask, seed = _inputs(rng, T=32, B=2)
    qm = jnp.asarray(np.asarray(mask), jnp.float32)[:, :, None, None]

    def loss_ref(q_, k_, v_, r_, rwb_, rrb_):
        return jnp.sum((_xla_ref(q_, k_, v_, r_, rwb_, rrb_, mask) * qm) ** 2)

    def loss_ker(q_, k_, v_, r_, rwb_, rrb_):
        out = xlk.xl_rel_attention(q_, k_, v_, r_, rwb_, rrb_, mask, seed,
                                   0.0, True)
        return jnp.sum((out * qm) ** 2)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(q, k, v, r, rwb, rrb)
    g_ker = jax.grad(loss_ker, argnums=tuple(range(6)))(q, k, v, r, rwb, rrb)
    names = ["q", "k", "v", "r", "rwb", "rrb"]
    for n, a, b in zip(names, g_ker, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4,
            err_msg=f"grad mismatch: {n}",
        )
