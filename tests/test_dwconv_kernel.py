"""Fused depthwise q/k/v conv kernel (kernels/dwconv.py) vs the XLA
shifted-FMA form (ops/masked.py masked_conv1d), interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vilco_tpu.kernels.dwconv import (
    _use_kernel,
    _use_kernel_s2,
    _xla_ref,
    _xla_ref_s2,
    fused_dwconv_qkv,
    fused_dwconv_qkv_s2,
)
from vilco_tpu.ops.masked import masked_conv1d


def _inputs(B=3, T=128, C=256, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C)) * 0.3, jnp.float32)
    return x, w


def test_fwd_matches_masked_conv1d():
    x, w = _inputs()
    assert _use_kernel(x, w)
    outs = fused_dwconv_qkv(x, w, True)
    mask = jnp.ones(x.shape[:2], bool)
    for j, out in enumerate(outs):
        kernel = w[j][:, None, :]                     # (K, 1, C)
        ref, _ = masked_conv1d(x, mask, kernel, None, stride=1,
                               groups=x.shape[-1])
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_fwd_respects_boundary_zero_pad():
    # all-ones input: boundary rows see only 2 taps
    C = 128
    x = jnp.ones((1, 8, C), jnp.float32)
    w = jnp.ones((3, 3, C), jnp.float32)
    q, k, v = fused_dwconv_qkv(x, w, True)
    for out in (q, k, v):
        np.testing.assert_allclose(out[0, 0], 2.0)
        np.testing.assert_allclose(out[0, -1], 2.0)
        np.testing.assert_allclose(out[0, 1:-1], 3.0)


def test_grads_match_xla_ref():
    x, w = _inputs(B=4, T=64, C=128, seed=1)
    # weight each output differently so dw accumulation is exercised
    gq, gk, gv = (jnp.asarray(np.random.default_rng(2 + i)
                              .standard_normal(x.shape), jnp.float32)
                  for i in range(3))

    def loss(fn):
        def f(x_, w_):
            q, k, v = fn(x_, w_)
            return jnp.sum(q * gq) + jnp.sum(k * gk) + jnp.sum(v * gv)
        return f

    dx, dw = jax.grad(loss(lambda x_, w_: fused_dwconv_qkv(x_, w_, True)),
                      argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(loss(_xla_ref), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(dx, dx_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dw, dw_r, rtol=1e-4, atol=1e-4)


def test_unroutable_shapes_fall_back():
    # C not a multiple of 128 -> XLA fallback, still correct
    x, w = _inputs(B=2, T=64, C=96)
    assert not _use_kernel(x, w)
    outs = fused_dwconv_qkv(x, w, True)
    mask = jnp.ones(x.shape[:2], bool)
    for j, out in enumerate(outs):
        ref, _ = masked_conv1d(x, mask, w[j][:, None, :], None,
                               stride=1, groups=x.shape[-1])
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # grads route through the fallback too
    g = jax.grad(lambda x_: sum(jnp.sum(o)
                                for o in fused_dwconv_qkv(x_, w, True)))(x)
    g_r = jax.grad(lambda x_: sum(jnp.sum(o)
                                  for o in _xla_ref(x_, w)))(x)
    np.testing.assert_allclose(g, g_r, rtol=1e-5, atol=1e-5)


def test_mhca_fused_conv_path_matches_default():
    """MaskedMHCA with use_fused_conv routes through the kernel wrapper
    (XLA fallback on CPU) and must match the MaskedConv path exactly,
    with an identical param tree."""
    from vilco_tpu.models.layers import MaskedMHCA

    rng = np.random.default_rng(5)
    B, T, C = 2, 64, 128
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    mask = jnp.asarray(rng.random((B, T)) > 0.2)
    m_ref = MaskedMHCA(C, 4, name="attn")
    m_fused = MaskedMHCA(C, 4, use_fused_conv=True, name="attn")
    params = m_ref.init(jax.random.PRNGKey(0), x, mask)["params"]
    params_f = m_fused.init(jax.random.PRNGKey(0), x, mask)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_f)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_f)):
        np.testing.assert_array_equal(a, b)
    out, om = m_ref.apply({"params": params}, x, mask)
    out_f, om_f = m_fused.apply({"params": params}, x, mask)
    np.testing.assert_array_equal(om, om_f)
    np.testing.assert_allclose(out, out_f, rtol=2e-5, atol=2e-5)


def test_s2_fwd_matches_masked_conv1d():
    x, w = _inputs(B=2, T=256, C=128, seed=3)
    assert _use_kernel_s2(x, w)
    outs = fused_dwconv_qkv_s2(x, w, True)
    mask = jnp.ones(x.shape[:2], bool)
    for j, out in enumerate(outs):
        ref, rm = masked_conv1d(x, mask, w[j][:, None, :], None, stride=2,
                                groups=x.shape[-1])
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_s2_grads_match_xla_ref():
    x, w = _inputs(B=3, T=256, C=128, seed=4)
    gs = [jnp.asarray(np.random.default_rng(10 + i)
                      .standard_normal((3, 128, 128)), jnp.float32)
          for i in range(3)]

    def loss(fn):
        def f(x_, w_):
            outs = fn(x_, w_)
            return sum(jnp.sum(o * g) for o, g in zip(outs, gs))
        return f

    dx, dw = jax.grad(loss(lambda a, b: fused_dwconv_qkv_s2(a, b, True)),
                      argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(loss(_xla_ref_s2), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(dx, dx_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dw, dw_r, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("T", [64, 256])
def test_mhca_strided_fused_matches_default(T):
    """Strided MHCA with use_fused_conv (kernel route for T>=256,
    XLA fallback below) matches the MaskedConv path."""
    from vilco_tpu.models.layers import MaskedMHCA

    rng = np.random.default_rng(7)
    B, C = 2, 128
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    mask = jnp.asarray(rng.random((B, T)) > 0.2)
    m_ref = MaskedMHCA(C, 4, n_qx_stride=2, n_kv_stride=2, name="attn")
    m_fused = MaskedMHCA(C, 4, n_qx_stride=2, n_kv_stride=2,
                         use_fused_conv=True, name="attn")
    params = m_ref.init(jax.random.PRNGKey(0), x, mask)["params"]
    params_f = m_fused.init(jax.random.PRNGKey(0), x, mask)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_f)
    out, om = m_ref.apply({"params": params}, x, mask)
    out_f, om_f = m_fused.apply({"params": params}, x, mask)
    assert out.shape == (B, T // 2, C)
    np.testing.assert_array_equal(om, om_f)
    np.testing.assert_allclose(out, out_f, rtol=2e-5, atol=2e-5)
