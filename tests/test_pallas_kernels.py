"""Pallas kernel tests (interpret mode on CPU): fused banded attention vs
the XLA blocked implementation, values + gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vilco_tpu.kernels.banded_attention import banded_attention_fused
from vilco_tpu.ops.attention import banded_attention


@pytest.mark.parametrize("window,T", [(4, 128), (8, 256)])
def test_fused_matches_xla(rng, window, T):
    B, H, D = 2, 2, 16
    q, k, v = (rng.standard_normal((B, T, H, D)).astype(np.float32)
               for _ in range(3))
    mask = np.arange(T)[None, :] < np.array([[T], [T - 7]])

    out_ref = banded_attention(
        *map(jnp.asarray, (q, k, v)), jnp.asarray(mask), window=window
    )
    out = banded_attention_fused(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        window, 0, True,   # interpret mode
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=2e-5)


def test_fused_gradients_match(rng):
    B, T, H, D, w = 1, 128, 2, 8, 4
    q, k, v = (rng.standard_normal((B, T, H, D)).astype(np.float32)
               for _ in range(3))
    mask = np.ones((B, T), bool)
    jq, jk, jv, jm = map(jnp.asarray, (q, k, v, mask))

    def loss_fused(q_, k_, v_):
        return jnp.sum(
            banded_attention_fused(q_, k_, v_, jm, w, 0, True) ** 2
        )

    def loss_ref(q_, k_, v_):
        return jnp.sum(banded_attention(q_, k_, v_, jm, window=w) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(jq, jk, jv)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(jq, jk, jv)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.parametrize("T,w,valid", [(256, 4, (256, 181)),
                                       (128, 4, (128, 128)),
                                       # w=9 needs T % 9 == 0 for the
                                       # XLA reference and T % 128 == 0
                                       # for the kernel: 1152 = 9 * 128
                                       (1152, 9, (1152, 1000)),
                                       # no 128-multiple divides 160:
                                       # exercises the XLA fallback
                                       (160, 4, (160, 121))])
def test_fused_banded_bwd_masked(rng, T, w, valid):
    """The flash-style fused backward (dq + dkv kernels) against the XLA
    blocked backward at NLQ-like shapes, with padded rows — covers the
    lse/delta halo handling and the invalid-row masking."""
    B, H, D = 2, 2, 16
    q, k, v = (rng.standard_normal((B, T, H, D)).astype(np.float32)
               for _ in range(3))
    mask = np.arange(T)[None, :] < np.asarray(valid)[:, None]
    jq, jk, jv, jm = map(jnp.asarray, (q, k, v, mask))
    # non-uniform cotangent (sum-of-squares hides sign errors less well)
    wgt = jnp.asarray(
        rng.standard_normal((B, T, H, D)).astype(np.float32))

    def loss_fused(q_, k_, v_):
        return jnp.sum(
            banded_attention_fused(q_, k_, v_, jm, w, 0, True) * wgt)

    def loss_ref(q_, k_, v_):
        return jnp.sum(banded_attention(q_, k_, v_, jm, window=w) * wgt)

    np.testing.assert_allclose(
        float(loss_fused(jq, jk, jv)), float(loss_ref(jq, jk, jv)),
        rtol=1e-5)
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(jq, jk, jv)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(jq, jk, jv)
    for a, b, nm in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, err_msg=f"d{nm}")


def test_fused_full_attention_matches_xla(rng, monkeypatch):
    import vilco_tpu.kernels.attention as ka
    from vilco_tpu.ops.attention import masked_attention

    monkeypatch.setattr(ka, "_use_kernel", lambda q, k: True)
    monkeypatch.setattr(ka, "_block_size", lambda T: 16)
    B, T, H, D = 2, 64, 2, 8
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(np.arange(T)[None, :] < np.array([[T], [T - 9]]))
    ref = masked_attention(q, k, v, mask)
    out = ka.fused_attention(q, k, v, mask, True)
    # kernel leaves invalid query rows unmasked; compare valid rows
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(out) * m, np.asarray(ref) * m,
                               atol=2e-5)


def test_fused_full_attention_grads_match(rng, monkeypatch):
    import vilco_tpu.kernels.attention as ka
    from vilco_tpu.ops.attention import masked_attention

    monkeypatch.setattr(ka, "_use_kernel", lambda q, k: True)
    monkeypatch.setattr(ka, "_block_size", lambda T: 16)
    B, T, H, D = 1, 32, 2, 8
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
               for _ in range(3))
    mask = jnp.ones((B, T), bool)

    def lf(q_, k_, v_):
        return jnp.sum(ka.fused_attention(q_, k_, v_, mask, True) ** 2)

    def lr(q_, k_, v_):
        return jnp.sum(masked_attention(q_, k_, v_, mask) ** 2)

    g1 = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_attention_padded_unaligned_length():
    """The ViT pad-to-128 trick (models/vit.py): padding keys/queries with
    a False kv_mask and slicing the output back must equal dense masked
    attention on the unpadded length (L=70 -> 128 here; 1025 -> 1152 on
    the real ViT)."""
    import jax.numpy as jnp
    import numpy as np

    from vilco_tpu.kernels.attention import fused_attention
    from vilco_tpu.ops.attention import masked_attention

    rng = np.random.default_rng(0)
    B, L, H, D = 2, 70, 2, 8
    pad = (-L) % 128
    q, k, v = (jnp.asarray(rng.standard_normal((B, L, H, D)).astype(
        np.float32)) for _ in range(3))
    ref = masked_attention(q, k, v, jnp.ones((B, L), bool))
    padw = ((0, 0), (0, pad), (0, 0), (0, 0))
    qp, kp, vp = (jnp.pad(t, padw) for t in (q, k, v))
    kv_mask = jnp.broadcast_to(jnp.arange(L + pad)[None, :] < L,
                               (B, L + pad))
    out = fused_attention(qp, kp, vp, kv_mask, interpret=True)[:, :L]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_matches_reference(rng):
    from vilco_tpu.kernels.mlp import _ref_mlp, fused_mlp

    N, C, H = 600, 128, 512   # pads 600 -> 768 inside the kernel
    x = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C, H)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal((H,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((H, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
    out = fused_mlp(x, w1, b1, w2, b2, True)
    ref = _ref_mlp(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    # leading batch dims + gradient path (XLA-recompute vjp)
    x3 = x.reshape(2, 300, C)
    out3 = fused_mlp(x3, w1, b1, w2, b2, True)
    np.testing.assert_allclose(np.asarray(out3).reshape(N, C),
                               np.asarray(ref), atol=2e-4)
    g = jax.grad(lambda xx: fused_mlp(xx, w1, b1, w2, b2, True).sum())(x)
    gr = jax.grad(lambda xx: _ref_mlp(xx, w1, b1, w2, b2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-3)


def test_fused_attention_blc_matches_xla(rng, monkeypatch):
    """Channels-last kernel (two D=64-style heads packed per 128-lane
    program) == dense masked attention, values + grads."""
    import vilco_tpu.kernels.attention as ka
    from vilco_tpu.ops.attention import masked_attention

    monkeypatch.setattr(ka, "_block_size", lambda T: 16)
    B, T, H, D = 2, 64, 2, 64     # C=128: both heads in one program
    C = H * D
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(np.arange(T)[None, :] < np.array([[T], [T - 9]]))
    split = lambda x: x.reshape(B, T, H, D)
    ref = masked_attention(split(q), split(k), split(v), mask)
    out = ka.fused_attention_blc(q, k, v, mask, H, True)
    m = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref).reshape(B, T, C) * m,
        atol=2e-5)

    def lf(q_, k_, v_):
        o = ka.fused_attention_blc(q_, k_, v_, mask, H, True)
        return jnp.sum((o * m) ** 2)

    def lr(q_, k_, v_):
        o = masked_attention(split(q_), split(k_), split(v_), mask)
        return jnp.sum((o.reshape(B, T, C) * m) ** 2)

    g1 = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_fused_attention_blc_wide_head(rng, monkeypatch):
    """D=128 (one head per 128-lane program) and the unpackable-head
    XLA fallback both match dense attention."""
    import vilco_tpu.kernels.attention as ka
    from vilco_tpu.ops.attention import masked_attention

    monkeypatch.setattr(ka, "_block_size", lambda T: 16)
    B, T = 1, 128
    # kernel path (D=128) / unpackable-head fallback (D=24) /
    # wider-than-block fallback (D=256 would span two 128-lane blocks)
    for H, D in ((2, 128), (3, 24), (1, 256)):
        C = H * D
        assert ka._use_kernel_blc(
            jnp.zeros((B, T, C)), jnp.zeros((B, T, C)), H) == (D == 128)
        q, k, v = (jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
                   for _ in range(3))
        mask = jnp.asarray(np.arange(T)[None, :] < T - 5)
        split = lambda x: x.reshape(B, T, H, D)
        ref = masked_attention(split(q), split(k), split(v), mask)
        out = ka.fused_attention_blc(q, k, v, mask, H, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref).reshape(B, T, C), atol=2e-5,
            err_msg=f"H={H} D={D}")


@pytest.mark.parametrize("n_frames,fr,w", [(6, 8, 1), (8, 8, 2), (7, 16, 2)])
def test_frame_band_attention_matches_xla(rng, n_frames, fr, w):
    """Frame-banded st-encoder kernel == dense attention with the additive
    temporal_band_mask (get_mask :457-471), values + gradients."""
    from vilco_tpu.kernels import frame_band as fb

    B, C, H = 2, 128, 2
    L = n_frames * fr
    bq = fr if fr >= 16 else 2 * fr       # small test blocks (HW uses 128)
    assert fb.supports(L, C, H, fr, w, block_q=bq)
    q, k, v = (jnp.asarray(rng.standard_normal((B, L, C)), jnp.float32)
               for _ in range(3))

    ref = fb._xla_ref(q, k, v, H, fr, w)
    out = fb.frame_band_attention(q, k, v, H, fr, w, bq, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def lf(q_, k_, v_):
        return jnp.sum(fb.frame_band_attention(q_, k_, v_, H, fr, w,
                                               bq, True) ** 2)

    def lr(q_, k_, v_):
        return jnp.sum(fb._xla_ref(q_, k_, v_, H, fr, w) ** 2)

    g1 = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b, nm in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   err_msg=f"d{nm}")


def test_frame_band_matches_encoder_layer_mask():
    """The kernel's band equals temporal_band_mask's semantics on the
    exact flagship geometry scaled down (fr=R*R tokens, window//2 frames),
    through the EncoderLayer fallback path."""
    from vilco_tpu.kernels import frame_band as fb
    from vilco_tpu.models.clip_matcher import temporal_band_mask

    rng = np.random.default_rng(3)
    n_frames, fr, w, H, C = 7, 16, 2, 4, 128
    L = n_frames * fr
    q, k, v = (jnp.asarray(rng.standard_normal((B_, L, C)), jnp.float32)
               for B_ in (1, 1, 1))
    # dense reference using the model's own additive mask
    split = lambda t: t.reshape(1, L, H, C // H)
    scale = (C // H) ** -0.5
    a = jnp.einsum("bqhd,bkhd->bhqk", split(q) * scale, split(k),
                   preferred_element_type=jnp.float32)
    a = a + jnp.asarray(temporal_band_mask(n_frames, fr, 2 * w + 1))[None, None]
    a = jax.nn.softmax(a, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", a, split(v)).reshape(1, L, C)
    out = fb.frame_band_attention(q, k, v, H, fr, w, 16, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("decay,mu_dt,nu_dt", [
    (True, "bfloat16", "bfloat16"),
    (False, "bfloat16", "float32"),
    (True, "float32", "float32"),
])
def test_pallas_adamw_leaf_matches_jnp(rng, decay, mu_dt, nu_dt):
    """kernels/adamw.py == FusedAdamW's jnp update expression bit-for-bit
    (same weak-typed b1*m rounding, same cast points), across state
    dtypes and the decay branch."""
    from vilco_tpu.kernels.adamw import adamw_update_leaf

    B1, B2, EPS, WD = 0.9, 0.999, 1e-8, 0.05
    mu = jnp.dtype(mu_dt)
    nu = jnp.dtype(nu_dt)
    n = 8 * 128 * 3                      # tiles to (24, 128)
    p = jnp.asarray(rng.standard_normal(n), jnp.float32).reshape(8, 128, 3)
    g = jnp.asarray(rng.standard_normal(n), jnp.float32).reshape(8, 128, 3)
    m = (jnp.asarray(rng.standard_normal(n), jnp.float32)
         .reshape(8, 128, 3).astype(mu))
    v = (jnp.abs(jnp.asarray(rng.standard_normal(n), jnp.float32))
         .reshape(8, 128, 3).astype(nu))
    lr = jnp.asarray(1e-3, jnp.float32)
    bc1 = jnp.asarray(1.0 - B1 ** 3, jnp.float32)
    bc2 = jnp.asarray(1.0 - B2 ** 3, jnp.float32)

    # the jnp path's exact expression (optim.FusedAdamW._fused::upd)
    g32 = g.astype(jnp.float32)
    m2 = (1.0 - B1) * g32 + B1 * m
    v2 = (1.0 - B2) * (g32 * g32) + B2 * v.astype(jnp.float32)
    u = (m2 / bc1.astype(m2.dtype)) / (
        jnp.sqrt(v2 / bc2.astype(v2.dtype)) + EPS)
    if decay:
        u = u + WD * p
    want_p = p - lr * u
    want_m = m2.astype(mu)
    want_v = v2.astype(nu)

    got = adamw_update_leaf(
        p, g, m, v, decay=decay, wd=WD, lr=lr, bc1=bc1, bc2=bc2,
        b1=B1, b2=B2, eps=EPS, mu_dtype=mu, nu_dtype=nu, interpret=True,
    )
    assert got is not None
    # not array_equal: the kernel compiles as ONE fused computation, where
    # XLA contracts mul+add to FMA (and may skip the bf16 m-term's
    # intermediate rounding), vs the eagerly-dispatched reference ops —
    # f32-ulp noise for f32 state, bf16-ulp for bf16 state (measured
    # maxdiff 3.7e-9 / 1.2e-5)
    bf16_state = "bfloat16" in (mu_dt, nu_dt)
    for a, b, nm in zip(got, (want_p, want_m, want_v), "pmv"):
        assert a.dtype == b.dtype, nm
        an = np.asarray(a.astype(jnp.float32))
        bn = np.asarray(b.astype(jnp.float32))
        if a.dtype == jnp.bfloat16:
            # 1 bf16 ulp at the tensor's scale: the two computations can
            # round the same f32 value to adjacent bf16 lattice points
            atol = float(np.abs(bn).max()) * 2.0 ** -7
            np.testing.assert_allclose(an, bn, rtol=0, atol=atol,
                                       err_msg=nm)
        else:
            rtol, atol = (2e-3, 2e-5) if bf16_state else (1e-6, 1e-8)
            np.testing.assert_allclose(an, bn, rtol=rtol, atol=atol,
                                       err_msg=nm)


def test_pallas_adamw_leaf_fallback_on_odd_shape():
    from vilco_tpu.kernels.adamw import adamw_update_leaf

    p = jnp.zeros((37,), jnp.float32)
    out = adamw_update_leaf(
        p, p, p, p, decay=False, wd=0.0, lr=1e-3,
        bc1=jnp.float32(0.1), bc2=jnp.float32(0.01),
        b1=0.9, b2=0.999, eps=1e-8,
        mu_dtype=jnp.float32, nu_dtype=jnp.float32, interpret=True,
    )
    assert out is None
