"""Unit tests: dense/banded/channel attention vs direct transcriptions."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vilco_tpu.ops import attention as A


def _np_masked_attention(q, k, v, kv_mask):
    """Direct numpy transcription of MaskedMHA (blocks.py:256-263)."""
    B, Tq, H, D = q.shape
    scale = 1.0 / np.sqrt(D)
    att = np.einsum("bqhd,bkhd->bhqk", q * scale, k)
    att = np.where(kv_mask[:, None, None, :], att, -np.inf)
    att = att - att.max(-1, keepdims=True)
    e = np.exp(att)
    att = e / e.sum(-1, keepdims=True)
    vm = v * kv_mask[:, :, None, None]
    return np.einsum("bhqk,bkhd->bqhd", att, vm)


def test_masked_attention_dense(rng):
    B, T, H, D = 2, 16, 4, 8
    q, k, v = (rng.standard_normal((B, T, H, D)).astype(np.float32)
               for _ in range(3))
    mask = np.arange(T)[None, :] < np.array([[T], [10]])
    out = A.masked_attention(*map(jnp.asarray, (q, k, v)), jnp.asarray(mask))
    ref = _np_masked_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_masked_cross_attention_shapes(rng):
    B, Tq, Tk, H, D = 2, 12, 7, 2, 4
    q = rng.standard_normal((B, Tq, H, D)).astype(np.float32)
    k = rng.standard_normal((B, Tk, H, D)).astype(np.float32)
    v = rng.standard_normal((B, Tk, H, D)).astype(np.float32)
    kv_mask = np.ones((B, Tk), bool)
    kv_mask[1, 4:] = False
    q_mask = np.ones((B, Tq), bool)
    q_mask[0, 9:] = False
    out = A.masked_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(kv_mask), jnp.asarray(q_mask),
    )
    ref = _np_masked_attention(q, k, v, kv_mask) * q_mask[:, :, None, None]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("window", [4, 8])
def test_banded_attention_matches_dense_band_mask(rng, window):
    """Banded == dense attention under an explicit |i-j|<=w band mask.

    This is the semantic contract of LocalMaskedMHCA (blocks.py:871-1208).
    """
    B, T, H, D = 2, 32, 2, 8
    q, k, v = (rng.standard_normal((B, T, H, D)).astype(np.float32)
               for _ in range(3))
    mask = np.arange(T)[None, :] < np.array([[T], [T - 9]])

    out = A.banded_attention(
        *map(jnp.asarray, (q, k, v)), jnp.asarray(mask), window=window
    )

    # dense reference with band mask
    band = np.abs(np.arange(T)[:, None] - np.arange(T)[None, :]) <= window
    allow = band[None, :, :] & mask[:, None, :]
    scale = 1.0 / np.sqrt(D)
    att = np.einsum("bqhd,bkhd->bhqk", q * scale, k)
    att = np.where(allow[:, None, :, :], att, -np.inf)
    att = att - att.max(-1, keepdims=True)
    e = np.exp(att)
    att = e / e.sum(-1, keepdims=True)
    vm = v * mask[:, :, None, None]
    ref = np.einsum("bhqk,bkhd->bqhd", att, vm)
    ref = ref * mask[:, :, None, None]  # zero invalid queries
    out_np = np.asarray(out)
    np.testing.assert_allclose(out_np[mask], ref[mask], atol=1e-5)


def test_channel_attention_matches_torch(rng):
    """vs a torch transcription of ChannelAttention (blocks.py:412-437)."""
    B, T, C, H = 2, 10, 16, 4
    x = rng.standard_normal((B, T, 3, H, C // H)).astype(np.float32)
    out = A.channel_attention(jnp.asarray(x), n_head=H)

    qkv = torch.from_numpy(x).permute(2, 0, 3, 1, 4)  # (3, B, H, T, Dh)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scale = (C // H) ** -0.5
    k = k * scale
    att = (k.transpose(-1, -2) @ v).softmax(dim=-1)
    ref = (att @ q.transpose(-1, -2)).transpose(-1, -2)  # (B, H, T, Dh)
    ref = ref.permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
