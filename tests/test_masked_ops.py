"""Unit tests: masked conv / layernorm / pooling vs torch references.

Each test transcribes the reference op's semantics (MQ/libs/modeling/blocks.py)
with torch on the fly and compares against the vilco_tpu JAX op.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from vilco_tpu.ops import masked as M


def _mask(rng, b, t):
    lens = rng.integers(1, t + 1, size=b)
    m = np.arange(t)[None, :] < lens[:, None]
    m[0, :] = True  # one full row
    return m


@pytest.mark.parametrize("stride,groups", [(1, 1), (2, 1), (2, 8), (1, 8)])
def test_masked_conv1d_matches_torch(rng, stride, groups):
    B, T, Cin, Cout, K = 2, 32, 8, 8, 3
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    mask = _mask(rng, B, T)
    w = rng.standard_normal((K, Cin // groups, Cout)).astype(np.float32) * 0.1
    b = rng.standard_normal((Cout,)).astype(np.float32) * 0.1

    out, out_mask = M.masked_conv1d(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(w), jnp.asarray(b),
        stride=stride, groups=groups,
    )

    # torch: Conv1d on (B, C, T), mask nearest-downsampled (blocks.py:105-131)
    tw = torch.from_numpy(np.transpose(w, (2, 1, 0)))  # (Cout, Cin/g, K)
    tx = torch.from_numpy(np.transpose(x, (0, 2, 1)))
    ty = TF.conv1d(tx, tw, torch.from_numpy(b), stride=stride,
                   padding=K // 2, groups=groups)
    tm = torch.from_numpy(mask[:, None, :].astype(np.float32))
    if stride > 1:
        tm = TF.interpolate(tm, size=T // stride, mode="nearest")
    ty = ty * tm
    ref = np.transpose(ty.numpy(), (0, 2, 1))

    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out_mask), tm.numpy().squeeze(1).astype(bool)
    )


def test_channel_layernorm_matches_torch(rng):
    B, T, C = 2, 16, 32
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    w = rng.standard_normal((C,)).astype(np.float32)
    b = rng.standard_normal((C,)).astype(np.float32)

    out = M.channel_layernorm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))

    # reference LayerNorm normalizes the channel dim with biased variance
    # (blocks.py:160-175)
    tx = torch.from_numpy(x)
    mu = tx.mean(-1, keepdim=True)
    res = tx - mu
    sigma = (res ** 2).mean(-1, keepdim=True)
    ref = res / torch.sqrt(sigma + 1e-5) * torch.from_numpy(w) + torch.from_numpy(b)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_sinusoid_encoding_matches_reference_formula():
    n, d = 64, 16
    table = M.sinusoid_encoding(n, d)

    def angle_vec(pos):
        return [pos / np.power(10000, 2 * (j // 2) / d) for j in range(d)]

    ref = np.array([angle_vec(p) for p in range(n)])
    ref[:, 0::2] = np.sin(ref[:, 0::2])
    ref[:, 1::2] = np.cos(ref[:, 1::2])
    np.testing.assert_allclose(table, ref.astype(np.float32), atol=1e-6)


def test_masked_max_pool_matches_torch(rng):
    B, T, C = 2, 32, 4
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    mask = _mask(rng, B, T)
    xm = x * mask[..., None]

    out, out_mask = M.masked_max_pool1d(
        jnp.asarray(xm), jnp.asarray(mask), kernel=3, stride=2
    )

    tx = torch.from_numpy(np.transpose(xm, (0, 2, 1)))
    ref = TF.max_pool1d(tx, kernel_size=3, stride=2, padding=1)
    ref = ref * torch.from_numpy(mask[:, None, ::2].astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(ref.numpy(), (0, 2, 1)), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(out_mask), mask[:, ::2])


def test_masked_mean(rng):
    B, T, C = 3, 10, 4
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    mask = _mask(rng, B, T)
    out = M.masked_mean(jnp.asarray(x), jnp.asarray(mask), axis=1)
    for i in range(B):
        ref = x[i][mask[i]].mean(0)
        np.testing.assert_allclose(np.asarray(out[i]), ref, atol=1e-6)
