"""Sequence-parallel halo-exchange ops == unsharded ops (8-device CPU mesh)."""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vilco_tpu.ops.attention import banded_attention
from vilco_tpu.ops.masked import masked_conv1d
from vilco_tpu.parallel.seq import seq_banded_attention, seq_masked_conv1d


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("seq",))


def _ragged_mask(rng, B, T):
    lens = rng.integers(T // 2, T + 1, size=B)
    return (np.arange(T)[None, :] < lens[:, None])


def test_seq_banded_attention_matches_unsharded(rng):
    B, T, H, D, w = 2, 256, 2, 8, 16
    q = rng.standard_normal((B, T, H, D)).astype(np.float32)
    k = rng.standard_normal((B, T, H, D)).astype(np.float32)
    v = rng.standard_normal((B, T, H, D)).astype(np.float32)
    mask = _ragged_mask(rng, B, T)

    ref = banded_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask), w
    )

    mesh = _mesh()
    fn = shard_map(
        functools.partial(seq_banded_attention, window=w, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"),
                  P(None, "seq")),
        out_specs=P(None, "seq"),
    )
    out = jax.jit(fn)(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_seq_masked_conv1d_matches_unsharded(rng):
    B, T, Cin, Cout, K = 2, 128, 6, 10, 5
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    kern = rng.standard_normal((K, Cin, Cout)).astype(np.float32) * 0.1
    bias = rng.standard_normal((Cout,)).astype(np.float32)
    mask = _ragged_mask(rng, B, T)

    ref, ref_m = masked_conv1d(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(kern),
        jnp.asarray(bias),
    )

    mesh = _mesh()
    fn = shard_map(
        functools.partial(seq_masked_conv1d, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(), P()),
        out_specs=(P(None, "seq"), P(None, "seq")),
    )
    out, out_m = jax.jit(fn)(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(kern),
        jnp.asarray(bias),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(ref_m))


def test_seq_masked_conv1d_strided(rng):
    B, T, C, K = 2, 128, 4, 3
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    kern = rng.standard_normal((K, C, C)).astype(np.float32) * 0.1
    mask = _ragged_mask(rng, B, T)

    ref, ref_m = masked_conv1d(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(kern), stride=2
    )
    mesh = _mesh()
    fn = shard_map(
        functools.partial(seq_masked_conv1d, stride=2, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P()),
        out_specs=(P(None, "seq"), P(None, "seq")),
    )
    out, out_m = jax.jit(fn)(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(kern)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(ref_m))


def test_seq_banded_attention_grads_match(rng):
    B, T, H, D, w = 1, 128, 2, 4, 16
    q = rng.standard_normal((B, T, H, D)).astype(np.float32)
    k = rng.standard_normal((B, T, H, D)).astype(np.float32)
    v = rng.standard_normal((B, T, H, D)).astype(np.float32)
    mask = np.ones((B, T), bool)

    def loss_ref(q_, k_, v_):
        return banded_attention(q_, k_, v_, jnp.asarray(mask), w).sum()

    mesh = _mesh()
    inner = shard_map(
        functools.partial(seq_banded_attention, window=w, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"),
                  P(None, "seq")),
        out_specs=P(None, "seq"),
    )

    def loss_sp(q_, k_, v_):
        return inner(q_, k_, v_, jnp.asarray(mask)).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_episode_data_parallel_matches_single_device(tmp_path):
    """enable_data_parallel shards batches over the mesh's data axis with
    params replicated; results must match the unsharded episode."""
    from vilco_tpu.bin.train_cl import main

    r1 = main(["--synthetic", "--epochs", "1", "--num-tasks", "2",
               "--workdir", str(tmp_path / "a")])
    r2 = main(["--synthetic", "--epochs", "1", "--num-tasks", "2",
               "--dp", "2", "--workdir", str(tmp_path / "b")])
    import numpy as np

    assert np.isclose(r1["final"]["avg_mAP"], r2["final"]["avg_mAP"],
                      rtol=1e-4)
    assert np.isclose(r1["final"]["avg_R1@0.5"], r2["final"]["avg_R1@0.5"],
                      rtol=1e-4)
