"""Gradient accumulation (reference `config.train.accumulation_step`,
VQ/config/config.py:75 + VQ/func/train_anchor.py:88-106).

Exactness argument used here: give the accumulated step K identical
micro-batches (the batch is the micro-batch duplicated K times) with all
stochasticity off; every micro then produces the same gradient g, the
accumulated mean is exactly g, and with momentum-free SGD the updated
params must match a single micro-batch step. For MQ the loss-normalizer
EMA is pinned at its fixed point (init_loss_norm == the batch's num_pos)
so micro 2 sees the same normalizer micro 1 did.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vilco_tpu.data.synthetic import make_batch, tiny_config
from vilco_tpu.models.point_transformer import (
    PointTransformer,
    level_lengths,
)
from vilco_tpu.ops.assign import generate_points
from vilco_tpu.train.engine import (
    CLBatchExtras,
    TrainState,
    make_train_step,
)


def _dup(batch, k):
    return {kk: jnp.concatenate([v] * k, axis=0) for kk, v in batch.items()}


def test_mq_accumulation_matches_single_micro_step():
    cfg = tiny_config(train_cfg={"dropout": 0.0, "droppath": 0.0})
    model = PointTransformer(cfg.model, cfg.cl_cfg)
    rng = np.random.default_rng(0)
    mb = {k: jnp.asarray(v)
          for k, v in make_batch(rng, cfg.loader.batch_size, cfg).items()}
    params = model.init(jax.random.PRNGKey(0), mb["feats"], mb["mask"],
                        deterministic=True)["params"]
    points = jnp.asarray(generate_points(
        level_lengths(cfg.model), cfg.model.fpn_strides,
        cfg.model.regression_range,
    ))
    cl = CLBatchExtras(class_mask=jnp.ones((cfg.model.num_classes,), bool))
    tx = optax.sgd(0.05)

    def fresh_state(p):
        p = jax.tree.map(lambda x: jnp.array(x, copy=True), p)
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=p,
            opt_state=tx.init(p),
            loss_normalizer=jnp.asarray(
                cfg.train_cfg.init_loss_norm, jnp.float32),
            rng=jax.random.PRNGKey(7),
        )

    # probe the micro-batch's num_pos, then pin the normalizer EMA at its
    # fixed point so both micro-batches of the accumulated step see the
    # same normalizer
    probe = make_train_step(model, tx, points, cfg)
    _, m0, _ = probe(fresh_state(params), mb, cl)
    cfg = cfg.updated(train_cfg=cfg.train_cfg.updated(
        init_loss_norm=float(m0["num_pos"])))

    step1 = make_train_step(model, tx, points, cfg)
    s1, m1, _ = step1(fresh_state(params), mb, cl)

    step2 = make_train_step(model, tx, points, cfg, accumulation_steps=2)
    s2, m2, _ = step2(fresh_state(params), _dup(mb, 2), cl)

    # normalizer stayed at the fixed point on both paths
    np.testing.assert_allclose(float(s2.loss_normalizer),
                               float(s1.loss_normalizer), rtol=1e-6)
    np.testing.assert_allclose(float(m2["num_pos"]), float(m1["num_pos"]))
    np.testing.assert_allclose(float(m2["final_loss"]),
                               float(m1["final_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_mq_accumulation_rejects_indivisible_batch():
    cfg = tiny_config()
    model = PointTransformer(cfg.model, cfg.cl_cfg)
    rng = np.random.default_rng(0)
    mb = {k: jnp.asarray(v)
          for k, v in make_batch(rng, 3, cfg).items()}
    params = model.init(jax.random.PRNGKey(0), mb["feats"], mb["mask"],
                        deterministic=True)["params"]
    points = jnp.asarray(generate_points(
        level_lengths(cfg.model), cfg.model.fpn_strides,
        cfg.model.regression_range,
    ))
    tx = optax.sgd(0.05)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
        loss_normalizer=jnp.asarray(100.0, jnp.float32),
        rng=jax.random.PRNGKey(7),
    )
    cl = CLBatchExtras(class_mask=jnp.ones((cfg.model.num_classes,), bool))
    step = make_train_step(model, tx, points, cfg, accumulation_steps=2)
    with pytest.raises(ValueError, match="not divisible"):
        step(state, mb, cl)


class _Deterministic:
    """Forwards model.apply with deterministic=True so both micro-batches
    of the duplicated batch take identical dropout (i.e. none)."""

    def __init__(self, m):
        self._m = m

    def apply(self, variables, *args, deterministic=False, rngs=None, **kw):
        return self._m.apply(variables, *args, deterministic=True, **kw)


def test_vq_accumulation_matches_single_micro_step():
    from vilco_tpu.models.clip_matcher import tiny_clip_matcher
    from vilco_tpu.train.vq_engine import VQTrainState, make_vq_train_step

    model = tiny_clip_matcher()
    B, T, S = 2, 3, 16
    rng = np.random.default_rng(1)
    mb = {
        "clip": jnp.asarray(rng.standard_normal((B, T, S, S, 3)),
                            jnp.float32),
        "query": jnp.asarray(rng.standard_normal((B, S, S, 3)),
                             jnp.float32),
        "clip_bbox": jnp.asarray(
            np.tile(np.array([0.2, 0.2, 0.6, 0.6], np.float32),
                    (B, T, 1))),
        "clip_with_bbox": jnp.ones((B, T), jnp.float32),
        "before_query": jnp.ones((B, T), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), mb["clip"], mb["query"],
                        deterministic=True)["params"]
    tx = optax.sgd(0.05)

    def fresh_state(p):
        p = jax.tree.map(lambda x: jnp.array(x, copy=True), p)
        return VQTrainState(
            step=jnp.zeros((), jnp.int32), params=p,
            opt_state=tx.init(p), rng=jax.random.PRNGKey(3),
        )

    det = _Deterministic(model)
    step1 = make_vq_train_step(det, tx)
    s1, m1 = step1(fresh_state(params), mb)

    step2 = make_vq_train_step(det, tx, accumulation_steps=2)
    s2, m2 = step2(fresh_state(params), _dup(mb, 2))

    np.testing.assert_allclose(float(m2["final_loss"]),
                               float(m1["final_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_accum_cli_episode(tmp_path):
    """--accum-steps through the full CL episode loop: effective batch
    doubles (loader yields K*B), metrics stay finite, and the VQ runner
    accepts the flag too."""
    from vilco_tpu.bin import train_cl

    res = train_cl.main([
        "--synthetic", "--workdir", str(tmp_path / "mq"),
        "--epochs", "1", "--num-tasks", "2", "--accum-steps", "2",
    ])
    assert np.isfinite(res["final"]["avg_mAP"])

    res = train_cl.main([
        "--task", "vq", "--synthetic", "--workdir", str(tmp_path / "vq"),
        "--epochs", "1", "--num-tasks", "2", "--accum-steps", "2",
    ])
    assert np.isfinite(res["final"]["avg_tAP25"])
