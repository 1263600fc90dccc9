"""Optimizer + LR schedule factories.

TPU-native equivalents of make_optimizer / make_scheduler
(MQ/libs/utils/train_utils.py:68-215): AdamW/SGD with a decay/no-decay
parameter split (conv/linear kernels decay; biases, layernorms, PE, scales
and the per-class Gaussian params do not), and per-iteration
linear-warmup + cosine (or multi-step) schedules
(MQ/libs/utils/lr_schedulers.py:10-211).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from vilco_tpu.core.config import OptCfg


def weight_decay_mask(params) -> Any:
    """True where weight decay applies: only conv/dense kernels
    (train_utils.py:84-118's whitelist/blacklist split)."""

    def mask_fn(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        leafname = names[-1] if names else ""
        return leafname == "kernel" and leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_schedule(cfg: OptCfg, steps_per_epoch: int) -> optax.Schedule:
    total = cfg.epochs * steps_per_epoch
    warmup = cfg.warmup_epochs * steps_per_epoch if cfg.warmup else 0
    if cfg.schedule_type == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=max(warmup, 1),
            decay_steps=max(total + warmup, warmup + 1),
            end_value=cfg.eta_min,
        )
    # multistep (LinearWarmupMultiStepLR, lr_schedulers.py:123-211)
    boundaries = {
        warmup + s * steps_per_epoch: cfg.schedule_gamma
        for s in cfg.schedule_steps
    }
    step_fn = optax.piecewise_constant_schedule(cfg.learning_rate, boundaries)

    def sched(step):
        warm = cfg.learning_rate * jnp.minimum(step / max(warmup, 1), 1.0)
        return jnp.where(step < warmup, warm, step_fn(step))

    return sched


def make_optimizer(cfg: OptCfg, params, steps_per_epoch: int):
    sched = make_schedule(cfg, steps_per_epoch)
    # `cfg.flatten` ravels the MOMENT update into one flat buffer
    # (optax.flatten, identical math); the masked weight decay stays
    # per-tensor — the mask is defined on the original tree. Measured
    # SLOWER on TPU, faster on CPU — see RESULTS.md.
    maybe_flat = optax.flatten if cfg.flatten else (lambda t: t)
    if cfg.type.lower() == "adamw":
        mu_dtype = jnp.bfloat16 if cfg.mu_dtype == "bfloat16" else None
        if cfg.second_moment == "factored":
            # Adafactor-style factored v + momentum: optimizer state drops
            # from 2 x params (f32) to row/col stats + one (optionally
            # bf16) momentum pytree — the remaining big HBM-traffic term
            # of the flagship step after the fused kernels (RESULTS.md).
            # Factored stats depend on per-tensor shapes, so only the
            # momentum part can flatten.
            moment = optax.chain(
                optax.scale_by_factored_rms(),
                maybe_flat(optax.trace(decay=0.9,
                                       accumulator_dtype=mu_dtype)),
            )
        else:
            moment = maybe_flat(optax.scale_by_adam(mu_dtype=mu_dtype))
    else:  # SGD + momentum
        moment = maybe_flat(optax.trace(decay=cfg.momentum))
    tx = optax.chain(
        moment,
        optax.add_decayed_weights(
            cfg.weight_decay, mask=weight_decay_mask(params)
        ),
        optax.scale_by_learning_rate(sched),
    )
    return tx, sched
