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
    if cfg.type.lower() == "adamw":
        mu_dtype = jnp.bfloat16 if cfg.mu_dtype == "bfloat16" else None
        if cfg.second_moment == "factored":
            # Adafactor-style factored v + momentum: optimizer state drops
            # from 2 x params (f32) to row/col stats + one (optionally
            # bf16) momentum pytree — the remaining big HBM-traffic term
            # of the flagship step after the fused kernels (RESULTS.md)
            tx = optax.chain(
                optax.scale_by_factored_rms(),
                optax.trace(decay=0.9, accumulator_dtype=mu_dtype),
                optax.add_decayed_weights(
                    cfg.weight_decay, mask=weight_decay_mask(params)
                ),
                optax.scale_by_learning_rate(sched),
            )
        else:
            tx = optax.chain(
                optax.scale_by_adam(mu_dtype=mu_dtype),
                optax.add_decayed_weights(
                    cfg.weight_decay, mask=weight_decay_mask(params)
                ),
                optax.scale_by_learning_rate(sched),
            )
    else:  # SGD + momentum
        tx = optax.chain(
            optax.trace(decay=cfg.momentum),
            optax.add_decayed_weights(
                cfg.weight_decay, mask=weight_decay_mask(params)
            ),
            optax.scale_by_learning_rate(sched),
        )
    if cfg.flatten:
        # NOTE: masked weight decay must see the ORIGINAL tree, so the
        # flat wrapper goes around the whole chain only when the mask is
        # trivial; otherwise wrap adam alone and keep decay per-tensor.
        tx = _flatten_keeping_decay(cfg, params, sched)
    return tx, sched


def _flatten_keeping_decay(cfg: OptCfg, params, sched):
    """optax.flatten over the moment updates; decayed weights + lr stay
    outside (decay is masked per-tensor and already cheap — one
    multiply-add per leaf fuses into the unravel consumers)."""
    mu_dtype = jnp.bfloat16 if cfg.mu_dtype == "bfloat16" else None
    if cfg.second_moment == "factored":
        # factored stats depend on per-tensor shapes — cannot flatten;
        # flatten only the momentum part
        inner = optax.chain(
            optax.scale_by_factored_rms(),
            optax.flatten(optax.trace(decay=0.9,
                                      accumulator_dtype=mu_dtype)),
        )
    else:
        inner = optax.flatten(optax.scale_by_adam(mu_dtype=mu_dtype))
    return optax.chain(
        inner,
        optax.add_decayed_weights(
            cfg.weight_decay, mask=weight_decay_mask(params)
        ),
        optax.scale_by_learning_rate(sched),
    )
