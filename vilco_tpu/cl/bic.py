"""BiC (bias correction) continual learning.

TPU-native equivalent of the reference BiC machinery:
  - BiasLayer (alpha, beta) per task slice of the logits
    (MQ/libs/modeling/meta_archs.py:26-36, applied :823-836)
  - 2-stage training: stage 1 trains the model on 90% of the task's data
    with softmax-T distillation; stage 2 freezes the model and trains ONLY
    the new task's bias layer on the held-out 10%
    (MQ/train_bic.py:200-439, train_bic_one_epoch
    MQ/libs/utils/train_utils.py:425-583, BiCQILSetTask perc=0.9
    MQ/libs/datasets/cl_benchmark.py:142-281)

Instead of per-slice module objects, the bias is two (num_tasks,) vectors
expanded per class by a class->task map, so applying it is one fused
elementwise op and the stage-2 step jits once.

Documented deviation: the reference's stage 2 never actually updates
alpha/beta — it builds `bias_optimizer = torch.optim.SGD(..., lr=0.001)`
(train_bic.py:622) but passes the MAIN optimizer to train_bic_one_epoch,
and the bias layers live in a plain Python list (meta_archs.py:625), so
they are in no optimizer's param groups; with all model params frozen the
stage-2 loop is a no-op. We run the training the reference visibly
intended: SGD(lr=0.001) on (alpha, beta) of the current task.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax


class BicState:
    """Host-side container for bias params + class->task slice map."""

    def __init__(self, num_classes: int, num_tasks: int):
        self.alphas = np.ones((num_tasks,), np.float32)
        self.betas = np.zeros((num_tasks,), np.float32)
        self.class_task = np.zeros((num_classes,), np.int64)
        self.num_tasks_seen = 0

    def register_task(self, task_idx: int, class_ids) -> None:
        for c in class_ids:
            self.class_task[c] = task_idx
        self.num_tasks_seen = max(self.num_tasks_seen, task_idx + 1)

    def per_class(self, upto_task: int) -> Tuple[np.ndarray, np.ndarray]:
        """Expand to per-class (alpha, beta); classes of unseen tasks get
        identity."""
        a = self.alphas[self.class_task]
        b = self.betas[self.class_task]
        seen = self.class_task <= upto_task
        return (np.where(seen, a, 1.0).astype(np.float32),
                np.where(seen, b, 0.0).astype(np.float32))


def apply_bias(cls_logits: jax.Array, alpha: jax.Array, beta: jax.Array):
    """logits * alpha[c] + beta[c] (meta_archs.py:823-836)."""
    return cls_logits * alpha[None, None, :] + beta[None, None, :]


def make_bias_stage2_step(model, points, cfg, task_idx: int,
                          class_task: np.ndarray, lr: float = 1e-3):
    """Jitted stage-2 step: optimize ONLY (alpha_j, beta_j) of the current
    task on held-out data; model params are frozen inputs. SGD at the
    reference's intended lr (train_bic.py:622 — built there but never
    stepped; see module docstring)."""
    from vilco_tpu.train.engine import CLBatchExtras, compute_losses

    class_task_j = jnp.asarray(class_task)
    tx = optax.sgd(lr)

    def loss_fn(bias, params, batch, cl: "CLBatchExtras", loss_norm):
        outputs = model.apply(
            {"params": params}, batch["feats"], batch["mask"],
            text=batch.get("text"), text_mask=batch.get("text_mask"),
            deterministic=True,
        )
        base_a, base_b = cl.bias_alpha, cl.bias_beta
        # overwrite the current task's slice with the trainable scalars
        cur = class_task_j == task_idx
        alpha = jnp.where(cur, bias["alpha"], base_a)
        beta = jnp.where(cur, bias["beta"], base_b)
        outputs = dict(outputs)
        outputs["cls_logits"] = apply_bias(
            outputs["cls_logits"], alpha, beta
        )
        loss, metrics, _ = compute_losses(
            outputs, batch, points, cfg, cl, loss_norm, "naive", 0
        )
        return loss, metrics

    @jax.jit
    def step(bias, opt_state, params, batch, cl, loss_norm):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(bias, params, batch, cl, loss_norm)
        updates, opt_state = tx.update(grads, opt_state, bias)
        bias = optax.apply_updates(bias, updates)
        return bias, opt_state, metrics

    def init(alpha0: float = 1.0, beta0: float = 0.0):
        bias = {"alpha": jnp.asarray(alpha0), "beta": jnp.asarray(beta0)}
        return bias, tx.init(bias)

    return step, init


def split_train_val(videos, perc: float = 0.9, seed: int = 0):
    """BiCQILSetTask's 90/10 split (cl_benchmark.py:159,214-235)."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(videos))
    n_train = max(1, int(round(perc * len(videos))))
    train = [videos[i] for i in idx[:n_train]]
    val = [videos[i] for i in idx[n_train:]] or train[-1:]
    return train, val
