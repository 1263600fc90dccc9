"""EWC / MAS importance estimation.

TPU-native equivalent of on_task_update / on_task_mas_update
(MQ/libs/cl_methods/EWC.py:24-56, MAS.py:23-57): accumulate loss gradients
over the finished task's loader; EWC importance = grad^2 of the *accumulated*
gradient (the reference backprops every batch without zeroing, so the
gradient accumulates across batches and fisher is the square of the sum —
reproduced faithfully), MAS importance = |accumulated grad|.

Per-task (importance, optpar) pytrees are stacked along a leading task axis
so the quadratic penalty (train/engine.py:reg_penalty) is one fused op.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_grad_step(model, points, cfg, cl_method: str = "naive"):
    """One jitted gradient-accumulation step: returns grads of final_loss."""
    from vilco_tpu.train.engine import CLBatchExtras, compute_losses

    def grad_fn(params, batch, cl: "CLBatchExtras", loss_norm):
        def loss_fn(p):
            outputs = model.apply(
                {"params": p}, batch["feats"], batch["mask"],
                text=batch.get("text"), text_mask=batch.get("text_mask"),
                deterministic=True,
            )
            loss, _, _ = compute_losses(
                outputs, batch, points, cfg, cl, loss_norm, cl_method, 0
            )
            return loss

        return jax.grad(loss_fn)(params)

    return jax.jit(grad_fn)


def estimate_importance(
    grad_step: Callable,
    params,
    batches: Iterable,
    cl_extras,
    loss_norm,
    mode: str = "ewc",
) -> Tuple[Any, Any]:
    """Returns (importance, optpar) pytrees for the finished task."""
    acc = None
    for batch in batches:
        g = grad_step(params, batch, cl_extras, loss_norm)
        # the reference never zeroes grads between batches -> accumulate
        acc = g if acc is None else jax.tree.map(jnp.add, acc, g)
    if acc is None:
        acc = jax.tree.map(jnp.zeros_like, params)
    if mode == "ewc":
        imp = jax.tree.map(lambda g: np.asarray(jnp.square(g)), acc)
    else:  # mas
        imp = jax.tree.map(lambda g: np.asarray(jnp.abs(g)), acc)
    optpar = jax.tree.map(np.asarray, params)
    return imp, optpar


def stack_reg_tasks(reg_list):
    """[(imp, optpar), ...] -> stacked pytrees with leading task axis."""
    if not reg_list:
        return None, None
    imps = [r[0] for r in reg_list]
    opts = [r[1] for r in reg_list]
    fisher = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *imps)
    optpar = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *opts)
    return fisher, optpar
