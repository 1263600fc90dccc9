"""EWC / MAS importance estimation.

TPU-native equivalent of on_task_update / on_task_mas_update
(MQ/libs/cl_methods/EWC.py:24-56, MAS.py:23-57). The reference calls
`optimizer.zero_grad(set_to_none=True)` at the TOP of every loader
iteration (EWC.py:38, MAS.py:39) and the optimizer's param groups cover
every model param, so after the loop `param.grad` holds ONLY the final
batch's gradient: fisher = (last-batch grad)^2, MAS importance =
|last-batch grad|. Reproduced faithfully (pinned by
tests/test_cl_lockstep.py::test_importance_lockstep).

Per-task (importance, optpar) pytrees are stacked along a leading task axis
so the quadratic penalty (train/engine.py:reg_penalty) is one fused op.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_grad_step(model, points, cfg, cl_method: str = "naive"):
    """One jitted estimation step: returns (grads of final_loss, new EMA
    loss normalizer). The normalizer must be threaded batch-to-batch: the
    reference's `model(video_list)` updates `loss_normalizer` in place on
    every forward of the estimation loop, so the final batch's gradient
    (the one that becomes fisher) sees the EMA'd norm, not the initial."""
    from vilco_tpu.train.engine import CLBatchExtras, compute_losses

    def grad_fn(params, batch, cl: "CLBatchExtras", loss_norm):
        def loss_fn(p):
            outputs = model.apply(
                {"params": p}, batch["feats"], batch["mask"],
                text=batch.get("text"), text_mask=batch.get("text_mask"),
                deterministic=True,
            )
            loss, _, new_norm = compute_losses(
                outputs, batch, points, cfg, cl, loss_norm, cl_method, 0
            )
            return loss, new_norm

        grads, new_norm = jax.grad(loss_fn, has_aux=True)(params)
        return grads, new_norm

    return jax.jit(grad_fn)


def estimate_importance(
    grad_step: Callable,
    params,
    batches: Iterable,
    cl_extras,
    loss_norm,
    mode: str = "ewc",
) -> Tuple[Any, Any, Any]:
    """Returns (importance, optpar, loss_norm) for the finished task.

    The final loss_norm matters to the episode composition: the
    reference's on_task_update forwards run with is_training semantics,
    so the model's loss-normalizer EMA keeps advancing during estimation
    and the NEXT task trains from that advanced value (EWC.py:37-41 with
    meta_archs.py:1454-1458; the normalizer is a plain attribute, not
    state_dict content, so even best-checkpoint reloads keep it)."""
    # the reference zeroes grads before every backward (EWC.py:38), so
    # only the LAST batch's gradient survives its loop; the loss
    # normalizer EMA still advances on every forward, so each batch runs
    # through grad_step to thread the norm even though only the final
    # grads are kept
    acc = None
    for batch in batches:
        acc, loss_norm = grad_step(params, batch, cl_extras, loss_norm)
    if acc is None:
        acc = jax.tree.map(jnp.zeros_like, params)
    if mode == "ewc":
        imp = jax.tree.map(lambda g: np.asarray(jnp.square(g)), acc)
    else:  # mas
        imp = jax.tree.map(lambda g: np.asarray(jnp.abs(g)), acc)
    optpar = jax.tree.map(np.asarray, params)
    return imp, optpar, loss_norm


def stack_reg_tasks(reg_list):
    """[(imp, optpar), ...] -> stacked pytrees with leading task axis."""
    if not reg_list:
        return None, None
    imps = [r[0] for r in reg_list]
    opts = [r[1] for r in reg_list]
    fisher = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *imps)
    optpar = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *opts)
    return fisher, optpar
