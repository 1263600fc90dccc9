"""VQ training engine: anchor losses, HNM, jitted train/eval steps.

TPU-native equivalent of VQ/func/train_anchor.py:54-343 +
VQ/utils/loss_utils.py (get_losses_with_anchor :12-133, GiouLoss :221-269,
focal_loss :289-312) and the HNM replication
(VQ/dataset/dataset_utils.py:199-260).

Batch format (static shapes):
  clip:            (B, T, H, W, 3) frames or (B, T, h, w, C) features
  query:           (B, Hq, Wq, 3) or (B, h, w, C)
  clip_bbox:       (B, T, 4) normalized xyxy GT box per frame
  clip_with_bbox:  (B, T) float 1 where the frame contains the object
  before_query:    (B, T) float 1 for frames at/before the query frame
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vilco_tpu.ops.anchors import assign_anchor_labels, giou


class VQTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any = None
    opt_state: Any = None
    rng: jax.Array = None


def make_vq_optimizer(lr: float, weight_decay: float,
                      freeze_backbone: bool = True,
                      grad_max: float = 20.0,
                      milestones: tuple = (7000, 14000, 20000, 25000),
                      gamma: float = 0.3):
    """The reference VQ optimizer stack, end to end:
      - global grad-norm clip at `grad_max` (train_anchor.py:104,
        config.train.grad_max=20)
      - AdamW over the TRAINABLE params only (VQ/utils/train_utils.py:8-15:
        with `fix_backbone` the ViT's params get `requires_grad=False` and
        are filtered OUT of the optimizer — no decay, no Adam state)
      - MultiStepLR: lr * gamma^(#milestones passed), stepped per
        optimizer update (train_utils.py:28-32 + train_anchor.py:107;
        milestones from config/train*.yaml:58). No warmup — the config's
        `schedular_warmup_iter` is dead, get_schedular ignores it.

    The frozen `backbone` subtree maps to `optax.set_to_zero()` via
    `multi_transform`: zero updates, zero optimizer state (saves m/v for
    the ~86M frozen ViT-B params: ~0.7 GB HBM + their per-step read/write
    traffic), and no spurious `lr*wd` decay of the frozen weights. The
    model stop-gradients the frozen backbone (clip_matcher.py:339-340),
    so the global clip norm sees exactly the torch trainable grads."""
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def sched(step):
        k = jnp.sum(ms <= jnp.asarray(step, jnp.float32))
        return lr * gamma ** k

    tx = optax.chain(
        optax.clip_by_global_norm(grad_max),
        optax.adamw(sched, weight_decay=weight_decay),
    )
    def labels(params):
        # frozen_bn running stats live in the params tree (bn_mean /
        # bn_var leaves) but are torch BUFFERS — never in the reference
        # optimizer, so they must get neither Adam updates nor lr*wd
        # decay. The backbone subtree is frozen per fix_backbone.
        def leaf_label(path, _):
            keys = [str(getattr(p, "key", "")) for p in path]
            if keys and keys[-1] in ("bn_mean", "bn_var"):
                return "freeze"
            if freeze_backbone and keys and keys[0] == "backbone":
                return "freeze"
            return "train"

        return jax.tree_util.tree_map_with_path(leaf_label, params)

    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


def replicate_for_hnm(preds_or_gts: dict, b: int) -> dict:
    """(clip_i, query_j) pairing for hard-negative mining: clip index varies
    slowest; off-diagonal pairs become pure negatives
    (dataset_utils.py:199-260)."""
    i_idx = jnp.repeat(jnp.arange(b), b)   # clip
    j_idx = jnp.tile(jnp.arange(b), b)     # query
    out = {}
    diag = (i_idx == j_idx)
    for k, v in preds_or_gts.items():
        if k == "query":
            out[k] = v[j_idx]
        elif k == "clip_with_bbox":
            out[k] = jnp.where(diag[:, None], v[i_idx], 0.0)
        elif k == "before_query":
            out[k] = jnp.where(diag[:, None], v[i_idx], 1.0)
        elif k == "clip_bbox":
            neg = jnp.array([0.0, 0.0, 1e-4, 1e-4])
            out[k] = jnp.where(diag[:, None, None], v[i_idx],
                               neg[None, None, :])
        else:
            out[k] = v[i_idx]
    return out


def vq_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """VQ's focal variant (loss_utils.py:289-312): positives weighted
    (1 - alpha), negatives alpha. Elementwise."""
    t = targets.astype(jnp.float32)
    x = logits.astype(jnp.float32)
    bce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p = jax.nn.sigmoid(x)
    pt = jnp.where(t == 1, p, 1 - p)
    a = jnp.where(t == 1, 1 - alpha, alpha)
    return a * (1 - pt) ** gamma * bce


def vq_losses(
    preds: dict,
    gts: dict,
    positive_threshold: float = 0.2,
    positive_topk: int = 5,
    weight_center: float = 1.0,
    weight_hw: float = 1.0,
    weight_giou: float = 0.3,
    weight_prob: float = 100.0,
):
    """get_losses_with_anchor (loss_utils.py:12-133), vectorized & jittable.

    Default weights follow VQ/config/config.py:56-62; total loss is the
    weighted sum as in train_anchor.
    """
    pred_center = preds["center"]      # (B, T, N, 2)
    pred_hw = preds["hw"]
    pred_bbox = preds["bbox"]
    pred_prob = preds["prob"]          # (B, T, N)
    anchors = preds["anchors_xyxy"]    # (N, 4)
    B, T, N = pred_prob.shape

    gt_bbox = gts["clip_bbox"].astype(jnp.float32)         # (B, T, 4)
    gt_prob = gts["clip_with_bbox"].astype(jnp.float32)    # (B, T)
    before_query = gts["before_query"].astype(jnp.float32)

    gt_center = 0.5 * (gt_bbox[..., :2] + gt_bbox[..., 2:])
    gt_hw = gt_center - gt_bbox[..., :2]

    assign = assign_anchor_labels(
        anchors, gt_bbox, iou_threshold=positive_threshold,
        topk=positive_topk,
    )                                                      # (B, T, N)
    positive = assign & (gt_prob[..., None] > 0)
    # Reference quirk (loss_utils.py:47-49): a batch with zero positives
    # (no GT at all, or the top-k fallback landing only on no-bbox frames)
    # gets ONE fake positive at the first anchor of the first frame, so
    # the bbox losses stay defined (the reference's zero-tensor else
    # branch is dead code — after positive[:1]=True the sum is always >0)
    # and the focal loss sees that one positive target.
    no_pos = ~jnp.any(positive)
    fake = jnp.zeros_like(positive).at[0, 0, 0].set(True)
    positive = jnp.where(no_pos, fake, positive)
    pos_f = positive.astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(pos_f), 1.0)

    # L1 center / hw over positives
    l1 = lambda p, g: jnp.sum(
        jnp.abs(p - g[..., None, :]) * pos_f[..., None]
    ) / (num_pos * p.shape[-1])
    loss_center = l1(pred_center, gt_center)
    loss_hw = l1(pred_hw, gt_hw)

    # GIoU over positives
    iou_v, giou_v = giou(pred_bbox, gt_bbox[..., None, :])
    loss_giou = jnp.sum((1.0 - giou_v) * pos_f) / num_pos

    # occupancy focal loss over before-query anchors
    bq = jnp.broadcast_to(before_query[..., None], pred_prob.shape)
    fl = vq_focal_loss(pred_prob, pos_f)
    denom = jnp.maximum(jnp.sum(bq), 1.0)
    loss_prob = jnp.sum(fl * bq) / denom

    total = (
        weight_center * loss_center
        + weight_hw * loss_hw
        + weight_giou * loss_giou
        + weight_prob * loss_prob
    )

    # top prediction per frame (for logging / eval)
    top_idx = jnp.argmax(pred_prob, axis=-1)               # (B, T)
    take = lambda a: jnp.take_along_axis(
        a, top_idx[..., None, None], axis=2
    )[..., 0, :]
    top = {
        "bbox": take(pred_bbox),                           # (B, T, 4)
        "prob": jnp.take_along_axis(pred_prob, top_idx[..., None],
                                    axis=-1)[..., 0],
    }
    metrics = {
        "loss_center": loss_center,
        "loss_hw": loss_hw,
        "loss_giou": loss_giou,
        "loss_prob": loss_prob,
        "final_loss": total,
        "num_pos": jnp.sum(pos_f),
        "mean_iou": jnp.sum(iou_v * pos_f) / num_pos,
    }
    return total, metrics, top


def make_vq_train_step(
    model,
    tx,
    *,
    use_hnm: bool = False,
    from_features: bool = False,
    positive_threshold: float = 0.2,
    positive_topk: int = 5,
    reg_lambda: float = 0.0,
    accumulation_steps: int = 1,
    deterministic: bool = False,
) -> Callable:
    """Jitted VQ train step with optional HNM and EWC/MAS penalty.

    `accumulation_steps=K` reproduces the reference's
    `config.train.accumulation_step` (VQ/config/config.py:75, used at
    VQ/func/train_anchor.py:88-106): the batch is split into K
    micro-batches whose gradients accumulate across a `lax.scan` (one
    micro-batch of activations live at a time) before a single optimizer
    update on the mean gradient. The micro-batch is the reference's
    loader batch, so the HNM negative pool is built per micro-batch,
    exactly as the reference mines within each loader batch.
    """

    def loss_fn(params, mb, drng, reg):
        preds = model.apply(
            {"params": params}, mb["clip"], mb["query"],
            from_features=from_features, hnm=use_hnm,
            deterministic=deterministic, rngs={"dropout": drng},
        )
        gts = {k: mb[k] for k in
               ("clip_bbox", "clip_with_bbox", "before_query")}
        if use_hnm:
            gts = replicate_for_hnm(gts, mb["clip"].shape[0])
        loss, metrics, _ = vq_losses(
            preds, gts, positive_threshold=positive_threshold,
            positive_topk=positive_topk,
        )
        if reg is not None:
            from vilco_tpu.train.engine import reg_penalty

            pen = reg_penalty(params, reg[0], reg[1], reg_lambda)
            loss = loss + pen
            metrics["reg_penalty"] = pen
        return loss, metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: VQTrainState, batch: dict, reg=None):
        rng, drng = jax.random.split(state.rng)

        if accumulation_steps > 1:
            K = accumulation_steps
            b = batch["clip"].shape[0]
            if b % K:
                raise ValueError(
                    f"batch size {b} not divisible by "
                    f"accumulation_steps {K}"
                )
            micro = jax.tree.map(
                lambda x: x.reshape((K, b // K) + x.shape[1:]), batch
            )
            gzero = jax.tree.map(
                lambda p: jnp.zeros(p.shape, p.dtype), state.params
            )

            def body(gacc, xs):
                mb, dk = xs
                (_, metrics_k), g = grad_fn(state.params, mb, dk, reg)
                return jax.tree.map(jnp.add, gacc, g), metrics_k

            grads, mseq = jax.lax.scan(
                body, gzero, (micro, jax.random.split(drng, K))
            )
            grads = jax.tree.map(lambda g: g / K, grads)
            metrics = jax.tree.map(lambda m: m.mean(0), mseq)
        else:
            (_, metrics), grads = grad_fn(state.params, batch, drng, reg)
        if hasattr(tx, "fused_apply"):
            # single-pass AdamW (optim.py::FusedAdamW)
            params, opt_state = tx.fused_apply(
                grads, state.opt_state, state.params
            )
        else:
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        ), metrics

    return jax.jit(step, donate_argnums=(0,))


def make_vq_eval_step(model, *, from_features: bool = False):
    """Per-frame top bbox + prob for sliding-window inference
    (task_inference_predict.py:30-150)."""

    def step(params, clip, query):
        preds = model.apply(
            {"params": params}, clip, query,
            from_features=from_features, deterministic=True,
        )
        prob = jax.nn.sigmoid(preds["prob"])               # (B, T, N)
        top_idx = jnp.argmax(prob, axis=-1)
        bbox = jnp.take_along_axis(
            preds["bbox"], top_idx[..., None, None], axis=2
        )[..., 0, :]
        top_prob = jnp.take_along_axis(prob, top_idx[..., None],
                                       axis=-1)[..., 0]
        return bbox, top_prob

    return jax.jit(step)
