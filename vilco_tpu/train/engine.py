"""Jitted train/eval engine for the point-transformer tasks.

TPU-native equivalent of the reference L4 layer (train_one_epoch / losses /
valid loops, MQ/libs/utils/train_utils.py:278-423 + meta_archs.py:1374-1524).
The CL episode loop stays in Python (vilco_tpu/cl/episode.py); each step is a
single jitted `train_step(state, batch, cl)` whose shapes are static across
every task, so the XLA executable survives task transitions (class growth is
a mask, not tensor surgery — SURVEY.md section 7).

Everything runs in one fused step on device: forward, label assignment,
focal/DIoU losses with Gaussian weighting, the auxiliary label-involved and
SSL-contrastive losses, EWC/MAS penalties, distillation, grad clip, AdamW
update, loss-normalizer EMA, adapter-EMA update.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from vilco_tpu.core.config import Config
from vilco_tpu.ops.assign import label_points
from vilco_tpu.ops.losses import ctr_diou_loss_1d, sigmoid_focal_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    loss_normalizer: jax.Array           # EMA of #positives (meta_archs.py:596)
    rng: jax.Array
    adapter_ema: Any = None              # EMA copy of CL adapter params
    ema_params: Any = None               # optional full-model EMA
    # persistent bf16 OVERLAY of the matmul kernels for forward/backward:
    # a path-keyed dict (optim.make_compute_copy) injected over `params`
    # via inject_adapters when opt.param_compute_dtype=bfloat16 —
    # `params` stays the f32 master the optimizer updates
    params_c: Any = None


class CLBatchExtras(struct.PyTreeNode):
    """Per-step CL inputs with static presence decided by the step factory."""

    class_mask: jax.Array                         # (C,) bool — seen classes
    prev_logits: Optional[jax.Array] = None       # (B, P, C) distill target
    #   PROBABILITIES (sigmoid / softmax-T snapshots, see snapshot_logits)
    memory_bank: Optional[jax.Array] = None       # (M, D) SSL negatives
    memory_ptr: Optional[jax.Array] = None        # () int32
    fisher: Any = None                            # stacked (K, ...) pytrees
    optpar: Any = None
    bias_alpha: Optional[jax.Array] = None        # (C,) BiC per-class alpha
    bias_beta: Optional[jax.Array] = None         # (C,) BiC per-class beta


def _is_adapter_path(path) -> bool:
    return any(getattr(p, "key", None) == "adapter" for p in path)


def adapter_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda p, _: _is_adapter_path(p), params
    )


def merge_adapter_params(params, adapter_params):
    """Swap adapter leaves of `params` for those in `adapter_params`."""
    return jax.tree_util.tree_map_with_path(
        lambda p, a, b: b if _is_adapter_path(p) else a,
        params, adapter_params,
    )


def compute_losses(
    outputs: dict,
    batch: dict,
    points: jax.Array,
    cfg: Config,
    cl: CLBatchExtras,
    loss_normalizer: jax.Array,
    cl_method: str,
    n_known: int,
):
    """The reference `losses` (meta_archs.py:1374-1524), vectorized."""
    tc = cfg.train_cfg
    C = cfg.model.num_classes
    cls_logits = outputs["cls_logits"]        # (B, P, C) f32
    offsets = outputs["offsets"]              # (B, P, 2)
    valid = outputs["fpn_mask"]               # (B, P) bool
    class_mask_f = cl.class_mask.astype(jnp.float32)

    tgt = label_points(
        points,
        batch["gt_segments"], batch["gt_labels"], batch["gt_valid"],
        C, outputs["gaussians"],
        center_sample=tc.center_sample,
        center_sample_radius=tc.center_sample_radius,
    )

    pos_mask = tgt.pos_mask & valid                        # (B, P)
    num_pos = jnp.sum(pos_mask.astype(jnp.float32))
    new_norm = 0.9 * loss_normalizer + 0.1 * jnp.maximum(num_pos, 1.0)
    norm = new_norm

    # --- classification: focal * Gaussian weight (negatives weight 1.0)
    n_seen = jnp.sum(class_mask_f)
    gt_target = tgt.cls * (1.0 - tc.label_smoothing)
    gt_target = gt_target + tc.label_smoothing / (n_seen + 1.0)
    cls_l = sigmoid_focal_loss(cls_logits, gt_target)      # (B, P, C)
    cls_l = cls_l * class_mask_f[None, None, :]
    cls_l = jnp.sum(cls_l, axis=-1)                        # (B, P)
    if tc.use_gaussian_weights:
        w_cls = jnp.where(pos_mask, tgt.prob_cls, 1.0)
    else:
        w_cls = 1.0
    cls_loss = jnp.sum(cls_l * w_cls * valid) / norm

    # --- label-involved (AL) loss (meta_archs.py:1437-1449)
    if tc.al_loss_weight > 0 and C > 1:
        masked_logits = jnp.where(valid[..., None], cls_logits, -1e7)
        masked_logits = jnp.where(cl.class_mask[None, None, :],
                                  masked_logits, -1e7)
        probs = jax.nn.softmax(masked_logits, axis=-1)
        max_per_class = jnp.max(probs, axis=1)             # (B, C)
        involved = jnp.zeros_like(max_per_class)
        lbl = jnp.clip(batch["gt_labels"], 0, C - 1)
        involved = involved.at[
            jnp.arange(lbl.shape[0])[:, None], lbl
        ].max(batch["gt_valid"].astype(jnp.float32))
        p = jnp.clip(max_per_class, 1e-7, 1.0 - 1e-7)
        al = -involved * jnp.log(p) - (1 - involved) * jnp.log1p(-p)
        al = al * class_mask_f[None, :]
        al_loss = jnp.sum(al) / norm
    else:
        al_loss = jnp.zeros(())

    # --- regression: DIoU * Gaussian weights on positives
    reg_l = ctr_diou_loss_1d(offsets, jnp.maximum(tgt.reg, 0.0))  # (B, P)
    if tc.use_gaussian_weights:
        w_reg = 0.5 * (tgt.prob_reg_left + tgt.prob_reg_right) * tgt.prob_cls
    else:
        w_reg = 1.0
    reg_loss = jnp.sum(reg_l * w_reg * pos_mask) / norm
    reg_loss = jnp.where(num_pos > 0, reg_loss, 0.0)

    loss_weight = tc.loss_weight if tc.loss_weight > 0 else 1.0
    final = cls_loss + reg_loss * loss_weight + al_loss * tc.al_loss_weight
    metrics = {
        "cls_loss": cls_loss,
        "reg_loss": reg_loss,
        "al_loss": al_loss,
        "num_pos": num_pos,
    }

    # --- L2P pull constraint (meta_archs.py:1476-1479)
    if "reduce_sim" in outputs and n_known > 0:
        final = final - 0.1 * outputs["reduce_sim"]
        metrics["reduce_sim"] = outputs["reduce_sim"]

    # --- distillation (iCaRL BCE / BiC soft-target, meta_archs.py:1480-1519)
    # The reference computes a PER-LEVEL mean over time and SUMS the
    # levels (each level contributes its mean regardless of length), so
    # the concatenated (B, P, C) form needs per-point weights 1/T_l.
    # cl.prev_logits carries PROBABILITIES: sigmoid snapshots for iCaRL
    # (train_cl.py:235), softmax(cur/T) over the first n_known classes
    # (zero-padded to C) for BiC (train_bic.py:433). Documented
    # deviations: the reference reads batch element 0's logits against
    # the last element's snapshot (train_utils.py:327-333 — only
    # well-defined at B=1); we average per-sample terms over the batch.
    # It also includes padded positions in the per-level means; we
    # normalize over valid positions (identical on full-length clips).
    if cl.prev_logits is not None and n_known > 0:
        from vilco_tpu.models.point_transformer import level_lengths

        lens = level_lengths(cfg.model)
        level_id = np.repeat(np.arange(len(lens)), lens)       # (P,)
        lvl_onehot = jnp.asarray(
            np.eye(len(lens), dtype=np.float32)[level_id])     # (P, L)
        vf = valid.astype(jnp.float32)                          # (B, P)
        counts = vf @ lvl_onehot                                # (B, L)
        if cl_method == "bic":
            T = 2.0
            logp = jax.nn.log_softmax(
                cls_logits[..., :n_known] / T, axis=-1)
            per_pt = -jnp.sum(
                cl.prev_logits[..., :n_known] * logp, axis=-1)  # (B, P)
            factor = cfg.cl_cfg.dist_factor * (n_known / C)
        else:  # icarl: BCE-with-logits vs sigmoid snapshots, summed
            # over the first n_known classes (meta_archs.py:1513)
            x = cls_logits[..., :n_known]
            t = cl.prev_logits[..., :n_known]
            bce = (jnp.maximum(x, 0) - x * t
                   + jnp.log1p(jnp.exp(-jnp.abs(x))))
            per_pt = jnp.sum(bce, axis=-1)                      # (B, P)
            factor = cfg.cl_cfg.dist_factor
        lvl_sums = (per_pt * vf) @ lvl_onehot                   # (B, L)
        per_sample = jnp.sum(
            lvl_sums / jnp.maximum(counts, 1.0), axis=-1)       # (B,)
        dist = factor * jnp.mean(per_sample)
        final = final + dist
        metrics["dist_loss"] = dist

    # --- narration-SSL InfoNCE vs the memory bank
    # (masked_contrastive_loss, meta_archs.py:1351-1372)
    if "narration_feat" in outputs and cl.memory_bank is not None:
        ssl = narration_ssl_loss(
            outputs["narration_feat"], outputs["video_feat"],
            outputs["narration_valid"], cl.memory_bank, cl.memory_ptr,
            tc.temperature,
        ) * cfg.cl_cfg.ssl_factor
        final = final + ssl
        metrics["ssl_loss"] = ssl

    # --- EWC / MAS quadratic penalty (cl_methods/EWC.py:6-22, MAS.py:6-21)
    # applied over stacked per-task (fisher, optpar) pytrees
    # handled in the step (needs params); see make_train_step.

    metrics["final_loss"] = final
    return final, metrics, new_norm


def _ring_update(bank, ptr, feats, valid):
    """Ring-buffer write of valid rows (MemoryBank.update,
    meta_archs.py:44-57), jit-safe via drop-mode scatter."""
    M = bank.shape[0]
    order = jnp.cumsum(valid.astype(jnp.int32)) - 1        # (B,)
    idx = jnp.where(valid, (ptr + order) % M, M)           # M = out of bounds
    bank = bank.at[idx].set(feats, mode="drop")
    new_ptr = (ptr + jnp.sum(valid.astype(jnp.int32))) % M
    return bank, new_ptr


def narration_ssl_loss(nf, vf, narration_valid, bank, ptr,
                       temperature: float):
    """masked_contrastive_loss (meta_archs.py:1350-1371) with the
    reference's call-site quirk reproduced: the memory bank is UPDATED
    with the batch's (detached) narration features BEFORE the loss
    (:941-943), so every valid row sees its own narration among the
    negatives — the MoCo self-collision the reference actually trains
    with. The bank stays gradient-free (torch stores it under no_grad).
    Masked rows are excluded by weight (the reference indexes [mask] and
    cross_entropy means over the kept rows)."""
    nvalid = narration_valid.astype(jnp.float32)
    neg_bank, _ = _ring_update(
        bank, ptr, jax.lax.stop_gradient(nf), narration_valid)
    pos = jnp.sum(nf * vf, axis=-1, keepdims=True)         # (B, 1)
    neg_t = nf @ neg_bank.T                                # (B, M)
    neg_v = vf @ neg_bank.T
    lt = jnp.concatenate([pos, neg_t], axis=1) / temperature
    lv = jnp.concatenate([pos, neg_v], axis=1) / temperature
    ce = lambda l: -jax.nn.log_softmax(l, axis=-1)[:, 0]
    per_row = 0.5 * (ce(lt) + ce(lv))
    denom = jnp.maximum(jnp.sum(nvalid), 1.0)
    return jnp.sum(per_row * nvalid) / denom


def cast_input_features(batch, compute_dtype: str):
    """Host-side cast of the float input-feature tensors (feats/txt) to
    the model compute dtype BEFORE device transfer. The model consumes
    them at that dtype anyway, so the numerics are bit-identical to the
    on-device convert this replaces — but the convert was 2.44 ms per
    4-step dispatch on the flagship (a (4,16,1024,4096) f32→bf16 pass,
    RESULTS.md round-3 accounting) and the f32 transfer was 2x the
    bytes. Labels/segments/masks stay untouched (the loss is f32)."""
    if compute_dtype != "bfloat16":
        return batch
    import ml_dtypes

    out = dict(batch)
    for k in ("feats", "text", "narration"):
        v = out.get(k)
        if v is not None and np.asarray(v).dtype == np.float32:
            out[k] = np.asarray(v).astype(ml_dtypes.bfloat16)
    return out


def _penalty_excluded(path) -> bool:
    """The reference penalty skips every param whose torch name contains
    'scale' (EWC.py:14, MAS.py:13) — in our tree those are the
    AffineDropPath `drop_path_*/scale` leaves and the per-level head
    `scale_l/scale` scalars. flax nn.LayerNorm also names its weight
    'scale', but its torch twin is `*.weight` and IS penalized, so the
    match is on the parent module name, not the leaf."""
    keys = [str(getattr(p, "key", "")) for p in path]
    return any(k.startswith(("drop_path", "scale")) for k in keys[:-1])


def reg_penalty(params, fisher, optpar, lam):
    """sum_i fisher_i * (optpar_i - theta)^2 * lambda, over stacked tasks.

    Skips 'scale'-named params exactly as the reference does (EWC.py:14)
    — fisher still CONTAINS them (on_task_update records every grad), the
    penalty just never reads those entries."""
    per_leaf = jax.tree_util.tree_map_with_path(
        lambda path, f, o, p: (
            jnp.zeros(()) if _penalty_excluded(path)
            else jnp.sum(f * jnp.square(o - p[None]))
        ),
        fisher, optpar, params,
    )
    total = jax.tree.reduce(lambda a, b: a + b, per_leaf, jnp.zeros(()))
    return lam * total


def make_train_step(
    model,
    tx,
    points,
    cfg: Config,
    *,
    cl_method: str = "naive",
    use_ssl: bool = False,
    use_distill: bool = False,
    use_reg_penalty: bool = False,
    use_prompt: bool = False,
    n_known: int = 0,
    ema_decay: float = 0.999,
    accumulation_steps: int = 1,
) -> Callable:
    """Build the jitted train step for the current CL configuration.

    `param_compute_dtype=bfloat16` (the state's params_c overlay) requires
    bf16 activations: with compute_dtype=float32 the kernels are consumed
    at f32 and a bf16 copy would CHANGE the forward instead of matching
    the per-step cast.

    `accumulation_steps=K` splits the incoming batch into K micro-batches
    and accumulates their gradients inside ONE jitted dispatch (a
    `lax.scan`, so XLA keeps only one micro-batch's activations live) and
    applies a single optimizer update on the mean gradient — the
    reference's `accumulation_step` semantics (VQ/func/train_anchor.py:
    88-106: per-loader-batch backward, optimizer step every K batches),
    here as a TPU-friendly in-step scan. The micro-batch plays the
    reference's loader-batch role: the loss normalizer EMA and the SSL
    memory-bank ring advance once per micro-batch, exactly as they would
    across K sequential reference batches.
    """

    if (cfg.opt.param_compute_dtype == "bfloat16"
            and cfg.model.compute_dtype != "bfloat16"):
        raise ValueError(
            "param_compute_dtype=bfloat16 needs model.compute_dtype="
            "bfloat16: with f32 activations the kernels are consumed at "
            "f32, so a stored bf16 copy would change the forward"
        )

    def loss_fn(params, mb, mcl, drng, norm_in):
        outputs = model.apply(
            {"params": params},
            mb["feats"], mb["mask"],
            text=mb.get("text"), text_mask=mb.get("text_mask"),
            narration=mb.get("narration") if use_ssl else None,
            narration_mask=mb.get("narration_mask") if use_ssl else None,
            narration_valid=mb.get("narration_valid") if use_ssl else None,
            prompt_mask=mb.get("prompt_mask") if use_prompt else None,
            deterministic=False,
            rngs={"dropout": drng},
        )
        if mcl.bias_alpha is not None:
            # BiC bias layers on past-task logit slices
            # (meta_archs.py:823-836)
            outputs = dict(outputs)
            outputs["cls_logits"] = (
                outputs["cls_logits"] * mcl.bias_alpha[None, None, :]
                + mcl.bias_beta[None, None, :]
            )
        loss, metrics, new_norm = compute_losses(
            outputs, mb, points, cfg, mcl, norm_in, cl_method, n_known,
        )
        if use_reg_penalty and mcl.fisher is not None:
            pen = reg_penalty(
                params, mcl.fisher, mcl.optpar, cfg.cl_cfg.reg_lambda
            )
            loss = loss + pen
            metrics["reg_penalty"] = pen
        aux = {
            "metrics": metrics,
            "new_norm": new_norm,
            "narration_feat": outputs.get("narration_feat"),
            "narration_valid": outputs.get("narration_valid"),
        }
        return loss, aux

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, batch: dict, cl: CLBatchExtras):
        rng, drng = jax.random.split(state.rng)
        # mixed-precision layout: differentiate w.r.t. the master tree
        # with the persistent bf16 kernel overlay injected (forward
        # numerics identical to casting the f32 master per step; grads
        # for the overlaid leaves land bf16)
        fwd_params = (state.params if state.params_c is None
                      else inject_adapters(state.params, state.params_c))

        if accumulation_steps > 1:
            K = accumulation_steps
            b = batch["feats"].shape[0]
            if b % K:
                raise ValueError(
                    f"batch size {b} not divisible by "
                    f"accumulation_steps {K}"
                )
            micro = jax.tree.map(
                lambda x: x.reshape((K, b // K) + x.shape[1:]), batch
            )
            mprev = None
            if cl.prev_logits is not None:
                mprev = cl.prev_logits.reshape(
                    (K, b // K) + cl.prev_logits.shape[1:]
                )
            drngs = jax.random.split(drng, K)
            # accumulate in f32 even when micro-grads land bf16
            # (param_compute_dtype path)
            gzero = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), fwd_params
            )

            def body(carry, xs):
                gacc, norm, bank, ptr = carry
                mb, pk, dk = xs
                mcl = cl.replace(
                    prev_logits=pk, memory_bank=bank, memory_ptr=ptr
                )
                (_, aux_k), g = grad_fn(fwd_params, mb, mcl, dk, norm)
                gacc = jax.tree.map(jnp.add, gacc, g)
                # narration_feat is None when the batch carries no
                # narration (e.g. no narration source configured)
                if (use_ssl and bank is not None
                        and aux_k["narration_feat"] is not None):
                    bank, ptr = _ring_update(
                        bank, ptr,
                        aux_k["narration_feat"], aux_k["narration_valid"],
                    )
                return ((gacc, aux_k["new_norm"], bank, ptr),
                        aux_k["metrics"])

            (grads, new_norm, new_bank, new_ptr), mseq = jax.lax.scan(
                body,
                (gzero, state.loss_normalizer,
                 cl.memory_bank, cl.memory_ptr),
                (micro, mprev, drngs),
            )
            grads = jax.tree.map(lambda g: g / K, grads)
            aux = {
                "metrics": jax.tree.map(lambda m: m.mean(0), mseq),
                "new_norm": new_norm,
            }
        else:
            (_, aux), grads = grad_fn(
                fwd_params, batch, cl, drng, state.loss_normalizer
            )
            new_bank, new_ptr = cl.memory_bank, cl.memory_ptr
            if (use_ssl and cl.memory_bank is not None
                    and aux["narration_feat"] is not None):
                new_bank, new_ptr = _ring_update(
                    cl.memory_bank, cl.memory_ptr,
                    aux["narration_feat"], aux["narration_valid"],
                )
        if cfg.train_cfg.clip_grad_l2norm > 0:
            if state.params_c is not None:
                # f32-accumulated norm over possibly-bf16 grad leaves
                # (optax.global_norm would reduce those in bf16); the
                # cast fuses into the reduce — no materialized copy
                gnorm = jnp.sqrt(sum(
                    jnp.sum(jnp.square(g.astype(jnp.float32)))
                    for g in jax.tree.leaves(grads)
                ))
            else:
                gnorm = optax.global_norm(grads)
            scale = jnp.minimum(
                1.0, cfg.train_cfg.clip_grad_l2norm / (gnorm + 1e-9)
            )
            grads = jax.tree.map(
                lambda g: g * scale.astype(g.dtype), grads
            )
            aux["metrics"]["grad_norm"] = gnorm
        new_pc = None
        if state.params_c is not None:
            if not hasattr(tx, "fused_apply_pc"):
                raise ValueError(
                    "params_c (param_compute_dtype=bfloat16) requires "
                    "the FusedAdamW optimizer path"
                )
            new_params, new_pc, new_opt_state = tx.fused_apply_pc(
                grads, state.opt_state, state.params
            )
        elif hasattr(tx, "fused_apply"):
            # single-pass AdamW: no materialized updates pytree
            # (optim.py::FusedAdamW)
            new_params, new_opt_state = tx.fused_apply(
                grads, state.opt_state, state.params
            )
        else:
            updates, new_opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)

        # adapter EMA (post_train_step, meta_archs.py:702-707)
        new_adapter_ema = state.adapter_ema
        if state.adapter_ema is not None:
            new_adapter_ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.adapter_ema,
                _extract_adapters(new_params),
            )

        new_ema = state.ema_params
        if state.ema_params is not None:
            d = cfg.opt.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, state.ema_params,
                new_params,
            )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            loss_normalizer=aux["new_norm"],
            rng=rng,
            adapter_ema=new_adapter_ema,
            ema_params=new_ema,
            params_c=new_pc,
        )
        return new_state, aux["metrics"], (new_bank, new_ptr)

    return jax.jit(step, donate_argnums=(0,))


def make_multi_train_step(model, tx, points, cfg: Config, scan_steps: int,
                          **flags) -> Callable:
    """K train steps fused into ONE dispatch via `lax.scan` over pre-staged
    batches (leading dim = scan_steps). Amortizes host->device dispatch
    latency — essential when the host link is high-latency (the axon tunnel
    costs ~25ms/dispatch) and a standard pattern for production TPU trainers.

    Batches must be a stacked pytree; CL extras with per-batch payloads
    (prev_logits) are not supported in the scanned path.
    """
    inner = make_train_step(model, tx, points, cfg, **flags)
    # re-derive the un-jitted step body by calling the factory's closure:
    # jax.jit wraps it, and jit-of-scan-of-jit is fine (inner jit is inlined
    # during tracing).

    def multi(state: TrainState, batches: dict, cl: CLBatchExtras):
        def body(carry, batch):
            st, bank, ptr = carry
            cl_t = cl.replace(memory_bank=bank, memory_ptr=ptr)
            st, metrics, (bank, ptr) = inner(st, batch, cl_t)
            return (st, bank, ptr), metrics

        (state, bank, ptr), metrics = jax.lax.scan(
            body, (state, cl.memory_bank, cl.memory_ptr), batches
        )
        last = jax.tree.map(lambda m: m[-1], metrics)
        return state, last, (bank, ptr)

    return jax.jit(multi, donate_argnums=(0,))


def _extract_adapters(params):
    """Subtree pytree of adapter params only (paths containing 'adapter')."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        if _is_adapter_path(path):
            out["/".join(str(getattr(p, "key", p)) for p in path)] = leaf
    return out


def init_adapter_ema(params):
    """Fresh copies of the adapter leaves (avoids donation aliasing with
    params when both live in the donated TrainState)."""
    return jax.tree.map(lambda x: jnp.array(x, copy=True),
                        _extract_adapters(params))


def inject_adapters(params, adapter_dict):
    """Inverse of _extract_adapters: write EMA adapter leaves back."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = []
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        leaves.append(adapter_dict.get(key, leaf))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_eval_step(model, cfg: Config, *, use_prompt: bool = False,
                   ensemble_adapters: bool = False):
    """Forward pass for evaluation; with `ensemble_adapters`, averages the
    live-adapter and EMA-adapter predictions (meta_archs.py:854-881)."""

    def step(params, batch, adapter_ema=None):
        def fwd(p):
            return model.apply(
                {"params": p},
                batch["feats"], batch["mask"],
                text=batch.get("text"), text_mask=batch.get("text_mask"),
                prompt_mask=None,
                deterministic=True,
            )

        out = fwd(params)
        if ensemble_adapters and adapter_ema is not None:
            out2 = fwd(inject_adapters(params, adapter_ema))
            out["cls_logits"] = 0.5 * (out["cls_logits"] + out2["cls_logits"])
            out["offsets"] = 0.5 * (out["offsets"] + out2["offsets"])
        return {
            "cls_logits": out["cls_logits"],
            "offsets": out["offsets"],
            "fpn_mask": out["fpn_mask"],
            "fpn_feats": tuple(out["fpn_feats"]),
        }

    return jax.jit(step)
