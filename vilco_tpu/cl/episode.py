"""Query-incremental continual-learning episode engine.

The unified runtime that replaces the reference's three copy-pasted CL entry
points (MQ/train_cl.py:43-433, NLQ/train_cl.py:37-365, VQ/train_cl.py:51-280)
with one loop over task plugins:

  for task j:
    merge rehearsal memory into the task's train set
    (iCaRL/BiC) snapshot pre-task logits for distillation
    train epochs with the jitted step (fresh optimizer/schedule per task)
    evaluate every seen task cumulatively, track BwF
    update rehearsal memory (random exemplars, per-class quota)
    (EWC/MAS) estimate parameter importance on the finished task
    checkpoint {params, opt, cl-state}

Idiomatic shifts: class growth is a boolean class mask (no head surgery), so
one compiled train step serves all tasks of a method; eval decode + NMS run
jitted on device; metrics are the exact numpy ports in vilco_tpu/evals.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vilco_tpu.cl.bic import (
    BicState,
    make_bias_stage2_step,
    split_train_val,
)
from vilco_tpu.cl.regularizers import (
    estimate_importance,
    make_grad_step,
    stack_reg_tasks,
)
from vilco_tpu.cl.stream import RehearsalMemory, TaskStream, _dedup_by_id
from vilco_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from vilco_tpu.core.config import Config
from vilco_tpu.core.logging import MetricsLogger, profile_ctx
from vilco_tpu.data.pipeline import BatchIterator, ClipDataset
from vilco_tpu.evals.anet_map import ANETDetection, cumulative_cl_gt
from vilco_tpu.evals.retrieval import (
    BwfTracker,
    moment_retrieval_recall,
    retrieval_gt_from_task,
)
from vilco_tpu.models.point_transformer import PointTransformer, level_lengths
from vilco_tpu.ops.assign import generate_points
from vilco_tpu.ops.decode import decode_and_nms_batch
from vilco_tpu.train.engine import (
    CLBatchExtras,
    TrainState,
    cast_input_features,
    init_adapter_ema,
    make_eval_step,
    make_train_step,
)
from vilco_tpu.train.optim import make_optimizer

log = logging.getLogger("vilco.episode")


class EpisodeRunner:
    def __init__(
        self,
        cfg: Config,
        stream: TaskStream,
        feature_source: Callable,
        workdir: str = "/tmp/vilco_run",
        text_source: Optional[Callable] = None,
        narration_source: Optional[Callable] = None,
        shard: tuple = (0, 1),
        persist_config: bool = True,
    ):
        self.cfg = cfg
        self.stream = stream
        self.src = feature_source
        self.text_source = text_source
        self.narration_source = narration_source
        self.workdir = workdir
        # (process_index, process_count) — per-host train-data shard
        # (replaces DistributedSampler; eval stays unsharded like the
        # reference's rank-0 validation)
        self.shard = shard
        # set via enable_data_parallel(): device mesh for SPMD train/eval
        # steps (batch sharded over 'data', params replicated, XLA inserts
        # the gradient psum — the DDP the reference comments out)
        self.mesh = None
        os.makedirs(workdir, exist_ok=True)
        if persist_config and jax.process_index() == 0:
            # persist the resolved config so bin/evaluate.py can rebuild
            # the exact model/stream without the original CLI invocation
            # (the reference requires re-passing the yaml to eval.py).
            # Eval-only CLIs pass persist_config=False so re-evaluating a
            # workdir never clobbers the training run's record.
            with open(os.path.join(workdir, "config.json"), "w") as f:
                json.dump(cfg.to_dict(), f, indent=2)

        self.model = PointTransformer(cfg.model, cfg.cl_cfg)
        self.points = jnp.asarray(
            generate_points(
                level_lengths(cfg.model), cfg.model.fpn_strides,
                cfg.model.regression_range,
            )
        )
        self.num_classes = cfg.model.num_classes
        self.method = (cfg.cl_cfg.name or "naive").lower()
        self.bic = (
            BicState(self.num_classes, stream.num_tasks)
            if self.method == "bic" else None
        )
        self.memory = RehearsalMemory(seed=cfg.init_rand_seed)
        self.reg_list: List = []
        # the loss-normalizer EMA persists across tasks AND through
        # EWC/MAS estimation forwards: the reference keeps it as a plain
        # model attribute (meta_archs.py:596), so best-checkpoint reloads
        # do NOT rewind it and the next task trains from wherever the
        # previous task (plus any estimation passes) left it
        self.loss_normalizer = float(cfg.train_cfg.init_loss_norm)
        self.bwf_recall = BwfTracker()
        self.bwf_map = BwfTracker()
        self._setup_eval()
        self.memory_bank = None
        self.memory_ptr = jnp.zeros((), jnp.int32)
        if cfg.cl_cfg.narration_ssl and cfg.cl_cfg.memory_size > 0:
            self.memory_bank = jnp.asarray(
                np.random.default_rng(0).standard_normal(
                    (cfg.cl_cfg.memory_size, cfg.model.embd_dim)
                ).astype(np.float32)
            )
        self.params = self._init_params()
        self.eval_step = make_eval_step(
            self.model, cfg,
            ensemble_adapters=cfg.cl_cfg.use_adapt,
        )
        self._decode = None
        self.metrics_log = MetricsLogger(
            os.path.join(workdir, "metrics.jsonl")
        )
        self.ext_cls_scores = None
        if cfg.test_cfg.ext_score_file:
            from vilco_tpu.ops.ext_scores import load_cls_scores

            self.ext_cls_scores = load_cls_scores(cfg.test_cfg.ext_score_file)

    # ------------------------------------------------------------------
    def _setup_eval(self):
        """Build per-task cumulative GT (MQ flavor); task plugins override."""
        self.cl_gt = cumulative_cl_gt(self.stream.val_tasks)

    def _init_params(self):
        cfg = self.cfg
        ds = cfg.dataset
        B, T = cfg.loader.batch_size, ds.max_seq_len
        kw = {}
        if ds.use_text:
            kw["text"] = np.zeros(
                (B, ds.max_text_len, cfg.model.n_txt_in), np.float32
            )
            kw["text_mask"] = np.ones((B, ds.max_text_len), bool)
        if cfg.cl_cfg.narration_ssl:
            kw["narration"] = np.zeros(
                (B, ds.max_narration_len, cfg.cl_cfg.narration_dim),
                np.float32,
            )
            kw["narration_mask"] = np.ones((B, ds.max_narration_len), bool)
        # init on the CPU with a fused-off twin (identical param tree): the
        # init graph alone remote-compiles for minutes on the TPU tunnel,
        # and Pallas kernels can't trace on the CPU device
        init_model = PointTransformer(
            cfg.model.updated(fused_attention=False, fused_conv=False, attention_impl="xla", fused_xl=False), cfg.cl_cfg
        )
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        def do_init():
            return init_model.init(
                jax.random.PRNGKey(cfg.init_rand_seed),
                jnp.zeros((B, T, ds.input_dim), jnp.float32),
                jnp.ones((B, T), bool),
                deterministic=True,
                **{k: jnp.asarray(v) for k, v in kw.items()},
            )["params"]
        if cpu is not None and jax.default_backend() != "cpu":
            with jax.default_device(cpu):
                params = do_init()
            return jax.device_put(params, jax.devices()[0])
        return do_init()

    def _make_dataset(self, videos, is_training):
        return ClipDataset(
            videos, self.cfg, self.src,
            is_training=is_training,
            text_source=self.text_source,
            narration_source=self.narration_source,
        )

    def _class_mask(self, j: int) -> jnp.ndarray:
        mask = np.zeros((self.num_classes,), bool)
        for c in self.stream.classes_upto(j):
            mask[c] = True
        return jnp.asarray(mask)

    def enable_data_parallel(self, mesh=None):
        """Run the jitted steps SPMD over a device mesh: each batch is
        sharded over the mesh's 'data' axis and params are replicated, so
        XLA inserts the cross-device gradient all-reduce. Works single- and
        multi-host (call parallel.mesh.init_distributed() FIRST on multi-
        host; each host then feeds its BatchIterator shard and the global
        batch is assembled via make_array_from_process_local_data)."""
        from vilco_tpu.parallel.mesh import make_mesh

        self.mesh = mesh if mesh is not None else make_mesh()
        data_size = self.mesh.shape.get("data", 1)
        B = self.cfg.loader.batch_size * jax.process_count()
        assert B % data_size == 0, (
            f"global batch {B} not divisible by data-mesh size {data_size}"
        )
        return self

    def _shard_state(self, tree):
        """Replicate a pytree (train state) across the mesh for pure DP."""
        if self.mesh is None:
            return tree
        from vilco_tpu.parallel.mesh import replicated

        return jax.device_put(tree, replicated(tree, self.mesh))

    def _to_device(self, batch, is_training: bool = True):
        batch = {k: v for k, v in batch.items() if k != "video_idx"}
        # bf16 feature tensors leave the host already cast: bit-identical
        # to the in-step convert (the model casts on entry either way),
        # half the transfer bytes, and no device convert pass
        batch = cast_input_features(batch, self.cfg.model.compute_dtype)
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from vilco_tpu.parallel.mesh import batch_shardings, replicated

        if jax.process_count() > 1:
            if is_training:
                # each host holds its BatchIterator shard; assemble the
                # global batch across hosts
                shardings = batch_shardings(batch, self.mesh)
                return {
                    k: jax.make_array_from_process_local_data(
                        shardings[k], np.asarray(v)
                    )
                    for k, v in batch.items()
                }
            # EVAL loaders are deliberately unsharded (every host loads the
            # same batch): cross-host assembly would stack the identical
            # copies as distinct shards and leave outputs not fully
            # addressable per host — replicate instead
            shardings = replicated(batch, self.mesh)
            return {k: jax.device_put(jnp.asarray(v), shardings[k])
                    for k, v in batch.items()}
        shardings = batch_shardings(batch, self.mesh)
        return {k: jax.device_put(jnp.asarray(v), shardings[k])
                for k, v in batch.items()}

    # ------------------------------------------------------------------
    def snapshot_logits(self, params, videos,
                        n_known: int = 0) -> Dict[str, np.ndarray]:
        """Pre-task distill targets per video, stored as PROBABILITIES the
        way the reference snapshots them: sigmoid(logits) for iCaRL
        (MQ/train_cl.py:235), softmax(logits/T) over the first n_known
        classes zero-padded to C for BiC (MQ/train_bic.py:424-434)."""
        data = self._make_dataset(videos, is_training=False)
        it = BatchIterator(data, self.cfg, self.cfg.loader.batch_size,
                           is_training=False,
                           num_workers=self.cfg.loader.num_workers,
                           prefetch=self.cfg.loader.prefetch)
        out = {}
        for batch, meta in it:
            res = self.eval_step(params,
                                 self._to_device(batch, is_training=False))
            logits = np.asarray(res["cls_logits"], np.float32)
            if self.method == "bic" and n_known > 0:
                z = logits[..., :n_known] / 2.0
                z = z - z.max(axis=-1, keepdims=True)
                e = np.exp(z)
                probs = np.zeros_like(logits)
                probs[..., :n_known] = e / e.sum(axis=-1, keepdims=True)
            else:
                probs = 1.0 / (1.0 + np.exp(-logits))
            for i, vid in enumerate(meta["video_id"]):
                if not meta["pad"][i]:
                    out[vid] = probs[i]
        return out

    # ------------------------------------------------------------------
    def _reset_unseen_classes(self, j: int):
        """Reference augment_classification parity for the max-width head.

        The reference grows the cls head at each task boundary
        (meta_archs.py:715-752 + blocks.py:85-105): new-class conv rows
        are a FRESH kaiming draw, new biases the prior constant, and the
        per-class Gaussians re-init to (0, 1, -0.5, 1, 0.5, 1). Our head
        is allocated at the CL maximum once, so rows for classes beyond
        task j exist during earlier tasks and — with zero gradient under
        the class mask — would drift under AdamW's decoupled weight decay
        (sigma *= (1 - lr*wd) per step), which the reference's
        not-yet-allocated rows cannot. Resetting the not-yet-seen rows at
        the reference's augment point (called with j+1 at the end of task
        j) makes each row's state at its own allocation boundary match
        the reference's semantics exactly (fresh init), killing the decay
        drift."""
        if self.cfg.model.variant == "nlq":
            return            # class-agnostic head, nothing grows
        seen = np.zeros((self.num_classes,), bool)
        for c in self.stream.classes_upto(j):
            seen[c] = True
        if seen.all():
            return
        um = jnp.asarray(~seen)
        params = jax.tree_util.tree_map(lambda x: x, self.params)
        import math as _math

        import flax.linen as nn_

        head = params["cls_head"]["cls"]
        fresh = nn_.initializers.he_uniform()(
            jax.random.fold_in(jax.random.PRNGKey(self.cfg.init_rand_seed),
                               1000 + j),
            head["kernel"].shape, jnp.float32,
        )
        head["kernel"] = jnp.where(um[None, None, :], fresh,
                                   head["kernel"])
        prior = -_math.log((1 - 0.01) / 0.01)
        head["bias"] = jnp.where(
            um, jnp.asarray(prior, head["bias"].dtype), head["bias"])
        for name, val in (("mu", 0.0), ("sigma", 1.0),
                          ("mu_reg_left", -0.5), ("sigma_reg_left", 1.0),
                          ("mu_reg_right", 0.5), ("sigma_reg_right", 1.0)):
            if name in params:
                params[name] = jnp.where(
                    um, jnp.asarray(val, params[name].dtype), params[name])
        self.params = params

    def train_task(self, j: int, n_known: int):
        cfg = self.cfg
        use_memory = cfg.cl_cfg.memory_size > 0 and j > 0
        heldout = None
        if self.bic is not None:
            # BiC: 90/10 split of the current task; stage 2 trains the bias
            # layer on the held-out 10% (cl_benchmark.py:142-281)
            self.bic.register_task(j, self.stream.task_classes(j))
            cur = self.stream.train_videos(j, None)
            tr, heldout = split_train_val(cur, 0.9, cfg.init_rand_seed + j)
            videos = _dedup_by_id(
                (self.memory.videos() if use_memory else []) + tr
            )
        else:
            videos = self.stream.train_videos(
                j, self.memory if use_memory else None
            )
        data = self._make_dataset(videos, is_training=True)
        # with gradient accumulation, the loader yields K micro-batches
        # worth of clips per optimizer step (the step splits internally)
        accum = max(cfg.opt.accumulation_steps, 1)
        loader = BatchIterator(
            data, cfg, cfg.loader.batch_size * accum, is_training=True,
            seed=cfg.init_rand_seed,
            shard_id=self.shard[0], num_shards=self.shard[1],
            num_workers=cfg.loader.num_workers,
            prefetch=cfg.loader.prefetch,
        )
        steps_per_epoch = max(len(loader), 1)

        tx, _ = make_optimizer(cfg.opt, self.params, steps_per_epoch)
        use_distill = self.method in ("icarl", "bic") and n_known > 0
        use_prompt = cfg.cl_cfg.prompt_pool
        use_ssl = cfg.cl_cfg.narration_ssl and self.memory_bank is not None
        use_reg = self.method in ("ewc", "mas") and len(self.reg_list) > 0

        step = make_train_step(
            self.model, tx, self.points, cfg,
            cl_method=self.method,
            use_ssl=use_ssl,
            use_distill=use_distill,
            use_reg_penalty=use_reg,
            use_prompt=use_prompt,
            n_known=n_known,
            accumulation_steps=accum,
        )
        adapter_ema = (
            init_adapter_ema(self.params) if cfg.cl_cfg.use_adapt else None
        )
        params_c = None
        if cfg.opt.param_compute_dtype == "bfloat16":
            from vilco_tpu.train.optim import make_compute_copy

            params_c = make_compute_copy(self.params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=self.params,
            opt_state=tx.init(self.params),
            loss_normalizer=jnp.asarray(self.loss_normalizer, jnp.float32),
            rng=jax.random.PRNGKey(cfg.init_rand_seed + j),
            adapter_ema=adapter_ema,
            params_c=params_c,
        )
        state = self._shard_state(state)

        prev_logits_map = None
        if use_distill:
            prev_logits_map = self.snapshot_logits(
                self.params, videos, n_known=n_known)

        fisher, optpar = (None, None)
        if use_reg:
            fisher, optpar = stack_reg_tasks(self.reg_list)
            fisher = jax.tree.map(jnp.asarray, fisher)
            optpar = jax.tree.map(jnp.asarray, optpar)

        class_mask = self._class_mask(j)
        prompt_arange = None
        if use_prompt:
            start = j * cfg.cl_cfg.topk
            end = (j + 1) * cfg.cl_cfg.topk
            if end <= cfg.cl_cfg.pool_size:
                prompt_arange = np.arange(start, end)

        t0 = time.time()
        n_steps = 0
        last_metrics = {}
        best_score, best_params = -np.inf, None
        # the reference trains max_epochs = epochs + warmup_epochs per task
        # (MQ/train_cl.py:200-203) and evaluates every epoch from
        # max_epochs // 3 on, tracking the FIRST epoch achieving the best
        # score (strict >, :295-299)
        total_epochs = cfg.opt.total_epochs
        eval_start = int(total_epochs * cfg.opt.eval_start_ratio + 1e-9)
        for epoch in range(total_epochs):
            loader.set_epoch(epoch)
            for batch, meta in loader:
                extras = {}
                if use_distill:
                    prev = np.stack([
                        prev_logits_map.get(
                            vid,
                            np.zeros(
                                (self.points.shape[0], self.num_classes),
                                np.float32,
                            ),
                        )
                        for vid in meta["video_id"]
                    ])
                    extras["prev_logits"] = jnp.asarray(prev)
                if use_prompt and prompt_arange is not None:
                    batch = dict(batch)
                    batch["prompt_mask"] = np.broadcast_to(
                        prompt_arange[None, :],
                        (len(meta["video_id"]), len(prompt_arange)),
                    ).copy()
                if self.bic is not None and n_known > 0:
                    a, b = self.bic.per_class(j - 1)
                    extras["bias_alpha"] = jnp.asarray(a)
                    extras["bias_beta"] = jnp.asarray(b)
                cl = CLBatchExtras(
                    class_mask=class_mask,
                    memory_bank=self.memory_bank if use_ssl else None,
                    memory_ptr=self.memory_ptr if use_ssl else None,
                    fisher=fisher,
                    optpar=optpar,
                    **extras,
                )
                state, metrics, (bank, ptr) = step(
                    state, self._to_device(batch), cl
                )
                if use_ssl:
                    self.memory_bank, self.memory_ptr = bank, ptr
                n_steps += 1
            last_metrics = {k: float(v) for k, v in metrics.items()}
            log.info(
                "task %d epoch %d: %s", j, epoch,
                {k: round(v, 4) for k, v in last_metrics.items()},
            )
            self.metrics_log.log("train_epoch", step=int(state.step),
                                 task=j, epoch=epoch, **last_metrics)

            # per-task best-checkpoint tracking (MQ/train_cl.py:283-315):
            # every epoch from max_epochs // 3 INCLUDING the last is
            # evaluated; best is by cfg.opt.best_metric (the MQ reference
            # selects on the cumulative weighted avg mAP, :295)
            if cfg.opt.track_best and epoch >= eval_start:
                self.params = state.params
                self._adapter_ema = state.adapter_ema
                score = self.evaluate(
                    j, update_bwf=False)[cfg.opt.best_metric]
                if score > best_score:
                    best_score = score
                    best_params = jax.tree.map(np.asarray, state.params)
                    log.info("task %d epoch %d: new best %s=%.4f",
                             j, epoch, cfg.opt.best_metric, score)
        wall = time.time() - t0
        self.params = state.params
        self._adapter_ema = state.adapter_ema
        # carry the end-of-training normalizer forward even when an
        # earlier best epoch is restored (reference semantics: the
        # normalizer is not state_dict content)
        self.loss_normalizer = float(
            jax.device_get(state.loss_normalizer).reshape(-1)[0])
        if best_params is not None:
            # ALWAYS restore the tracked best — the reference reloads
            # best_task_XXX.pth.tar unconditionally before final_validate
            # (load_best_checkpoint, MQ/train_cl.py:363), so on ties the
            # EARLIER epoch's weights win
            self.params = jax.tree.map(jnp.asarray, best_params)
            log.info("task %d: restored best epoch (%s=%.4f)",
                     j, cfg.opt.best_metric, best_score)

        if self.bic is not None and heldout:
            self._bic_stage2(j, heldout, class_mask, state.loss_normalizer)
        return {
            "steps": n_steps,
            "wall_s": wall,
            "clips_per_s": (n_steps * cfg.loader.batch_size * accum
                            / max(wall, 1e-9)),
            "last_metrics": last_metrics,
            "loader": loader,
        }

    # ------------------------------------------------------------------
    def _bic_stage2(self, j, heldout, class_mask, loss_norm,
                    epochs: int = 2):
        """Stage-2: train only (alpha_j, beta_j) on the held-out split
        (train_bic_one_epoch stage switch, train_utils.py:425-583)."""
        cfg = self.cfg
        step2, init2 = make_bias_stage2_step(
            self.model, self.points, cfg, j, self.bic.class_task
        )
        bias, opt2 = init2()
        data = self._make_dataset(heldout, is_training=True)
        loader = BatchIterator(data, cfg, cfg.loader.batch_size,
                               is_training=True, seed=cfg.init_rand_seed,
                               num_workers=cfg.loader.num_workers,
                               prefetch=cfg.loader.prefetch)
        a, b = self.bic.per_class(j)
        cl = CLBatchExtras(
            class_mask=class_mask,
            bias_alpha=jnp.asarray(a), bias_beta=jnp.asarray(b),
        )
        for ep in range(epochs):
            loader.set_epoch(ep)
            for batch, _ in loader:
                bias, opt2, m = step2(
                    bias, opt2, self.params,
                    # this loader is host-unsharded: replicate, don't
                    # cross-host assemble (see _to_device)
                    self._to_device(batch, is_training=False), cl,
                    loss_norm,
                )
        self.bic.alphas[j] = float(bias["alpha"])
        self.bic.betas[j] = float(bias["beta"])
        log.info("bic stage2 task %d: alpha=%.4f beta=%.4f",
                 j, self.bic.alphas[j], self.bic.betas[j])

    def _decode_batch(self, out, class_mask):
        t = self.cfg.test_cfg
        return decode_and_nms_batch(
            self.points, out["cls_logits"], out["offsets"], out["fpn_mask"],
            class_mask,
            num_classes=self.num_classes,
            pre_nms_topk=t.pre_nms_topk,
            pre_nms_thresh=t.pre_nms_thresh,
            duration_thresh=t.duration_thresh,
            max_seg_num=t.max_seg_num,
            iou_threshold=t.iou_threshold,
            min_score=t.min_score,
            nms_sigma=t.nms_sigma,
            voting_thresh=t.voting_thresh,
            use_soft_nms=t.nms_method == "soft",
            multiclass=t.multiclass_nms,
        )

    def _collect_fpn_feats(self, videos):
        """Per-level feature stacks for exemplar-mean computation
        (classify, meta_archs.py:1068-1096)."""
        data = self._make_dataset(videos, is_training=False)
        it = BatchIterator(data, self.cfg, self.cfg.loader.batch_size,
                           is_training=False,
                           num_workers=self.cfg.loader.num_workers,
                           prefetch=self.cfg.loader.prefetch)
        levels = None
        for batch, meta in it:
            out = self.eval_step(self.params,
                                 self._to_device(batch, is_training=False),
                                 getattr(self, "_adapter_ema", None))
            feats = [np.asarray(f) for f in out["fpn_feats"]]
            keep = [i for i, p in enumerate(meta["pad"]) if not p]
            if levels is None:
                levels = [[] for _ in feats]
            for li, f in enumerate(feats):
                levels[li].extend(f[i] for i in keep)
        return levels or []

    def _refresh_exemplar_means(self):
        """Recompute iCaRL exemplar means from the rehearsal memory
        (compute_means path, meta_archs.py:1066-1096)."""
        from vilco_tpu.cl.icarl import compute_exemplar_means

        self._icarl_means, self._icarl_valid = compute_exemplar_means(
            self._collect_fpn_feats, self.memory.data, self.num_classes
        )

    def predict_videos(self, videos, class_mask) -> Dict[str, dict]:
        """Run eval forward + decode over videos; segments in seconds."""
        data = self._make_dataset(videos, is_training=False)
        it = BatchIterator(data, self.cfg, self.cfg.loader.batch_size,
                           is_training=False,
                           num_workers=self.cfg.loader.num_workers,
                           prefetch=self.cfg.loader.prefetch)
        adapter_ema = getattr(self, "_adapter_ema", None)
        icarl_means = getattr(self, "_icarl_means", None)
        use_icarl_filter = (
            self.method == "icarl" and icarl_means
        )
        preds = {}
        bias = None
        if self.bic is not None and self.bic.num_tasks_seen > 0:
            a, b = self.bic.per_class(self.bic.num_tasks_seen - 1)
            bias = (jnp.asarray(a), jnp.asarray(b))
        for batch, meta in it:
            out = self.eval_step(
                self.params, self._to_device(batch, is_training=False),
                adapter_ema,
            )
            if bias is not None:
                out = dict(out)
                out["cls_logits"] = (
                    out["cls_logits"] * bias[0][None, None, :]
                    + bias[1][None, None, :]
                )
            if use_icarl_filter:
                from vilco_tpu.cl.icarl import distance_keep_mask

                keep = distance_keep_mask(
                    [np.asarray(f) for f in out["fpn_feats"]],
                    icarl_means, self._icarl_valid,
                )
                out = dict(out)
                out["cls_logits"] = jnp.where(
                    jnp.asarray(keep), out["cls_logits"], -1e9
                )
            det = self._decode_batch(out, class_mask)
            segs = np.asarray(det.segs)
            scores = np.asarray(det.scores)
            labels = np.asarray(det.labels)
            valid = np.asarray(det.valid)
            for i, vid in enumerate(meta["video_id"]):
                if meta["pad"][i]:
                    continue
                stride = meta["feat_stride"][i]
                nframes = meta["feat_num_frames"][i]
                fps = meta["fps"][i]
                dur = meta["duration"][i]
                sel = valid[i]
                s = (segs[i][sel] * stride + 0.5 * nframes) / fps
                s = np.clip(s, 0.0, dur)
                preds[vid] = {
                    "segments": s,
                    "scores": scores[i][sel],
                    "labels": labels[i][sel],
                }
        return preds

    def predict_submission(self, j: int) -> dict:
        """Official Ego4D-MQ submission dump: {"version", "external_data",
        "results": {video_id: [{"segment": [s, e], "score", "label"}]}}
        with label NAMES mapped back through the activity index — the
        reference's test-set writer (MQ/libs/utils/train_utils.py:876-895,
        which hardcodes the 110-class Ego4D-MQ dict; ours inverts the
        stream's own index so any TAL dataset works)."""
        if self.method == "icarl" and self.memory.n_known > 0:
            self._refresh_exemplar_means()
        class_mask = self._class_mask(j)
        preds = self.predict_videos(self.stream.val_videos_upto(j),
                                    class_mask)
        inv = {v: k for k, v in self.cl_gt[j]["activity_index"].items()}
        results = {}
        for vid, p in preds.items():
            results[vid] = [
                {"segment": [float(s[0]), float(s[1])],
                 "score": float(sc),
                 "label": str(inv.get(int(lb), int(lb)))}
                for s, sc, lb in zip(p["segments"], p["scores"],
                                     p["labels"])
            ]
        return {"version": "1.0", "external_data": "", "results": results}

    def evaluate(self, j: int, update_bwf: bool = True) -> Dict:
        """Cumulative per-task eval + BwF (final_validate,
        MQ/libs/utils/train_utils.py:1176-1349)."""
        if self.method == "icarl" and self.memory.n_known > 0:
            self._refresh_exemplar_means()
        class_mask = self._class_mask(j)
        gt_j = self.cl_gt[j]
        act_idx = gt_j["activity_index"]
        per_task_map, per_task_r1 = {}, {}
        per_task = []
        weights = {}
        for i in range(j + 1):
            videos = self.stream.val_videos_upto(i)
            preds = self.predict_videos(videos, class_mask)
            if self.ext_cls_scores:
                # external video-level score fusion (postprocessing.py:97)
                from vilco_tpu.ops.ext_scores import fuse_external_scores

                preds = fuse_external_scores(preds, self.ext_cls_scores)
            rec = {"video-id": [], "t-start": [], "t-end": [], "label": [],
                   "score": []}
            for vid, p in preds.items():
                for s, sc, lb in zip(p["segments"], p["scores"], p["labels"]):
                    if int(lb) not in act_idx:
                        continue
                    rec["video-id"].append(vid)
                    rec["t-start"].append(float(s[0]))
                    rec["t-end"].append(float(s[1]))
                    rec["label"].append(act_idx[int(lb)])
                    rec["score"].append(float(sc))
            evaluator = ANETDetection(
                {k: gt_j[k] for k in
                 ("video-id", "t-start", "t-end", "label")}
            )
            mAP, avg_map = evaluator.evaluate(rec)

            # retrieval vs task i's own GT (get_retrieval_performance.py)
            task_key = self.stream.task_ids[i]
            gt_ret = retrieval_gt_from_task(self.stream.val_tasks[task_key])
            inv = {v: k for k, v in
                   self.stream.val_tasks[task_key]["label_dict"].items()}
            pred_ret = {}
            for vid, p in preds.items():
                by_class = {}
                for s, sc, lb in zip(p["segments"], p["scores"],
                                     p["labels"]):
                    name = inv.get(int(lb))
                    if name is None:
                        continue
                    by_class.setdefault(name, []).append(
                        [float(s[0]), float(s[1]), float(sc)]
                    )
                pred_ret[vid] = by_class
            rec_matrix = moment_retrieval_recall(gt_ret, pred_ret)
            # the reference weights per-loader averages by the CUMULATIVE
            # class count through loader i (get_valSet_by_taskNum
            # accumulates eval_data before list_num_classes.append,
            # cl_benchmark.py:103-108; AverageMeter.update(val,
            # num_queries) in valid/final_validate)
            weights[i] = len(self.stream.classes_upto(i))
            per_task_map[i] = avg_map
            per_task_r1[i] = float(rec_matrix[4, 0])  # R@1 tIoU 0.5
            per_task.append({
                "task": i,
                "avg_mAP": avg_map,
                "mAP": mAP.tolist(),
                "recall": rec_matrix.tolist(),
                "R1@0.3": float(rec_matrix[2, 0]),
                "R5@0.3": float(rec_matrix[2, 1]),
                "R1@0.5": float(rec_matrix[4, 0]),
                "R5@0.5": float(rec_matrix[4, 1]),
            })
        if update_bwf:
            bwf_r = self.bwf_recall.update(j, per_task_r1, weights)
            bwf_m = self.bwf_map.update(j, per_task_map, weights)
        else:
            bwf_r, bwf_m = 0.0, 0.0
        avg = lambda key: float(np.average(
            [t[key] for t in per_task],
            weights=[weights[t["task"]] for t in per_task],
        ))
        return {
            "per_task": per_task,
            "avg_mAP": avg("avg_mAP"),
            "avg_R1@0.3": avg("R1@0.3"),
            "avg_R5@0.3": avg("R5@0.3"),
            "avg_R1@0.5": avg("R1@0.5"),
            "avg_R5@0.5": avg("R5@0.5"),
            "BwF_R1@0.5": bwf_r,
            "BwF_mAP": bwf_m,
        }

    # ------------------------------------------------------------------
    def _try_resume(self):
        """Resume from the latest task checkpoint in workdir (the reference
        restores epoch/optim/sched + reg_params + pickled memory,
        MQ/train_cl.py:172-189, 360-361)."""
        import glob

        ckpts = sorted(glob.glob(os.path.join(self.workdir, "task_*.ckpt")))
        if not ckpts:
            return -1, 0
        tree = load_checkpoint(ckpts[-1])
        self.params = jax.tree.map(jnp.asarray, tree["params"])
        if tree.get("memory_bank") is not None:
            self.memory_bank = jnp.asarray(tree["memory_bank"])
            self.memory_ptr = jnp.asarray(tree.get("memory_ptr", 0),
                                          jnp.int32)
        if tree.get("reg_list"):
            self.reg_list = tree["reg_list"]
        if tree.get("bwf_recall"):
            self.bwf_recall.recorded = tree["bwf_recall"]
            self.bwf_map.recorded = tree["bwf_map"]
        if self.bic is not None and tree.get("bic"):
            self.bic.alphas = tree["bic"]["alphas"]
            self.bic.betas = tree["bic"]["betas"]
            self.bic.class_task = tree["bic"]["class_task"]
            self.bic.num_tasks_seen = int(tree["bic"]["num_tasks_seen"])
        mem_path = os.path.join(self.workdir, self.cfg.cl_cfg.path_memory)
        if os.path.exists(mem_path):
            self.memory.load(mem_path)
        log.info("resumed from %s (task %d)", ckpts[-1], tree["task"])
        return int(tree["task"]), int(tree.get("n_known", 0))

    def run(self, resume: bool = False) -> Dict:
        cfg = self.cfg
        results = {"tasks": [], "method": self.method}
        n_known = 0
        done_task = -1
        if resume:
            done_task, n_known = self._try_resume()
        for j in range(done_task + 1, self.stream.num_tasks):
            log.info("=== task %d/%d (method=%s, n_known=%d) ===",
                     j + 1, self.stream.num_tasks, self.method, n_known)
            train_stats = self.train_task(j, n_known)
            eval_stats = self.evaluate(j)
            log.info("task %d eval: avg_mAP=%.4f R1@0.5=%.4f BwF=%.4f",
                     j, eval_stats["avg_mAP"], eval_stats["avg_R1@0.5"],
                     eval_stats["BwF_R1@0.5"])

            n_seen = len(self.stream.classes_upto(j))
            if cfg.cl_cfg.memory_size > 0:
                m = self.stream.memory_quota(cfg.cl_cfg.memory_size, n_seen)
                self.memory.add_task(self.stream.train_class_videos(j), m)
                n_known = self.memory.n_known
                self.memory.save(
                    os.path.join(self.workdir, cfg.cl_cfg.path_memory)
                )

            if j < self.stream.num_tasks - 1:
                # the reference's augment_classification point
                # (train_cl.py:378): the next task's head rows become a
                # fresh init HERE — before EWC/MAS importance estimation,
                # so the Fisher/optpar snapshots see the grown fresh rows
                self._reset_unseen_classes(j + 1)

            if self.method in ("ewc", "mas") and j < self.stream.num_tasks - 1:
                grad_step = make_grad_step(
                    self.model, self.points, cfg, self.method
                )
                loader = train_stats.pop("loader")
                loader.set_epoch(0)
                # the reference estimates importance AFTER
                # augment_classification (train_cl.py:378-385), so its
                # loss at estimation time spans the NEXT task's freshly
                # grown classes too (their logits count as focal-loss
                # negatives and pick up Fisher mass) — mirror with the
                # classes-through-(j+1) mask
                cl = CLBatchExtras(class_mask=self._class_mask(j + 1))
                batches = (self._to_device(b) for b, _ in loader)
                imp, optpar, new_norm = estimate_importance(
                    grad_step, self.params, batches, cl,
                    jnp.asarray(self.loss_normalizer, jnp.float32),
                    mode=self.method,
                )
                self.loss_normalizer = float(np.asarray(new_norm))
                self.reg_list.append((imp, optpar))
            else:
                train_stats.pop("loader", None)

            save_checkpoint(
                os.path.join(self.workdir, f"task_{j:03d}.ckpt"),
                {
                    "params": self.params,
                    "task": j,
                    "n_known": n_known,
                    "memory_bank": self.memory_bank,
                    "memory_ptr": int(self.memory_ptr),
                    "reg_list": self.reg_list,
                    "bwf_recall": self.bwf_recall.recorded,
                    "bwf_map": self.bwf_map.recorded,
                    "bic": (
                        {
                            "alphas": self.bic.alphas,
                            "betas": self.bic.betas,
                            "class_task": self.bic.class_task,
                            "num_tasks_seen": self.bic.num_tasks_seen,
                        } if self.bic is not None else None
                    ),
                },
                arrays_format=cfg.ckpt_format,
            )
            self.metrics_log.log(
                "task_eval", step=j, task=j,
                avg_mAP=eval_stats.get("avg_mAP", 0.0),
                R1_05=eval_stats.get("avg_R1@0.5", 0.0),
                bwf=eval_stats.get("BwF_R1@0.5", 0.0),
                clips_per_s=train_stats.get("clips_per_s", 0.0),
            )
            results["tasks"].append({
                "task": j,
                "train": {k: v for k, v in train_stats.items()
                          if k != "loader"},
                "eval": eval_stats,
            })
        results["final"] = results["tasks"][-1]["eval"]
        return results
