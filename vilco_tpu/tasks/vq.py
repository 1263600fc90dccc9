"""VQ task plugin: visual-query 2-D tracking as a CL stream.

TPU-native equivalent of the VQ stack (VQ/train_cl.py:51-280,
VQ/dataset/{base_dataset,cl_benchmark}.py, VQ/evaluation/,
VQ/metrics/): samples are (clip frames, query crop, response track) tuples,
tasks are object-category groups, the model is the ClipMatcher anchor
tracker, evaluation slides windows over the clip, assembles response tracks
via peak finding, and scores tAP/stAP/Success/recovery.

The reference decodes raw video with decord + augments on GPU
(VQ/dataset/dataset_utils.py:76-197); here frame sources are pluggable and
the synthetic source renders a moving bright patch whose color channel is
keyed to the query, so tracking is learnable in tests.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import time
from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vilco_tpu.cl.stream import RehearsalMemory, _dedup_by_id
from vilco_tpu.core.registry import TASKS
from vilco_tpu.core.checkpoint import save_checkpoint
from vilco_tpu.evals.retrieval import BwfTracker
from vilco_tpu.evals.vq_metrics import (
    BBox,
    ResponseTrack,
    compute_visual_query_metrics,
    predictions_to_response_track,
)
from vilco_tpu.models.clip_matcher import ClipMatcher
from vilco_tpu.train.vq_engine import (
    VQTrainState,
    make_vq_eval_step,
    make_vq_train_step,
)

log = logging.getLogger("vilco.vq")

# epoch_key sentinel for the EWC/MAS importance-estimation pass.
# Training epochs key batches by (task << 16) | epoch, which can never
# reach this value at ViLCo scale (5 tasks x <=30 epochs).
_IMPORTANCE_EPOCH_KEY = 0x7FFF0000


class VQTaskStream:
    """Category-keyed QIL stream (VQ/dataset/cl_benchmark.py:18-120):
    {task_idx: {category: [sample dicts]}}."""

    def __init__(self, train_tasks: Dict[int, Dict[str, list]],
                 val_tasks: Dict[int, Dict[str, list]]):
        self.task_ids = sorted(train_tasks)
        self.train_tasks = train_tasks
        self.val_tasks = val_tasks

    @property
    def num_tasks(self) -> int:
        return len(self.task_ids)

    def train_class_videos(self, j: int) -> Dict[str, list]:
        return self.train_tasks[self.task_ids[j]]

    def train_videos(self, j: int,
                     memory: Optional[RehearsalMemory] = None) -> List[dict]:
        out = []
        if memory is not None:
            out.extend(memory.videos())
        for samples in self.train_tasks[self.task_ids[j]].values():
            out.extend(dict(s, is_memory=False) for s in samples)
        return _dedup_by_id(out)

    def val_videos_task(self, i: int) -> List[dict]:
        out = []
        for samples in self.val_tasks[self.task_ids[i]].values():
            out.extend(samples)
        return _dedup_by_id(out)

    def memory_quota(self, memory_size: int, n_categories: int) -> int:
        return memory_size // max(n_categories, 1)


def merge_vq_tasks(stream: VQTaskStream) -> VQTaskStream:
    """Collapse all tasks into one — the reference's non-CL trainer
    (VQ/train_anchor.py) upper bound."""

    def merge(tasks):
        cats = {}
        for t in tasks.values():
            for c, samples in t.items():
                cats.setdefault(c, []).extend(samples)
        return {0: cats}

    return VQTaskStream(merge(stream.train_tasks), merge(stream.val_tasks))


class SyntheticVQSource:
    """Renders clips with a moving bright patch; the lit color channel is a
    hash of the sample's category, and the query crop shows the same patch.
    """

    def __init__(self, frame_size: int = 32, noise: float = 0.15):
        self.frame_size = frame_size
        self.noise = noise

    def _chan(self, category: str) -> int:
        return int(hashlib.md5(category.encode()).hexdigest()[:8], 16) % 3

    def clip(self, sample: dict) -> np.ndarray:
        """(T_total, H, W, 3) frames following sample['track'] boxes."""
        seed = int(hashlib.md5(sample["id"].encode()).hexdigest()[8:16], 16)
        rng = np.random.default_rng(seed)
        S = self.frame_size
        T = sample["num_frames"]
        frames = rng.random((T, S, S, 3)).astype(np.float32) * self.noise
        ch = self._chan(sample["category"])
        for fno, box in sample["track"].items():
            x1, y1, x2, y2 = (np.asarray(box) * S).astype(int)
            frames[fno, y1:max(y2, y1 + 1), x1:max(x2, x1 + 1), ch] = 1.0
        return frames

    def query(self, sample: dict) -> np.ndarray:
        S = self.frame_size
        q = np.random.default_rng(0).random((S, S, 3)).astype(
            np.float32
        ) * self.noise
        ch = self._chan(sample["category"])
        c = S // 4
        q[c:-c, c:-c, ch] = 1.0
        return q

    def frames(self, sample: dict, idxs) -> np.ndarray:
        return self.clip(sample)[np.asarray(idxs, np.int64)]


def make_synthetic_vq_split(rng: np.random.Generator, num_tasks: int = 3,
                            cats_per_task: int = 2,
                            samples_per_cat_train: int = 4,
                            samples_per_cat_val: int = 2,
                            num_frames: int = 16, window: int = 4):
    """{task: {category: [samples]}} with box tracks occupying a contiguous
    span of frames before the query frame."""

    def split(n, name):
        tasks = {}
        sid = 0
        for k in range(num_tasks):
            cats = {}
            for ci in range(cats_per_task):
                cat = f"cat_{k * cats_per_task + ci}"
                samples = []
                for _ in range(n):
                    span = int(rng.integers(3, max(4, num_frames // 2)))
                    start = int(rng.integers(0, num_frames - span))
                    cx, cy = rng.uniform(0.3, 0.7, 2)
                    sz = rng.uniform(0.15, 0.3)
                    track = {}
                    for f in range(start, start + span):
                        dx = (f - start) * 0.02
                        track[f] = [
                            float(np.clip(cx - sz / 2 + dx, 0, 1 - sz)),
                            float(np.clip(cy - sz / 2, 0, 1 - sz)),
                            float(np.clip(cx + sz / 2 + dx, sz, 1)),
                            float(np.clip(cy + sz / 2, sz, 1)),
                        ]
                    samples.append({
                        "id": f"{name}_s{sid:05d}",
                        "category": cat,
                        "num_frames": num_frames,
                        "track": track,
                        "query_frame": num_frames - 1,
                        "window": window,
                    })
                    sid += 1
                cats[cat] = samples
            tasks[k] = cats
        return tasks

    return (split(samples_per_cat_train, "train"),
            split(samples_per_cat_val, "val"))


def build_clip_matcher(model_cfg=None, *, window: int = 4,
                       frame_size: int = 32,
                       use_fused: bool = False) -> ClipMatcher:
    """One ClipMatcher construction path shared by the episode runner and
    the serving export: a VQCfg (flagship configs/vq_vilco.yaml shape) or,
    without one, the CI-sized toy geometry derived from window/frame_size."""
    if model_cfg is not None:
        return ClipMatcher(
            dim=model_cfg.dim, clip_size=model_cfg.clip_size,
            patch_size=model_cfg.patch_size,
            vit_dim=model_cfg.vit_dim, vit_depth=model_cfg.vit_depth,
            vit_heads=model_cfg.vit_heads,
            resolution_transformer=model_cfg.resolution_transformer,
            resolution_anchor_feat=model_cfg.resolution_anchor_feat,
            num_transformer=model_cfg.num_transformer,
            window_transformer=model_cfg.window_transformer,
            num_frames=model_cfg.num_frames,
            freeze_backbone=model_cfg.freeze_backbone,
            use_fused=use_fused,
            use_query_roi=getattr(model_cfg, "use_query_roi", False),
        )
    return ClipMatcher(
        dim=64, clip_size=frame_size, patch_size=8,
        vit_dim=48, vit_depth=2, vit_heads=4,
        resolution_transformer=frame_size // 8,
        resolution_anchor_feat=frame_size // 8,
        num_transformer=1, window_transformer=5,
        num_frames=window, use_fused=use_fused,
    )


@TASKS.register("vq")
class VQEpisodeRunner:
    """CL episode engine for VQ (mirrors VQ/train_cl.py:51-280): per task —
    train the tracker (with rehearsal memory), evaluate every seen task by
    sliding-window inference + peak finding + official metrics, track BwF."""

    def __init__(self, stream: VQTaskStream, source: SyntheticVQSource,
                 workdir: str, *, window: int = 4, frame_size: int = 32,
                 method: str = "naive", memory_size: int = 0,
                 reg_lambda: float = 0.0, epochs: int = 4,
                 batch_size: int = 2, lr: float = 1e-3, seed: int = 0,
                 use_hnm: bool = False, augment: bool = False,
                 eval_windows: int = 8, use_fused: bool = False,
                 model_cfg=None, vit_ckpt: str = "",
                 weight_decay: float = 1e-4,
                 positive_threshold: float = 0.2, positive_topk: int = 5,
                 accumulation_steps: int = 1, persist_config: bool = True,
                 ckpt_format: str = "npz",
                 grad_max: float = 20.0,
                 lr_milestones: tuple = (7000, 14000, 20000, 25000),
                 lr_gamma: float = 0.3):
        self.stream = stream
        self.source = source
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.window = window
        self.frame_size = frame_size
        self.method = method
        self.memory_size = memory_size
        self.reg_lambda = reg_lambda
        self.epochs = epochs
        self.batch_size = batch_size
        self.lr = lr
        self.seed = seed
        self.use_hnm = use_hnm
        self.augment = augment
        self.ckpt_format = ckpt_format
        # inference windows batched per jitted call (fixed chunk size ->
        # one compile; bounds host+device memory on long real clips)
        self.eval_windows = eval_windows
        self._aug_key = jax.random.PRNGKey(seed + 99)

        if model_cfg is not None:
            # flagship shape from a VQCfg (configs/vq_vilco.yaml mirrors
            # VQ/config/train_cl.yaml); window/frame_size follow it
            self.window = window = model_cfg.num_frames
            self.frame_size = frame_size = model_cfg.clip_size
        self.model = build_clip_matcher(model_cfg, window=window,
                                        frame_size=frame_size,
                                        use_fused=use_fused)
        if persist_config and jax.process_index() == 0:
            # persist the model-defining settings so bin/vq_infer.py can
            # rebuild the exact ClipMatcher shape from the workdir alone
            # (the reference re-reads its global yaml config at inference).
            # bin/vq_infer.py passes persist_config=False so inference on a
            # pre-existing workdir never rewrites the training geometry.
            with open(os.path.join(workdir, "vq_config.json"), "w") as f:
                json.dump({
                    "window": self.window,
                    "frame_size": self.frame_size,
                    "model_cfg": (model_cfg.to_dict()
                                  if model_cfg is not None else None),
                }, f, indent=2)
        rng = jax.random.PRNGKey(seed)
        # T=1 init clip: param shapes are T-independent (pe_3d is built from
        # num_frames, not the input) and ViT-B init at the full window costs
        # ~15 min on CPU (RESULTS.md)
        clip0 = jnp.zeros((1, 1, frame_size, frame_size, 3))
        query0 = jnp.zeros((1, frame_size, frame_size, 3))
        self.params = self.model.init(rng, clip0, query0,
                                      deterministic=True)["params"]
        if vit_ckpt:
            from vilco_tpu.models.vit import load_torch_vit_checkpoint

            self.params = dict(self.params)
            self.params["backbone"] = load_torch_vit_checkpoint(
                self.params["backbone"], vit_ckpt)
        from vilco_tpu.train.vq_engine import make_vq_optimizer

        self.tx = make_vq_optimizer(
            lr, weight_decay,
            freeze_backbone=self.model.freeze_backbone,
            grad_max=grad_max, milestones=tuple(lr_milestones),
            gamma=lr_gamma,
        )
        self.accumulation_steps = max(accumulation_steps, 1)
        self.train_step = make_vq_train_step(
            self.model, self.tx, use_hnm=use_hnm,
            positive_threshold=positive_threshold,
            positive_topk=positive_topk,
            reg_lambda=reg_lambda,
            accumulation_steps=self.accumulation_steps,
        )
        self.eval_step = make_vq_eval_step(self.model)
        self.memory = RehearsalMemory(seed=seed)
        self.reg_list: List = []
        self.bwf = BwfTracker()
        self.mesh = None

    # --------------------------------------------------------------
    # multi-host capable since the host-sharded window loader
    # (_train_batches slices the global step batch per process)
    supports_multihost = True

    def enable_data_parallel(self, mesh=None):
        """Run the jitted VQ steps SPMD over a device mesh: batches shard
        over the 'data' axis, params replicate, XLA inserts the gradient
        psum — the reference VQ's single-node DDP + SyncBatchNorm
        (VQ/train_cl.py:112-119) by construction (GroupNorm here has no
        cross-device batch stats to sync). Multi-host too (beyond the
        reference's single-node DDP): call parallel.mesh.init_distributed()
        first; each host's window loader yields its process slice of the
        global step batch (the slicing is process-count-INVARIANT — window
        draws are keyed per global position — so the assembled global
        batch is identical for any host layout) and the global arrays are
        assembled via make_array_from_process_local_data."""
        from vilco_tpu.parallel.mesh import make_mesh

        self.mesh = mesh if mesh is not None else make_mesh()
        d = self.mesh.shape.get("data", 1)
        gb = self.batch_size * jax.process_count()
        if gb % d:
            raise ValueError(
                f"global batch {gb} not divisible by data-mesh size {d}")
        return self

    def _to_device(self, batch, is_training: bool = True):
        if self.mesh is None:
            return batch
        from vilco_tpu.parallel.mesh import batch_shardings, replicated

        if jax.process_count() > 1:
            if is_training:
                # each host holds its loader slice; assemble the global
                # batch across hosts (same pattern as cl/episode.py)
                shardings = batch_shardings(batch, self.mesh)
                return {
                    k: jax.make_array_from_process_local_data(
                        shardings[k], np.asarray(v))
                    for k, v in batch.items()
                }
            # eval runs the same data on every host: replicate
            shardings = replicated(batch, self.mesh)
            return {k: jax.device_put(jnp.asarray(v), shardings[k])
                    for k, v in batch.items()}
        if not is_training:
            # eval window chunks are sized for throughput, not the mesh
            # (chunk may be < data axis); replicate — eval is a tiny
            # fraction of episode time and values are unchanged
            return jax.device_put(batch, replicated(batch, self.mesh))
        return jax.device_put(batch, batch_shardings(batch, self.mesh))

    def _replicate(self, tree):
        if self.mesh is None:
            return tree
        from vilco_tpu.parallel.mesh import replicated

        return jax.device_put(tree, replicated(tree, self.mesh))

    # --------------------------------------------------------------
    def _window_indices(self, sample: dict,
                        rng: np.random.Generator) -> np.ndarray:
        """Training-window frame indices: the reference's balanced sampler
        when the sample carries a `valid_range` (real Ego4D annotations),
        else a random contiguous window around the track."""
        T = sample["num_frames"]
        w = self.window
        if sample.get("valid_range") is not None:
            from vilco_tpu.data.vq_frames import balanced_frame_indices

            return np.clip(balanced_frame_indices(w, sample, rng),
                           0, max(T - 1, 0))
        fnos = sorted(sample["track"])
        center = int(rng.choice(fnos))
        start = int(np.clip(center - rng.integers(0, w), 0, T - w))
        return np.arange(start, start + w)

    def _fetch_frames(self, sample: dict, idxs) -> np.ndarray:
        if hasattr(self.source, "frames"):
            return self.source.frames(sample, idxs)
        return self.source.clip(sample)[np.asarray(idxs, np.int64)]

    def _sample_window(self, sample: dict, rng: np.random.Generator):
        """Random training window around the response track."""
        w = self.window
        idxs = self._window_indices(sample, rng)
        clip = self._fetch_frames(sample, idxs)
        bbox = np.zeros((w, 4), np.float32)
        with_box = np.zeros((w,), np.float32)
        for i, f in enumerate(idxs):
            box = sample["track"].get(int(f))
            if box is not None:
                bbox[i] = box
                with_box[i] = 1.0
        before = (idxs < sample["query_frame"]).astype(np.float32)
        return {
            "clip": clip,
            "query": self.source.query(sample),
            "clip_bbox": bbox,
            "clip_with_bbox": with_box,
            "before_query": before,
        }

    def _train_batches(self, videos, rng, batch_size=None, *,
                       epoch_key: int = 0, last_only: bool = False):
        """Yield per-optimizer-step batches; one yielded batch = one step
        = accumulation_steps micro-batches of batch_size
        (train_anchor.py:88-106 semantics).

        Under multi-host DP each yielded batch is THIS process's slice of
        the global step batch. Sampling is process-count-invariant: the
        permutation comes from the caller-shared `rng` (same seed on
        every host) and each position's window draws use an rng keyed by
        (epoch_key, step, global position), so the assembled global batch
        is byte-identical for any host layout."""
        pc, pid = jax.process_count(), jax.process_index()
        idx = rng.permutation(len(videos))
        B_local = batch_size or self.batch_size * self.accumulation_steps
        B = B_local * pc
        pool = np.resize(idx, max(len(idx), B))
        n_steps = max(len(idx) // B, 1)
        # `last_only` materializes ONLY the final step batch: window rngs
        # are keyed by (epoch_key, step, gpos) — independent of earlier
        # steps — so skipping them yields an identical last batch.
        for b in range(n_steps - 1 if last_only else 0, n_steps):
            gsel = pool[b * B:(b + 1) * B]
            lo = pid * B_local
            parts = []
            for off in range(B_local):
                gpos = lo + off
                win_rng = np.random.default_rng(
                    np.random.SeedSequence(
                        [self.seed, epoch_key, b, int(gpos)]))
                parts.append(
                    self._sample_window(videos[gsel[gpos]], win_rng))
            yield {
                k: jnp.asarray(np.stack([p[k] for p in parts]))
                for k in parts[0]
            }

    def train_task(self, j: int):
        use_memory = self.memory_size > 0 and j > 0
        videos = self.stream.train_videos(
            j, self.memory if use_memory else None
        )
        rng = np.random.default_rng(self.seed + j)
        state = VQTrainState(
            step=jnp.zeros((), jnp.int32), params=self.params,
            opt_state=self.tx.init(self.params),
            rng=jax.random.PRNGKey(self.seed + j),
        )
        state = self._replicate(state)
        reg = None
        if self.method in ("ewc", "mas") and self.reg_list:
            from vilco_tpu.cl.regularizers import stack_reg_tasks

            f, o = stack_reg_tasks(self.reg_list)
            reg = (jax.tree.map(jnp.asarray, f), jax.tree.map(jnp.asarray, o))
            reg = self._replicate(reg)
        t0 = time.time()
        n = 0
        for ep in range(self.epochs):
            for batch in self._train_batches(
                    videos, np.random.default_rng(
                        np.random.SeedSequence([self.seed, j, ep])),
                    epoch_key=(j << 16) | ep):
                if self.augment:
                    # on-device augmentation (process_data,
                    # VQ/dataset/dataset_utils.py:76-197)
                    from vilco_tpu.data.vq_augment import augment_vq_batch

                    self._aug_key, k = jax.random.split(self._aug_key)
                    batch = augment_vq_batch(k, batch)
                state, metrics = self.train_step(
                    state, self._to_device(batch), reg)
                n += 1
        self.params = state.params
        last = {k: float(v) for k, v in metrics.items()}
        log.info("vq task %d: %d steps, %.1fs, %s", j, n,
                 time.time() - t0, {k: round(v, 4) for k, v in last.items()})

        if self.method in ("ewc", "mas") and j < self.stream.num_tasks - 1:
            self._estimate_importance(videos, rng)
        if self.memory_size > 0:
            n_cats = sum(
                len(self.stream.train_class_videos(i))
                for i in range(j + 1)
            )
            m = self.stream.memory_quota(self.memory_size, n_cats)
            self.memory.add_task(self.stream.train_class_videos(j), m)
        return last

    def _estimate_importance(self, videos, rng):
        def grad_fn(params, batch):
            def loss(p):
                from vilco_tpu.train.vq_engine import vq_losses

                preds = self.model.apply(
                    {"params": p}, batch["clip"], batch["query"],
                    deterministic=True,
                )
                gts = {k: batch[k] for k in
                       ("clip_bbox", "clip_with_bbox", "before_query")}
                return vq_losses(preds, gts)[0]

            return jax.grad(loss)(params)

        grad_fn = jax.jit(grad_fn)
        acc = None
        # micro batch_size: importance estimation must not pay the
        # accumulated K*B device footprint. The reference zeroes grads at
        # the TOP of every estimation iteration (VQ/cl_methods/EWC.py:40,
        # same quirk as MQ — pinned by test_cl_lockstep), so only the
        # LAST batch's gradient becomes the importance — and only that
        # batch is materialized (last_only). epoch_key is a reserved
        # non-negative sentinel: SeedSequence rejects negative entropy,
        # and training epochs use (j << 16) | ep which stays far below it.
        last = None
        for batch in self._train_batches(videos, rng, self.batch_size,
                                         epoch_key=_IMPORTANCE_EPOCH_KEY,
                                         last_only=True):
            last = batch
        if last is not None:
            acc = grad_fn(self.params, self._to_device(last))
        if acc is None:
            return
        imp = jax.tree.map(
            lambda g: np.asarray(jnp.square(g) if self.method == "ewc"
                                 else jnp.abs(g)), acc
        )
        optpar = jax.tree.map(np.asarray, self.params)
        self.reg_list.append((imp, optpar))

    # --------------------------------------------------------------
    def predict_track(self, sample: dict) -> ResponseTrack:
        """Sliding-window inference over the full clip
        (task_inference_predict.py:30-150) -> per-frame top bbox/prob ->
        peak finding -> ResponseTrack.

        Windows run through the jitted step in fixed-size chunks of
        `eval_windows` (the reference dispatches window-by-window per mp
        worker, inference_predict.py:26-93). The chunk size is FIXED so
        every clip reuses one compiled executable, and frames are fetched
        per chunk so host memory stays bounded on long real clips."""
        query = self.source.query(sample)
        T = sample["num_frames"]
        w = self.window
        starts = [max(min(s, T - w), 0) for s in range(0, T, w)]
        win_idxs = [np.minimum(np.arange(s, s + w), T - 1) for s in starts]
        n = len(starts)
        chunk = max(min(self.eval_windows, 1 << (n - 1).bit_length()), 1)
        queries = jnp.asarray(np.repeat(query[None], chunk, axis=0))
        scores = np.zeros((T,), np.float64)
        boxes = np.zeros((T, 4), np.float64)
        counts = np.zeros((T,), np.int64)
        for c0 in range(0, n, chunk):
            sel = win_idxs[c0:c0 + chunk]
            clips = np.stack(
                [self._fetch_frames(sample, ix) for ix in sel]
            )
            if len(sel) < chunk:   # pad the tail chunk by repetition
                clips = np.concatenate(
                    [clips,
                     np.repeat(clips[-1:], chunk - len(sel), axis=0)]
                )
            ev = self._to_device(
                {"clip": jnp.asarray(clips), "query": queries},
                is_training=False)
            bbox_b, prob_b = self.eval_step(
                self.params, ev["clip"], ev["query"]
            )
            bbox_b = np.asarray(bbox_b[:len(sel)])
            prob_b = np.asarray(prob_b[:len(sel)])
            for bi, idxs in enumerate(sel):
                for i, f in enumerate(idxs):
                    if counts[f] == 0 or prob_b[bi, i] > scores[f]:
                        scores[f] = prob_b[bi, i]
                        boxes[f] = bbox_b[bi, i]
                    counts[f] += 1
        # to pixel coords for the metrics
        boxes = boxes * self.frame_size
        return predictions_to_response_track(
            scores, boxes, sample["query_frame"]
        )

    def evaluate(self, j: int) -> Dict:
        per_task = []
        per_task_key = {}
        weights = {}
        for i in range(j + 1):
            samples = self.stream.val_videos_task(i)
            gt_rts, pred_rts = [], []
            for s in samples:
                gt_boxes = [
                    BBox(f, *(np.asarray(b) * self.frame_size))
                    for f, b in sorted(s["track"].items())
                ]
                gt_rts.append(ResponseTrack(gt_boxes))
                pred_rts.append([self.predict_track(s)])
            # sliding-window inference scans every pre-query frame, so
            # accessed == total and search efficiency reports 0 (the
            # reference's exhaustive path behaves identically)
            n_frames = [int(s["query_frame"]) for s in samples]
            m = compute_visual_query_metrics(
                pred_rts, gt_rts, accessed_frames=n_frames,
                total_frames=n_frames,
            )
            weights[i] = len(samples)
            per_task_key[i] = m["tAP@0.25"]
            per_task.append({"task": i, **m})
        bwf = self.bwf.update(j, per_task_key, weights)
        avg = lambda key: float(np.average(
            [t[key] for t in per_task],
            weights=[weights[t["task"]] for t in per_task],
        ))
        return {
            "per_task": per_task,
            "avg_tAP25": avg("tAP@0.25"),
            "avg_stAP25": avg("stAP@0.25"),
            "avg_success": avg("Success"),
            "avg_recovery": avg("recovery%"),
            "BwF_tAP25": bwf,
        }

    def run(self) -> Dict:
        results = {"tasks": [], "method": self.method}
        for j in range(self.stream.num_tasks):
            train_stats = self.train_task(j)
            eval_stats = self.evaluate(j)
            log.info("vq task %d eval: tAP25=%.3f stAP25=%.3f succ=%.1f",
                     j, eval_stats["avg_tAP25"], eval_stats["avg_stAP25"],
                     eval_stats["avg_success"])
            save_checkpoint(
                os.path.join(self.workdir, f"vq_task_{j:03d}.ckpt"),
                {"params": self.params, "task": j},
                arrays_format=self.ckpt_format,
            )
            results["tasks"].append(
                {"task": j, "train": train_stats, "eval": eval_stats}
            )
        results["final"] = results["tasks"][-1]["eval"]
        return results


def build_vq_submission(runner: "VQEpisodeRunner",
                        annotations: dict) -> dict:
    """Official ego4d_vq2d_challenge prediction file.

    Walks the raw Ego4D annotation structure videos -> clips ->
    annotations -> query_sets exactly like the reference's
    format_predictions (VQ/inference_results.py:88-115), predicts a
    response track for every query the runner's stream knows, and emits
    bboxes converted back to ORIGINAL-resolution pixel coordinates
    (denormalize_track_box; the reference's process_bbox_prediction,
    VQ/evaluation/task_inference_predict.py:236-269). Unknown / invalid
    queries get the reference's empty entry {"bboxes": [], "score": 0.0}.
    """
    from vilco_tpu.data.vq_frames import denormalize_track_box

    by_key = {}
    for i in range(runner.stream.num_tasks):
        for s in runner.stream.val_videos_task(i):
            if s.get("annotation_uid") is not None:
                by_key[(s["annotation_uid"], s.get("query_set"))] = s
    fs = float(runner.frame_size)
    results = {"videos": []}
    for v in annotations.get("videos", []):
        vp = {"video_uid": v.get("video_uid"), "clips": []}
        for c in v.get("clips", []):
            cp = {"clip_uid": c.get("clip_uid"), "predictions": []}
            for a in c.get("annotations", []):
                auid = a.get("annotation_uid")
                apred = {"query_sets": {}, "annotation_uid": auid}
                for qid in a.get("query_sets", {}):
                    s = by_key.get((auid, qid))
                    if s is None:
                        apred["query_sets"][qid] = {"bboxes": [],
                                                    "score": 0.0}
                        continue
                    rt = runner.predict_track(s)
                    oh, ow = s["original_hw"]
                    bbs = []
                    for b in rt.bboxes:
                        x1, y1, x2, y2 = denormalize_track_box(
                            [b.x1 / fs, b.y1 / fs, b.x2 / fs, b.y2 / fs],
                            oh, ow,
                        )
                        bbs.append({"fno": int(b.fno),
                                    "x1": int(x1), "x2": int(x2),
                                    "y1": int(y1), "y2": int(y2)})
                    apred["query_sets"][qid] = {
                        "bboxes": bbs,
                        "score": (float(rt.score)
                                  if rt.score is not None else 0.0),
                    }
                cp["predictions"].append(apred)
            vp["clips"].append(cp)
        results["videos"].append(vp)
    return {
        "version": annotations.get("version", "1.0"),
        "challenge": "ego4d_vq2d_challenge",
        "results": results,
    }
