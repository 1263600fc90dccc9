"""Synthetic data for tests and benchmarks.

Generates clips whose features carry a recoverable signal for their GT
segments (a class-specific bump on a noise floor), in the exact padded batch
format the pipeline emits, plus reference-format annotation/task-split
fixtures for the CL engine and metric tests (the e2e smoke role the
BASELINE.json "CPU-runnable" MQ config plays — SURVEY.md section 4).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from vilco_tpu.core.config import Config


def make_batch(
    rng: np.random.Generator,
    batch_size: int,
    cfg: Config,
    *,
    with_text: Optional[bool] = None,
    with_narration: Optional[bool] = None,
    signal: float = 2.0,
) -> Dict[str, np.ndarray]:
    ds = cfg.dataset
    T, Cin, C = ds.max_seq_len, ds.input_dim, ds.num_classes
    N = ds.max_segments
    B = batch_size

    feats = rng.standard_normal((B, T, Cin)).astype(np.float32) * 0.5
    mask = np.zeros((B, T), bool)
    segs = np.zeros((B, N, 2), np.float32)
    labels = np.zeros((B, N), np.int64)
    valid = np.zeros((B, N), bool)

    for b in range(B):
        t_len = int(rng.integers(T // 2, T + 1))
        mask[b, :t_len] = True
        n = int(rng.integers(1, min(4, N) + 1))
        for i in range(n):
            length = int(rng.integers(max(2, T // 64), max(3, T // 8)))
            start = int(rng.integers(0, max(1, t_len - length)))
            c = int(rng.integers(0, C))
            segs[b, i] = (start, start + length)
            labels[b, i] = c
            valid[b, i] = True
            # class-conditional additive bump so the task is learnable
            feats[b, start:start + length, c % Cin] += signal
            feats[b, start:start + length, (c * 7 + 1) % Cin] += signal

    batch = {
        "feats": feats,
        "mask": mask,
        "gt_segments": segs,
        "gt_labels": labels,
        "gt_valid": valid,
    }
    if with_text is None:
        with_text = ds.use_text
    if with_narration is None:
        with_narration = ds.use_narration
    if with_text:
        L = ds.max_text_len
        batch["text"] = rng.standard_normal(
            (B, L, cfg.model.n_txt_in)
        ).astype(np.float32)
        tl = rng.integers(4, L + 1, size=B)
        batch["text_mask"] = np.arange(L)[None, :] < tl[:, None]
    if with_narration:
        Ln = ds.max_narration_len
        batch["narration"] = rng.standard_normal(
            (B, Ln, cfg.cl_cfg.narration_dim)
        ).astype(np.float32)
        nl = rng.integers(1, Ln + 1, size=B)
        batch["narration_mask"] = np.arange(Ln)[None, :] < nl[:, None]
        batch["narration_valid"] = rng.random(B) < 0.8
    return batch


def tiny_config(**overrides) -> Config:
    """A CPU-runnable MQ-flavor config for tests."""
    d = {
        "task": "mq",
        "dataset": {
            "num_classes": 10, "max_seq_len": 64, "input_dim": 16,
            "max_segments": 8, "max_text_len": 16, "max_narration_len": 8,
            "feat_stride": 16.0, "num_frames": 16.0,
        },
        "model": {
            "backbone_arch": (2, 1, 3), "embd_dim": 32, "fpn_dim": 32,
            "head_dim": 32, "n_head": 4, "use_abs_pe": True,
            "regression_range": ((0, 4), (2, 8), (4, 16), (8, 10000)),
            "compute_dtype": "float32",
        },
        "train_cfg": {"init_loss_norm": 20.0, "al_loss_weight": 0.1,
                      "droppath": 0.0, "dropout": 0.0},
        "test_cfg": {"pre_nms_topk": 256, "max_seg_num": 20,
                     "min_score": 0.001, "nms_sigma": 0.9,
                     "duration_thresh": 0.05},
        "opt": {"learning_rate": 2e-3, "epochs": 3, "warmup_epochs": 1},
        "loader": {"batch_size": 2},
        "cl_cfg": {"num_tasks": 5, "classes_per_task": 2},
    }
    cfg = Config.from_dict(_deep_merge(d, overrides)).derived()
    return cfg


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def make_synthetic_cl_split(
    rng: np.random.Generator,
    cfg: Config,
    videos_per_class_train: int = 6,
    videos_per_class_val: int = 2,
):
    """Reference-format QIL split dict: {task_idx: {'label_dict': {name: id},
    'dict_db': [video dicts]}} (scripts/split_mq.py output consumed by
    MQ/train_cl.py:103 / cl_benchmark.py:18). Videos carry second-domain
    segments + metadata so the full pipeline incl. grid conversion runs.
    """
    C = cfg.dataset.num_classes
    K = cfg.cl_cfg.num_tasks
    per = cfg.cl_cfg.classes_per_task
    assert per * K <= C

    fps = 30.0
    stride, nframes = cfg.dataset.feat_stride, cfg.dataset.num_frames

    def make_split(videos_per_class, split_name):
        tasks = {}
        vid = 0
        for k in range(K):
            label_dict = {}
            dict_db = []
            for ci in range(per):
                c = k * per + ci
                label_dict[f"class_{c}"] = c
                for _ in range(videos_per_class):
                    duration = float(rng.uniform(60, 120))
                    n = int(rng.integers(1, 4))
                    segments, labels = [], []
                    for _ in range(n):
                        ln = float(rng.uniform(2, 20))
                        st = float(rng.uniform(0, max(1.0, duration - ln)))
                        segments.append([st, st + ln])
                        labels.append(c)
                    dict_db.append({
                        "id": f"{split_name}_v{vid:05d}",
                        "fps": fps,
                        "duration": duration,
                        "feat_stride": stride,
                        "feat_num_frames": nframes,
                        "segments": np.array(segments, np.float32),
                        "labels": np.array(labels, np.int64),
                        "subset": split_name,
                    })
                    vid += 1
            tasks[k] = {"label_dict": label_dict, "dict_db": dict_db}
        return tasks

    return make_split(videos_per_class_train, "train"), make_split(
        videos_per_class_val, "val"
    )
