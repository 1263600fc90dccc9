"""End-to-end CL smoke tests on synthetic features.

The TPU analogue of the reference's only correctness story (end-to-end metric
eval during training, SURVEY.md section 4): run the full episode engine —
task stream, rehearsal memory, jitted train steps, on-device decode+NMS,
numpy metrics, BwF — over a tiny synthetic 3-task split and check the
numbers behave.
"""

import numpy as np
import pytest

from vilco_tpu.cl.episode import EpisodeRunner
from vilco_tpu.cl.stream import RehearsalMemory, TaskStream
from vilco_tpu.data.pipeline import SyntheticFeatureSource
from vilco_tpu.data.synthetic import make_synthetic_cl_split, tiny_config


def small_setup(method="naive", **cl_over):
    cfg = tiny_config(**{
        "dataset": {"num_classes": 6},
        "opt": {"epochs": 8, "warmup_epochs": 1, "learning_rate": 3e-3},
        "cl_cfg": {"name": method, "num_tasks": 3, "classes_per_task": 2,
                   **cl_over},
        "test_cfg": {"pre_nms_topk": 128, "max_seg_num": 10},
        "loader": {"batch_size": 4},
    })
    rng = np.random.default_rng(0)
    train_tasks, val_tasks = make_synthetic_cl_split(
        rng, cfg, videos_per_class_train=4, videos_per_class_val=2
    )
    stream = TaskStream(train_tasks, val_tasks)
    src = SyntheticFeatureSource(cfg.dataset.input_dim)
    return cfg, stream, src


def test_task_stream_and_memory():
    cfg, stream, _ = small_setup()
    assert stream.num_tasks == 3
    assert stream.task_classes(0) == [0, 1]
    assert stream.classes_upto(2) == [0, 1, 2, 3, 4, 5]
    v0 = stream.train_videos(0)
    assert all(not v["is_memory"] for v in v0)
    mem = RehearsalMemory()
    mem.add_task(stream.train_class_videos(0), m=2)
    assert mem.n_known == 2
    assert all(len(v) <= 2 for v in mem.data.values())
    v1 = stream.train_videos(1, mem)
    assert any(v["is_memory"] for v in v1)
    ids = [v["id"] for v in v1]
    assert len(ids) == len(set(ids)), "train videos must be deduped"
    # cumulative val grows
    assert len(stream.val_videos_upto(1)) > len(stream.val_videos_upto(0))


@pytest.mark.slow
def test_episode_naive_runs_and_learns(tmp_path):
    cfg, stream, src = small_setup("naive")
    runner = EpisodeRunner(cfg, stream, src, workdir=str(tmp_path))
    results = runner.run()
    assert len(results["tasks"]) == 3
    final = results["final"]
    assert 0.0 <= final["avg_mAP"] <= 1.0
    assert np.isfinite(final["BwF_R1@0.5"])
    # current task must be learnable: last task's own mAP clearly > 0
    last_own = results["tasks"][-1]["eval"]["per_task"][-1]
    assert last_own["avg_mAP"] > 0.1, last_own
    # checkpoints written
    assert (tmp_path / "task_002.ckpt").exists()


@pytest.mark.slow
def test_episode_rehearsal_beats_structure(tmp_path):
    """Rehearsal (icarl-style) episode runs with memory + distillation."""
    cfg, stream, src = small_setup("icarl", memory_size=12)
    runner = EpisodeRunner(cfg, stream, src, workdir=str(tmp_path))
    results = runner.run()
    assert runner.memory.n_known == 6
    # memory file saved
    assert (tmp_path / cfg.cl_cfg.path_memory).exists()
    assert len(results["tasks"]) == 3


@pytest.mark.slow
def test_episode_ewc(tmp_path):
    cfg, stream, src = small_setup("ewc", reg_lambda=10.0)
    runner = EpisodeRunner(cfg, stream, src, workdir=str(tmp_path))
    results = runner.run()
    assert len(runner.reg_list) == 2   # estimated after tasks 0 and 1
    assert np.isfinite(results["final"]["avg_mAP"])


@pytest.mark.slow
def test_episode_bic(tmp_path):
    """BiC 2-stage: stage-1 with distillation + stage-2 bias training."""
    cfg, stream, src = small_setup("bic", memory_size=12)
    runner = EpisodeRunner(cfg, stream, src, workdir=str(tmp_path))
    results = runner.run()
    assert len(results["tasks"]) == 3
    # stage-2 actually trained bias scalars for every task
    assert runner.bic.num_tasks_seen == 3
    moved = np.abs(runner.bic.alphas - 1.0) + np.abs(runner.bic.betas)
    assert (moved > 1e-6).any(), (runner.bic.alphas, runner.bic.betas)


@pytest.mark.slow
def test_episode_resume(tmp_path):
    """Checkpoint/resume: run 2 tasks, new runner resumes and finishes."""
    cfg, stream, src = small_setup("naive")
    cfg = cfg.updated(opt=cfg.opt.updated(epochs=2))
    runner = EpisodeRunner(cfg, stream, src, workdir=str(tmp_path))
    # run only the first two tasks
    for j in range(2):
        runner.train_task(j, 0)
        runner.evaluate(j)
        from vilco_tpu.core.checkpoint import save_checkpoint
        save_checkpoint(str(tmp_path / f"task_{j:03d}.ckpt"), {
            "params": runner.params, "task": j, "n_known": 0,
            "memory_bank": None, "reg_list": [], "bwf_recall": {},
            "bwf_map": {}, "bic": None,
        })
    runner2 = EpisodeRunner(cfg, stream, src, workdir=str(tmp_path))
    results = runner2.run(resume=True)
    # only the remaining task was trained
    assert len(results["tasks"]) == 1
    assert results["tasks"][0]["task"] == 2
    assert (tmp_path / "metrics.jsonl").exists()


@pytest.mark.slow
def test_episode_best_checkpoint_tracking(tmp_path):
    """opt.track_best: per-epoch eval selects and restores the best epoch."""
    cfg, stream, src = small_setup("naive")
    cfg = cfg.updated(opt=cfg.opt.updated(epochs=4, track_best=True,
                                          eval_start_ratio=0.5))
    runner = EpisodeRunner(cfg, stream, src, workdir=str(tmp_path))
    runner.train_task(0, 0)
    res = runner.evaluate(0)
    assert np.isfinite(res["avg_mAP"])
    # epoch evals must not have polluted the BwF history
    assert list(runner.bwf_recall.recorded) == [0]


@pytest.mark.slow
def test_episode_vilco_full_method(tmp_path):
    """The full ViLCo recipe end-to-end: rehearsal memory + L2P prompts on
    text + narration-SSL memory bank + EMA time-adapters."""
    cfg, stream, src = small_setup(
        "l2p", memory_size=12, prompt_pool=True, pool_size=6, topk=2,
        length=3, embed_dim=12, narration_ssl=True, narration_dim=8,
        ssl_factor=0.05, use_adapt=True, adapt_blocks=(0, 1),
    )
    cfg = cfg.updated(
        dataset=cfg.dataset.updated(use_text=True, use_narration=True),
        model=cfg.model.updated(use_cross_modal=True, n_txt_in=12),
        opt=cfg.opt.updated(epochs=3),
    ).derived()  # re-derive: cl_cfg.embed_dim follows model.n_txt_in
    rng = np.random.default_rng(1)

    def text_source(video):
        import hashlib
        seed = int(hashlib.md5(video["id"].encode()).hexdigest()[:8], 16)
        r = np.random.default_rng(seed)
        return r.standard_normal((6, 12)).astype(np.float32)

    def narration_source(video):
        return np.random.default_rng(0).standard_normal((4, 8)).astype(
            np.float32
        )

    runner = EpisodeRunner(cfg, stream, src, workdir=str(tmp_path),
                           text_source=text_source,
                           narration_source=narration_source)
    bank0 = np.asarray(runner.memory_bank).copy()
    results = runner.run()
    assert len(results["tasks"]) == 3
    # the SSL memory bank was written (ptr may wrap exactly to 0 mod size)
    assert not np.allclose(np.asarray(runner.memory_bank), bank0)
    # prompts live in the param tree
    assert "prompt" in runner.params
    m = results["tasks"][-1]["train"]["last_metrics"]
    assert "ssl_loss" in m and "reduce_sim" in m


def test_metrics_logger_tensorboard_mirror(tmp_path, monkeypatch):
    """--tensorboard mirrors scalars as TB events (the reference's
    SummaryWriter, MQ/train_cl.py:74-75); JSONL stays the source of
    truth."""
    pytest.importorskip("torch.utils.tensorboard")
    import os

    from vilco_tpu.core.logging import MetricsLogger

    tb_dir = str(tmp_path / "logs")
    ml = MetricsLogger(str(tmp_path / "m.jsonl"), tensorboard_dir=tb_dir)
    ml.log("train_epoch", step=3, loss=1.5, note="text-skipped")
    ml.close()
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events, os.listdir(tb_dir)
    assert os.path.getsize(os.path.join(tb_dir, events[0])) > 0
