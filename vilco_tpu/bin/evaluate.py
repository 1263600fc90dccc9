"""Standalone checkpoint evaluation CLI.

Equivalent of the reference's eval entry points (MQ/eval.py, NLQ/eval_nlq.py
+ the official scorer NLQ/evaluate_ego4d_nlq.py, VQ/evaluate.py): load a task
checkpoint produced by train_cl and re-run the cumulative per-task
evaluation.

  python -m vilco_tpu.bin.evaluate --config cfg.yaml --workdir ./runs/x \
      [--task-idx 4] [--synthetic]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--workdir", required=True)
    p.add_argument("--task", default=None)
    p.add_argument("--task-idx", type=int, default=None,
                   help="evaluate as of this task (default: latest ckpt)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--submission",
                   help="also write the official prediction file to this "
                        "path: Ego4D-MQ submission.json for mq, "
                        "ego4d_nlq_challenge for nlq (per-model files "
                        "feed bin/ensemble.py)")
    args = p.parse_args(argv)

    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stdout)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vilco_tpu.core.checkpoint import load_checkpoint
    from vilco_tpu.core.config import Config, load_config
    from vilco_tpu.data.synthetic import make_synthetic_cl_split, tiny_config

    saved_cfg = os.path.join(args.workdir, "config.json")
    if args.config:
        cfg = load_config(args.config)
    elif os.path.exists(saved_cfg):
        # the episode runner persists its resolved config — restoring it
        # reproduces the training model/stream exactly (incl. any CLI
        # overrides), where the reference eval.py re-parses the yaml
        with open(saved_cfg) as f:
            cfg = Config.from_dict(json.load(f)).derived()
    elif (args.task or "mq") == "nlq":
        from vilco_tpu.tasks.nlq import nlq_tiny_config

        cfg = nlq_tiny_config()
    else:
        cfg = tiny_config()

    task = args.task or cfg.task
    if task == "vq":
        p.error("VQ checkpoints are evaluated by the sliding-window "
                "inference pipeline: python -m vilco_tpu.bin.vq_infer "
                f"--workdir {args.workdir} (MIGRATION.md)")
    if args.synthetic:
        rng = np.random.default_rng(cfg.init_rand_seed)
        if task == "nlq":
            from vilco_tpu.tasks.nlq import (
                NLQEpisodeRunner, NLQTaskStream, SyntheticNLQFeatures,
                make_synthetic_nlq_split,
            )

            train_t, val_t = make_synthetic_nlq_split(rng, cfg)
            stream = NLQTaskStream(train_t, val_t)
            feat = SyntheticNLQFeatures(cfg.dataset.input_dim,
                                        cfg.model.n_txt_in)
            runner = NLQEpisodeRunner(cfg, stream, feat.video,
                                      workdir=args.workdir,
                                      text_source=feat.text,
                                      persist_config=False)
        else:
            from vilco_tpu.cl.episode import EpisodeRunner
            from vilco_tpu.cl.stream import TaskStream
            from vilco_tpu.data.pipeline import SyntheticFeatureSource

            train_t, val_t = make_synthetic_cl_split(rng, cfg)
            stream = TaskStream(train_t, val_t)
            runner = EpisodeRunner(
                cfg, stream, SyntheticFeatureSource(cfg.dataset.input_dim),
                workdir=args.workdir, persist_config=False,
            )
    else:
        from vilco_tpu.tasks.mq import build_mq_runner

        runner = build_mq_runner(cfg, args.workdir, persist_config=False)

    ckpts = sorted(glob.glob(os.path.join(args.workdir, "task_*.ckpt")))
    if not ckpts:
        raise SystemExit(f"no task_*.ckpt in {args.workdir}")
    if args.task_idx is not None:
        path = os.path.join(args.workdir, f"task_{args.task_idx:03d}.ckpt")
    else:
        path = ckpts[-1]
    tree = load_checkpoint(path)
    runner.params = jax.tree.map(jnp.asarray, tree["params"])
    j = int(tree["task"])
    mem_path = os.path.join(args.workdir, cfg.cl_cfg.path_memory)
    if os.path.exists(mem_path):
        runner.memory.load(mem_path)

    if args.submission:
        sub = runner.predict_submission(j)
        if isinstance(sub, list):  # NLQ records take the challenge wrapper
            sub = {"version": "1.0", "challenge": "ego4d_nlq_challenge",
                   "results": sub}
        with open(args.submission, "w") as f:
            json.dump(sub, f)
        logging.getLogger("vilco.evaluate").info(
            "wrote submission to %s", args.submission)

    results = runner.evaluate(j)
    out = {k: v for k, v in results.items() if k != "per_task"}
    out["per_task"] = results["per_task"]
    print(json.dumps(out, indent=2, default=float))
    return results


if __name__ == "__main__":
    main()
