"""VQ leaderboard-style inference + scoring CLI.

Equivalent of the reference's 3-stage VQ pipeline
(VQ/inference_predict.py -> VQ/inference_results.py -> VQ/evaluate.py,
SURVEY.md §3.5): sliding-window per-frame prediction, score-curve peak
finding into response tracks, then the official metrics. The reference fans
out per-clip tasks over a torch.multiprocessing worker pool (2 per GPU);
here windows are batched through one jitted step — scale comes from the
device mesh, not host processes.

  python -m vilco_tpu.bin.vq_infer --workdir ./runs/vq --synthetic

Real data (Ego4D vq_val.json + decoded clips or extracted frames):

  python -m vilco_tpu.bin.vq_infer --workdir ./runs/vq \
      --annotations vq_val.json --clip-dir ./clips   # or --images-dir
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-tasks", type=int, default=2)
    p.add_argument("--annotations", help="Ego4D vq_val.json to score")
    p.add_argument("--train-annotations",
                   help="Ego4D vq_train.json used for the training run — "
                        "REQUIRED to reproduce the same category->task "
                        "grouping as train_cl (which shuffles the "
                        "train+val category union)")
    p.add_argument("--clip-dir", help="directory of {clip_uid}.mp4 clips")
    p.add_argument("--images-dir",
                   help="directory of {clip_uid}/frame_XXXXXXX.jpg frames")
    p.add_argument("--frame-size", type=int, default=448)
    p.add_argument("--window", type=int, default=30)
    p.add_argument("--categories-per-task", type=int, default=400,
                   help="QIL grouping (scripts/split_vq.py: 5 x ~400)")
    p.add_argument("--submission",
                   help="also write the official ego4d_vq2d_challenge "
                        "prediction file (the reference's "
                        "inference_results.py output) to this path; "
                        "requires --annotations")
    args = p.parse_args(argv)
    if args.submission and not args.annotations:
        p.error("--submission requires --annotations (the raw Ego4D json "
                "provides the videos->clips->query_sets structure)")
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vilco_tpu.core.checkpoint import load_checkpoint
    from vilco_tpu.tasks.vq import (
        SyntheticVQSource,
        VQEpisodeRunner,
        VQTaskStream,
        make_synthetic_vq_split,
    )

    # the training runner persisted its model-defining settings — restore
    # them so the rebuilt ClipMatcher matches the checkpoint's shapes
    # (e.g. a flagship configs/vq_vilco.yaml run) without re-passing flags
    vq_kw = {}
    man = None
    manifest_path = os.path.join(args.workdir, "vq_config.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            man = json.load(f)
        if man.get("model_cfg"):
            from vilco_tpu.core.config import VQCfg

            vq_kw["model_cfg"] = VQCfg.from_dict(man["model_cfg"])
        if (args.window != man["window"]
                or args.frame_size != man["frame_size"]):
            logging.info(
                "vq_config.json overrides CLI shape: window=%d "
                "frame_size=%d", man["window"], man["frame_size"])
        # single override channel: the manifest rewrites the CLI shape
        args.window = man["window"]
        args.frame_size = man["frame_size"]

    if args.annotations:
        from vilco_tpu.data.vq_frames import (
            FrameDirSource,
            VideoFrameSource,
            group_by_category,
            group_splits,
            load_vq_annotations,
        )

        samples = load_vq_annotations(args.annotations, split="val")
        if args.train_annotations:
            train_s = load_vq_annotations(args.train_annotations, "train")
            _, tasks = group_splits(train_s, samples,
                                    args.categories_per_task)
        else:
            logging.warning(
                "no --train-annotations: category->task grouping is over "
                "val categories only and may NOT match the training run"
            )
            tasks = group_by_category(samples, args.categories_per_task)
        stream = VQTaskStream(tasks, tasks)
        if args.images_dir:
            src = FrameDirSource(args.images_dir,
                                 frame_size=args.frame_size)
        elif args.clip_dir:
            src = VideoFrameSource(args.clip_dir,
                                   frame_size=args.frame_size)
        else:
            p.error("--annotations needs --clip-dir or --images-dir")
        runner = VQEpisodeRunner(stream, src, args.workdir,
                                 window=args.window,
                                 frame_size=args.frame_size,
                                 persist_config=False, **vq_kw)
    else:
        rng = np.random.default_rng(0)
        train, val = make_synthetic_vq_split(rng, num_tasks=args.num_tasks)
        stream = VQTaskStream(train, val)
        # without a manifest the synthetic path keeps the tiny default
        # geometry (the CLI's 448/30 defaults describe flagship real data)
        syn_fs = args.frame_size if man else 32
        syn_win = args.window if man else 4
        src = SyntheticVQSource(frame_size=syn_fs)
        runner = VQEpisodeRunner(stream, src, args.workdir,
                                 window=syn_win, frame_size=syn_fs,
                                 persist_config=False, **vq_kw)

    ckpts = sorted(glob.glob(os.path.join(args.workdir, "vq_task_*.ckpt")))
    if ckpts:
        tree = load_checkpoint(ckpts[-1])
        runner.params = jax.tree.map(jnp.asarray, tree["params"])
        j = int(tree["task"])
    else:
        j = stream.num_tasks - 1

    results = runner.evaluate(j)
    if args.submission:
        from vilco_tpu.tasks.vq import build_vq_submission

        with open(args.annotations) as f:
            raw = json.load(f)
        sub = build_vq_submission(runner, raw)
        with open(args.submission, "w") as f:
            json.dump(sub, f)
        logging.info("wrote %s submission to %s",
                     sub["challenge"], args.submission)
    print(json.dumps(results, indent=2, default=float))
    return results


if __name__ == "__main__":
    main()
