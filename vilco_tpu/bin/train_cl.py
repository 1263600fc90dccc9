"""Unified CL training CLI — one entry point for all tasks/methods.

Replaces the per-task reference entry points (MQ/train_cl.py, NLQ/train_cl.py,
VQ/train_cl.py, MQ/train_bic.py):

  python -m vilco_tpu.bin.train_cl --config cfg.yaml --workdir ./runs/x
  python -m vilco_tpu.bin.train_cl --config cfg.yaml --synthetic  # smoke

Features come from the config's feat_folder (reference .pt/.npy/.pkl
formats) or the synthetic source for smoke runs.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=False, default=None)
    p.add_argument("--workdir", default="./runs/default")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic features + synthetic task split (smoke)")
    p.add_argument("--method", default=None,
                   help="override cl_cfg.name (naive|ewc|mas|icarl|bic|l2p|vilco)")
    p.add_argument("--reg-lambda", type=float, default=None,
                   help="override cl_cfg.reg_lambda (EWC/MAS penalty weight; "
                        "the reference's ewc/mas configs use 3000, e.g. "
                        "MQ/configs/mq_ewc_all_larger.yaml:66 — the synthetic "
                        "tiny config defaults to 0, which makes the penalty "
                        "a no-op)")
    p.add_argument("--task", default=None,
                   help="mq | nlq | vq (default from config)")
    p.add_argument("--num-tasks", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--joint", action="store_true",
                   help="merge all tasks into one (the reference's non-CL "
                        "train.py upper bound)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host bring-up: jax.distributed.initialize "
                        "when a coordinator is configured, then shard the "
                        "train data per host (torchrun/NCCL equivalent)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel over N devices (0 = single device; "
                        "-1 = all): batch sharded over a device mesh, "
                        "gradients all-reduced by XLA")
    p.add_argument("--init-from", default=None,
                   help="checkpoint to initialize model params from before "
                        "the episode starts (NLQ/train_ft.py fine-tune "
                        "entry point equivalent; extra/missing leaves — "
                        "e.g. a differently-sized cls head — keep their "
                        "fresh init)")
    p.add_argument("--workers", type=int, default=None,
                   help="loader worker threads (prefetching batch build)")
    p.add_argument("--batch-size", type=int, default=0,
                   help="override loader.batch_size (per-host; the global "
                        "batch under --distributed is batch_size * hosts)")
    p.add_argument("--accum-steps", type=int, default=0,
                   help="gradient accumulation: micro-batches per optimizer "
                        "step (reference config.train.accumulation_step); "
                        "effective batch = batch_size * K at batch_size "
                        "device memory")
    p.add_argument("--factored", action="store_true",
                   help="Adafactor-style factored second moment (halves "
                        "optimizer-state HBM traffic on the bandwidth-"
                        "bound TPU step; see RESULTS.md)")
    p.add_argument("--mu-dtype", choices=["bfloat16", "float32"],
                   default=None,
                   help="Adam first-moment dtype (default: config; the "
                        "shipped default is bfloat16 — float32 restores "
                        "exact reference AdamW state precision)")
    p.add_argument("--nu-dtype", choices=["bfloat16", "float32"],
                   default=None,
                   help="Adam second-moment STORAGE dtype (default "
                        "float32; bfloat16 halves nu-state HBM traffic "
                        "but must be quality-validated — see RESULTS.md)")
    p.add_argument("--params-bf16", action="store_true",
                   help="persistent bf16 compute copy of the matmul "
                        "kernels + bf16 grads over an f32 AdamW master "
                        "(standard TPU mixed-precision layout; forward "
                        "numerics identical — see RESULTS.md). Needs "
                        "model.compute_dtype=bfloat16 (the flagship "
                        "default; pass --compute-dtype bfloat16 on the "
                        "synthetic tiny config)")
    p.add_argument("--compute-dtype", choices=["bfloat16", "float32"],
                   default=None,
                   help="activation dtype override (default: config — "
                        "bfloat16 on the flagship shapes, float32 on the "
                        "tiny synthetic config)")
    p.add_argument("--ckpt-format", choices=["npz", "orbax"], default=None,
                   help="task-checkpoint array storage: npz (one zip, the "
                        "default) or orbax (tensorstore/OCDBT dir — the "
                        "TPU-native layout for large params); loaders "
                        "auto-detect either")
    p.add_argument("--seed", type=int, default=None,
                   help="override config.init_rand_seed (model init, data "
                        "order, synthetic fixtures) — the reference's "
                        "fix_random_seed knob, for paired quality sweeps")
    p.add_argument("--tensorboard", action="store_true",
                   help="mirror scalar metrics to TensorBoard events in "
                        "{workdir}/logs (the reference's SummaryWriter, "
                        "MQ/train_cl.py:74-75) alongside the JSONL stream")
    # real-data VQ sources (data/vq_frames.py)
    p.add_argument("--vq-annotations", default=None,
                   help="Ego4D vq_train.json (with --task vq)")
    p.add_argument("--vq-val-annotations", default=None,
                   help="Ego4D vq_val.json (defaults to --vq-annotations)")
    p.add_argument("--vq-clip-dir", default=None,
                   help="directory of {clip_uid}.mp4 clips")
    p.add_argument("--vq-images-dir", default=None,
                   help="directory of {clip_uid}/frame_XXXXXXX.jpg frames")
    p.add_argument("--vq-frame-size", type=int, default=None,
                   help="default: config vq.clip_size (448) for real data, "
                        "32 for --synthetic")
    p.add_argument("--vq-window", type=int, default=None)
    p.add_argument("--vq-categories-per-task", type=int, default=None)
    p.add_argument("--vit-ckpt", default=None,
                   help="local DINO/DINOv2/MAE torch checkpoint for the VQ "
                        "ViT backbone (models.vit.load_torch_vit_checkpoint)")
    # real-data NLQ sources (reference lmdb envs or imported per-key dirs,
    # see bin/import_lmdb.py)
    p.add_argument("--nlq-train-jsonl", default=None,
                   help="NLQ train annotations jsonl (with --task nlq)")
    p.add_argument("--nlq-val-jsonl", default=None)
    p.add_argument("--nlq-video-lmdb", default=None,
                   help="reference video-feature lmdb env (video_id keys)")
    p.add_argument("--nlq-text-lmdb", default=None,
                   help="reference text-feature lmdb env (query_id keys)")
    p.add_argument("--nlq-val-text-lmdb", default=None)
    p.add_argument("--nlq-video-dir", default=None,
                   help="dir of {video_id}.npy (import_lmdb unpack output)")
    p.add_argument("--nlq-text-dir", default=None,
                   help="dir of {query_id}.npz (import_lmdb unpack output)")
    args = p.parse_args(argv)
    if args.tensorboard:
        # picked up by MetricsLogger in whichever runner gets built
        os.environ["VILCO_TENSORBOARD_DIR"] = os.path.join(
            args.workdir, "logs")

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(message)s",
        handlers=[
            logging.StreamHandler(sys.stdout),
        ],
    )

    shard = (0, 1)
    if args.distributed:
        # MUST precede any XLA-backend-initializing call (model init,
        # jax.devices()), or jax.distributed.initialize() raises
        from vilco_tpu.parallel.mesh import init_distributed

        shard = init_distributed()

    def prep(runner):
        """Apply the shared pre-run flags on any task's runner."""
        dp = args.dp
        has_dp = hasattr(runner, "enable_data_parallel")
        if args.distributed:
            runner.shard = shard
            if shard[1] > 1 and not (
                    has_dp and getattr(runner, "supports_multihost", True)):
                # no multi-host support -> each host would train an
                # independent diverging replica; refuse rather than pretend
                p.error("--distributed with multiple hosts needs a runner "
                        "with multi-host data-parallel support")
            if shard[1] > 1 and not dp:
                # without a mesh each host would train an independent
                # diverging replica on 1/N of the data (no gradient
                # all-reduce) — --distributed implies DP over all devices
                logging.getLogger("vilco").warning(
                    "--distributed with %d hosts and no --dp: enabling "
                    "--dp -1 so gradients all-reduce", shard[1])
                dp = -1
        if dp and has_dp:
            from vilco_tpu.parallel.mesh import make_mesh

            n = None if dp == -1 else dp
            runner.enable_data_parallel(make_mesh(n))
        elif dp:
            p.error("--dp is not supported by this task's runner")
        if args.init_from:
            from vilco_tpu.core.checkpoint import load_params_into

            runner.params = load_params_into(args.init_from, runner.params)
        return runner

    from vilco_tpu.core.config import load_config
    from vilco_tpu.cl.episode import EpisodeRunner
    from vilco_tpu.cl.stream import TaskStream
    from vilco_tpu.data.pipeline import DirFeatureSource, SyntheticFeatureSource
    from vilco_tpu.data.synthetic import make_synthetic_cl_split, tiny_config

    from vilco_tpu.tasks.nlq import nlq_tiny_config

    if args.config:
        cfg = load_config(args.config)
    elif args.task == "nlq":
        cfg = nlq_tiny_config()
    else:
        cfg = tiny_config()
    if args.method == "vilco":
        # the full ViLCo recipe (configs/mq_vilco.yaml cl_cfg): L2P prompt
        # pool + rehearsal memory + narration-SSL + EMA time-adapters
        cl = cfg.cl_cfg
        cfg = cfg.updated(cl_cfg=cl.updated(
            name="l2p", prompt_pool=True, narration_ssl=True,
            use_adapt=True,
            adapt_blocks=cl.adapt_blocks or (0, 1, 2),
            memory_size=cl.memory_size
            or 2 * cfg.dataset.num_classes,
        ))
    elif args.method:
        cfg = cfg.updated(cl_cfg=cfg.cl_cfg.updated(name=args.method))
        if args.method == "l2p" and not cfg.cl_cfg.prompt_pool:
            # L2P IS the prompt pool (reference cl_methods/prompt.py wired
            # via cl_cfg.prompt_pool) — method name alone would be naive
            cfg = cfg.updated(
                cl_cfg=cfg.cl_cfg.updated(prompt_pool=True))
        if args.method in ("icarl", "bic") and cfg.cl_cfg.memory_size == 0:
            # rehearsal-based methods are meaningless without exemplars
            # (distillation and BiC stage-2 are gated on known classes) —
            # the reference always pairs them with a memory budget
            cfg = cfg.updated(cl_cfg=cfg.cl_cfg.updated(
                memory_size=2 * cfg.dataset.num_classes
            ))
    if args.reg_lambda is not None:
        cfg = cfg.updated(
            cl_cfg=cfg.cl_cfg.updated(reg_lambda=args.reg_lambda))
    if args.accum_steps:
        cfg = cfg.updated(
            opt=cfg.opt.updated(accumulation_steps=args.accum_steps))
    if args.factored:
        cfg = cfg.updated(opt=cfg.opt.updated(second_moment="factored"))
    if args.mu_dtype:
        cfg = cfg.updated(opt=cfg.opt.updated(mu_dtype=args.mu_dtype))
    if args.nu_dtype:
        cfg = cfg.updated(opt=cfg.opt.updated(nu_dtype=args.nu_dtype))
    if args.compute_dtype:
        cfg = cfg.updated(
            model=cfg.model.updated(compute_dtype=args.compute_dtype))
    if args.params_bf16:
        cfg = cfg.updated(
            opt=cfg.opt.updated(param_compute_dtype="bfloat16"))
    if args.seed is not None:
        cfg = cfg.updated(init_rand_seed=args.seed)
    if args.ckpt_format is not None:
        cfg = cfg.updated(ckpt_format=args.ckpt_format)
    if args.epochs:
        cfg = cfg.updated(opt=cfg.opt.updated(epochs=args.epochs))
    if args.num_tasks:
        cfg = cfg.updated(cl_cfg=cfg.cl_cfg.updated(num_tasks=args.num_tasks))
    if args.workers is not None:
        cfg = cfg.updated(loader=cfg.loader.updated(num_workers=args.workers))
    if args.batch_size:
        cfg = cfg.updated(loader=cfg.loader.updated(
            batch_size=args.batch_size))

    import numpy as np

    task = args.task or cfg.task
    text_source = None
    if task == "vq" and args.params_bf16:
        p.error("--params-bf16 covers the point-transformer engine "
                "(mq/nlq); the VQ runner's optimizer does not consume it")
    if task == "vq":
        # VQ (visual query 2-D tracking) episode — replaces VQ/train_cl.py
        from vilco_tpu.tasks.vq import (
            SyntheticVQSource, VQEpisodeRunner, VQTaskStream,
            make_synthetic_vq_split,
        )

        # flagship knobs come from the config's vq section
        # (configs/vq_vilco.yaml); CLI flags override
        vqc = cfg.vq if args.config else None
        if vqc is not None:
            # CLI size flags override the config consistently (the frame
            # source AND the model must agree on the geometry)
            if args.vq_frame_size:
                vqc = vqc.updated(clip_size=args.vq_frame_size,
                                  query_size=args.vq_frame_size)
            if args.vq_window:
                vqc = vqc.updated(num_frames=args.vq_window)
        # init_rand_seed (and therefore --seed) drives the VQ runner too:
        # model init, batch order, augmentation, rehearsal memory
        vq_kw = {"seed": cfg.init_rand_seed,
                 "ckpt_format": cfg.ckpt_format}
        if vqc is not None:
            vq_kw.update(
                model_cfg=vqc, batch_size=vqc.batch_size, lr=vqc.lr,
                weight_decay=vqc.weight_decay, use_hnm=vqc.use_hnm,
                augment=vqc.augment,
                positive_threshold=vqc.positive_threshold,
                positive_topk=vqc.positive_topk,
                vit_ckpt=args.vit_ckpt or vqc.vit_ckpt,
                accumulation_steps=vqc.accumulation_steps,
            )
        elif args.vit_ckpt:
            vq_kw["vit_ckpt"] = args.vit_ckpt
        if args.accum_steps:
            vq_kw["accumulation_steps"] = args.accum_steps
        if args.batch_size:
            vq_kw["batch_size"] = args.batch_size
        if args.reg_lambda is not None:
            vq_kw["reg_lambda"] = args.reg_lambda

        if args.vq_annotations:
            from vilco_tpu.data.vq_frames import (
                FrameDirSource, VideoFrameSource, group_splits,
                load_vq_annotations,
            )

            frame_size = args.vq_frame_size or (
                vqc.clip_size if vqc else 448)
            window = args.vq_window or (vqc.num_frames if vqc else 30)
            train_s = load_vq_annotations(args.vq_annotations, "train")
            val_s = load_vq_annotations(
                args.vq_val_annotations or args.vq_annotations, "val"
            )
            per = args.vq_categories_per_task or (
                vqc.categories_per_task if vqc else 400)
            stream = VQTaskStream(*group_splits(train_s, val_s, per))
            if args.joint:
                from vilco_tpu.tasks.vq import merge_vq_tasks

                stream = merge_vq_tasks(stream)
            if args.vq_images_dir:
                source = FrameDirSource(args.vq_images_dir,
                                        frame_size=frame_size)
            elif args.vq_clip_dir:
                source = VideoFrameSource(args.vq_clip_dir,
                                          frame_size=frame_size)
            else:
                p.error("--vq-annotations needs --vq-clip-dir or "
                        "--vq-images-dir")
            runner = VQEpisodeRunner(
                stream, source, args.workdir,
                window=window, frame_size=frame_size,
                method=args.method or "naive",
                epochs=args.epochs or 4,
                memory_size=(2 * per
                             if args.method in ("icarl", "rehearsal",
                                                "vilco") else 0),
                **vq_kw,
            )
            results = prep(runner).run()
            out = os.path.join(args.workdir, "results.json")
            with open(out, "w") as f:
                json.dump(results, f, indent=2)
            print(json.dumps({
                "final_avg_tAP25": results["final"]["avg_tAP25"],
                "final_avg_stAP25": results["final"]["avg_stAP25"],
                "final_avg_success": results["final"]["avg_success"],
                "results_file": out,
            }))
            return results
        if not args.synthetic:
            p.error("--task vq needs --synthetic or --vq-annotations "
                    "with a frame source")
        rng = np.random.default_rng(cfg.init_rand_seed)
        train_tasks, val_tasks = make_synthetic_vq_split(
            rng, num_tasks=args.num_tasks or 3
        )
        stream = VQTaskStream(train_tasks, val_tasks)
        if args.joint:
            # non-CL upper bound (VQ/train_anchor.py)
            from vilco_tpu.tasks.vq import merge_vq_tasks

            stream = merge_vq_tasks(stream)
        syn_frame = args.vq_frame_size or (vqc.clip_size if vqc else 32)
        syn_window = args.vq_window or (vqc.num_frames if vqc else 4)
        runner = VQEpisodeRunner(
            # window/frame_size keep the model geometry in sync with the
            # source when the size flags are used without a config
            # (model_cfg in vq_kw overrides both when a config is given)
            stream, SyntheticVQSource(frame_size=syn_frame), args.workdir,
            window=syn_window, frame_size=syn_frame,
            method=args.method or "naive",
            epochs=args.epochs or 4,
            memory_size=8 if args.method in ("icarl", "rehearsal") else 0,
            **vq_kw,
        )
        results = prep(runner).run()
        out = os.path.join(args.workdir, "results.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps({
            "final_avg_tAP25": results["final"]["avg_tAP25"],
            "final_avg_stAP25": results["final"]["avg_stAP25"],
            "final_avg_success": results["final"]["avg_success"],
            "results_file": out,
        }))
        return results
    if task == "nlq" and args.nlq_train_jsonl:
        from vilco_tpu.tasks.nlq import build_nlq_runner

        runner = build_nlq_runner(
            cfg, args.workdir, args.nlq_train_jsonl,
            args.nlq_val_jsonl or args.nlq_train_jsonl,
            video_lmdb=args.nlq_video_lmdb, text_lmdb=args.nlq_text_lmdb,
            val_text_lmdb=args.nlq_val_text_lmdb,
            video_dir=args.nlq_video_dir, text_dir=args.nlq_text_dir,
        )
    elif args.synthetic and task == "nlq":
        from vilco_tpu.tasks.nlq import (
            NLQEpisodeRunner, NLQTaskStream, SyntheticNLQFeatures,
            make_synthetic_nlq_split,
        )

        rng = np.random.default_rng(cfg.init_rand_seed)
        train_tasks, val_tasks = make_synthetic_nlq_split(rng, cfg)
        stream = NLQTaskStream(train_tasks, val_tasks)
        feat = SyntheticNLQFeatures(cfg.dataset.input_dim, cfg.model.n_txt_in)
        nar = None
        if cfg.cl_cfg.narration_ssl:
            from vilco_tpu.data.pipeline import SyntheticNarrationSource

            nar = SyntheticNarrationSource(
                cfg.cl_cfg.narration_dim,
                cfg.dataset.max_narration_len,
            )
        runner = NLQEpisodeRunner(cfg, stream, feat.video,
                                  workdir=args.workdir,
                                  text_source=feat.text,
                                  narration_source=nar)
    else:
        if args.synthetic:
            if cfg.cl_cfg.prompt_pool and not cfg.dataset.use_text:
                # L2P prompts prepend to TEXT tokens (meta_archs.py:759-780)
                # — without a text stream the pool is dead code. Give the
                # synthetic episode the reference's text plumbing: per-clip
                # class-conditional prompt features + cross-modal fusion.
                cfg = cfg.updated(
                    dataset=cfg.dataset.updated(use_text=True),
                    model=cfg.model.updated(
                        use_cross_modal=True,
                        n_txt_in=cfg.model.n_txt_in or 16),
                ).derived()   # re-derive: cl_cfg.embed_dim <- n_txt_in
            rng = np.random.default_rng(cfg.init_rand_seed)
            train_tasks, val_tasks = make_synthetic_cl_split(rng, cfg)
            stream = TaskStream(train_tasks, val_tasks)
            src = SyntheticFeatureSource(cfg.dataset.input_dim)
            text_src = None
            if cfg.dataset.use_text:
                from vilco_tpu.data.pipeline import SyntheticTextSource

                text_src = SyntheticTextSource(
                    cfg.model.n_txt_in, cfg.dataset.max_text_len)
            nar = None
            if cfg.cl_cfg.narration_ssl:
                from vilco_tpu.data.pipeline import SyntheticNarrationSource

                nar = SyntheticNarrationSource(
                    cfg.cl_cfg.narration_dim,
                    cfg.dataset.max_narration_len,
                )
            runner = EpisodeRunner(cfg, stream, src, workdir=args.workdir,
                                   text_source=text_src,
                                   narration_source=nar)
        else:
            from vilco_tpu.tasks.mq import build_mq_runner

            runner = build_mq_runner(cfg, args.workdir)
        if args.joint:
            # non-CL joint training (reference MQ/train.py upper bound)
            from vilco_tpu.cl.stream import merge_tasks

            runner.stream = merge_tasks(runner.stream)
            runner._setup_eval()
    results = prep(runner).run(resume=args.resume)
    out = os.path.join(args.workdir, "results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({
        "final_avg_mAP": results["final"]["avg_mAP"],
        "final_R1@0.5": results["final"]["avg_R1@0.5"],
        "BwF_R1@0.5": results["final"]["BwF_R1@0.5"],
        "results_file": out,
    }))
    return results


if __name__ == "__main__":
    main()
