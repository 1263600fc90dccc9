"""Benchmark: MQ flagship training throughput (clips/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/s/chip", "vs_baseline": N}

Measures the jitted train step of the flagship MQ point-transformer
(embd 1024, T=1024, arch (2,2,9), 110 classes, XL stage — mirroring
configs/mq_vilco.yaml) on synthetic feature batches. Defaults: batch 16,
4 lax.scan-fused steps per dispatch, fused XL + fused full-attention
(BLC) + fused dwconv-qkv Pallas kernels + single-pass packed-state fused
AdamW — 137.8 clips/s/chip measured on one v5e (116.1 ms/step, round 5).
The reference's batch-2 setting: `--batch 2 --scan-steps 1`. `--model
nlq` benches the dual-tower NLQ flagship (249.5 clips/s/chip at the
batch-8 default); `--model vq` the frozen-ViT tracker (14.76 samples/s,
270.9 ms/step); `--model vq --eval` the sliding-window inference path
(501 frames/s/chip); `--eval` (mq) the batched inference+NMS path
(254 clips/s after the round-5 class-bucketed NMS).

Baseline: the reference publishes NO throughput numbers (BASELINE.md). The
constant below is an estimate of the reference PyTorch pipeline's training
throughput on its target single GPU (torch 1.12, batch 2, measured-class
hardware: ~8 it/s => ~16 clips/s for this model size; see
MQ/libs/utils/train_utils.py:278 train_one_epoch). It is marked estimated
until the reference can be profiled on real GPU hardware — treat
`vs_baseline` accordingly.

Usage: python bench.py [--fast] [--steps N] [--batch B]
"""

from __future__ import annotations

import argparse
import json
import os
import time

# Persistent compile cache: remote TPU compilation through the axon tunnel is
# slow for large modules; a warmed cache makes repeat runs fast.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache",
                 "jax_tpu"),
)
# Initialize params on CPU: the init graph alone remote-compiles for minutes.
if "axon" in os.environ.get("JAX_PLATFORMS", ""):
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

REFERENCE_GPU_CLIPS_PER_S_ESTIMATE = 16.0
# VQ: reference trains batch 4 of 30x448x448 windows through a frozen
# ViT-B/14 + tracker head on one GPU with grad accumulation — roughly
# ~2 samples/s on its target hardware (estimate; no published numbers)
REFERENCE_GPU_VQ_SAMPLES_PER_S_ESTIMATE = 2.0


V5E_BF16_PEAK_FLOPS = 197e12     # per chip


def _mfu_detail(make_lowered, step_ms, dispatch_steps=1):
    """Analytic per-step FLOPs / HBM bytes + MFU for the bench record
    (VERDICT r4 #7).

    `make_lowered()` must trace+lower a FUSED-OFF twin of the measured
    step at identical shapes: lowering only (no second device compile —
    the axon tunnel recompiles even on persistent-cache hits, ~10 min per
    flagship model), and fused-off so the XLA cost model sees every op
    (Pallas kernels lower to opaque custom-calls that count zero flops).
    Pre-optimization HLO: flop counts are exact; "bytes accessed" is an
    upper bound (fusion removes intermediate traffic) — the measured
    roofline tables in RESULTS.md remain the bandwidth ground truth.

    The twin is lowered FOR THE CPU BACKEND (abstract ShapeDtypeStruct
    args + default_device(cpu)): pre-compile `cost_analysis()` returns
    None for the axon/TPU plugin, while the CPU lowering carries the
    analytical HLO cost model — flop counts are backend-independent.
    """
    import jax

    try:
        ca = make_lowered().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        if ca is None:
            raise ValueError("cost_analysis() returned None "
                             "(non-CPU lowering?)")
        fl = float(ca.get("flops", float("nan"))) / dispatch_steps
        by = float(ca.get("bytes accessed", float("nan"))) / dispatch_steps
        out = {
            "tflops_step": round(fl / 1e12, 3),
            "gb_step_preopt": round(by / 1e9, 2),
        }
        if jax.devices()[0].platform == "tpu" and step_ms > 0:
            out["mfu_pct"] = round(
                fl / (step_ms / 1e3) / V5E_BF16_PEAK_FLOPS * 100, 1)
        return out
    except Exception as e:          # cost analysis must never fail a bench
        return {"cost_analysis_error": f"{type(e).__name__}: {e}"[:120]}


def bench_eval(args, cfg, model, params, points, n_params, accel, rng):
    """Inference throughput: batched forward + on-device decode + NMS in
    one jitted call. The reference's eval path is batch-1 with a host
    round-trip into the C++ NMS op (meta_archs.py:1694-1736)."""
    import jax
    import jax.numpy as jnp

    from vilco_tpu.data.synthetic import make_batch
    from vilco_tpu.ops.decode import decode_and_nms_batch

    t = cfg.test_cfg
    B = cfg.loader.batch_size

    @jax.jit
    def eval_fn(params, feats, mask, text, text_mask, class_mask):
        out = model.apply({"params": params}, feats, mask,
                          text=text, text_mask=text_mask,
                          deterministic=True)
        return decode_and_nms_batch(
            points, out["cls_logits"], out["offsets"], out["fpn_mask"],
            class_mask,
            num_classes=cfg.model.num_classes,
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

    class_mask = jax.device_put(
        jnp.ones((cfg.model.num_classes,), bool), accel
    )
    batches = []
    for _ in range(2):
        b = make_batch(rng, B, cfg)
        batches.append(jax.device_put(
            (jnp.asarray(b["feats"]), jnp.asarray(b["mask"]),
             jnp.asarray(b["text"]) if "text" in b else None,
             jnp.asarray(b["text_mask"]) if "text_mask" in b else None),
            accel,
        ))
    for i in range(max(args.warmup, 1)):   # >=1: bind det + compile
        det = eval_fn(params, *batches[i % 2], class_mask)
    float(det.scores[0, 0])
    t0 = time.perf_counter()
    for i in range(args.steps):
        det = eval_fn(params, *batches[i % 2], class_mask)
    float(det.scores[0, 0])
    dt = time.perf_counter() - t0
    # eval_fn is a single-device jit pinned to `accel` — per-chip by
    # construction, no device_count division
    value = args.steps * B / dt
    return {
        "metric": f"{args.model}_flagship_eval_throughput",
        "value": round(value, 3),
        "unit": "clips/s/chip",
        "vs_baseline": round(value / REFERENCE_GPU_CLIPS_PER_S_ESTIMATE, 3),
        "detail": {
            "batch": B, "steps": args.steps,
            "step_ms": round(dt / args.steps * 1e3, 2),
            "params_m": round(n_params / 1e6, 1),
            "nms": t.nms_method, "max_seg_num": t.max_seg_num,
            "devices": jax.device_count(),
            "platform": jax.devices()[0].platform,
            "baseline_estimated": True,
        },
    }


def bench_vq(args):
    """VQ ClipMatcher train-step throughput (samples/s/chip; one sample =
    one 30-frame 448^2 window + query through the frozen ViT-B/14-shaped
    backbone + tracker, mirroring VQ/config/train_cl.yaml)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from vilco_tpu.models.clip_matcher import ClipMatcher
    from vilco_tpu.train.vq_engine import VQTrainState, make_vq_train_step

    if args.fast:
        B, T, S, P = 2, 4, 32, 8
        vit = dict(vit_dim=48, vit_depth=2, vit_heads=4)
        dim, rt, ra = 64, 4, 4
    else:
        B, T, S, P = (args.batch or 4), 30, 448, 14
        vit = dict(vit_dim=768, vit_depth=12, vit_heads=12)  # ViT-B/14
        dim, rt, ra = 256, 8, 16
    # --attn flash swaps the ViT kernel; --no-fused reproduces the
    # XLA-attention baseline rows of RESULTS.md ("--attn xla" is the MQ
    # bench's default string and is NOT an unfuse switch here)
    vit_impl = "flash" if args.attn == "flash" else "pallas"
    mk = lambda fused: ClipMatcher(
        dim=dim, clip_size=S, patch_size=P,
        resolution_transformer=rt, resolution_anchor_feat=ra,
        num_transformer=3, window_transformer=5,
        num_frames=T, use_fused=fused, vit_attn_impl=vit_impl,
        use_fused_mlp=fused and args.fused_mlp, **vit)
    # fused Pallas attention on the accelerator; the CPU init twin stays
    # unfused (identical param tree — the kernels hold no params)
    model = mk(jax.default_backend() != "cpu" and not args.no_fused)
    init_twin = mk(False)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    accel = jax.devices()[0]
    rng = np.random.default_rng(0)

    def fresh_batch():
        return {
            "clip": jnp.asarray(rng.random((B, T, S, S, 3), np.float32)),
            "query": jnp.asarray(rng.random((B, S, S, 3), np.float32)),
            "clip_bbox": jnp.asarray(
                np.tile([0.3, 0.3, 0.6, 0.6], (B, T, 1)).astype(np.float32)
            ),
            "clip_with_bbox": jnp.ones((B, T), jnp.float32),
            "before_query": jnp.ones((B, T), jnp.float32),
        }

    # init with a (1, 1, S, S, 3) clip: params are batch/time-shape
    # independent and the full-size init forward costs ~15 min on the
    # 1-core host CPU
    with jax.default_device(cpu):
        params = init_twin.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1, S, S, 3), jnp.float32),
            jnp.zeros((1, S, S, 3), jnp.float32),
            deterministic=True,
        )["params"]
    params = jax.device_put(params, accel)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    from vilco_tpu.train.vq_engine import make_vq_optimizer

    # frozen ViT excluded from the optimizer (reference
    # VQ/utils/train_utils.py:8-15) — no Adam state for its ~86M params
    tx = make_vq_optimizer(1e-4, 1e-4, freeze_backbone=True)
    with jax.default_device(cpu):
        opt_state = tx.init(jax.device_put(params, cpu))
    state = VQTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=jax.device_put(opt_state, accel),
        rng=jax.random.PRNGKey(1),
    )
    if args.eval:
        # sliding-window INFERENCE throughput: batched windows through the
        # jitted forward + per-frame top-anchor decode (the reference runs
        # decord decode + per-window forward on GPU with a multiprocessing
        # pool, VQ/evaluation/task_inference_predict.py)
        from vilco_tpu.train.vq_engine import make_vq_eval_step

        estep = make_vq_eval_step(model)
        clips = [jax.device_put(fresh_batch()["clip"], accel)
                 for _ in range(2)]
        query = jax.device_put(fresh_batch()["query"], accel)
        for i in range(max(args.warmup, 1)):
            bbox, prob = estep(params, clips[i % 2], query)
        float(prob[0, 0])
        t0 = time.perf_counter()
        for i in range(args.steps):
            bbox, prob = estep(params, clips[i % 2], query)
        float(prob[0, 0])
        dt = time.perf_counter() - t0
        value = args.steps * B * T / dt / jax.device_count()
        return {
            "metric": "vq_flagship_eval_throughput",
            "value": round(value, 3),
            "unit": "frames/s/chip",
            "vs_baseline": round(
                value / (REFERENCE_GPU_VQ_SAMPLES_PER_S_ESTIMATE * T), 3
            ),
            "detail": {
                "batch": B, "frames": T, "size": S,
                "steps": args.steps,
                "window_ms": round(dt / (args.steps * B) * 1e3, 2),
                "params_m": round(n_params / 1e6, 1),
                "devices": jax.device_count(),
                "platform": jax.devices()[0].platform,
                "baseline_estimated": True,
            },
        }

    A = max(args.accum_steps, 1)
    step = make_vq_train_step(model, tx, accumulation_steps=A)
    # one step consumes A micro-batches of B samples each; detail.batch
    # stays the micro batch (same semantics as the mq/nlq records)
    micro_b = B
    B = B * A
    batches = [jax.device_put(fresh_batch(), accel) for _ in range(2)]

    for i in range(max(args.warmup, 1)):   # >=1: bind metrics + compile
        state, metrics = step(state, batches[i % 2])
    float(metrics["final_loss"])
    t0 = time.time()
    for i in range(args.steps):
        state, metrics = step(state, batches[i % 2])
    loss_val = float(metrics["final_loss"])
    dt = time.time() - t0
    value = args.steps * B / dt / jax.device_count()
    step_ms = round(dt / args.steps * 1e3, 2)

    def _lower_twin():
        ana_step = make_vq_train_step(init_twin, tx, accumulation_steps=A)
        sds = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            (state, batches[0]))
        with jax.default_device(jax.devices("cpu")[0]):
            return ana_step.lower(*sds)

    return {
        "metric": "vq_flagship_train_throughput",
        "value": round(value, 3),
        "unit": "samples/s/chip",
        "vs_baseline": round(
            value / REFERENCE_GPU_VQ_SAMPLES_PER_S_ESTIMATE, 3
        ),
        "detail": {
            "batch": micro_b, "frames": T, "size": S,
            "steps": args.steps, "accum_steps": A,
            "step_ms": step_ms,
            "params_m": round(n_params / 1e6, 1),
            "devices": jax.device_count(),
            "platform": jax.devices()[0].platform,
            "loss": loss_val,
            "baseline_estimated": True,
            **_mfu_detail(_lower_twin, step_ms),
        },
    }


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fast", action="store_true",
                   help="tiny shapes (CPU smoke)")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--batch", type=int, default=None,
                   help="batch size (default: 16 for mq, the measured "
                        "throughput sweet spot on a 16GB v5e; 4 for vq; "
                        "config default for nlq)")
    p.add_argument("--model", choices=["mq", "nlq", "vq"], default=None,
                   help="bench ONE model (default: all three — see --all)")
    p.add_argument("--attn", choices=["xla", "flash", "pallas_naive"],
                   default="xla")
    p.add_argument("--no-fused", action="store_true",
                   help="disable Pallas fused attention kernels")
    p.add_argument("--fused", action="store_true",
                   help="enable the fused full-attention Pallas kernel "
                        "(kernels/attention.py) in MaskedMHA/MaskedMHCA")
    p.add_argument("--no-fused-xl", action="store_true",
                   help="disable the fused Pallas XL relative-attention "
                        "kernel (default on; 104 -> 74.7 ms/step)")
    p.add_argument("--no-fused-conv", action="store_true",
                   help="disable the fused depthwise q/k/v conv kernel "
                        "(kernels/dwconv.py; default on)")
    p.add_argument("--mu-bf16", action="store_true",
                   help="Adam first moment in bfloat16 (the default since "
                        "round 2; flag kept for script compat)")
    p.add_argument("--fused-mlp", action="store_true",
                   help="opt-in fused ViT MLP kernel for --model vq "
                        "(measured 430.7 vs 418.8 ms/step — see RESULTS)")
    p.add_argument("--nu-bf16", action="store_true",
                   help="Adam second moment STORED in bfloat16 (the "
                        "default since round 3; flag kept for script "
                        "compat)")
    p.add_argument("--nu-f32", action="store_true",
                   help="Adam second moment in float32 (exact reference "
                        "AdamW state precision)")
    p.add_argument("--params-bf16", action="store_true",
                   help="persistent bf16 compute copy of the matmul "
                        "kernels + bf16 grads, f32 AdamW master (standard "
                        "TPU mixed-precision layout; forward numerics "
                        "identical, grads get one extra bf16 rounding)")
    p.add_argument("--mu-f32", action="store_true",
                   help="Adam first moment in float32 (the pre-round-2 "
                        "default; exact reference state precision)")
    p.add_argument("--flat-opt", action="store_true",
                   help="optax.flatten the moment update into one flat "
                        "buffer (same math, far fewer kernels)")
    p.add_argument("--factored", action="store_true",
                   help="Adafactor-style factored second moment (halves "
                        "optimizer-state HBM traffic; non-reference "
                        "semantics, opt-in)")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation micro-batches per optimizer "
                        "step (in-step lax.scan): effective batch = "
                        "batch * accum at batch device memory — e.g. "
                        "effective MQ batch 32 past the 16GB OOM at 32")
    p.add_argument("--scan-steps", type=int, default=4,
                   help="train steps fused per dispatch via lax.scan; "
                        "1 = plain per-step dispatch")
    p.add_argument("--eval", action="store_true",
                   help="benchmark INFERENCE instead: batched forward + "
                        "on-device decode + NMS (the reference evals "
                        "batch-1 with a CPU C++ NMS round-trip)")
    p.add_argument("--all", action="store_true",
                   help="bench mq + nlq + vq and emit ONE line: the MQ "
                        "headline with nlq/vq sub-records under "
                        "detail.sub (round-over-round regression trail "
                        "for the non-flagship models). This is the "
                        "DEFAULT when no --model/--eval is given, so the "
                        "driver's plain `python bench.py` records all "
                        "three families (VERDICT r2 #5)")
    args = p.parse_args(argv)
    if args.model is None and not args.eval:
        args.all = True
    args.model = args.model or "mq"
    return args


def run_one(args):
    """Run one model's bench and return its JSON record."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _nlq_flagship_cfg
    from vilco_tpu.data.synthetic import make_batch
    from vilco_tpu.models.point_transformer import (
        PointTransformer,
        level_lengths,
    )
    from vilco_tpu.ops.assign import generate_points
    from vilco_tpu.train.engine import (
        CLBatchExtras,
        TrainState,
        make_multi_train_step,
        make_train_step,
    )
    from vilco_tpu.train.optim import make_optimizer

    if args.model == "vq":
        return bench_vq(args)  # returns the record

    if args.model == "nlq":
        if args.fast:
            from vilco_tpu.tasks.nlq import nlq_tiny_config

            cfg = nlq_tiny_config()
        else:
            cfg = _nlq_flagship_cfg()
    else:
        cfg = _flagship_cfg(tiny=args.fast)
    if args.no_fused:
        cfg = cfg.updated(model=cfg.model.updated(fused_attention=False))
    if args.fused:
        cfg = cfg.updated(model=cfg.model.updated(fused_attention=True))
    if args.attn != "xla":
        cfg = cfg.updated(model=cfg.model.updated(attention_impl=args.attn))
    if args.no_fused_xl:
        cfg = cfg.updated(model=cfg.model.updated(fused_xl=False))
    if args.no_fused_conv:
        cfg = cfg.updated(model=cfg.model.updated(fused_conv=False))
    if args.mu_bf16:
        cfg = cfg.updated(opt=cfg.opt.updated(mu_dtype="bfloat16"))
    if args.mu_f32:
        cfg = cfg.updated(opt=cfg.opt.updated(mu_dtype="float32"))
    if args.nu_bf16:
        cfg = cfg.updated(opt=cfg.opt.updated(nu_dtype="bfloat16"))
    if args.nu_f32:
        cfg = cfg.updated(opt=cfg.opt.updated(nu_dtype="float32"))
    if args.params_bf16:
        cfg = cfg.updated(
            opt=cfg.opt.updated(param_compute_dtype="bfloat16"))
    if args.factored:
        cfg = cfg.updated(opt=cfg.opt.updated(second_moment="factored"))
    if args.flat_opt:
        cfg = cfg.updated(opt=cfg.opt.updated(flatten=True))
    if args.batch and not args.fast:
        cfg = cfg.updated(loader=cfg.loader.updated(batch_size=args.batch))
    elif args.model == "mq" and not args.fast:
        # measured sweet spot: 128 clips/s at batch 16 vs 118.5 at batch 8
        # (batch 32 OOMs the 16 GB v5e)
        cfg = cfg.updated(loader=cfg.loader.updated(batch_size=16))
    elif args.model == "nlq" and not args.fast:
        # measured sweet spot: 232.6 clips/s at batch 8 vs 192 at batch 4
        # and 215.9 at batch 16
        cfg = cfg.updated(loader=cfg.loader.updated(batch_size=8))
    B = cfg.loader.batch_size

    model = PointTransformer(cfg.model, cfg.cl_cfg)
    rng = np.random.default_rng(0)
    batch_np = make_batch(rng, B, cfg)

    # init on CPU (cheap interpile), then transfer to the accelerator
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    accel = jax.devices()[0]
    # init with a fused-off twin (identical param tree; Pallas kernels hold
    # no params and can't trace on the CPU init device)
    init_model = PointTransformer(
        cfg.model.updated(fused_attention=False, fused_conv=False, attention_impl="xla", fused_xl=False), cfg.cl_cfg
    )
    init_kw = {}
    if "text" in batch_np:
        init_kw["text"] = jnp.asarray(batch_np["text"])
        init_kw["text_mask"] = jnp.asarray(batch_np["text_mask"])
    with jax.default_device(cpu):
        feats0 = jnp.asarray(batch_np["feats"])
        mask0 = jnp.asarray(batch_np["mask"])
        params = init_model.init(
            jax.random.PRNGKey(0), feats0, mask0, deterministic=True,
            **init_kw,
        )["params"]
    params = jax.device_put(params, accel)
    from vilco_tpu.train.engine import cast_input_features

    batch = jax.device_put(
        {k: jnp.asarray(v) for k, v in
         cast_input_features(batch_np, cfg.model.compute_dtype).items()},
        accel,
    )
    n_params = sum(x.size for x in jax.tree.leaves(params))

    tx, _ = make_optimizer(cfg.opt, params, steps_per_epoch=100)
    points = jnp.asarray(generate_points(
        level_lengths(cfg.model), cfg.model.fpn_strides,
        cfg.model.regression_range,
    ))
    if args.eval:
        return bench_eval(args, cfg, model, params, points,
                          n_params, accel, rng)  # returns the record
    K = max(args.scan_steps, 1)
    A = max(args.accum_steps, 1)
    if K > 1:
        step = make_multi_train_step(model, tx, points, cfg, K,
                                     accumulation_steps=A)
    else:
        step = make_train_step(model, tx, points, cfg,
                               accumulation_steps=A)
    with jax.default_device(cpu):
        opt_state = tx.init(jax.device_put(params, cpu))
    opt_state = jax.device_put(opt_state, accel)
    params_c = None
    if cfg.opt.param_compute_dtype == "bfloat16":
        from vilco_tpu.train.optim import make_compute_copy

        params_c = make_compute_copy(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=opt_state,
        loss_normalizer=jnp.asarray(100.0, jnp.float32),
        rng=jax.random.PRNGKey(1),
        params_c=params_c,
    )
    # commit EVERY input to the accelerator: with JAX_PLATFORMS=axon,cpu an
    # uncommitted input makes jit lower per-platform, and TPU-only pallas
    # kernels refuse the CPU lowering
    state = jax.device_put(state, accel)
    points = jax.device_put(points, accel)
    cl = CLBatchExtras(class_mask=jnp.ones((cfg.model.num_classes,), bool))
    cl = jax.device_put(cl, accel)

    # pre-build distinct batches so the loop isn't one cached input
    # (with accumulation, one step consumes A micro-batches of B clips)
    def fresh_batch():
        from vilco_tpu.train.engine import cast_input_features

        b = cast_input_features(make_batch(rng, B * A, cfg),
                                cfg.model.compute_dtype)
        return {k: jnp.asarray(v) for k, v in b.items()}

    if K > 1:
        batches = [
            jax.device_put(
                jax.tree.map(lambda *xs: jnp.stack(xs),
                             *[fresh_batch() for _ in range(K)]),
                accel,
            )
            for _ in range(2)
        ]
    else:
        batches = [jax.device_put(fresh_batch(), accel) for _ in range(4)]

    for i in range(args.warmup):
        state, metrics, _ = step(state, batches[i % len(batches)], cl)
    # force a real device->host readback: under the axon tunnel,
    # block_until_ready returns before remote execution finishes
    float(metrics["final_loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics, _ = step(state, batches[i % len(batches)], cl)
    loss_val = float(metrics["final_loss"])
    dt = time.perf_counter() - t0

    clips_per_s = args.steps * K * B * A / dt
    n_chips = jax.device_count()
    value = clips_per_s / n_chips
    step_ms = round(dt / (args.steps * K) * 1e3, 2)

    def _lower_twin():
        # the twin lowers for CPU: the TPU-only Pallas AdamW opt-in must
        # stay off or the CPU lowering rejects the kernel
        enable = os.environ.pop("VILCO_ENABLE_PALLAS_ADAMW", None)
        try:
            ana_step = make_train_step(init_model, tx, points, cfg,
                                       accumulation_steps=A)
            b = (batches[0] if K == 1
                 else jax.tree.map(lambda x: x[0], batches[0]))
            sds = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                (state, b, cl))
            with jax.default_device(jax.devices("cpu")[0]):
                return ana_step.lower(*sds)
        finally:
            if enable is not None:
                os.environ["VILCO_ENABLE_PALLAS_ADAMW"] = enable

    return {
        "metric": f"{args.model}_flagship_train_throughput",
        "value": round(value, 3),
        "unit": "clips/s/chip",
        "vs_baseline": round(value / REFERENCE_GPU_CLIPS_PER_S_ESTIMATE, 3),
        "detail": {
            "batch": B,
            "steps": args.steps,
            "scan_steps": K,
            "accum_steps": A,
            "step_ms": step_ms,
            "params_m": round(n_params / 1e6, 1),
            "devices": n_chips,
            "platform": jax.devices()[0].platform,
            "loss": loss_val,
            "baseline_estimated": True,
            **_mfu_detail(_lower_twin, step_ms),
        },
    }


def _start_watchdog(n_models=1, completed=None):
    """Bound the run instead of hanging forever when the TPU tunnel
    wedges mid-run: remote dispatch through the axon tunnel can stall
    indefinitely (observed: a bench process idle for 45+ min with no
    output), and a hung bench is worse for the caller than a failed one.
    Per-model deadline covers worst-case remote compile (~15 min) + the
    measured run with margin; override with VILCO_BENCH_WATCHDOG_S
    (0 disables). On expiry: emit the records already in `completed`
    (exit 0) if the MQ headline is among them, else exit 3."""
    import threading

    per_model = float(os.environ.get("VILCO_BENCH_WATCHDOG_S", 2400))
    if per_model <= 0:
        return None
    limit = per_model * n_models

    def expire():
        import sys

        print(f"bench watchdog: no completion within {limit:.0f}s — "
              "TPU tunnel stalled? emitting whatever completed",
              file=sys.stderr, flush=True)
        # partial JSON beats exit 3 (VERDICT r2 #5): if the MQ headline
        # finished before the wedge, emit it (with any finished subs)
        # so the round still has a machine-readable record
        if completed is not None and "mq" in completed:
            head = _assemble_all(completed)
            head["detail"]["watchdog_truncated"] = True
            print(json.dumps(head), flush=True)
            os._exit(0)
        os._exit(3)

    t = threading.Timer(limit, expire)
    t.daemon = True
    t.start()
    return t


def _assemble_all(recs):
    """One JSON record: the MQ headline with nlq/vq sub-records."""
    head = recs["mq"]
    head["detail"]["sub"] = {
        m: {
            "metric": recs[m]["metric"],
            "value": recs[m]["value"],
            "unit": recs[m]["unit"],
            "vs_baseline": recs[m]["vs_baseline"],
            "step_ms": recs[m]["detail"]["step_ms"],
            "batch": recs[m]["detail"]["batch"],
        }
        for m in ("nlq", "vq") if m in recs
    }
    return head


def main(argv=None):
    args = parse_args(argv)
    if args.all and args.eval:
        raise SystemExit("--all benches the TRAIN step of all three "
                         "models; --eval is per-model (drop --all)")
    if not args.all:
        _start_watchdog()
        print(json.dumps(run_one(args)))
        return
    import copy

    recs = {}
    _start_watchdog(n_models=3, completed=recs)
    for m in ("mq", "nlq", "vq"):
        a = copy.copy(args)
        a.model = m
        a.batch = args.batch if m == "mq" else None
        recs[m] = run_one(a)
    print(json.dumps(_assemble_all(recs)))


if __name__ == "__main__":
    main()
