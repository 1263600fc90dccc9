"""Measure the reference trainers on THIS host's CPU — the like-for-like
baseline anchors BASELINE.md lacked (the GPU numbers are estimates).

--task mq  (default): the reference PtTransformer (flagship
  configs/mq_vilco.yaml shape, use_xl, cross-modal text) through the exact
  train_one_epoch step body (MQ/libs/utils/train_utils.py:328-352:
  forward -> final_loss.backward() -> clip_grad -> optimizer/scheduler
  step) on synthetic batch-2 inputs. Pair with
  `JAX_PLATFORMS=cpu python bench.py --batch 2 --scan-steps 1`.
--task nlq: the reference NLQ dual tower at the flagship shape
  (configs/ego4d_nlq_cl_naive_egovlp_1e-4.yaml: T=2560, vid 256-d,
  txt 512-d, win 9) through NLQ/libs/utils/train_utils.py:417-470.
  Pair with `... python bench.py --model nlq --batch 2 --scan-steps 1`.
--task vq: the reference assembled ClipMatcher (train_cl.yaml shape:
  448px, 30-frame windows, frozen dinov2-shaped ViT-B/14 built locally —
  torch.hub has no network here) through VQ/func/train_anchor.py:61-108.
  Pair with `... python bench.py --model vq --batch <B>`.

Usage (from the repo root):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/baseline_cpu.py [--task mq|nlq|vq] [--steps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bench_mq(args):
    from _reference import load_reference_mq  # shared import shims

    libs = load_reference_mq()

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)

    os.chdir("/root/reference/MQ")     # xlnet config json is cwd-relative
    from libs.core.config import load_config

    cfg = load_config("configs/mq_vilco.yaml")
    # the supervised step only: the ViLCo extras (narration SSL memory
    # bank, prompt pool) hard-code .cuda() in the reference and are not
    # part of either side's step-time bench
    cfg["model"]["cl_cfg"] = dict(
        cfg["model"]["cl_cfg"], name="naive", narration_ssl=False,
        prompt_pool=False, use_adapt=False, memory_size=0,
    )

    from libs.modeling import make_meta_arch

    model = make_meta_arch(cfg["model_name"], **cfg["model"])
    model.train()
    n_params = sum(p.numel() for p in model.parameters())

    from libs.utils import make_optimizer, make_scheduler

    optimizer = make_optimizer(model, cfg["opt"])
    scheduler = make_scheduler(optimizer, cfg["opt"], num_iters_per_epoch=100)

    T = cfg["dataset"]["max_seq_len"]
    C = cfg["dataset"]["input_dim"]
    if isinstance(C, (list, tuple)):       # multi-folder feature concat
        C = sum(C)
    Ctxt = cfg["model"]["n_txt_in"]
    g = torch.Generator().manual_seed(0)

    def make_video(i):
        n_seg = 4
        centers = torch.rand(n_seg, generator=g) * (T - 64)
        spans = 8 + torch.rand(n_seg, generator=g) * 48
        segs = torch.stack([centers, centers + spans], dim=1)
        return {
            "video_id": f"v{i}",
            "feats": torch.randn(C, T, generator=g),
            "segments": segs,
            "labels": torch.randint(0, cfg["dataset"]["num_classes"], (n_seg,),
                                    generator=g),
            "segmentation_labels": torch.zeros(
                T, cfg["dataset"]["num_classes"]),
            "prompt_feature": torch.randn(Ctxt, 64, generator=g),
        }

    video_list = [make_video(i) for i in range(args.batch)]

    def step():
        optimizer.zero_grad(set_to_none=True)
        losses = model(video_list, task_id=0, prev_out_cls_logits=[])
        losses["final_loss"].backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        optimizer.step()
        scheduler.step()
        return float(losses["final_loss"].detach())

    for _ in range(args.warmup):
        loss = step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss = step()
    dt = time.perf_counter() - t0
    step_s = dt / args.steps
    print(json.dumps({
        "metric": "reference_mq_cpu_train_throughput",
        "value": round(args.batch / step_s, 4),
        "unit": "clips/s",
        "detail": {
            "batch": args.batch, "steps": args.steps,
            "step_s": round(step_s, 2),
            "params_m": round(n_params / 1e6, 1),
            "torch_threads": torch.get_num_threads(),
            "loss": loss,
        },
    }))


def bench_nlq(args):
    from _reference import load_reference_nlq

    libs = load_reference_nlq()

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)

    # the isolated loader removes `libs` from sys.modules after import
    # (MQ and NLQ share the package name); one task per process here, so
    # re-register it to finish the sub-imports the loader skipped
    sys.modules["libs"] = libs
    sys.path.insert(0, "/root/reference/NLQ")
    import libs.core.config  # noqa: F401
    os.chdir("/root/reference/NLQ")
    cfg = libs.core.config.load_config(
        "configs/ego4d_nlq_cl_naive_egovlp_1e-4.yaml")
    cfg["model"]["cl_cfg"] = dict(
        cfg["model"]["cl_cfg"], name="naive", narration_ssl=False,
        prompt_pool=False, use_adapter=False, memory_size=0,
    )

    model = libs.modeling.make_meta_arch(cfg["model_name"], **cfg["model"])
    # the NLQ meta-arch hardcodes device=cuda:0 (meta_archs.py:563-567)
    type(model).device = property(lambda s: torch.device("cpu"))
    model.train()
    n_params = sum(p.numel() for p in model.parameters())

    optimizer = libs.utils.make_optimizer(model, cfg["opt"])
    scheduler = libs.utils.make_scheduler(optimizer, cfg["opt"],
                                          num_iters_per_epoch=100)

    T = cfg["dataset"]["max_seq_len"]
    C = cfg["dataset"]["input_vid_dim"]
    Ctxt = cfg["dataset"]["input_txt_dim"]
    NC = cfg["dataset"]["num_classes"]
    g = torch.Generator().manual_seed(0)

    def make_video(i):
        n_seg = 4
        centers = torch.rand(n_seg, generator=g) * (T - 64)
        spans = 8 + torch.rand(n_seg, generator=g) * 48
        segs = torch.stack([centers, centers + spans], dim=1)
        one_hot = torch.zeros(n_seg, NC)
        one_hot[torch.arange(n_seg),
                torch.randint(0, NC, (n_seg,), generator=g)] = 1.0
        return {
            "video_id": f"v{i}",
            "feats": torch.randn(C, T, generator=g),
            "query_feats": torch.randn(Ctxt, 24, generator=g),
            "segments": segs,
            "one_hot_labels": one_hot,
        }

    video_list = [make_video(i) for i in range(args.batch)]

    def step():
        # NLQ train_one_epoch body (train_utils.py:417-470)
        optimizer.zero_grad(set_to_none=True)
        losses = model(video_list)
        losses["final_loss"].backward()
        torch.nn.utils.clip_grad_norm_(
            model.parameters(), cfg["train_cfg"]["clip_grad_l2norm"])
        optimizer.step()
        scheduler.step()
        return float(losses["final_loss"].detach())

    for _ in range(args.warmup):
        loss = step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss = step()
    dt = time.perf_counter() - t0
    step_s = dt / args.steps
    print(json.dumps({
        "metric": "reference_nlq_cpu_train_throughput",
        "value": round(args.batch / step_s, 4),
        "unit": "clips/s",
        "detail": {
            "batch": args.batch, "steps": args.steps,
            "step_s": round(step_s, 2),
            "params_m": round(n_params / 1e6, 1),
            "torch_threads": torch.get_num_threads(),
            "loss": loss,
        },
    }))


def bench_vq(args):
    from types import SimpleNamespace as NS

    from _reference import (
        AttrDict, load_reference_vq_model, load_reference_vq_utils,
    )

    lu, _, _ = load_reference_vq_utils()
    corr, mae = load_reference_vq_model()

    import torch
    import torch.nn as nn
    from functools import partial

    if args.threads:
        torch.set_num_threads(args.threads)

    S, T, B = 448, 30, args.batch
    cfg = AttrDict(
        dataset=AttrDict(query_size=S, clip_size_fine=S,
                         clip_size_coarse=S, clip_num_frames=T),
        model=AttrDict(backbone_name="dinov2", backbone_type="vitb14",
                       bakcbone_use_mae_weight=False, fix_backbone=True,
                       num_transformer=3, type_transformer="global",
                       window_transformer=5, resolution_transformer=8,
                       resolution_anchor_feat=16, pe_transformer="zero"),
        train=AttrDict(use_query_roi=False, use_hnm=False),
        cl=AttrDict(use_adapt=False, prompt_pool=False, length=None,
                    topk=None, pool_size=None, narration_ssl=False,
                    narration_dim=384, ssl_factor=0.0),
    )

    # the reference pulls dinov2 off torch.hub (no network here): build
    # the same-shape ViT-B/14 locally and expose the dinov2 API surface
    # the model touches (get_intermediate_layers + patch_embed)
    vit = mae.VisionTransformer(
        img_size=S, patch_size=14, embed_dim=768, depth=12, num_heads=12,
        mlp_ratio=4, qkv_bias=True,
        norm_layer=partial(nn.LayerNorm, eps=1e-6))

    class Dinov2Shim(nn.Module):
        def __init__(self, v):
            super().__init__()
            self.v = v
            self.patch_embed = v.patch_embed

        def get_intermediate_layers(self, x, n=1):
            return [self.v.forward_features(x)[:, 1:]]

    corr.torch.hub.load = lambda *a, **k: Dinov2Shim(vit)
    torch.manual_seed(0)
    model = corr.ClipMatcher(cfg)
    model.train()
    model.backbone.eval()
    for p_ in model.backbone.parameters():
        p_.requires_grad = False
    n_params = sum(p_.numel() for p_ in model.parameters())

    optimizer = torch.optim.AdamW(
        [p_ for p_ in model.parameters() if p_.requires_grad],
        lr=3e-4, weight_decay=1e-4)
    scheduler = torch.optim.lr_scheduler.MultiStepLR(
        optimizer, [7000, 14000, 20000, 25000], 0.3)
    loss_cfg = NS(train=NS(use_hnm=False),
                  model=NS(positive_threshold=0.2, positive_topk=5),
                  loss=NS(weight_bbox_center=1.0, weight_bbox_hw=1.0,
                          weight_bbox_giou=0.3, weight_prob=100.0))

    g = torch.Generator().manual_seed(0)
    clips = torch.randn(B, T, 3, S, S, generator=g)
    queries = torch.randn(B, 3, S, S, generator=g)
    gt_bbox = torch.tensor([0.3, 0.3, 0.6, 0.6]).repeat(B, T, 1)
    gts = dict(clip_bbox=gt_bbox,
               clip_with_bbox=torch.ones(B, T),
               before_query=torch.ones(B, T).bool())

    def step():
        # train_anchor.py:61-108 body, accumulation_step=1
        preds = model(clips, queries, training=True, fix_backbone=True)
        losses, _, _ = lu.get_losses_with_anchor(loss_cfg, preds, gts)
        total = sum(losses[k.replace("loss_", "weight_")] * v
                    for k, v in losses.items() if k.startswith("loss"))
        total.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=20.0,
                                       norm_type=2.0)
        optimizer.step()
        optimizer.zero_grad()
        scheduler.step()
        return float(total.detach())

    for _ in range(args.warmup):
        loss = step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss = step()
    dt = time.perf_counter() - t0
    step_s = dt / args.steps
    print(json.dumps({
        "metric": "reference_vq_cpu_train_throughput",
        "value": round(B / step_s, 4),
        "unit": "samples/s",
        "detail": {
            "batch": B, "steps": args.steps,
            "step_s": round(step_s, 2),
            "params_m": round(n_params / 1e6, 1),
            "torch_threads": torch.get_num_threads(),
            "loss": loss,
        },
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["mq", "nlq", "vq"], default="mq")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--threads", type=int, default=0,
                   help="torch CPU threads (0 = torch default)")
    args = p.parse_args()

    os.environ.setdefault("LOCAL_RANK", "0")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    {"mq": bench_mq, "nlq": bench_nlq, "vq": bench_vq}[args.task](args)


if __name__ == "__main__":
    main()
