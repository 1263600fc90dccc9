"""Measure the reference MQ trainer on THIS host's CPU — the like-for-like
baseline anchor BASELINE.md lacked (its GPU number is an estimate).

Runs the reference PtTransformer (flagship configs/mq_vilco.yaml shape,
use_xl, cross-modal text) through the exact train_one_epoch step body
(MQ/libs/utils/train_utils.py:328-352: forward -> final_loss.backward()
-> clip_grad -> optimizer/scheduler step) on synthetic batch-2 inputs,
torch CPU. Pair with the vilco CPU number from
`JAX_PLATFORMS=cpu python bench.py --batch 2 --scan-steps 1`.

Usage (from the repo root):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/baseline_cpu.py [--steps 3] [--warmup 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--threads", type=int, default=0,
                   help="torch CPU threads (0 = torch default)")
    args = p.parse_args()

    os.environ.setdefault("LOCAL_RANK", "0")
    sys.path.insert(0, os.path.join(REPO, "tests"))
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


if __name__ == "__main__":
    main()
