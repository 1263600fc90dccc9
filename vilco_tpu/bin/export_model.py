"""Serving export: serialize the jitted forward pass to a StableHLO artifact.

The reference has no serving story (inference runs through the training
entry points); for production deployment the TPU-native equivalent is an
ahead-of-time `jax.export` artifact — a platform-checked, serialized
StableHLO module that a serving binary (or another JAX process) loads and
calls without the model code or Python weights pipeline.

  # export the flagship MQ forward (synthetic-initialized weights)
  python -m vilco_tpu.bin.export_model --out model.stablehlo --tiny

  # export from a trained checkpoint
  python -m vilco_tpu.bin.export_model --out model.stablehlo \
      --config configs/mq_vilco.yaml --ckpt runs/x/task_004.ckpt

Round-trip: `load_exported(path)` deserializes and returns a callable.
"""

from __future__ import annotations

import argparse


def export_forward(cfg, params, platforms=("tpu", "cpu")):
    """Export `model.apply(params, feats, mask)` -> jax.export.Exported.

    The artifact closes over the weights (they become constants in the
    module) so the serving side needs nothing but the bytes.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from vilco_tpu.models.point_transformer import PointTransformer

    # serving artifact: deterministic forward, XLA ops only (Pallas custom
    # calls are not portable across serialization targets)
    model = PointTransformer(
        cfg.model.updated(fused_attention=False, fused_conv=False, attention_impl="xla",
                          fused_xl=False),
        cfg.cl_cfg,
    )
    B, T, C = (cfg.loader.batch_size, cfg.dataset.max_seq_len,
               cfg.dataset.input_dim)
    args = [jax.ShapeDtypeStruct((B, T, C), jnp.float32),
            jax.ShapeDtypeStruct((B, T), jnp.bool_)]
    if cfg.dataset.use_text:
        # text-conditioned forwards (NLQ dual tower / cross-modal MQ) take
        # the query tokens as additional inputs
        L = cfg.dataset.max_text_len
        args += [jax.ShapeDtypeStruct((B, L, cfg.model.n_txt_in),
                                      jnp.float32),
                 jax.ShapeDtypeStruct((B, L), jnp.bool_)]

        def forward(feats, mask, text, text_mask):
            out = model.apply({"params": params}, feats, mask, text=text,
                              text_mask=text_mask, deterministic=True)
            return {"cls_logits": out["cls_logits"],
                    "offsets": out["offsets"]}
    else:
        def forward(feats, mask):
            out = model.apply({"params": params}, feats, mask,
                              deterministic=True)
            return {"cls_logits": out["cls_logits"],
                    "offsets": out["offsets"]}

    return jexport.export(jax.jit(forward), platforms=list(platforms))(*args)


def export_vq_forward(matcher, params, batch: int = 1,
                      platforms=("tpu", "cpu")):
    """Export the VQ tracker's sliding-window forward:
    (clip (B,T,S,S,3), query (B,S,S,3)) -> {bbox (B,T,N,4) normalized
    xyxy, prob (B,T,N) logits} — the per-window unit the inference
    pipeline dispatches (tasks/vq.py::predict_track)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    T, S = matcher.num_frames, matcher.clip_size
    args = [jax.ShapeDtypeStruct((batch, T, S, S, 3), jnp.float32),
            jax.ShapeDtypeStruct((batch, S, S, 3), jnp.float32)]

    def forward(clip, query):
        out = matcher.apply({"params": params}, clip, query,
                            deterministic=True)
        return {"bbox": out["bbox"], "prob": out["prob"]}

    return jexport.export(jax.jit(forward), platforms=list(platforms))(*args)


def load_exported(path: str):
    """Deserialize an exported artifact; returns the jax-callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call


def _main_vq(args):
    """--task vq: export the ClipMatcher window forward. Geometry comes
    from the run's persisted vq_config.json (--workdir) like bin/vq_infer,
    or the CI toy shape (--tiny)."""
    import glob
    import json
    import os

    import jax
    import jax.numpy as jnp

    from vilco_tpu.tasks.vq import build_clip_matcher

    kw = {}
    if args.workdir:
        man_path = os.path.join(args.workdir, "vq_config.json")
        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            if man.get("model_cfg"):
                from vilco_tpu.core.config import VQCfg

                kw["model_cfg"] = VQCfg.from_dict(man["model_cfg"])
            kw["window"] = man["window"]
            kw["frame_size"] = man["frame_size"]
    matcher = build_clip_matcher(**kw)

    ckpt = args.ckpt
    if not ckpt and args.workdir:
        ckpts = sorted(glob.glob(
            os.path.join(args.workdir, "vq_task_*.ckpt")))
        if ckpts:
            ckpt = ckpts[-1]
    if ckpt:
        from vilco_tpu.core.checkpoint import load_checkpoint

        params = load_checkpoint(ckpt)["params"]
    else:
        S = matcher.clip_size
        params = matcher.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, S, S, 3)),
            jnp.zeros((1, S, S, 3)), deterministic=True)["params"]

    exp = export_vq_forward(matcher, params,
                            platforms=tuple(args.platforms.split(",")))
    data = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"wrote {args.out}: {len(data)/1e6:.1f} MB, "
          f"platforms={exp.platforms}, "
          f"in={[str(a) for a in exp.in_avals]}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--ckpt", default=None,
                   help="checkpoint from train_cl (uses its params)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny synthetic config (smoke)")
    p.add_argument("--platforms", default="tpu,cpu")
    p.add_argument("--task", choices=["mq", "nlq", "vq"], default="mq",
                   help="vq exports the ClipMatcher window forward "
                        "(nlq is the mq path with use_text configs)")
    p.add_argument("--workdir", default=None,
                   help="with --task vq: restore geometry from the run's "
                        "vq_config.json and its latest vq_task_*.ckpt")
    args = p.parse_args(argv)
    if args.task == "vq":
        return _main_vq(args)

    import jax
    import jax.numpy as jnp

    from vilco_tpu.core.config import load_config
    from vilco_tpu.data.synthetic import tiny_config

    cfg = load_config(args.config) if args.config else tiny_config()
    if args.tiny and args.config is None:
        pass  # tiny_config already

    if args.ckpt:
        from vilco_tpu.core.checkpoint import load_checkpoint

        params = load_checkpoint(args.ckpt)["params"]
    else:
        from vilco_tpu.models.point_transformer import PointTransformer

        model = PointTransformer(
            cfg.model.updated(fused_attention=False, fused_conv=False, attention_impl="xla",
                              fused_xl=False),
            cfg.cl_cfg,
        )
        B, T, C = (cfg.loader.batch_size, cfg.dataset.max_seq_len,
                   cfg.dataset.input_dim)
        kw = {}
        if cfg.dataset.use_text:
            L = cfg.dataset.max_text_len
            kw = {"text": jnp.zeros((B, L, cfg.model.n_txt_in)),
                  "text_mask": jnp.ones((B, L), bool)}
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((B, T, C)), jnp.ones((B, T), bool),
            deterministic=True, **kw,
        )["params"]

    exp = export_forward(cfg, params,
                         platforms=tuple(args.platforms.split(",")))
    data = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"wrote {args.out}: {len(data)/1e6:.1f} MB, "
          f"platforms={exp.platforms}, "
          f"in={[str(a) for a in exp.in_avals]}")


if __name__ == "__main__":
    main()
