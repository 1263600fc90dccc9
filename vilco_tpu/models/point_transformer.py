"""Point-transformer meta-arch: the shared MQ/NLQ single-stage localizer.

TPU-native redesign of PtTransformer (MQ/libs/modeling/meta_archs.py:351-970;
NLQ mirror NLQ/libs/modeling/meta_archs.py:339-791):

  backbone (conv-transformer pyramid) -> neck (identity LN / FPN) ->
  shared cls head (max-classes wide, class-masked for CL) + reg head
  (per-level learnable scale + ReLU), plus the ViLCo extras: L2P prompt pool
  on the text stream, narration-SSL encoder + pooled video feature, CL time
  adapters inside branch blocks.

Key idiomatic shifts vs the reference (SURVEY.md section 7):
  - batching/padding happens in the data pipeline; the model consumes
    static-shape (B, T, C) + (B, T) masks, so one jitted step serves every
    CL task;
  - per-level output lists are concatenated to (B, P_total, .) where
    P_total = sum(T / stride) — points are a static (P_total, 4) table;
  - the class head is allocated at `num_classes` (the CL maximum, e.g. 110)
    once; `augment_classification` (meta_archs.py:715-752) becomes a
    seen-classes mask applied in the loss/decode instead of tensor surgery.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vilco_tpu.core.config import CLCfg, ModelConfig
from vilco_tpu.core.registry import MODELS
from vilco_tpu.cl.prompt import PromptPool, l2_normalize
from vilco_tpu.models.backbone import (
    ConvBackbone,
    ConvTransformerBackbone,
    DualTowerBackbone,
)
from vilco_tpu.models.layers import LayerNormC, MaskedConv, Scale
from vilco_tpu.ops.masked import masked_mean


class FPNIdentity(nn.Module):
    """Per-level channel LayerNorm (necks.py:117-180, fpn_type=identity)."""

    with_ln: bool = True

    @nn.compact
    def __call__(self, feats, masks):
        out = []
        for i, f in enumerate(feats):
            out.append(LayerNormC(name=f"norm_{i}")(f) if self.with_ln else f)
        return out, masks


class FPN1D(nn.Module):
    """Top-down FPN (necks.py:12-107): lateral 1x1 convs + nearest-upsample
    merge + 3x3 output convs. The reference routes the TOP pyramid level
    through ACConv (DenseAPP dilated pyramid) instead of a lateral conv
    (necks.py:42,78-80) — which assumes in==out channels there; reproduced
    behind `use_acconv` (on by default like the reference; this neck is
    dead in every shipped config, which all use fpn_type=identity)."""

    out_channel: int
    with_ln: bool = True
    use_acconv: bool = True

    @nn.compact
    def __call__(self, feats, masks, deterministic: bool = True):
        from vilco_tpu.models.aux_blocks import ACConv

        laterals = []
        for i, (f, m) in enumerate(zip(feats, masks)):
            if self.use_acconv and i == len(feats) - 1:
                l, _ = ACConv(name="ac_conv")(
                    f, m, deterministic=deterministic)
            else:
                l, _ = MaskedConv(self.out_channel, 1,
                                  name=f"lateral_{i}")(f, m)
            laterals.append(l)
        # top-down: upsample level i+1 into level i
        for i in range(len(laterals) - 2, -1, -1):
            up = jnp.repeat(laterals[i + 1], 2, axis=1)
            laterals[i] = laterals[i] + up[:, : laterals[i].shape[1]]
        outs = []
        for i, (l, m) in enumerate(zip(laterals, masks)):
            o, _ = MaskedConv(self.out_channel, 3, name=f"fpn_conv_{i}")(l, m)
            if self.with_ln:
                o = LayerNormC(name=f"fpn_norm_{i}")(o)
            outs.append(o)
        return outs, masks


def _concat_levels(feats, masks, gap: int):
    """Concatenate per-level (B, T_l, C) tensors along time with `gap`
    masked-off zero positions between levels. A K-wide conv over the concat
    sees zeros across boundaries (each layer re-zeros the gaps), so shared
    heads run ONCE over (B, sum T_l + gaps, C) instead of once per level —
    on the 10-level MQ pyramid that turns 60 small convs into 6 MXU-sized
    ones. Returns (concat_feats, concat_mask, gap_keep, level_slices):
    gap_keep is False ONLY at gap positions — within-level masked positions
    are left to behave exactly as in the per-level form, where LN revives
    them (bias at zeroed positions) and the next conv reads them (reference
    MaskedConv1D + LayerNorm semantics, blocks.py:57-175)."""
    B, _, C = feats[0].shape
    z = jnp.zeros((B, gap, C), feats[0].dtype)
    zm = jnp.zeros((B, gap), bool)
    parts_f, parts_m, parts_k, slices = [], [], [], []
    off = 0
    for i, (f, m) in enumerate(zip(feats, masks)):
        if i:
            parts_f.append(z)
            parts_m.append(zm)
            parts_k.append(zm)
            off += gap
        T = f.shape[1]
        parts_f.append(f)
        parts_m.append(m)
        parts_k.append(jnp.ones((B, T), bool))
        slices.append((off, T))
        off += T
    # NOT padded to a 128-multiple: measured on HW (round 5) — padding
    # the concat to 2048 rows was within tunnel noise (117.3 vs 116.3
    # ms/step), i.e. XLA already tiles the odd 8*2021-row head GEMMs fine
    return (jnp.concatenate(parts_f, axis=1),
            jnp.concatenate(parts_m, axis=1),
            jnp.concatenate(parts_k, axis=1), slices)


class ClsHead(nn.Module):
    """Shared conv classification head (meta_archs.py:183-259): (layers-1) x
    [masked conv + LN + ReLU] + final conv with prior-prob bias init. Levels
    are fused into one concatenated pass (see _concat_levels)."""

    feat_dim: int
    num_classes: int
    num_layers: int = 3
    kernel_size: int = 3
    prior_prob: float = 0.01
    with_ln: bool = True

    @nn.compact
    def __call__(self, feats, masks):
        bias_init = -math.log((1 - self.prior_prob) / self.prior_prob)
        convs = [
            MaskedConv(self.feat_dim, self.kernel_size,
                       use_bias=not self.with_ln, name=f"head_{i}")
            for i in range(self.num_layers - 1)
        ]
        norms = [
            LayerNormC(name=f"norm_{i}") for i in range(self.num_layers - 1)
        ]
        final = MaskedConv(self.num_classes, self.kernel_size,
                           bias_init=bias_init, name="cls")
        h, m, keep, slices = _concat_levels(feats, masks,
                                            self.kernel_size // 2)
        kf = keep[..., None].astype(h.dtype)
        for conv, norm in zip(convs, norms):
            h, _ = conv(h, m)
            if self.with_ln:
                h = norm(h)
            # LN/ReLU revive zeroed positions (LN of zeros = bias); re-zero
            # ONLY the gaps so each conv sees zero padding across levels
            h = nn.relu(h) * kf
        logits, _ = final(h, m)
        return [logits[:, o:o + T] for o, T in slices]


class RegHead(nn.Module):
    """Shared conv regression head with per-level Scale + ReLU
    (meta_archs.py:278-349). Levels fused as in ClsHead."""

    feat_dim: int
    num_levels: int
    num_layers: int = 3
    kernel_size: int = 3
    with_ln: bool = True

    @nn.compact
    def __call__(self, feats, masks):
        convs = [
            MaskedConv(self.feat_dim, self.kernel_size,
                       use_bias=not self.with_ln, name=f"head_{i}")
            for i in range(self.num_layers - 1)
        ]
        norms = [
            LayerNormC(name=f"norm_{i}") for i in range(self.num_layers - 1)
        ]
        final = MaskedConv(2, self.kernel_size, name="offset")
        scales = [Scale(name=f"scale_{l}") for l in range(self.num_levels)]
        h, m, keep, slices = _concat_levels(feats, masks,
                                            self.kernel_size // 2)
        kf = keep[..., None].astype(h.dtype)
        for conv, norm in zip(convs, norms):
            h, _ = conv(h, m)
            if self.with_ln:
                h = norm(h)
            h = nn.relu(h) * kf
        offsets, _ = final(h, m)
        return [
            nn.relu(scales[l](offsets[:, o:o + T]))
            for l, (o, T) in enumerate(slices)
        ]


@MODELS.register("point_transformer")
class PointTransformer(nn.Module):
    """The meta-arch. Returns concatenated per-level outputs + extras."""

    cfg: ModelConfig
    cl: CLCfg

    @nn.compact
    def __call__(
        self,
        feats,                 # (B, T, C_in)
        mask,                  # (B, T) bool
        text=None,             # (B, L, C_txt)
        text_mask=None,        # (B, L) bool
        narration=None,        # (B, Ln, C_nar)
        narration_mask=None,   # (B, Ln) bool
        narration_valid=None,  # (B,) bool — clip has any narration
        prompt_mask=None,      # (B, top_k) int for task-known prompt slots
        deterministic: bool = True,
    ):
        cfg = self.cfg
        out = {}

        # bf16 activations on TPU; params stay f32, matmuls accumulate f32,
        # norms/softmax/losses compute in f32
        dt = jnp.dtype(cfg.compute_dtype)
        feats = feats.astype(dt)
        if text is not None:
            text = text.astype(dt)
        if narration is not None:
            narration = narration.astype(dt)

        # --- L2P prompt pool on raw text tokens (meta_archs.py:759-780)
        if self.cl.prompt_pool and text is not None:
            pool = PromptPool(
                pool_size=self.cl.pool_size, length=self.cl.length,
                embed_dim=self.cl.embed_dim, top_k=self.cl.topk,
                name="prompt",
            )
            res = pool(text, prompt_mask=prompt_mask)
            text = res["prompted"]
            out["reduce_sim"] = res["reduce_sim"]
            if text_mask is not None:
                plen = res["total_prompt_len"]
                pm = jnp.ones(
                    (text.shape[0], plen), dtype=bool
                )
                text_mask = jnp.concatenate([pm, text_mask], axis=1)

        # --- backbone + neck
        adapt = tuple(self.cl.adapt_blocks) if self.cl.use_adapt else ()
        if cfg.variant == "nlq":
            bb_feats, bb_masks = DualTowerBackbone(
                cfg, adapt_blocks=adapt, name="backbone",
            )(feats, mask, text, text_mask, deterministic=deterministic)
        elif cfg.backbone_type == "conv":
            bb_feats, bb_masks = ConvBackbone(cfg, name="backbone")(
                feats, mask, deterministic=deterministic
            )
        else:
            bb_feats, bb_masks = ConvTransformerBackbone(
                cfg, adapt_blocks=adapt, name="backbone",
            )(feats, mask, text=text, text_mask=text_mask,
              deterministic=deterministic)
        if cfg.fpn_type == "identity":
            fpn_feats, fpn_masks = FPNIdentity(
                with_ln=cfg.fpn_with_ln, name="neck"
            )(bb_feats, bb_masks)
        else:
            fpn_feats, fpn_masks = FPN1D(
                cfg.fpn_dim, with_ln=cfg.fpn_with_ln, name="neck"
            )(bb_feats, bb_masks, deterministic=deterministic)
        fpn_feats = fpn_feats[cfg.fpn_start_level:]
        fpn_masks = fpn_masks[cfg.fpn_start_level:]

        # --- narration SSL feature + pooled video feature
        # (meta_archs.py:794-811, 939-945)
        if self.cl.narration_ssl and narration is not None:
            nar = nn.Dense(cfg.embd_dim, name="narration_encoder")(narration)
            nar = masked_mean(nar.astype(jnp.float32), narration_mask, axis=1)
            out["narration_feat"] = l2_normalize(nar, axis=1)
            vids = [
                masked_mean(f.astype(jnp.float32), m, axis=1)
                for f, m in zip(fpn_feats, fpn_masks)
            ]
            video_feat = jnp.mean(jnp.stack(vids, axis=0), axis=0)
            out["video_feat"] = l2_normalize(video_feat, axis=1)
            out["narration_valid"] = (
                narration_valid
                if narration_valid is not None
                else jnp.ones((feats.shape[0],), bool)
            )

        # --- heads
        cls_list = ClsHead(
            cfg.head_dim, cfg.num_classes, cfg.head_num_layers,
            cfg.head_kernel_size, with_ln=cfg.head_with_ln, name="cls_head",
        )(fpn_feats, fpn_masks)
        reg_list = RegHead(
            cfg.head_dim, len(fpn_feats), cfg.head_num_layers,
            cfg.head_kernel_size, with_ln=cfg.head_with_ln, name="reg_head",
        )(fpn_feats, fpn_masks)

        # learnable per-class Gaussians for label weighting
        # (MQ meta_archs.py:601-606). MQ-only: the NLQ reference model has
        # no such params, and creating inert leaves there would still see
        # AdamW's decoupled weight decay shrink them — a trajectory
        # deviation the NLQ lockstep (test_nlq_trajectory.py) pins away.
        if cfg.variant == "nlq":
            out["gaussians"] = None
        else:
            C = cfg.num_classes
            out["gaussians"] = (
                self.param("mu", nn.initializers.zeros, (C,), jnp.float32),
                self.param("sigma", nn.initializers.ones, (C,),
                           jnp.float32),
                self.param("mu_reg_left",
                           nn.initializers.constant(-0.5), (C,),
                           jnp.float32),
                self.param("sigma_reg_left", nn.initializers.ones, (C,),
                           jnp.float32),
                self.param("mu_reg_right",
                           nn.initializers.constant(0.5), (C,),
                           jnp.float32),
                self.param("sigma_reg_right", nn.initializers.ones, (C,),
                           jnp.float32),
            )

        out["level_lengths"] = tuple(f.shape[1] for f in fpn_feats)
        out["cls_logits"] = jnp.concatenate(
            [c.astype(jnp.float32) for c in cls_list], axis=1
        )                                                    # (B, P, C)
        out["offsets"] = jnp.concatenate(
            [r.astype(jnp.float32) for r in reg_list], axis=1
        )                                                    # (B, P, 2)
        out["fpn_mask"] = jnp.concatenate(fpn_masks, axis=1)  # (B, P)
        out["fpn_feats"] = fpn_feats
        return out


def level_lengths(cfg: ModelConfig) -> Tuple[int, ...]:
    return tuple(cfg.max_seq_len // s for s in cfg.fpn_strides)
