"""VQ ClipMatcher: query-crop spatio-temporal tracker.

TPU-native redesign of the VQ model
(VQ/model/corr_clip_spatial_transformer2_anchor_2heads_hnm.py:137-576):

  frozen ViT features for query crop + every clip frame
  -> channel reduce (convs + norm)
  -> query<->frame cross-attention (1 decoder layer, :187-199)
  -> spatial downsample to R=8
  -> spatio-temporal self-attention x3 over (t * 8 * 8) tokens with a banded
     temporal mask (window_transformer=5 -> +-2 frames, get_mask :457-471)
  -> anchor refinement head (12 anchors/cell = 4 sizes x 3 ARs on a 16x16
     grid, Head :509-576): bbox deltas + occupancy logit per anchor.

TPU-first shifts: channels-last everywhere; frames fold into the batch dim
so the ViT and reduce convs run as one big batched matmul; BatchNorm is
replaced by GroupNorm (no cross-device batch-stats sync needed — the
reference needs SyncBatchNorm + DDP for this, VQ/train_cl.py:112-119);
the banded temporal mask is computed statically.

Hard-negative mining (replicate_for_hnm :357-379) lives in the loss wiring:
train/vq_engine.py replicates (clip_i, query_j) pairs.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from vilco_tpu.ops.activations import gelu

from vilco_tpu.core.registry import MODELS
from vilco_tpu.models.vit import ViT
from vilco_tpu.ops.anchors import generate_anchors, xyhw_to_xyxy


def positional_encoding_3d(d_model: int, depth: int, height: int,
                           width: int) -> np.ndarray:
    """3-D sinusoid PE (t, h, w, C); mirrors positionalencoding3d used for
    pe_3d (:213-218). Split channels across the three axes."""
    pe = np.zeros((depth, height, width, d_model), np.float32)
    d = d_model // 3
    d = d - d % 2

    def table(n, dims):
        pos = np.arange(n)[:, None]
        div = np.exp(np.arange(0, dims, 2) * -(math.log(10000.0) / dims))
        out = np.zeros((n, dims), np.float32)
        out[:, 0::2] = np.sin(pos * div)
        out[:, 1::2] = np.cos(pos * div)
        return out

    pe[..., :d] += table(depth, d)[:, None, None, :]
    pe[..., d:2 * d] += table(height, d)[None, :, None, :]
    pe[..., 2 * d:3 * d] += table(width, d)[None, None, :, :]
    return pe


class ConvBlock2D(nn.Module):
    """conv3x3 + norm + leaky-relu (BasicBlock_Conv2D,
    VQ/utils/model_utils.py:129-135, which uses BatchNorm2d).

    norm="group" (default): GroupNorm — the TPU-native training choice (no
    cross-device batch-stat sync; the reference needs SyncBatchNorm + DDP).
    norm="frozen_bn": eval-mode BatchNorm semantics — per-channel
    (x - mean) / sqrt(var + eps) * scale + bias with imported running
    stats. This is EXACTLY what the reference computes at inference, so
    checkpoints imported from torch reproduce its numerics bit-for-bit
    (test_full_vq_forward_parity)."""

    features: int
    stride: int = 1
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    name="conv", dtype=dt)(x)
        if self.norm == "frozen_bn":
            f = (self.features,)
            scale = self.param("bn_scale", nn.initializers.ones, f,
                               jnp.float32)
            bias = self.param("bn_bias", nn.initializers.zeros, f,
                              jnp.float32)
            mean = self.param("bn_mean", nn.initializers.zeros, f,
                              jnp.float32)
            var = self.param("bn_var", nn.initializers.ones, f, jnp.float32)
            # fold into one multiply-add (torch BN eval, eps=1e-5)
            mult = scale * jax.lax.rsqrt(var + 1e-5)
            x = (x.astype(jnp.float32) * mult + (bias - mean * mult)
                 ).astype(dt)
        else:
            # GroupNorm stats in f32; cast BACK so bf16 compute survives
            # the block (otherwise everything downstream silently runs f32)
            x = nn.GroupNorm(num_groups=min(32, self.features), name="norm",
                             dtype=jnp.float32)(x).astype(dt)
        return nn.leaky_relu(x)


class DecoderLayer(nn.Module):
    """torch TransformerDecoderLayer(d, nhead, ff, gelu, post-LN)
    equivalent: self-attn + cross-attn + FFN (CQ_corr_transformer :187-199)."""

    dim: int
    num_heads: int
    ff: int
    use_fused: bool = False

    @nn.compact
    def __call__(self, x, mem):
        def attn(name, q_in, kv_in):
            B, Lq, C = q_in.shape
            H = self.num_heads
            q = nn.Dense(C, name=f"{name}_q", dtype=x.dtype)(q_in)
            k = nn.Dense(C, name=f"{name}_k", dtype=x.dtype)(kv_in)
            v = nn.Dense(C, name=f"{name}_v", dtype=x.dtype)(kv_in)
            Lk = kv_in.shape[1]
            if self.use_fused and Lq % 128 == 0 and Lk % 128 == 0:
                # channels-last kernel: consumes the q/k/v matmul outputs
                # directly, no (B, L, H, D) fold relayouts (see
                # kernels/attention.py::fused_attention_blc)
                from vilco_tpu.kernels.attention import fused_attention_blc

                o = fused_attention_blc(
                    q, k, v, jnp.ones((B, Lk), bool), H
                )   # (B, Lq, C) — the final reshape below is a no-op
            else:
                q = q.reshape(B, Lq, H, C // H)
                k = k.reshape(B, Lk, H, C // H)
                v = v.reshape(B, Lk, H, C // H)
                scale = (C // H) ** -0.5
                a = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                               preferred_element_type=jnp.float32)
                a = jax.nn.softmax(a, axis=-1).astype(x.dtype)
                o = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                               preferred_element_type=jnp.float32
                               ).astype(x.dtype)
            return nn.Dense(C, name=f"{name}_o", dtype=x.dtype)(
                o.reshape(B, Lq, C)
            )

        x = nn.LayerNorm(name="norm1", dtype=x.dtype)(x + attn("self", x, x))
        x = nn.LayerNorm(name="norm2", dtype=x.dtype)(x + attn("cross", x, mem))
        h = nn.Dense(self.ff, name="ff1", dtype=x.dtype)(x)
        h = gelu(h)
        h = nn.Dense(self.dim, name="ff2", dtype=x.dtype)(h)
        return nn.LayerNorm(name="norm3", dtype=x.dtype)(x + h)


class EncoderLayer(nn.Module):
    """torch TransformerEncoderLayer equivalent with an additive attention
    mask (feat_corr_transformer :222-234).

    With use_fused=True and a frame-band eligible shape
    (kernels/frame_band.py::supports) the attention runs through the fused
    frame-banded Pallas kernel instead of materializing the full (L, L)
    additive-mask scores (~16 ms/step of the VQ flagship in the XLA form,
    RESULTS.md round-4 profile); `fr`/`band_w` carry the frame geometry
    (tokens per frame, frames each side)."""

    dim: int
    num_heads: int
    ff: int
    use_fused: bool = False
    fr: int = 0
    band_w: int = 0

    @nn.compact
    def __call__(self, x, attn_mask):
        B, L, C = x.shape
        H = self.num_heads
        # q/k/v as three matmuls against column blocks of the one fused
        # qkv kernel: weight-side slicing is free, whereas slicing the
        # (B, L, 3C) activation into thirds forces a copy of each third
        # before its reshape (same layout torch's in_proj_weight packs)
        from vilco_tpu.models.vit import _DenseParams

        wqkv, bqkv = _DenseParams(3 * C, C, name="qkv")()
        wqkv = wqkv.astype(x.dtype)
        bqkv = bqkv.astype(x.dtype)
        q = x @ wqkv[:, :C] + bqkv[:C]
        k = x @ wqkv[:, C:2 * C] + bqkv[C:2 * C]
        v = x @ wqkv[:, 2 * C:] + bqkv[2 * C:]
        from vilco_tpu.kernels.frame_band import (
            frame_band_attention, supports,
        )

        if (self.use_fused and self.fr > 0
                and supports(L, C, H, self.fr, self.band_w)):
            o = frame_band_attention(q, k, v, H, self.fr, self.band_w)
        else:
            split = lambda t: t.reshape(B, L, H, C // H)
            scale = (C // H) ** -0.5
            a = jnp.einsum("bqhd,bkhd->bhqk", split(q) * scale, split(k),
                           preferred_element_type=jnp.float32)
            a = a + attn_mask[None, None]
            a = jax.nn.softmax(a, axis=-1).astype(x.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", a, split(v),
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype).reshape(B, L, C)
        x = nn.LayerNorm(name="norm1", dtype=x.dtype)(
            x + nn.Dense(C, name="proj", dtype=x.dtype)(o)
        )
        h = nn.Dense(self.ff, name="ff1", dtype=x.dtype)(x)
        h = gelu(h)
        h = nn.Dense(self.dim, name="ff2", dtype=x.dtype)(h)
        return nn.LayerNorm(name="norm2", dtype=x.dtype)(x + h)


def temporal_band_mask(t: int, hw: int, window: int) -> np.ndarray:
    """(t*hw, t*hw) additive mask: frame i attends frames within
    +-window//2 (get_mask :457-471)."""
    mask = np.full((t * hw, t * hw), -1e9, np.float32)
    w = window // 2
    for i in range(t):
        lo = max(0, (i - w) * hw)
        hi = min(t * hw, (i + w + 1) * hw)
        mask[i * hw:(i + 1) * hw, lo:hi] = 0.0
    return mask


class AnchorHead(nn.Module):
    """Anchor refinement head (Head :509-576): upsample R=8 -> 16, split
    reg/cls towers, emit (h*w*n*m) bbox deltas + occupancy logits."""

    dim: int = 256
    in_res: int = 8
    out_res: int = 16
    n_anchors: int = 12      # 4 base sizes x 3 aspect ratios
    dropout: float = 0.2
    norm: str = "group"

    @nn.compact
    def __call__(self, x, deterministic=True):
        for i in range(int(math.log2(self.out_res // self.in_res))):
            x = nn.ConvTranspose(self.dim, (4, 4), strides=(2, 2),
                                 name=f"up_{i}", dtype=x.dtype)(x)
        feat = ConvBlock2D(2 * self.dim, norm=self.norm, name="in_conv")(x)
        feat_reg, feat_cls = jnp.split(feat, 2, axis=-1)
        feat_reg = nn.Dropout(self.dropout)(feat_reg, deterministic=deterministic)
        feat_cls = nn.Dropout(self.dropout)(feat_cls, deterministic=deterministic)
        for i in range(3):
            feat_reg = ConvBlock2D(self.dim, norm=self.norm,
                                   name=f"reg_{i}")(feat_reg)
            feat_cls = ConvBlock2D(self.dim, norm=self.norm,
                                   name=f"cls_{i}")(feat_cls)
        zinit = nn.initializers.normal(1e-6)
        out_reg = nn.Conv(self.n_anchors * 4, (3, 3), name="reg_head",
                          kernel_init=zinit, bias_init=zinit,
                          dtype=x.dtype)(feat_reg)
        out_cls = nn.Conv(self.n_anchors, (3, 3), name="cls_head",
                          kernel_init=zinit, bias_init=zinit,
                          dtype=x.dtype)(feat_cls)
        B, h, w, _ = out_reg.shape
        out_reg = out_reg.reshape(B, h * w * self.n_anchors, 4)
        out_cls = out_cls.reshape(B, h * w * self.n_anchors)
        return out_reg, out_cls


@MODELS.register("clip_matcher")
class ClipMatcher(nn.Module):
    """The VQ meta-arch. Consumes either raw frames (through the internal
    ViT) or precomputed patch features (`from_features=True`)."""

    dim: int = 256
    clip_size: int = 448
    patch_size: int = 14
    vit_dim: int = 384
    vit_depth: int = 4
    vit_heads: int = 6
    resolution_transformer: int = 8
    resolution_anchor_feat: int = 16
    num_transformer: int = 3
    window_transformer: int = 5
    num_frames: int = 30
    freeze_backbone: bool = True
    # activations/matmuls in bf16 (params stay f32; GroupNorm + outputs
    # pinned f32) — the MXU path; set float32 to reproduce exact torch
    # numerics
    compute_dtype: str = "bfloat16"
    # Fused attention in the ViT + cross-attention (TPU only): the XLA
    # form materializes ~6 GB of f32 scores PER ViT LAYER at the flagship
    # shape. vit_attn_impl: "flash" (jax production kernel) | "pallas"
    use_fused: bool = False
    vit_attn_impl: str = "pallas"
    # opt-in fused ViT MLP kernel (kernels/mlp.py; measured slower than
    # XLA at the flagship shape — RESULTS.md)
    use_fused_mlp: bool = False
    # defaults-off query-frame ROI resample (reference model :399-403 via
    # torchvision.ops.roi_align; config.train.use_query_roi = False in
    # every shipped config) — pass `query_frame_bbox` (normalized xyxy)
    # to __call__ when enabled
    use_query_roi: bool = False
    # conv-block normalization: "group" (TPU-native training default) or
    # "frozen_bn" (eval-mode BatchNorm for torch-checkpoint inference
    # parity — see ConvBlock2D)
    norm: str = "group"
    # the reference's MAE backbone path bilinearly resizes the ViT patch
    # grid to (16, 16) before the reduce stack (:351) and skips the ViT's
    # final LayerNorm (mae.py forward_features); None = use the native
    # grid with the final norm (DINO/DINOv2 semantics)
    interp_feat_to: Optional[int] = None
    vit_final_norm: bool = True
    # head feature dropout (reference droupout_feat/cls p=0.2, :537-538)
    dropout: float = 0.2

    def setup(self):
        self.backbone = ViT(self.patch_size, self.vit_dim, self.vit_depth,
                            self.vit_heads, use_fused=self.use_fused,
                            attn_impl=self.vit_attn_impl,
                            use_fused_mlp=self.use_fused_mlp,
                            final_norm=self.vit_final_norm)
        self.reduce1 = ConvBlock2D(self.dim, norm=self.norm, name="reduce1")
        self.reduce2 = ConvBlock2D(self.dim, norm=self.norm, name="reduce2")
        self.cq_corr = DecoderLayer(self.dim, 4, 4 * self.dim,
                                    use_fused=self.use_fused,
                                    name="cq_corr")
        feat_res = self.interp_feat_to or (self.clip_size // self.patch_size)
        self.n_down = max(0, int(math.log2(max(
            feat_res // self.resolution_transformer, 1
        ))))
        self.down_heads = [
            ConvBlock2D(self.dim, stride=2, norm=self.norm, name=f"down_{i}")
            for i in range(self.n_down)
        ]
        R = self.resolution_transformer
        self.st_layers = [
            EncoderLayer(self.dim, 8, 8 * self.dim,
                         use_fused=self.use_fused, fr=R * R,
                         band_w=self.window_transformer // 2,
                         name=f"st_{i}")
            for i in range(self.num_transformer)
        ]
        self.head = AnchorHead(
            self.dim, self.resolution_transformer,
            self.resolution_anchor_feat, norm=self.norm,
            dropout=self.dropout, name="head",
        )
        anchors = generate_anchors(self.clip_size,
                                   self.resolution_anchor_feat)
        self.anchors_xyhw = anchors / self.clip_size           # (N, 4)
        self.anchors_xyxy = xyhw_to_xyxy(self.anchors_xyhw)
        pe = positional_encoding_3d(
            self.dim, self.num_frames, self.resolution_transformer,
            self.resolution_transformer,
        ).reshape(1, -1, self.dim)
        self.pe_3d = self.param(
            "pe_3d", lambda rng: jnp.asarray(pe)
        )

    def extract(self, images):
        feats = self.backbone(images)
        if self.interp_feat_to:
            # F.interpolate(..., mode='bilinear') with the torch default
            # align_corners=False == jax.image.resize half-pixel centers
            B, _, _, C = feats.shape
            S = self.interp_feat_to
            feats = jax.image.resize(feats, (B, S, S, C), "bilinear")
        if self.freeze_backbone:
            feats = jax.lax.stop_gradient(feats)
        return feats

    def __call__(self, clip, query, *, from_features: bool = False,
                 hnm: bool = False, deterministic: bool = True,
                 query_frame_bbox=None):
        """clip: (B, T, H, W, 3) frames or (B, T, h, w, C) features;
        query: (B, H2, W2, 3) or (B, h, w, C). Returns dict with per-anchor
        center/hw/bbox (normalized xyxy) and occupancy prob logits.

        hnm=True replicates every (clip_i, query_j) pair after the reduce
        stage — leading dim becomes B^2 (replicate_for_hnm :357-379).
        """
        B, T = clip.shape[:2]
        dt = jnp.dtype(self.compute_dtype)
        clip = clip.astype(dt)
        query = query.astype(dt)
        if from_features:
            clip_feat = clip.reshape((B * T,) + clip.shape[2:])
            query_feat = query
        else:
            clip_feat = self.extract(clip.reshape((B * T,) + clip.shape[2:]))
            query_feat = self.extract(query)
        h, w = clip_feat.shape[1:3]

        if self.use_query_roi and query_frame_bbox is not None:
            # resample the query features onto the annotated query-frame
            # bbox (reference :399-403: recover_bbox to feature coords +
            # torchvision roi_align back to (h, w))
            from vilco_tpu.ops.roi_align import roi_align_2d

            qb = query_frame_bbox.astype(jnp.float32)     # (B, 4) norm xyxy
            scale = jnp.asarray([w, h, w, h], jnp.float32)
            rois = jnp.concatenate(
                [jnp.arange(qb.shape[0], dtype=jnp.float32)[:, None],
                 qb * scale], axis=1)
            query_feat = roi_align_2d(
                query_feat.astype(jnp.float32), rois, (h, w)
            ).astype(query_feat.dtype)

        # channel reduce (reference runs query+clip through one stack :404)
        def reduce(x):
            return self.reduce2(self.reduce1(x))

        clip_feat = reduce(clip_feat)                     # (B*T, h, w, d)
        query_feat = reduce(query_feat)                   # (B, h, w, d)

        if hnm:
            d = clip_feat.shape[-1]
            cf = clip_feat.reshape(B, T, h, w, d)
            i_idx = jnp.repeat(jnp.arange(B), B)          # clip
            j_idx = jnp.tile(jnp.arange(B), B)            # query
            clip_feat = cf[i_idx].reshape(B * B * T, h, w, d)
            query_feat = query_feat[j_idx]
            B = B * B

        # query<->frame cross attention
        q_tokens = jnp.repeat(
            query_feat.reshape(B, 1, h * w, self.dim), T, axis=1
        ).reshape(B * T, h * w, self.dim)
        c_tokens = clip_feat.reshape(B * T, h * w, self.dim)
        c_tokens = self.cq_corr(c_tokens, q_tokens)
        x = c_tokens.reshape(B * T, h, w, self.dim)

        # spatial downsample to R, then spatio-temporal attention
        for head in self.down_heads:
            x = head(x)
        R = self.resolution_transformer
        x = x.reshape(B, T * R * R, self.dim)
        x = x + self.pe_3d[:, : T * R * R].astype(x.dtype)
        mask = jnp.asarray(temporal_band_mask(T, R * R,
                                              self.window_transformer))
        for layer in self.st_layers:
            x = layer(x, mask)
        x = x.reshape(B * T, R, R, self.dim)

        bbox_delta, prob = self.head(x, deterministic=deterministic)
        N = bbox_delta.shape[1]
        bbox_delta = bbox_delta.reshape(B, T, N, 4).astype(jnp.float32)
        prob = prob.reshape(B, T, N).astype(jnp.float32)

        anchors_xyhw = jnp.asarray(self.anchors_xyhw)[None, None]
        bbox_refine = bbox_delta + anchors_xyhw           # [cy, cx, h, w]
        center, hw = jnp.split(bbox_refine, 2, axis=-1)
        hw = 0.5 * hw
        bbox = jnp.concatenate([center - hw, center + hw], axis=-1)
        return {
            "center": center,
            "hw": hw,
            "bbox": bbox,
            "prob": prob,
            "anchors_xyxy": jnp.asarray(self.anchors_xyxy),
        }


def tiny_clip_matcher(**overrides) -> ClipMatcher:
    """The smallest valid ClipMatcher shape, shared by the unit tests and
    the multi-chip dryrun so both exercise the same configuration."""
    kw = dict(
        dim=32, clip_size=16, patch_size=8, vit_dim=24, vit_depth=1,
        vit_heads=2, resolution_transformer=2, resolution_anchor_feat=2,
        num_transformer=1, window_transformer=3, num_frames=3,
    )
    kw.update(overrides)
    return ClipMatcher(**kw)
