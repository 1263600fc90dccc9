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

from vilco_tpu.ops import activations
from vilco_tpu.ops.activations import gelu


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact names/init, so the fused-MLP
    path and the unfused path share one parameter tree (fc1/kernel etc. —
    the layout load_torch_vit_checkpoint imports into)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    # Fused attention (TPU): the XLA form materializes the (B, H, L, L)
    # score tensor in HBM — at the VQ flagship shape that is ~6 GB f32
    # PER LAYER (120 frames x 12 heads x 1025^2) and dominates the step.
    # The token axis is padded ONCE in ViT.__call__; valid_len is the
    # unpadded token count (0 = all valid). attn_impl picks the kernel:
    # "pallas" (kernels/attention.py, default — measured 419 ms/step at
    # the VQ flagship shape) or "flash" (jax's production TPU kernel —
    # measured 1108 ms/step at the same shape; kept for ablation).
    use_fused: bool = False
    valid_len: int = 0
    attn_impl: str = "pallas"
    # fused fc1->gelu->fc2 Pallas kernel (kernels/mlp.py): measured SLOWER
    # than XLA's two big matmuls + gelu pass at the VQ flagship shape
    # (430.7 vs 418.8 ms/step) — XLA's full-N matmul tiling beats the
    # token-tiled kernel despite the extra HBM round-trip. Kept opt-in.
    use_fused_mlp: bool = False

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        H = self.num_heads
        h = nn.LayerNorm(name="norm1", dtype=x.dtype)(x)
        # q/k/v as three matmuls against column blocks of the ONE fused
        # qkv kernel (same param tree the torch importer fills): slicing
        # the (C, C) weight sub-blocks is free, whereas slicing the
        # (B, L, 3C) activation into contiguous thirds forced a copy of
        # every third before its reshape (measured ~80 ms/step of
        # slice/fold copies at the VQ flagship shape, RESULTS.md)
        wqkv, bqkv = _DenseParams(3 * C, C, name="qkv")()
        wqkv = wqkv.astype(h.dtype)
        bqkv = bqkv.astype(h.dtype)
        q = h @ wqkv[:, :C] + bqkv[:C]                 # (B, L, C)
        k = h @ wqkv[:, C:2 * C] + bqkv[C:2 * C]
        v = h @ wqkv[:, 2 * C:] + bqkv[2 * C:]
        split = lambda x_: x_.reshape(B, L, H, C // H)
        if self.use_fused:
            from vilco_tpu.kernels.attention import (
                flash_attention_jax,
                fused_attention_blc,
            )

            assert self.attn_impl in ("pallas", "flash"), self.attn_impl

            # the ViT pads the TOKEN AXIS once before the block stack
            # (see ViT.__call__), so L is already 128-aligned here and
            # pad tokens are masked out as keys
            valid = self.valid_len if self.valid_len else L
            kv_mask = jnp.broadcast_to(
                jnp.arange(L)[None, :] < valid, (B, L)
            )
            if self.attn_impl == "flash":
                out = flash_attention_jax(split(q), split(k), split(v),
                                          kv_mask).reshape(B, L, C)
            else:
                # channels-last kernel: consumes the qkv matmul outputs
                # directly and returns (B, L, C) — removes the
                # (B,L,H,64) split + (H,B,L,D) fold relayouts that
                # measured ~4 ms per block at the flagship shape
                out = fused_attention_blc(q, k, v, kv_mask, H)
        else:
            scale = (C // H) ** -0.5
            att = jnp.einsum("blhd,bmhd->bhlm", split(q) * scale, split(k),
                             preferred_element_type=jnp.float32)
            att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhlm,bmhd->blhd", att, split(v),
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype).reshape(B, L, C)
        out = nn.Dense(C, name="proj", dtype=x.dtype)(out)
        x = x + out
        h = nn.LayerNorm(name="norm2", dtype=x.dtype)(x)
        C_h = int(C * self.mlp_ratio)
        w1, b1 = _DenseParams(C_h, C, name="fc1")()
        w2, b2 = _DenseParams(C, C_h, name="fc2")()
        if self.use_fused_mlp and not activations._EXACT:
            # keeps the (L, 4C) intermediate in VMEM; see the field note —
            # measured slower than XLA at the flagship shape, opt-in
            from vilco_tpu.kernels.mlp import fused_mlp

            h = fused_mlp(h, w1, b1, w2, b2)
        else:
            h = h @ w1.astype(h.dtype) + b1.astype(h.dtype)
            h = gelu(h)
            h = h @ w2.astype(h.dtype) + b2.astype(h.dtype)
        return x + h


class ViT(nn.Module):
    patch_size: int = 14
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    use_fused: bool = False     # fused attention kernels (TPU only)
    attn_impl: str = "pallas"   # "pallas" | "flash" (see ViTBlock)
    use_fused_mlp: bool = False  # opt-in fused MLP kernel (see ViTBlock)
    # DINO's get_intermediate_layers applies the final LayerNorm to the
    # returned tokens; the MAE-path forward_features override does NOT
    # (VQ/model/mae.py:21-34 returns x straight after the blocks) —
    # final_norm=False reproduces that
    final_norm: bool = True

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
        L = x.shape[1]
        pad = (-L) % 128 if self.use_fused else 0
        if pad:
            # pad the token axis ONCE for the fused kernel's 128 grid;
            # pad tokens are masked out as attention keys in every block
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        for i in range(self.depth):
            x = ViTBlock(self.dim, self.num_heads,
                         use_fused=self.use_fused,
                         valid_len=L if pad else 0,
                         attn_impl=self.attn_impl,
                         use_fused_mlp=self.use_fused_mlp,
                         name=f"block_{i}")(x)
        if pad:
            x = x[:, :L]
        if self.final_norm:
            x = nn.LayerNorm(name="norm", dtype=x.dtype)(x)
        return x[:, 1:].reshape(B, hh, ww, self.dim)


def load_torch_vit_checkpoint(params, ckpt_path: str):
    """Import DINO / DINOv2 / MAE ViT weights from a torch checkpoint into
    this module's param tree (build_backbone parity,
    VQ/model/corr_clip...py:110-134 — the reference torch.hub-loads these;
    in the zero-egress environment the file must exist locally).

    Handles the standard timm/DINO naming: patch_embed.proj, cls_token,
    pos_embed, blocks.N.{norm1, attn.qkv, attn.proj, norm2, mlp.fc1,
    mlp.fc2}, norm. Returns a new param tree; raises on missing keys.
    """
    import numpy as np
    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    sd = {k: np.asarray(v) for k, v in sd.items()}

    import copy

    out = copy.deepcopy(jax.tree.map(np.asarray, params))

    def put(dst, key, val):
        assert dst[key].shape == val.shape, (key, dst[key].shape, val.shape)
        dst[key] = val.astype(np.float32)

    # patch embed: torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    put(out["patch_embed"], "kernel",
        sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    put(out["patch_embed"], "bias", sd["patch_embed.proj.bias"])
    put(out, "cls_token", sd["cls_token"])
    put(out, "pos_embed", sd["pos_embed"])
    n_blocks = sum(1 for k in out if k.startswith("block_"))
    for i in range(n_blocks):
        b = out[f"block_{i}"]
        p = f"blocks.{i}."
        put(b["norm1"], "scale", sd[p + "norm1.weight"])
        put(b["norm1"], "bias", sd[p + "norm1.bias"])
        put(b["qkv"], "kernel", sd[p + "attn.qkv.weight"].T)
        put(b["qkv"], "bias", sd[p + "attn.qkv.bias"])
        put(b["proj"], "kernel", sd[p + "attn.proj.weight"].T)
        put(b["proj"], "bias", sd[p + "attn.proj.bias"])
        put(b["norm2"], "scale", sd[p + "norm2.weight"])
        put(b["norm2"], "bias", sd[p + "norm2.bias"])
        put(b["fc1"], "kernel", sd[p + "mlp.fc1.weight"].T)
        put(b["fc1"], "bias", sd[p + "mlp.fc1.bias"])
        put(b["fc2"], "kernel", sd[p + "mlp.fc2.weight"].T)
        put(b["fc2"], "bias", sd[p + "mlp.fc2.bias"])
    put(out["norm"], "scale", sd["norm.weight"])
    put(out["norm"], "bias", sd["norm.bias"])
    return jax.tree.map(jnp.asarray, out)
