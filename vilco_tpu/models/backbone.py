"""Conv-transformer pyramid backbone (MQ flavor).

TPU-native redesign of ConvTransformerBackbone
(MQ/libs/modeling/backbones.py:11-289):

  conv embed x arch[0] -> [+abs PE] -> stem TransformerBlock x arch[1]
  -> (optional XL rel-attn stage OR an extra stem[0] pass, backbones.py:266-279)
  -> branch TransformerBlock x arch[2], stride `scale_factor` each,
     with text cross-attention on branch levels not in cross_modal_skip_levels
     (reference hardcodes skip = [1, 2], backbones.py:280-283)
  Returns the (1 + arch[2])-level feature pyramid and masks.

The optional text tower (txt_embd convs + txt_stem self-attn blocks,
backbones.py:139-170) lives here too.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vilco_tpu.core.config import ModelConfig
from vilco_tpu.models.layers import (
    LayerNormC,
    MaskedConv,
    TransformerBlock,
    XLRelAttention,
)
from vilco_tpu.ops.masked import sinusoid_encoding


def _use_fused(cfg: ModelConfig) -> bool:
    """Pallas kernels only on real TPU backends (tests run CPU interpret
    paths explicitly)."""
    return bool(cfg.fused_attention) and jax.default_backend() == "tpu"


def _attn_impl(cfg: ModelConfig) -> str:
    if jax.default_backend() != "tpu":
        return "xla"
    return cfg.attention_impl


def _use_fused_xl(cfg: ModelConfig) -> bool:
    return bool(cfg.fused_xl) and jax.default_backend() == "tpu"


def _use_fused_conv(cfg: ModelConfig) -> bool:
    return bool(cfg.fused_conv) and jax.default_backend() == "tpu"


def _abs_pe_table(cfg: ModelConfig, T: int, deterministic: bool):
    """Sinusoid PE scaled by 1/sqrt(E) (backbones.py:61-63), length >= T.

    Over-length inputs: at inference the reference linearly re-interpolates
    the table to T (MQ backbones.py:228-235 / NLQ :575-580,
    F.interpolate(mode='linear', align_corners=False)); training asserts
    T <= max_len (:221-222). T is static under jit, so the resize happens
    in numpy at trace time.
    """
    E = cfg.embd_dim
    pe = sinusoid_encoding(cfg.max_seq_len, E) / (E ** 0.5)
    if T > cfg.max_seq_len:
        if not deterministic:
            raise ValueError(
                f"T={T} exceeds max_seq_len={cfg.max_seq_len} during "
                "training (reference asserts 'Reached max length.')")
        from vilco_tpu.data.pipeline import linear_resize
        pe = linear_resize(pe, T)
    return pe


class ConvTransformerBackbone(nn.Module):
    cfg: ModelConfig
    adapt_blocks: Tuple[int, ...] = ()   # branch indices carrying CL adapters

    @nn.compact
    def __call__(
        self,
        x,                  # (B, T, C_in)
        mask,               # (B, T)
        text=None,          # (B, L, C_txt) or None
        text_mask=None,     # (B, L)
        deterministic: bool = True,
    ):
        cfg = self.cfg
        E = cfg.embd_dim
        n_convs, n_stem, n_branch = (
            cfg.backbone_arch[0], cfg.backbone_arch[1], cfg.backbone_arch[-1]
        )
        T = x.shape[1]
        # n_mha_win_size is the TOTAL window width like the reference's
        # LocalMaskedMHCA window_size (banded half-width = size // 2); the
        # shipped MQ flagship uses -1 = dense, where the reference backbone
        # ignores the knob entirely (it never constructs local attention)
        win = cfg.n_mha_win_size // 2 if cfg.n_mha_win_size > 1 else -1

        # embedding convs (+LN+ReLU)
        for i in range(n_convs):
            x, mask = MaskedConv(
                E, cfg.embd_kernel_size, use_bias=not cfg.embd_with_ln,
                name=f"embd_{i}",
            )(x, mask)
            if cfg.embd_with_ln:
                x = LayerNormC(name=f"embd_norm_{i}")(x)
            x = nn.relu(x)

        if cfg.use_abs_pe:
            pe = _abs_pe_table(cfg, T, deterministic)
            pe = jnp.asarray(pe, dtype=x.dtype)[None, :T]
            x = x + pe * mask[..., None].astype(x.dtype)

        # text tower
        src_query = None
        src_query_mask = None
        if cfg.use_cross_modal and text is not None:
            for i in range(n_convs):
                text, text_mask = MaskedConv(
                    E, 1, use_bias=not cfg.embd_with_ln, name=f"txt_embd_{i}"
                )(text, text_mask)
                if cfg.embd_with_ln:
                    text = LayerNormC(name=f"txt_embd_norm_{i}")(text)
                text = nn.relu(text)
            src_query, src_query_mask = text, text_mask
            for i in range(n_stem):
                src_query, src_query_mask = TransformerBlock(
                    E, cfg.n_head,
                    proj_drop=cfg.dropout, path_drop=cfg.droppath,
                    t_c_alpha=cfg.t_c_alpha, use_cross_modal=False,
                    window=win, use_fused=_use_fused(cfg),
                    use_fused_conv=_use_fused_conv(cfg),
                    attention_impl=_attn_impl(cfg), name=f"txt_stem_{i}",
                )(src_query, src_query_mask, deterministic=deterministic)

        # stem
        for i in range(n_stem):
            x, mask = TransformerBlock(
                E, cfg.n_head,
                proj_drop=cfg.dropout, path_drop=cfg.droppath,
                t_c_alpha=cfg.t_c_alpha, use_cross_modal=cfg.use_cross_modal,
                window=win, use_fused=_use_fused(cfg),
                use_fused_conv=_use_fused_conv(cfg),
                    attention_impl=_attn_impl(cfg), name=f"stem_{i}",
            )(x, mask, deterministic=deterministic)

        out_feats = [x]
        out_masks = [mask]

        # long-context stage at branch level 0: XL rel-attn when use_xl, else
        # the reference re-applies stem[0] (a quirk we reproduce as one extra
        # dedicated block, backbones.py:266-279)
        if cfg.use_xl:
            # remat: the XL layer's (B, H, T, 2T) relative-attention score
            # tensors dominate the whole train step's HBM traffic if saved
            # for backward; recomputing them costs ~2 ms of MXU time and
            # saves far more in HBM reads (the step is bandwidth-bound —
            # see RESULTS.md MFU analysis)
            # static_argnums counts the bound module as arg 0, so
            # `deterministic` (a python bool) is index 3
            xl_cls = nn.remat(XLRelAttention, static_argnums=(3,)) \
                if cfg.remat_xl else XLRelAttention
            for i in range(cfg.xl_layers):
                x = xl_cls(
                    E, cfg.n_head, cfg.xl_d_inner, dropout=cfg.xl_dropout,
                    use_fused=_use_fused_xl(cfg), name=f"xl_{i}",
                )(x, mask, deterministic)
        else:
            x, mask = TransformerBlock(
                E, cfg.n_head,
                proj_drop=cfg.dropout, path_drop=cfg.droppath,
                t_c_alpha=cfg.t_c_alpha, use_cross_modal=cfg.use_cross_modal,
                window=win, use_fused=_use_fused(cfg),
                use_fused_conv=_use_fused_conv(cfg),
                    attention_impl=_attn_impl(cfg), name="pre_branch",
            )(x, mask, deterministic=deterministic)

        t_cur = T
        for i in range(n_branch):
            cross = cfg.use_cross_modal and (
                i not in cfg.cross_modal_skip_levels
            )
            x, mask = TransformerBlock(
                E, cfg.n_head, n_ds_stride=cfg.scale_factor,
                proj_drop=cfg.dropout, path_drop=cfg.droppath,
                t_c_alpha=cfg.t_c_alpha, use_cross_modal=cross,
                window=win, use_fused=_use_fused(cfg),
                use_fused_conv=_use_fused_conv(cfg),
                    attention_impl=_attn_impl(cfg),
                adapter_t_in=t_cur if i in self.adapt_blocks else 0,
                name=f"branch_{i}",
            )(
                x, mask,
                cross_y=src_query if cross else None,
                cross_y_mask=src_query_mask if cross else None,
                deterministic=deterministic,
            )
            t_cur //= cfg.scale_factor
            out_feats.append(x)
            out_masks.append(mask)

        return out_feats, out_masks


class ConvBlock(nn.Module):
    """ResNet-style basic block with masked convs (blocks.py:1209-1258):
    conv(k, stride) -> relu -> conv(k, 1) + (1x1 strided) residual -> relu."""

    n_embd: int
    kernel_size: int = 3
    n_ds_stride: int = 1
    expansion_factor: int = 2

    @nn.compact
    def __call__(self, x, mask):
        width = self.n_embd * self.expansion_factor
        out, out_mask = MaskedConv(
            width, self.kernel_size, stride=self.n_ds_stride, name="conv1"
        )(x, mask)
        out = nn.relu(out)
        out, out_mask = MaskedConv(
            self.n_embd, self.kernel_size, name="conv2"
        )(out, out_mask)
        if self.n_ds_stride > 1:
            identity, _ = MaskedConv(
                self.n_embd, 1, stride=self.n_ds_stride, name="downsample"
            )(x, mask)
        else:
            identity = x
        return nn.relu(out + identity), out_mask


class ConvBackbone(nn.Module):
    """Pure-conv pyramid backbone (backbone_type='conv',
    MQ/libs/modeling/backbones.py:325-411): conv embed -> stem ConvBlocks ->
    stride-2 ConvBlock branch."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, mask, text=None, text_mask=None,
                 deterministic: bool = True):
        cfg = self.cfg
        E = cfg.embd_dim
        n_convs, n_stem, n_branch = (
            cfg.backbone_arch[0], cfg.backbone_arch[1], cfg.backbone_arch[-1]
        )
        for i in range(n_convs):
            x, mask = MaskedConv(
                E, cfg.embd_kernel_size, use_bias=not cfg.embd_with_ln,
                name=f"embd_{i}",
            )(x, mask)
            if cfg.embd_with_ln:
                x = LayerNormC(name=f"embd_norm_{i}")(x)
            x = nn.relu(x)
        for i in range(n_stem):
            x, mask = ConvBlock(E, 3, 1, name=f"stem_{i}")(x, mask)
        out_feats, out_masks = [x], [mask]
        for i in range(n_branch):
            x, mask = ConvBlock(E, 3, cfg.scale_factor,
                                name=f"branch_{i}")(x, mask)
            out_feats.append(x)
            out_masks.append(mask)
        return out_feats, out_masks


class DualTowerBackbone(nn.Module):
    """NLQ dual-tower backbone (NLQ/libs/modeling/backbones.py:409-614):

      arch = (#convs, #txt_stem, #vid_stem, #cross_branch, #plain_branch)
      vid conv embed (+PE) ; txt 1x1 conv embed -> txt self-attn stem ->
      vid stem with per-block text cross-attention -> strided branch
      (first arch[3] blocks cross-modal, remaining arch[4] plain).

    All attention is sliding-window (n_mha_win_size, e.g. 9 -> +-4 band);
    NLQ blocks have no channel attention. Text is a REQUIRED input.
    """

    cfg: ModelConfig
    adapt_blocks: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, x, mask, text, text_mask, deterministic: bool = True):
        cfg = self.cfg
        E = cfg.embd_dim
        n_convs, n_txt_stem, n_vid_stem, n_cross, n_plain = cfg.backbone_arch
        T = x.shape[1]
        win = cfg.n_mha_win_size // 2 if cfg.n_mha_win_size > 1 else -1

        block = lambda name, stride=1, cross=False, t_in=0: TransformerBlock(
            E, cfg.n_head, n_ds_stride=stride,
            proj_drop=cfg.dropout, path_drop=cfg.droppath,
            use_cross_modal=cross, use_channel_attn=False,
            window=win, use_fused=_use_fused(cfg),
            use_fused_conv=_use_fused_conv(cfg),
            adapter_t_in=t_in, name=name,
        )

        for i in range(n_convs):
            x, mask = MaskedConv(
                E, cfg.embd_kernel_size, use_bias=not cfg.embd_with_ln,
                name=f"vid_embd_{i}",
            )(x, mask)
            if cfg.embd_with_ln:
                x = LayerNormC(name=f"vid_embd_norm_{i}")(x)
            x = nn.relu(x)

        if cfg.use_abs_pe:
            pe = _abs_pe_table(cfg, T, deterministic)
            pe = jnp.asarray(pe, dtype=x.dtype)[None, :T]
            x = x + pe * mask[..., None].astype(x.dtype)

        for i in range(n_convs):
            text, text_mask = MaskedConv(
                E, 1, use_bias=not cfg.embd_with_ln, name=f"txt_embd_{i}"
            )(text, text_mask)
            if cfg.embd_with_ln:
                text = LayerNormC(name=f"txt_embd_norm_{i}")(text)
            text = nn.relu(text)

        for i in range(n_txt_stem):
            # text stem uses full (non-windowed) attention (backbones.py:512)
            text, text_mask = TransformerBlock(
                E, cfg.n_head, proj_drop=cfg.dropout, path_drop=cfg.droppath,
                use_cross_modal=False, use_channel_attn=False, window=-1,
                use_fused=_use_fused(cfg),
                use_fused_conv=_use_fused_conv(cfg), name=f"txt_stem_{i}",
            )(text, text_mask, deterministic=deterministic)

        for i in range(n_vid_stem):
            x, mask = block(f"vid_stem_{i}", cross=True)(
                x, mask, cross_y=text, cross_y_mask=text_mask,
                deterministic=deterministic,
            )

        out_feats = [x]
        out_masks = [mask]
        t_cur = T
        for i in range(n_cross + n_plain):
            cross = i < n_cross
            x, mask = block(
                f"branch_{i}", stride=cfg.scale_factor, cross=cross,
                t_in=t_cur if i in self.adapt_blocks else 0,
            )(
                x, mask,
                cross_y=text if cross else None,
                cross_y_mask=text_mask if cross else None,
                deterministic=deterministic,
            )
            t_cur //= cfg.scale_factor
            out_feats.append(x)
            out_masks.append(mask)
        return out_feats, out_masks
