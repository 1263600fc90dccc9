"""Flax building blocks for the point-transformer trunk.

TPU-native re-design of MQ/libs/modeling/blocks.py. Layout is (B, T, C)
everywhere; masks are (B, T) bool. Modules:

  MaskedConv        <- MaskedConv1D            blocks.py:57
  LayerNormC        <- LayerNorm (channel LN)  blocks.py:133
  MaskedMHCA        <- MaskedMHCA / LocalMaskedMHCA  blocks.py:272 / :871
  MaskedMHA         <- MaskedMHA (self/cross)  blocks.py:194
  ChannelBlock      <- ChannelAttention+Block  blocks.py:412-467
  TransformerBlock  <- TransformerBlock        blocks.py:468-594
  TimeAdapter       <- meta_archs.Adapter "pets" (MQ meta_archs.py:105-140):
                       a bottleneck MLP over the TIME axis whose output length
                       is T/2 (matching the strided attention output)
  AffineDropPath    <- blocks.py:655-670
  XLRelAttention    <- XLNetRelativeAttention (modeling_xlnet_x.py:210+),
                       single-stream bi attention as used by the backbone
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from vilco_tpu.ops.activations import gelu

from vilco_tpu.ops.attention import banded_attention, channel_attention, masked_attention
from vilco_tpu.ops.masked import channel_layernorm, masked_conv1d, masked_max_pool1d


class MaskedConv(nn.Module):
    """Masked 1-D conv (same padding); see ops.masked.masked_conv1d."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x, mask):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.he_uniform(),
            (self.kernel_size, cin // self.groups, self.features),
            jnp.float32,
        ).astype(x.dtype)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.constant(self.bias_init),
                (self.features,), jnp.float32,
            ).astype(x.dtype)
        return masked_conv1d(
            x, mask, kernel, bias, stride=self.stride, groups=self.groups
        )


class _DWKernel(nn.Module):
    """Bare depthwise-conv kernel param — same name/shape/init as
    MaskedConv's, so the fused-conv path (kernels/dwconv.py) keeps the
    exact param tree of the XLA path (checkpoints and the CPU-init twin
    model stay interchangeable)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.he_uniform(),
            (self.kernel_size, 1, self.features), jnp.float32,
        )


class LayerNormC(nn.Module):
    """Channel LayerNorm with affine params (blocks.py:133-175)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return channel_layernorm(x, w.astype(x.dtype), b.astype(x.dtype), self.eps)


def _drop_path(x, rate, deterministic, rng):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x / keep * mask


class AffineDropPath(nn.Module):
    """Per-channel learnable scale (init 1e-4) + stochastic depth
    (blocks.py:655-670)."""

    drop_rate: float = 0.0
    init_scale: float = 1e-4

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.constant(self.init_scale), (1, 1, c),
            jnp.float32,
        ).astype(x.dtype)
        out = scale * x
        if not deterministic and self.drop_rate > 0.0:
            rng = self.make_rng("dropout")
            out = _drop_path(out, self.drop_rate, deterministic, rng)
        return out


class MaskedMHA(nn.Module):
    """Dense masked MHA with 1x1 projections; self- or cross-attention
    (blocks.py:194-270)."""

    n_embd: int
    n_head: int
    proj_drop: float = 0.0
    use_fused: bool = False   # Pallas fused attention (TPU)

    @nn.compact
    def __call__(self, x, mask, enc=None, enc_mask=None, deterministic=True):
        H = self.n_head
        D = self.n_embd // H
        dense = lambda name: nn.Dense(self.n_embd, name=name, dtype=x.dtype)
        if enc is not None:
            q = dense("query")(x)
            k = dense("key")(enc)
            v = dense("value")(enc)
            kv_mask = enc_mask
        else:
            q = dense("query")(x)
            k = dense("key")(x)
            v = dense("value")(x)
            kv_mask = mask
        B, Tq = q.shape[:2]
        Tk = k.shape[1]
        if self.use_fused:
            # channels-last kernel: consumes the q/k/v matmul outputs
            # directly, no (B, T, H, D) fold relayouts; falls back to
            # XLA attention when shapes don't fit the kernel
            from vilco_tpu.kernels.attention import fused_attention_blc

            out = fused_attention_blc(q, k, v, kv_mask, H)
        else:
            out = masked_attention(q.reshape(B, Tq, H, D),
                                   k.reshape(B, Tk, H, D),
                                   v.reshape(B, Tk, H, D), kv_mask
                                   ).reshape(B, Tq, self.n_embd)
        out = dense("proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out * mask[..., None].astype(out.dtype), mask


class MaskedMHCA(nn.Module):
    """Multi-head conv attention: depthwise-conv q/k/v preprocessing (with
    optional stride-2 downsampling) + LN + attention (blocks.py:272-411).
    window > 0 switches the attention core to the banded/sliding-window form
    (LocalMaskedMHCA, blocks.py:871-1208).
    """

    n_embd: int
    n_head: int
    n_qx_stride: int = 1
    n_kv_stride: int = 1
    window: int = -1          # half-window for banded attention; <=0 dense
    proj_drop: float = 0.0
    use_fused: bool = False   # Pallas fused kernels (TPU)
    use_fused_conv: bool = False  # Pallas fused depthwise q/k/v conv (TPU)
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        H, E = self.n_head, self.n_embd
        D = E // H

        q_ks = self.n_qx_stride + 1 if self.n_qx_stride > 1 else 3
        kv_ks = self.n_kv_stride + 1 if self.n_kv_stride > 1 else 3

        s = self.n_qx_stride
        if (self.use_fused_conv and s == self.n_kv_stride and s in (1, 2)
                and x.shape[1] % (2 * s) == 0):
            # one Pallas pass over x computes all three depthwise convs;
            # its backward emits dx + the three wgrads in one pass too
            # (kernels/dwconv.py). Same math, mask multiply, and param
            # tree as the MaskedConv path below.
            from vilco_tpu.kernels.dwconv import (
                fused_dwconv_qkv,
                fused_dwconv_qkv_s2,
            )

            wq = _DWKernel(E, q_ks, name="query_conv")()
            wk = _DWKernel(E, kv_ks, name="key_conv")()
            wv = _DWKernel(E, kv_ks, name="value_conv")()
            w3 = jnp.stack([wq[:, 0], wk[:, 0], wv[:, 0]]).astype(x.dtype)
            if s == 1:
                q, k, v = fused_dwconv_qkv(x, w3)
                q_mask = kv_mask = mask
            else:
                q, k, v = fused_dwconv_qkv_s2(x, w3)
                q_mask = kv_mask = mask[:, ::2]
            mm = q_mask[..., None].astype(q.dtype)
            q, k, v = q * mm, k * mm, v * mm
            q = LayerNormC(name="query_norm")(q)
            k = LayerNormC(name="key_norm")(k)
            v = LayerNormC(name="value_norm")(v)
        else:
            q, q_mask = MaskedConv(E, q_ks, stride=self.n_qx_stride,
                                   groups=E, use_bias=False,
                                   name="query_conv")(x, mask)
            q = LayerNormC(name="query_norm")(q)
            k, kv_mask = MaskedConv(E, kv_ks, stride=self.n_kv_stride,
                                    groups=E, use_bias=False,
                                    name="key_conv")(x, mask)
            k = LayerNormC(name="key_norm")(k)
            v, _ = MaskedConv(E, kv_ks, stride=self.n_kv_stride, groups=E,
                              use_bias=False, name="value_conv")(x, mask)
            v = LayerNormC(name="value_norm")(v)

        q = nn.Dense(E, name="query", dtype=x.dtype)(q)
        k = nn.Dense(E, name="key", dtype=x.dtype)(k)
        v = nn.Dense(E, name="value", dtype=x.dtype)(v)

        B, Tq = q.shape[:2]
        Tk = k.shape[1]
        blc = (self.use_fused and self.attention_impl != "pallas_naive"
               and not (self.window > 0 and Tq == Tk)
               and self.attention_impl != "flash")
        if not blc:
            q = q.reshape(B, Tq, H, D)
            k = k.reshape(B, Tk, H, D)
            v = v.reshape(B, Tk, H, D)
        if self.window > 0 and Tq == Tk:
            # Fused banded kernel (fwd + flash-style bwd) when a legal
            # query block exists (kernels/banded_attention.py: _pick_block
            # needs a 128-multiple block dividing T) AND the sequence is
            # long enough to win: the round-5 HW crossover sweep
            # (tools/bench_banded_longT.py, B=4 H=4 D=96 fwd+bwd) measured
            # fused/XLA at 0.80x for T=2560 but 1.23-1.40x for T=8192
            # (end-to-end neutral at the NLQ flagship's 2560 either way,
            # round-4 A/B) — so the fused form engages at T >= 8192 and
            # the XLA blocked form serves the shipped configs. The fused
            # bwd's full-T dkv accumulator VMEM-OOMs at T=16384 with
            # B*H=16; RESULTS.md round 5.
            import os as _os
            if (self.use_fused and Tq >= 8192
                    and not _os.environ.get("VILCO_DISABLE_FUSED_BANDED")):
                from vilco_tpu.kernels.banded_attention import (
                    banded_attention_fused,
                )

                out = banded_attention_fused(q, k, v, kv_mask, self.window)
            else:
                out = banded_attention(q, k, v, kv_mask, window=self.window)
        elif self.attention_impl == "flash" and Tq == Tk:
            from vilco_tpu.kernels.attention import flash_attention_jax

            # invalid query rows are zeroed by the qx_mask multiply below
            out = flash_attention_jax(q, k, v, kv_mask)
        elif blc:
            # channels-last kernel: no (B, T, H, D) fold relayouts
            from vilco_tpu.kernels.attention import fused_attention_blc

            out = fused_attention_blc(q, k, v, kv_mask, H)
        elif self.attention_impl == "pallas_naive":
            from vilco_tpu.kernels.attention import fused_attention

            out = fused_attention(q, k, v, kv_mask)
        else:
            out = masked_attention(q, k, v, kv_mask)
        if not blc:
            out = out.reshape(B, Tq, E)
        out = nn.Dense(E, name="proj", dtype=x.dtype)(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out * q_mask[..., None].astype(out.dtype), q_mask


class ChannelBlock(nn.Module):
    """Channel (transposed) attention block (blocks.py:438-467): LN qkv ->
    channel attention -> residual; LN -> MLP -> residual."""

    n_embd: int
    n_head: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        H = self.n_head
        B, T, C = x.shape
        qkv = nn.Dense(3 * C, use_bias=False, name="qkv", dtype=x.dtype)(x)
        qkv = qkv.reshape(B, T, 3, H, C // H)
        cur = channel_attention(qkv, H).reshape(B, T, C)
        cur = nn.Dense(C, name="proj", dtype=x.dtype)(cur)
        if not deterministic and self.drop_path > 0:
            cur = _drop_path(cur, self.drop_path, deterministic,
                             self.make_rng("dropout"))
        x = x + cur
        h = nn.LayerNorm(name="norm2", dtype=x.dtype)(x)
        h = nn.Dense(int(C * self.mlp_ratio), name="mlp_fc1", dtype=x.dtype)(h)
        h = gelu(h)
        h = nn.Dense(C, name="mlp_fc2", dtype=x.dtype)(h)
        if not deterministic and self.drop_path > 0:
            h = _drop_path(h, self.drop_path, deterministic,
                           self.make_rng("dropout"))
        return x + h


class TimeAdapter(nn.Module):
    """CL "pets" adapter — bottleneck MLP over the time axis.

    Faithful to meta_archs.Adapter (MQ/libs/modeling/meta_archs.py:105-140):
    nn.Linear applied to a (B, C, T) tensor acts on T, so the adapter maps
    T -> 5T -> T/2 and its output is added in parallel to the strided
    attention output. Zero-init on the second projection.
    """

    t_in: int
    down_sample: int = 5
    t_out_factor: int = 2   # output length = t_in // t_out_factor

    @nn.compact
    def __call__(self, x):  # x: (B, T, C)
        B, T, C = x.shape
        assert T == self.t_in, (T, self.t_in)
        hidden = self.down_sample * self.t_in
        xt = jnp.swapaxes(x, 1, 2)   # (B, C, T)
        h = nn.Dense(hidden, name="fc1", dtype=x.dtype)(xt)
        h = gelu(h)
        h = nn.Dense(
            self.t_in // self.t_out_factor, name="fc2",
            kernel_init=nn.initializers.zeros, dtype=x.dtype,
        )(h)
        return jnp.swapaxes(h, 1, 2)  # (B, T/2, C)


class TransformerBlock(nn.Module):
    """Pre-LN transformer block with masked conv attention, maxpool residual
    on downsampling, optional text cross-attention, channel-attention blend
    (blocks.py:468-594).

    The optional `adapter` flag adds the CL TimeAdapter in parallel with the
    attention (AdapterMixin.adapt_module + attach_pets,
    meta_archs.py:685-690). Its params live under this block so EMA/freeze
    logic can address them by path.
    """

    n_embd: int
    n_head: int
    n_ds_stride: int = 1
    n_hidden: Optional[int] = None
    proj_drop: float = 0.0
    path_drop: float = 0.0
    t_c_alpha: float = 0.8
    window: int = -1
    use_cross_modal: bool = False
    use_channel_attn: bool = True
    use_fused: bool = False    # Pallas fused attention kernels (TPU)
    use_fused_conv: bool = False  # Pallas fused depthwise q/k/v conv (TPU)
    attention_impl: str = "xla"
    adapter_t_in: int = 0      # >0: attach TimeAdapter with this input length

    @nn.compact
    def __call__(self, x, mask, cross_y=None, cross_y_mask=None,
                 deterministic=True, adapter_params=None):
        E = self.n_embd
        s = self.n_ds_stride

        ln1 = LayerNormC(name="ln1")(x)
        out, out_mask = MaskedMHCA(
            E, self.n_head, n_qx_stride=s, n_kv_stride=s, window=self.window,
            proj_drop=self.proj_drop, use_fused=self.use_fused,
            use_fused_conv=self.use_fused_conv,
            attention_impl=self.attention_impl, name="attn",
        )(ln1, mask, deterministic=deterministic)

        if self.adapter_t_in > 0:
            adapt = TimeAdapter(self.adapter_t_in, name="adapter")(ln1)
            out = out + adapt

        # Residual scaling: AffineDropPath only when path_drop > 0 — the
        # reference constructs nn.Identity otherwise (blocks.py:553-558).
        # drop_path_attn is SHARED between the self-attn and cross-attn
        # residuals (blocks.py:567,573).
        if self.path_drop > 0.0:
            _dp_attn = AffineDropPath(self.path_drop, name="drop_path_attn")
            _dp_mlp = AffineDropPath(self.path_drop, name="drop_path_mlp")
            dp_attn = lambda v: _dp_attn(v, deterministic)
            dp_mlp = lambda v: _dp_mlp(v, deterministic)
        else:
            dp_attn = dp_mlp = lambda v: v

        out_mask_f = out_mask[..., None].astype(out.dtype)
        if s > 1:
            skip, _ = masked_max_pool1d(x, mask, kernel=s + 1, stride=s)
        else:
            skip = x
        out = skip * out_mask_f + dp_attn(out)

        if self.use_cross_modal and cross_y is not None:
            ln3 = LayerNormC(name="ln3")
            cross_out, _ = MaskedMHA(
                E, self.n_head, proj_drop=self.proj_drop,
                use_fused=self.use_fused, name="cross_attn",
            )(ln3(out), out_mask, enc=ln3(cross_y), enc_mask=cross_y_mask,
              deterministic=deterministic)
            out = out * out_mask_f + dp_attn(cross_out)

        # FFN
        n_hidden = self.n_hidden or 4 * E
        h = LayerNormC(name="ln2")(out)
        h = nn.Dense(n_hidden, name="mlp_fc1", dtype=x.dtype)(h)
        h = gelu(h)
        h = nn.Dropout(self.proj_drop)(h, deterministic=deterministic)
        h = nn.Dense(E, name="mlp_fc2", dtype=x.dtype)(h)
        h = nn.Dropout(self.proj_drop)(h, deterministic=deterministic)
        out = out + dp_mlp(h * out_mask_f)

        # channel-attention mix on stride-1 blocks (blocks.py:578-585)
        if self.use_channel_attn and s == 1:
            out2 = ChannelBlock(E, self.n_head, drop_path=self.path_drop,
                                name="channel_attn")(ln1, deterministic)
            out = self.t_c_alpha * out + (1.0 - self.t_c_alpha) * out2

        return out, out_mask


def xl_cache_mems(prev_mems, x, mem_len: int):
    """Transformer-XL memory update (cache_mem, modeling_xlnet_x.py:997-
    1016): append the layer's INPUT hidden states and keep the last
    `mem_len`, detached. prev_mems may be None."""
    cat = x if prev_mems is None else jnp.concatenate([prev_mems, x], axis=1)
    return jax.lax.stop_gradient(cat[:, -mem_len:])


class XLRelAttention(nn.Module):
    """Single-stream Transformer-XL relative attention + FF layer.

    Equivalent to the XLNet stage the MQ backbone inserts at branch level 0
    (MQ/libs/modeling/backbones.py:267-274; XLNetRelativeAttention
    modeling_xlnet_x.py:210+, attn_type 'bi'). Post-LN residuals, learned
    r_w/r_r biases, sinusoid relative positions.

    Supports the mems recurrence for streaming long videos in fixed-size
    chunks: pass `mems` (B, M, C) = the previous chunk's layer INPUT cached
    via `xl_cache_mems`, and keys/values extend over [mems; x] with the
    relative positions shifted accordingly (relative_positional_encoding
    qlen/klen, modeling_xlnet_x.py:1228).

    Also supports XLNet's two-stream (query-stream) attention
    (modeling_xlnet_x.py:346-425): pass `g` (B, Mq, C) — the query-stream
    hidden states (initially XLNetModel's learned mask_emb broadcast) —
    plus optionally `target_mapping` (B, Mq, T) one-hot query->position
    and per-query allow masks. The g stream shares every projection, the
    post-attention LayerNorm and the FF with the h stream (as in
    XLNetLayer), and the call returns `(h_out, g_out)`. The reference MQ
    backbone only ever invokes the single-stream path (PARITY.md); the
    two-stream core is reproduced for full XLNet-stage parity.

    Segment attention (modeling_xlnet_x.py:291-295): pass `seg_ids`
    (B, T) int token-type ids and the score gains the ef term —
    (q + r_s_bias) · seg_embed[same/diff segment] — with mems counted as
    segment 0 (the reference's mem_pad, :1214-1222). Dead in the shipped
    MQ config (no token_type_ids) but reproduced for full parity.

    Mask conventions (OURS, boolean allow-masks — the reference uses
    float 1=masked): `mask`/`mems_mask` are (B, T)/(B, M) valid-token
    rows; `h_attn_mask` (B, T, K) and `g_attn_mask` (B, T, K) optionally
    restrict per-(query, key) attention (K = M + T), e.g. XLNet's
    perm_mask-derived non_tgt_mask / attn_mask.
    """

    d_model: int
    n_head: int
    d_inner: int
    dropout: float = 0.1
    # fused Pallas kernel for the relative-attention core (TPU only):
    # keeps the (T, T)/(T, 2T) score chain in VMEM instead of HBM —
    # the XLA form's dominant bandwidth cost (see kernels/xl_attention.py)
    use_fused: bool = False

    @nn.compact
    def __call__(self, x, mask, deterministic=True, mems=None,
                 mems_mask=None, g=None, g_attn_mask=None,
                 target_mapping=None, h_attn_mask=None, seg_ids=None):
        B, T, C = x.shape
        H = self.n_head
        D = C // H
        scale = 1.0 / (D ** 0.5)

        def head_param(name):
            return self.param(
                name, nn.initializers.normal(0.02), (C, H, D), jnp.float32
            ).astype(x.dtype)

        q_w, k_w, v_w, r_w, o_w = (head_param(n) for n in
                                   ("q", "k", "v", "r", "o"))
        r_w_bias = self.param("r_w_bias", nn.initializers.normal(0.02),
                              (H, D), jnp.float32).astype(x.dtype)
        r_r_bias = self.param("r_r_bias", nn.initializers.normal(0.02),
                              (H, D), jnp.float32).astype(x.dtype)

        # streamed chunks: keys/values extend over the cached previous
        # chunk (mems), queries stay on the current chunk
        if mems is not None and mems.shape[1] > 0:
            M = mems.shape[1]
            cat = jnp.concatenate([mems.astype(x.dtype), x], axis=1)
            kv_mask = jnp.concatenate(
                [mems_mask if mems_mask is not None
                 else jnp.ones((B, M), bool), mask], axis=1)
        else:
            M = 0
            cat = x
            kv_mask = mask
        K = M + T

        # relative positional encoding, pos from klen..-qlen (bi attention,
        # relative_positional_encoding, modeling_xlnet_x.py:1020-1070)
        pos_seq = jnp.arange(K, -T, -1.0, dtype=jnp.float32)
        inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, C, 2.0) / C))
        sin_inp = pos_seq[:, None] * inv_freq[None, :]
        pos_emb = jnp.concatenate([jnp.sin(sin_inp), jnp.cos(sin_inp)],
                                  axis=-1).astype(x.dtype)   # (K+T, C)

        q = jnp.einsum("btc,chd->bthd", x, q_w)
        k = jnp.einsum("btc,chd->bthd", cat, k_w)
        v = jnp.einsum("btc,chd->bthd", cat, v_w)
        r = jnp.einsum("tc,chd->thd", pos_emb, r_w)

        if seg_ids is not None:
            # segment attention (rel_attn_core ef term,
            # modeling_xlnet_x.py:291-295); mems take segment id 0
            # (mem_pad, :1214-1216)
            r_s_bias = self.param(
                "r_s_bias", nn.initializers.normal(0.02), (H, D),
                jnp.float32).astype(x.dtype)
            seg_embed = self.param(
                "seg_embed", nn.initializers.normal(0.02), (2, H, D),
                jnp.float32).astype(x.dtype)
            cat_ids = seg_ids if M == 0 else jnp.concatenate(
                [jnp.zeros((B, M), seg_ids.dtype), seg_ids], axis=1)
            # True = different segment (the reference's seg_mat[..., 1])
            seg_diff = seg_ids[:, :, None] != cat_ids[:, None, :]

        def rel_core(qh, allow_qk):
            # rel_attn_core (modeling_xlnet_x.py:270-320) for a (B, T, H,
            # D) query head; allow_qk optionally restricts per-(q, k)
            ac = jnp.einsum("bqhd,bkhd->bhqk",
                            qh + r_w_bias[None, None], k)
            bd = jnp.einsum("bqhd,khd->bhqk",
                            qh + r_r_bias[None, None], r)
            # rel shift (rel_shift_bnij, modeling_xlnet_x.py:264-276):
            # shifted[q, k] = bd[q, K + k - q]. The reshape-slice-reshape
            # form is the TPU-friendly XLA one — an equivalent
            # take_along_axis gather measured ~100x slower (per-element
            # gathers don't vectorize on the VPU lanes).
            bd = bd.reshape(B, H, K + T, T)[:, :, 1:, :]
            bd = bd.reshape(B, H, T, K + T - 1)[:, :, :, :K]

            s = ac + bd
            if seg_ids is not None:
                # ef[b,h,q,k] = (qh + r_s_bias) · seg_embed[diff(q,k)] —
                # the reference's one-hot seg_mat matmul selects exactly
                ef_all = jnp.einsum("bqhd,shd->bhqs",
                                    qh + r_s_bias[None, None], seg_embed)
                s = s + jnp.where(seg_diff[:, None],
                                  ef_all[..., 1:], ef_all[..., :1])
            att = s * scale
            allow = kv_mask[:, None, None, :]
            if allow_qk is not None:
                allow = allow & allow_qk[:, None]
            att = jnp.where(allow, att, -1e9)
            att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
            att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
            vm = v * kv_mask[:, :, None, None].astype(v.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", att, vm)

        # post-attention projection + FF, module instances shared between
        # the h and g streams (XLNetLayer applies the same layer_norm/ff
        # to both, modeling_xlnet_x.py:428-470)
        # layer_norm_eps=1e-12 in every shipped xlnet_config_*.json (the
        # flax default 1e-6 measurably moves a lockstep trajectory)
        ln_attn = nn.LayerNorm(name="ln_attn", dtype=x.dtype, epsilon=1e-12)
        ff1 = nn.Dense(self.d_inner, name="ff1", dtype=x.dtype)
        ff2 = nn.Dense(self.d_model, name="ff2", dtype=x.dtype)
        ln_ff = nn.LayerNorm(name="ln_ff", dtype=x.dtype, epsilon=1e-12)

        def post(inp, vec):
            o = jnp.einsum("bqhd,chd->bqc", vec, o_w)
            o = nn.Dropout(self.dropout)(o, deterministic=deterministic)
            y = ln_attn(inp + o)
            f = gelu(ff1(y))
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            f = ff2(f)
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            return ln_ff(y + f)

        if (self.use_fused and M == 0 and g is None
                and h_attn_mask is None and seg_ids is None):
            from vilco_tpu.kernels.xl_attention import xl_rel_attention

            rate = 0.0 if deterministic else self.dropout
            if rate > 0.0:
                seed = jax.random.bits(
                    self.make_rng("dropout"), (1,), jnp.uint32
                ).astype(jnp.int32)
            else:
                seed = jnp.zeros((1,), jnp.int32)
            out = xl_rel_attention(
                q, k, v, r, r_w_bias, r_r_bias, mask, seed, rate
            ).astype(x.dtype)
        else:
            out = rel_core(q, h_attn_mask)
        h_out = post(x, out) * mask[..., None].astype(x.dtype)
        if g is None:
            return h_out

        # g (query) stream: same q projection; with target_mapping the Mq
        # query slots are scattered onto their sequence positions for the
        # core and gathered back (modeling_xlnet_x.py:388-407)
        qg = jnp.einsum("bmc,chd->bmhd", g.astype(x.dtype), q_w)
        if target_mapping is not None:
            tm = target_mapping.astype(x.dtype)
            vec_g = rel_core(jnp.einsum("bmhd,bmt->bthd", qg, tm),
                             g_attn_mask)
            vec_g = jnp.einsum("bthd,bmt->bmhd", vec_g, tm)
        else:
            if qg.shape[1] != T:
                raise ValueError(
                    "two-stream g length must equal T unless a "
                    "target_mapping scatters the query slots"
                )
            vec_g = rel_core(qg, g_attn_mask)
        return h_out, post(g.astype(x.dtype), vec_g)


class Scale(nn.Module):
    """Learnable scalar multiplier (blocks.py:607-626)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(self.init_value),
                       (), jnp.float32).astype(x.dtype)
        return x * s
