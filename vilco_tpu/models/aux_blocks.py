"""Auxiliary reference blocks that ship in the reference repo but are dead
in every ViLCo config — implemented for full component parity and pinned
against the torch originals in tests/test_torch_parity.py:

  - SGPBlock (MQ/libs/modeling/blocks.py:749-870): the TriDet-style scalable
    granularity conv block; the reference only references it from
    commented-out backbone variants (backbones.py:123-126).
  - CxAM / CnAM (MQ/libs/modeling/utils.py:619-670): 1-D positional /
    channel attention refinements; constructed by ACConv but their
    application is commented out in its forward (utils.py:744-748).
  - DenseBlock / DenseAPP (utils.py:672-731): dilated dense ASPP pyramid.
  - ACConv (utils.py:732-749): DenseAPP applied to the TOP pyramid level
    inside FPN1D (necks.py:42,78-80); live only when `fpn_type: fpn`, which
    no shipped config selects (all use `identity`).

All modules are channels-last (B, T, C) Flax; the torch originals are
channels-first (B, C, T).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from vilco_tpu.models.layers import AffineDropPath, LayerNormC
from vilco_tpu.ops.activations import gelu


def _nearest_downsample_mask(mask, out_len: int):
    """torch F.interpolate(mode="nearest") index rule: floor(i * T / T_out)
    (blocks.py:851-856 downsamples the bool mask this way)."""
    T = mask.shape[-1]
    idx = (jnp.arange(out_len) * T) // out_len
    return mask[..., idx]


class _DepthwiseConv(nn.Module):
    """Plain (unmasked) depthwise conv over time, same padding — the
    reference SGPBlock uses raw nn.Conv1d with groups=n_embd, NOT the
    masked variant (blocks.py:788-793)."""

    kernel_size: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return nn.Conv(
            features=c, kernel_size=(self.kernel_size,),
            padding=[(self.kernel_size // 2,) * 2],
            feature_group_count=c, name="conv",
        )(x)


class SGPBlock(nn.Module):
    """Scalable-granularity perception block (blocks.py:749-870).

    instant branch  fc(x) * phi(global avg)  +
    window branch   (convw + convkw) * psi(x)  + ln(x),
    residual with the (max/avg-pool downsampled) input, then a GroupNorm'd
    1x1-conv MLP — all on raw convs (no mask inside, matching the
    reference), mask applied only at the residual join.
    """

    kernel_size: int = 3
    n_ds_stride: int = 1
    k: float = 1.5
    n_out: int | None = None
    n_hidden: int | None = None
    path_pdrop: float = 0.0
    downsample_type: str = "max"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        B, T, C = x.shape
        assert self.kernel_size % 2 == 1
        up_size = round((self.kernel_size + 1) * self.k)
        up_size = up_size + 1 if up_size % 2 == 0 else up_size
        n_hidden = self.n_hidden or 4 * C
        n_out = self.n_out or C

        s = self.n_ds_stride
        if s > 1:
            if self.downsample_type == "max":
                # MaxPool1d(n_ds+1, stride=n_ds, padding=(n_ds+1)//2) — the
                # -inf pad of torch maxpool is jax max_pool's default
                p = (s + 1) // 2
                x = nn.max_pool(x, (s + 1,), strides=(s,),
                                padding=[(p, p)])
            elif self.downsample_type == "avg":
                x = nn.avg_pool(x, (s,), strides=(s,))
                x = nn.Conv(C, (1,), name="ds_conv")(x)
            else:
                raise NotImplementedError("downsample type error")
        out_mask = _nearest_downsample_mask(mask, T // s)
        assert x.shape[1] == out_mask.shape[1], (
            "SGPBlock needs T divisible by the stride (the reference "
            "breaks on odd T too, blocks.py:848-856)")

        out = LayerNormC(name="ln")(x)
        psi = _DepthwiseConv(self.kernel_size, name="psi")(out)
        fc = _DepthwiseConv(1, name="fc")(out)
        convw = _DepthwiseConv(self.kernel_size, name="convw")(out)
        convkw = _DepthwiseConv(up_size, name="convkw")(out)
        phi = nn.relu(_DepthwiseConv(1, name="global_fc")(
            out.mean(axis=1, keepdims=True)))
        out = fc * phi + (convw + convkw) * psi + out

        def drop(name, y):
            if self.path_pdrop > 0.0:
                return AffineDropPath(self.path_pdrop, name=name)(
                    y, deterministic=deterministic)
            return y

        out = x * out_mask[..., None].astype(x.dtype) + drop(
            "drop_path_out", out)
        h = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="gn")(out)
        h = nn.Conv(n_hidden, (1,), name="mlp_fc1")(h)
        h = gelu(h)
        h = nn.Conv(n_out, (1,), name="mlp_fc2")(h)
        out = out + drop("drop_path_mlp", h)
        return out, out_mask


class CxAM(nn.Module):
    """Context attention module (utils.py:619-642): full T x T softmax
    attention with reduced-dim q/k projections."""

    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        q = nn.Dense(c // self.reduction, name="query")(x)   # (B, T, C')
        k = nn.Dense(c // self.reduction, name="key")(x)
        v = nn.Dense(c, name="value")(x)
        attn = nn.softmax(jnp.einsum("btc,bsc->bts", q, k), axis=-1)
        return jnp.einsum("bts,bsc->btc", attn, v)


class CnAM(nn.Module):
    """Content attention module (utils.py:643-670): q/k from the raw
    pyramid feature `init`, values from the refined feature `x`."""

    reduction: int = 8

    @nn.compact
    def __call__(self, x, init):
        c = x.shape[-1]
        q = nn.Dense(c // self.reduction, name="query")(init)
        k = nn.Dense(c // self.reduction, name="key")(init)
        v = nn.Dense(c, name="value")(x)
        attn = nn.softmax(jnp.einsum("btc,bsc->bts", q, k), axis=-1)
        return jnp.einsum("bts,bsc->btc", attn, v)


class DenseBlock(nn.Module):
    """1x1 reduce + GroupNorm + dilated 3-conv (utils.py:672-690)."""

    num1: int
    num2: int
    rate: int
    drop_out: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(self.num1, (1,), name="conv1x1")(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num2, (3,), kernel_dilation=(self.rate,),
                    padding=[(self.rate, self.rate)], name="dilaconv")(x)
        x = nn.relu(x)
        return nn.Dropout(self.drop_out)(x, deterministic=deterministic)


class DenseAPP(nn.Module):
    """Dense ASPP pyramid (utils.py:692-731): 5 progressively-concatenated
    dilated blocks (rates 3/6/12/18/24) + fused 1x1 output conv. The
    reference hardcodes the internal widths (512 -> 256) and 32-group
    norms; kept as defaults."""

    channels1: int = 512
    channels2: int = 256
    drop_out: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        num_channels = x.shape[-1]
        outs = []
        feature = x
        for rate in (3, 6, 12, 18, 24):
            o = DenseBlock(self.channels1, self.channels2, rate,
                           self.drop_out, name=f"aspp{rate}")(
                feature, deterministic=deterministic)
            outs.append(o)
            feature = jnp.concatenate([o, feature], axis=-1)
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Conv(num_channels, (1,), name="conv1x1")(y)
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn")(y)


class ACConv(nn.Module):
    """DenseAPP + mask (utils.py:732-749). The reference also constructs
    CxAM/CnAM here but their application is commented out of forward
    (utils.py:744-748) — reproduced as constructed-elsewhere standalone
    modules instead."""

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        out = DenseAPP(name="denseapp")(x, deterministic=deterministic)
        return out * mask[..., None].astype(out.dtype), mask
