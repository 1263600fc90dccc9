"""1-D deformable convolution with learned offsets.

TPU-native equivalent of DeformConv1d / PackedDeformConv1d
(MQ/libs/modeling/utils.py:272-470, `efficient_linterpolate` :209): each
kernel tap samples the input at (base position + learned offset) via linear
interpolation, then the usual weighted sum. Gated by `use_dcn`
(off in every shipped ViLCo config — capability parity).

Vectorized as one gather + einsum; differentiable end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def deform_conv1d(
    x: jax.Array,         # (B, T, Cin)
    offsets: jax.Array,   # (B, T, K) fractional offsets per tap
    kernel: jax.Array,    # (K, Cin, Cout)
    bias: jax.Array | None = None,
) -> jax.Array:
    """'same' deformable conv: tap k of output position t samples
    x[t + k - K//2 + offsets[t, k]] by linear interpolation."""
    B, T, Cin = x.shape
    K = kernel.shape[0]
    base = (
        jnp.arange(T, dtype=x.dtype)[None, :, None]
        + jnp.arange(K, dtype=x.dtype)[None, None, :]
        - K // 2
    )                                                # (1, T, K)
    pos = base + offsets.astype(x.dtype)             # (B, T, K)
    lo = jnp.clip(jnp.floor(pos), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    frac = pos - lo
    lo = lo.astype(jnp.int32)
    hi = hi.astype(jnp.int32)

    def take(idx):                                   # (B, T, K) -> (B,T,K,Cin)
        return jnp.take_along_axis(
            x, idx.reshape(B, T * K)[..., None], axis=1
        ).reshape(B, T, K, Cin)

    samp = take(lo) * (1 - frac[..., None]) + take(hi) * frac[..., None]
    out = jnp.einsum("btkc,kcd->btd", samp, kernel.astype(x.dtype))
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


class PackedDeformConv(nn.Module):
    """Offsets predicted from the input by a small conv, then deformable
    conv (PackedDeformConv1d, utils.py:422-470)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, mask):
        K = self.kernel_size
        off_kernel = self.param(
            "offset_kernel", nn.initializers.zeros,
            (K, x.shape[-1], K), jnp.float32,
        )
        offsets = jax.lax.conv_general_dilated(
            x, off_kernel.astype(x.dtype), (1,),
            [(K // 2, K // 2)], dimension_numbers=("NWC", "WIO", "NWC"),
        )                                            # (B, T, K)
        kernel = self.param(
            "kernel", nn.initializers.he_uniform(),
            (K, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        out = deform_conv1d(x, offsets, kernel, bias)
        out = out * mask[..., None].astype(out.dtype)
        return out, mask
