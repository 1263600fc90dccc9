"""L2P prompt pool (Learning-to-Prompt) as a Flax module.

TPU-native equivalent of MQ/libs/cl_methods/prompt.py:4-117 (same module is
copy-pasted in NLQ/ and VQ/). Prompts are selected from a learnable pool by
cosine similarity between the (mean-pooled) text embedding and learnable
keys; selected prompts are prepended to the token stream and a pull
constraint `reduce_sim` is returned for the loss
(meta_archs.py:1476-1479: final_loss -= 0.1 * reduce_sim).

Deviations from the reference (documented deliberately):
  - `batchwise_prompt` majority voting uses a bincount top-k instead of
    torch.unique (identical result, static shapes).
  - The reference rebuilds the prompted-text mask with the *original* text
    lengths (meta_archs.py:775-780), which silently masks out the tail of
    the real tokens once prompts are prepended. We mark `prompt_len + L_orig`
    positions valid instead — the sane reading of the intent.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def l2_normalize(x, axis=-1, eps=1e-12):
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


class PromptPool(nn.Module):
    pool_size: int = 10
    length: int = 20
    embed_dim: int = 768
    top_k: int = 4
    batchwise_prompt: bool = True
    embedding_key: str = "mean"

    @nn.compact
    def __call__(self, x_embed, prompt_mask: Optional[jax.Array] = None):
        """x_embed: (B, L, C) text tokens. prompt_mask: (B, top_k) int or None.

        Returns dict(prompted (B, top_k*length + L, C), reduce_sim scalar,
        idx (B, top_k)).
        """
        if x_embed.shape[-1] != self.embed_dim:
            raise ValueError(
                f"PromptPool embed_dim={self.embed_dim} but the text tokens "
                f"are {x_embed.shape[-1]}-d; prompts are prepended to the "
                f"text stream so the dims must match. Set cl_cfg.embed_dim "
                f"to the text-token dim (Config.derived() derives it from "
                f"model.n_txt_in — re-derive after overriding n_txt_in)."
            )
        # uniform(-1, 1) as in prompt.py:24-25; stored UN-shifted so the
        # leaves import 1:1 from reference checkpoints
        unif = lambda key, shape, dtype: jax.random.uniform(
            key, shape, dtype, -1.0, 1.0)
        prompt = self.param(
            "prompt", unif,
            (self.pool_size, self.length, self.embed_dim), jnp.float32)
        prompt_key = self.param(
            "prompt_key", unif,
            (self.pool_size, self.embed_dim), jnp.float32)

        if self.embedding_key == "mean":
            x_mean = jnp.mean(x_embed, axis=1)
        elif self.embedding_key == "max":
            x_mean = jnp.max(x_embed, axis=1)
        else:
            x_mean = jnp.max(x_embed, axis=1) + 2 * jnp.mean(x_embed, axis=1)

        prompt_norm = l2_normalize(prompt_key.astype(x_embed.dtype), axis=1)
        x_norm = l2_normalize(x_mean, axis=1)
        similarity = x_norm @ prompt_norm.T          # (B, pool)

        if prompt_mask is None:
            _, idx = jax.lax.top_k(similarity, self.top_k)   # (B, top_k)
            if self.batchwise_prompt:
                counts = jnp.zeros((self.pool_size,), jnp.int32).at[
                    idx.reshape(-1)
                ].add(1)
                # majority vote == the reference's unique+topk
                # (prompt.py:71-82) except COUNT TIES: torch.topk's order
                # for equal values is unspecified (observed picking the
                # higher id on CPU), ours is deterministically the lowest
                # id — a documented, unpinnable difference. (The
                # reference's count-0 padding can never win: every row
                # contributes top_k distinct ids, so at least top_k
                # prompts always carry positive counts.)
                _, major = jax.lax.top_k(counts, self.top_k)
                idx = jnp.broadcast_to(major[None, :],
                                       (x_embed.shape[0], self.top_k))
        else:
            idx = prompt_mask

        batched_prompt = prompt[idx].astype(x_embed.dtype)   # (B, k, len, C)
        B, k, L, C = batched_prompt.shape
        batched_prompt = batched_prompt.reshape(B, k * L, C)

        batched_key_norm = prompt_norm[idx]                  # (B, k, C)
        sim = batched_key_norm * x_norm[:, None, :]
        reduce_sim = jnp.sum(sim) / x_embed.shape[0]

        prompted = jnp.concatenate([batched_prompt, x_embed], axis=1)
        return {
            "prompted": prompted,
            "reduce_sim": reduce_sim,
            "idx": idx,
            "total_prompt_len": k * L,
        }
