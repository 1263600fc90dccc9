"""On-device VQ clip/query augmentation.

TPU-native equivalent of the reference's kornia GPU augmentation
(process_data, VQ/dataset/dataset_utils.py:76-197): color jitter
(brightness/contrast/saturation), horizontal flip with bbox flip, and
ImageNet normalization — all jittable jnp ops applied inside the train step
(the RandomResizedCrop / RandomAffine stages are commented out or
affine-disabled in the reference; crop is approximated by the flip+jitter
pipeline here and noted in PARITY.md).

Boxes are normalized xyxy (x1, y1, x2, y2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def normalize_images(x):
    """ImageNet normalization over the trailing channel dim."""
    return (x - IMAGENET_MEAN.astype(x.dtype)) / IMAGENET_STD.astype(x.dtype)


def color_jitter(rng, x, brightness=0.3, contrast=0.3, saturation=0.2):
    """Per-sample color jitter on (..., H, W, 3) in [0, 1]."""
    kb, kc, ks = jax.random.split(rng, 3)
    lead = x.shape[0]
    shape = (lead,) + (1,) * (x.ndim - 1)
    b = jax.random.uniform(kb, shape, minval=1 - brightness,
                           maxval=1 + brightness)
    c = jax.random.uniform(kc, shape, minval=1 - contrast,
                           maxval=1 + contrast)
    s = jax.random.uniform(ks, shape, minval=1 - saturation,
                           maxval=1 + saturation)
    x = x * b
    mean = jnp.mean(x, axis=(-3, -2, -1), keepdims=True)
    x = (x - mean) * c + mean
    gray = jnp.mean(x, axis=-1, keepdims=True)
    x = (x - gray) * s + gray
    return jnp.clip(x, 0.0, 1.0)


def hflip_clip(rng, clip, bbox, p=0.5):
    """Random horizontal flip of (B, T, H, W, 3) frames + xyxy boxes,
    same flip decision per sample (same_on_batch over the clip)."""
    B = clip.shape[0]
    flip = jax.random.bernoulli(rng, p, (B,))
    flipped = clip[:, :, :, ::-1, :]
    clip = jnp.where(flip[:, None, None, None, None], flipped, clip)
    x1, y1, x2, y2 = (bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3])
    fb = jnp.stack([1.0 - x2, y1, 1.0 - x1, y2], axis=-1)
    bbox = jnp.where(flip[:, None, None], fb, bbox)
    return clip, bbox


def augment_vq_batch(rng, batch, *, p_flip=0.5, jitter=True):
    """Train-time augmentation of a VQ batch dict (clip, query, clip_bbox)
    + normalization. Mirrors process_data's enabled stages."""
    k1, k2, k3 = jax.random.split(rng, 3)
    clip = batch["clip"]
    query = batch["query"]
    bbox = batch["clip_bbox"]
    if jitter:
        clip = color_jitter(k1, clip)
        query = color_jitter(k2, query)
    clip, bbox = hflip_clip(k3, clip, bbox, p=p_flip)
    out = dict(batch)
    out["clip"] = normalize_images(clip)
    out["query"] = normalize_images(query)
    out["clip_bbox"] = bbox
    return out
