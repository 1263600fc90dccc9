"""On-device VQ clip/query augmentation.

TPU-native equivalent of the reference's kornia GPU augmentation
(process_data, VQ/dataset/dataset_utils.py:76-197): color jitter
(brightness/contrast/saturation), horizontal flip with bbox flip,
RandomResizedCrop with bbox remap + out-of-frame invalidation
(check_bbox, dataset_utils.py:339-360), and ImageNet normalization —
all jittable jnp ops applied inside the train step. Only RandomAffine
stays off (commented out in the reference too).

Boxes are normalized xyxy (x1, y1, x2, y2). Crops are shared across a
clip's frames (the reference's same_on_batch=True per clip) and sampled
per batch element.
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


def _sample_crop(rng, scale, ratio, tries: int = 8):
    """torchvision/kornia RandomResizedCrop parameter sampling, jit-style:
    instead of the retry loop, draw `tries` (area, log-aspect) candidates
    at once and take the first whose crop fits; fall back to the full
    frame (torchvision's center fallback at aspect ~1 after 10 misses).
    Returns fractional (x0, y0, w, h)."""
    ka, kr, kx, ky = jax.random.split(rng, 4)
    area = jax.random.uniform(ka, (tries,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        kr, (tries,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_r)
    w = jnp.sqrt(area * aspect)
    h = jnp.sqrt(area / aspect)
    ok = (w <= 1.0) & (h <= 1.0)
    # first valid candidate; index `tries` selects the appended fallback
    idx = jnp.argmax(jnp.concatenate([ok, jnp.ones((1,), bool)]))
    w = jnp.concatenate([w, jnp.ones((1,))])[idx]
    h = jnp.concatenate([h, jnp.ones((1,))])[idx]
    x0 = jax.random.uniform(kx, ()) * (1.0 - w)
    y0 = jax.random.uniform(ky, ()) * (1.0 - h)
    return x0, y0, w, h


def _bilinear_crop_resize(frames, x0, y0, w, h):
    """Crop the fractional window (x0, y0, w, h) out of (..., H, W, C)
    frames and resize back to (H, W) with bilinear sampling
    (align_corners=False), separably per axis — jittable with traced
    window parameters."""
    H, W = frames.shape[-3], frames.shape[-2]

    def axis_coords(n, start, size):
        pos = start * n + (jnp.arange(n) + 0.5) * (size * n) / n - 0.5
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
        hi = jnp.clip(lo + 1, 0, n - 1)
        frac = jnp.clip(pos - lo, 0.0, 1.0)
        return lo, hi, frac

    ylo, yhi, yf = axis_coords(H, y0, h)
    x = (jnp.take(frames, ylo, axis=-3)
         * (1.0 - yf)[:, None, None]
         + jnp.take(frames, yhi, axis=-3) * yf[:, None, None])
    xlo, xhi, xf = axis_coords(W, x0, w)
    x = (jnp.take(x, xlo, axis=-2) * (1.0 - xf)[:, None]
         + jnp.take(x, xhi, axis=-2) * xf[:, None])
    return x


def random_resized_crop_clip(rng, clip, bbox, with_bbox,
                             scale=(0.66, 1.0), ratio=(0.8, 1.2)):
    """RandomResizedCrop over (B, T, H, W, 3) clips, one crop per batch
    element shared across its frames (transform_clip,
    VQ/dataset/dataset_utils.py:107-114: K.RandomResizedCrop p=1,
    scale=(0.66, 1), same_on_batch=True per clip), with bbox remap and
    the reference's out-of-frame invalidation + clamp (check_bbox).

    bbox: (B, T, 4) normalized xyxy; with_bbox: (B, T) float validity.
    """
    B = clip.shape[0]
    keys = jax.random.split(rng, B)
    x0, y0, w, h = jax.vmap(
        lambda k: _sample_crop(k, scale, ratio))(keys)      # (B,) each

    clip = jax.vmap(_bilinear_crop_resize)(clip, x0, y0, w, h)

    x0b, y0b = x0[:, None, None], y0[:, None, None]
    wb, hb = w[:, None, None], h[:, None, None]
    x1 = (bbox[..., 0:1] - x0b) / wb
    y1 = (bbox[..., 1:2] - y0b) / hb
    x2 = (bbox[..., 2:3] - x0b) / wb
    y2 = (bbox[..., 3:4] - y0b) / hb
    # invalid once fully outside the crop (check_bbox: any side beyond the
    # opposite frame edge), else clamp to [0, 1]
    invalid = ((x2 <= 0.0) | (x1 >= 1.0) | (y2 <= 0.0) | (y1 >= 1.0))[..., 0]
    bbox = jnp.clip(jnp.concatenate([x1, y1, x2, y2], axis=-1), 0.0, 1.0)
    with_bbox = with_bbox * (~invalid).astype(with_bbox.dtype)
    return clip, bbox, with_bbox


def augment_vq_batch(rng, batch, *, p_flip=0.5, jitter=True, crop=True):
    """Train-time augmentation of a VQ batch dict (clip, query, clip_bbox,
    clip_with_bbox) + normalization. Mirrors process_data's enabled clip
    stages in order: jitter -> flip -> random-resized crop."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    clip = batch["clip"]
    query = batch["query"]
    bbox = batch["clip_bbox"]
    with_bbox = batch.get("clip_with_bbox")
    if with_bbox is None:
        with_bbox = jnp.ones(bbox.shape[:2], jnp.float32)
    if jitter:
        # the clip transform uses (0.4, 0.4, 0.3) at p=1
        # (dataset_utils.py:108); the configurable triplet applies to the
        # query transform
        clip = color_jitter(k1, clip, 0.4, 0.4, 0.3)
        query = color_jitter(k2, query)
    clip, bbox = hflip_clip(k3, clip, bbox, p=p_flip)
    if crop:
        clip, bbox, with_bbox = random_resized_crop_clip(
            k4, clip, bbox, with_bbox)
    out = dict(batch)
    out["clip"] = normalize_images(clip)
    out["query"] = normalize_images(query)
    out["clip_bbox"] = bbox
    out["clip_with_bbox"] = with_bbox
    return out
