"""TPU-batched CLIP image / video-frame feature extraction.

Counterpart of the reference's video-side extractors (the EgoVLP/InternVideo
features are produced offline upstream; the in-repo CLIP image pathway is
MQ/libs/clip/model.py's visual tower driven per-frame). Frames are batched
to a fixed (B, H, W, 3) shape and run through a jitted Flax CLIP vision
tower; per-clip features are written as (T, D) arrays in the .npy format the
MQ loader reads (MQ/libs/datasets/ego4d.py:663-684).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np


class ClipImageExtractor:
    def __init__(self, model_path: Optional[str] = None,
                 image_size: int = 224, batch_size: int = 64):
        import jax
        from transformers import CLIPVisionConfig, FlaxCLIPVisionModel

        self.batch_size = batch_size
        self.image_size = image_size
        if model_path:
            self.model = FlaxCLIPVisionModel.from_pretrained(model_path)
        else:
            cfg = CLIPVisionConfig(
                hidden_size=256, intermediate_size=512,
                num_hidden_layers=2, num_attention_heads=4,
                image_size=image_size, patch_size=32,
            )
            self.model = FlaxCLIPVisionModel(cfg, seed=0)
        self._jit_fn = jax.jit(
            lambda px: self.model(pixel_values=px).pooler_output
        )

    def extract_frames(self, frames: np.ndarray) -> np.ndarray:
        """(T, H, W, 3) float frames -> (T, D) pooled features."""
        T = len(frames)
        B = self.batch_size
        out = []
        for s in range(0, T, B):
            chunk = frames[s:s + B]
            pad = B - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:],
                                     chunk.dtype)]
                )
            px = np.transpose(chunk, (0, 3, 1, 2))  # HF expects NCHW
            feats = np.asarray(self._jit_fn(px))
            out.append(feats[: len(frames[s:s + B])])
        return np.concatenate(out, axis=0).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames-npy", required=True,
                   help="(T, H, W, 3) frame array per clip")
    p.add_argument("--out", required=True)
    p.add_argument("--model-path", default=None)
    args = p.parse_args(argv)
    frames = np.load(args.frames_npy)
    ex = ClipImageExtractor(args.model_path, image_size=frames.shape[1])
    np.save(args.out, ex.extract_frames(frames))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
