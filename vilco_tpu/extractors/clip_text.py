"""TPU-batched CLIP text / RoBERTa token feature extraction.

TPU-native replacement for the reference's offline extractors:
  - MQ/clip_extractor.py (ClipFeatureExtractor.encode_text :38-60, driving
    the vendored OpenAI CLIP in MQ/libs/clip/)
  - MQ/ego4d_clip_token_extractor.py (per-query CLIP token features)
  - MQ/ego4d_robera_token_extractor.py (RoBERTa token features)

Instead of a vendored torch CLIP run sentence-by-sentence on GPU, this uses
HuggingFace Flax models jitted over fixed-size padded batches so extraction
saturates the TPU; outputs are written in the reference's consumption
formats (per-clip .npz of token_features / pooled features — the shapes
NLQ's lmdb loader reads back, NLQ/libs/datasets/ego4d_loader.py:225-238).

Zero-egress note: model weights must already exist locally
(`--model-path`); with none given, a small randomly-initialized CLIP text
tower is used (useful for pipeline tests, not for real features).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Iterable, List, Optional, Tuple

import numpy as np


class ClipTextExtractor:
    def __init__(self, model_path: Optional[str] = None,
                 max_length: int = 77, batch_size: int = 64,
                 hidden: int = 512, layers: int = 4):
        import jax
        from transformers import (
            AutoTokenizer,
            CLIPTextConfig,
            FlaxCLIPTextModel,
        )

        self.max_length = max_length
        self.batch_size = batch_size
        if model_path:
            self.tokenizer = AutoTokenizer.from_pretrained(model_path)
            self.model = FlaxCLIPTextModel.from_pretrained(model_path)
        else:
            # random-init fallback (pipeline tests / dry runs)
            from transformers import CLIPTokenizerFast

            vocab = 1000
            cfg = CLIPTextConfig(
                vocab_size=vocab, hidden_size=hidden,
                intermediate_size=hidden * 4,
                num_hidden_layers=layers, num_attention_heads=8,
                max_position_embeddings=max_length,
            )
            self.tokenizer = None
            self.model = FlaxCLIPTextModel(cfg, seed=0)
        self._jit_fn = jax.jit(
            lambda ids, mask: self.model(
                input_ids=ids, attention_mask=mask
            ).last_hidden_state
        )

    def _tokenize(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        if self.tokenizer is not None:
            enc = self.tokenizer(
                texts, padding="max_length", truncation=True,
                max_length=self.max_length, return_tensors="np",
            )
            return enc["input_ids"], enc["attention_mask"]
        # hash-tokenizer fallback
        ids = np.zeros((len(texts), self.max_length), np.int32)
        mask = np.zeros((len(texts), self.max_length), np.int32)
        for i, t in enumerate(texts):
            toks = [hash(w) % 998 + 2 for w in t.split()][: self.max_length]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask

    def extract(self, texts: List[str]) -> List[np.ndarray]:
        """Token features per text, truncated to each text's real length."""
        out: List[np.ndarray] = []
        B = self.batch_size
        for s in range(0, len(texts), B):
            chunk = texts[s:s + B]
            pad = B - len(chunk)
            ids, mask = self._tokenize(chunk + [""] * pad)
            feats = np.asarray(self._jit_fn(ids, mask))
            for i in range(len(chunk)):
                n = int(mask[i].sum()) or 1
                out.append(feats[i, :n].astype(np.float32))
        return out


class RobertaTokenExtractor:
    """RoBERTa token features (ego4d_robera_token_extractor.py), via
    FlaxRobertaModel with the same batched-jit driver."""

    def __init__(self, model_path: Optional[str] = None,
                 max_length: int = 128, batch_size: int = 32):
        import jax
        from transformers import AutoTokenizer, FlaxRobertaModel, RobertaConfig

        self.max_length = max_length
        self.batch_size = batch_size
        if model_path:
            self.tokenizer = AutoTokenizer.from_pretrained(model_path)
            self.model = FlaxRobertaModel.from_pretrained(model_path)
        else:
            cfg = RobertaConfig(
                vocab_size=1000, hidden_size=256, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=512,
                max_position_embeddings=max_length + 2,
            )
            self.tokenizer = None
            self.model = FlaxRobertaModel(cfg, seed=0)
        self._jit_fn = jax.jit(
            lambda ids, mask: self.model(
                input_ids=ids, attention_mask=mask
            ).last_hidden_state
        )

    def extract(self, texts: List[str]) -> List[np.ndarray]:
        ext = ClipTextExtractor.extract
        return ext(self, texts)  # same batching; tokenizer fallback shared

    _tokenize = ClipTextExtractor._tokenize


def write_reference_format(out_dir: str, keys: List[str],
                           feats: List[np.ndarray]):
    """One .npz per key with 'token_features' (+ pooled 'features'), the
    format the reference lmdb/pt loaders consume."""
    os.makedirs(out_dir, exist_ok=True)
    for k, f in zip(keys, feats):
        np.savez(os.path.join(out_dir, f"{k}.npz"),
                 token_features=f, features=f.mean(0))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input-jsonl", required=True,
                   help="records with 'query_id' and 'query' fields")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--model-path", default=None)
    p.add_argument("--extractor", choices=["clip", "roberta"],
                   default="clip")
    p.add_argument("--batch-size", type=int, default=64)
    args = p.parse_args(argv)

    with open(args.input_jsonl) as f:
        records = [json.loads(l) for l in f if l.strip()]
    keys = [r["query_id"] for r in records]
    texts = [r.get("query", "") for r in records]
    if args.extractor == "clip":
        ex = ClipTextExtractor(args.model_path, batch_size=args.batch_size)
    else:
        ex = RobertaTokenExtractor(args.model_path,
                                   batch_size=args.batch_size)
    feats = ex.extract(texts)
    write_reference_format(args.out_dir, keys, feats)
    print(f"wrote {len(keys)} feature files to {args.out_dir}")


if __name__ == "__main__":
    main()
