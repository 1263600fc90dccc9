"""Convert the reference's NLQ LMDB feature envs to/from per-key files.

The reference releases NLQ features as LMDB environments
(NLQ/libs/datasets/ego4d_loader.py:94-105): a video env keyed by video_id
holding npz {'features': (Lv, D)} and text envs keyed by query_id holding
npz {'token_features': (Lq, D)} (or pooled {'features': (D,)}).

Unpack (lmdb -> files, for DirFeatureSource / DirNLQFeatures):

  python -m vilco_tpu.bin.import_lmdb unpack --lmdb VIDEO_ENV \
      --out out/video_features --kind video     # writes {video_id}.npy
  python -m vilco_tpu.bin.import_lmdb unpack --lmdb TEXT_ENV \
      --out out/text_features --kind text       # writes {query_id}.npz

Pack (files -> lmdb, e.g. to feed the reference loader for comparisons):

  python -m vilco_tpu.bin.import_lmdb pack --src out/video_features \
      --out video_env --kind video

No `lmdb` package required — uses the format parser in data/lmdb_io.py.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def unpack(lmdb_path: str, out_dir: str, kind: str, limit: int = 0) -> int:
    from vilco_tpu.data.lmdb_io import LmdbReader, read_npz_value

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    with LmdbReader(lmdb_path) as db:
        for key, buf in db.items():
            name = key.decode()
            d = read_npz_value(buf)
            if kind == "video":
                np.save(os.path.join(out_dir, f"{name}.npy"),
                        np.asarray(d["features"], np.float32))
            else:
                q = d.get("token_features", d.get("features"))
                q = np.asarray(q, np.float32)
                np.savez(os.path.join(out_dir, f"{name}.npz"),
                         token_features=q if q.ndim > 1 else q[None],
                         features=q.mean(0) if q.ndim > 1 else q)
            n += 1
            if limit and n >= limit:
                break
    return n


def pack(src_dir: str, out_path: str, kind: str) -> int:
    from vilco_tpu.data.lmdb_io import write_feature_lmdb

    feats = {}
    for fn in sorted(os.listdir(src_dir)):
        path = os.path.join(src_dir, fn)
        key, ext = os.path.splitext(fn)
        if ext == ".npy":
            feats[key] = {"features": np.load(path).astype(np.float32)}
        elif ext == ".npz":
            d = np.load(path)
            q = np.asarray(
                d["token_features"] if "token_features" in d
                else d["features"], np.float32)
            feats[key] = ({"token_features": q,
                           "features": q.mean(0) if q.ndim > 1 else q}
                          if kind == "text" else {"features": q})
    write_feature_lmdb(out_path, feats)
    return len(feats)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    u = sub.add_parser("unpack")
    u.add_argument("--lmdb", required=True)
    u.add_argument("--out", required=True)
    u.add_argument("--kind", choices=["video", "text"], required=True)
    u.add_argument("--limit", type=int, default=0)
    k = sub.add_parser("pack")
    k.add_argument("--src", required=True)
    k.add_argument("--out", required=True)
    k.add_argument("--kind", choices=["video", "text"], required=True)
    args = p.parse_args(argv)

    if args.cmd == "unpack":
        n = unpack(args.lmdb, args.out, args.kind, args.limit)
        print(f"unpacked {n} {args.kind} entries -> {args.out}")
    else:
        n = pack(args.src, args.out, args.kind)
        print(f"packed {n} {args.kind} entries -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
