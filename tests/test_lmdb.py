"""LMDB feature ingestion: format round-trip, import CLI, and an NLQ
episode running straight off reference-layout lmdb envs
(NLQ/libs/datasets/ego4d_loader.py:94-105, 225-246)."""

import json
import os

import numpy as np
import pytest

from vilco_tpu.data.lmdb_io import (
    LmdbReader, read_npz_value, write_feature_lmdb, write_lmdb,
)


def test_lmdb_roundtrip_inline_overflow_multileaf(tmp_path, rng):
    # mix of inline values, >300 keys (multiple leaf pages), and
    # overflow-page values (big features)
    entries = {f"k{i:04d}".encode(): rng.bytes(100 + (i % 7) * 900)
               for i in range(300)}
    entries[b"big"] = rng.bytes(250_000)
    entries[b""] = b"empty-key-value"
    path = str(tmp_path / "env")
    write_lmdb(path, entries)
    with LmdbReader(path) as db:
        assert len(db) == len(entries)
        assert dict(db.items()) == entries
        assert db.get(b"k0123") == entries[b"k0123"]
        assert db.get(b"big") == entries[b"big"]
        assert db.get(b"missing") is None
    # NOSUBDIR-style single file
    f = str(tmp_path / "single.mdb")
    write_lmdb(f, {b"a": b"1"}, subdir=False)
    with LmdbReader(f) as db:
        assert db.get(b"a") == b"1"


def test_lmdb_empty_env(tmp_path):
    path = str(tmp_path / "env")
    write_lmdb(path, {})
    with LmdbReader(path) as db:
        assert len(db) == 0
        assert list(db.items()) == []
        assert db.get(b"x") is None


def test_feature_lmdb_npz_payloads(tmp_path, rng):
    feats = {
        "vid1": {"features":
                 rng.standard_normal((500, 64)).astype(np.float32)},
        "q1": {"token_features":
               rng.standard_normal((7, 32)).astype(np.float32),
               "features": rng.standard_normal((32,)).astype(np.float32)},
    }
    path = str(tmp_path / "env")
    write_feature_lmdb(path, feats)
    with LmdbReader(path) as db:
        v = read_npz_value(db.get("vid1"))
        np.testing.assert_array_equal(v["features"],
                                      feats["vid1"]["features"])
        q = read_npz_value(db.get("q1"))
        np.testing.assert_array_equal(q["token_features"],
                                      feats["q1"]["token_features"])


def test_import_lmdb_cli_roundtrip(tmp_path, rng):
    from vilco_tpu.bin.import_lmdb import main

    env = str(tmp_path / "text_env")
    feats = {f"q{i}": {"token_features":
                       rng.standard_normal((5, 16)).astype(np.float32)}
             for i in range(4)}
    write_feature_lmdb(env, {k: v for k, v in feats.items()})
    out = str(tmp_path / "unpacked")
    main(["unpack", "--lmdb", env, "--out", out, "--kind", "text"])
    assert sorted(os.listdir(out)) == [f"q{i}.npz" for i in range(4)]
    d = np.load(os.path.join(out, "q2.npz"))
    np.testing.assert_array_equal(d["token_features"],
                                  feats["q2"]["token_features"])
    # pack back and compare through the reader
    env2 = str(tmp_path / "packed")
    main(["pack", "--src", out, "--out", env2, "--kind", "text"])
    with LmdbReader(env2) as db:
        q = read_npz_value(db.get("q2"))
        np.testing.assert_array_equal(q["token_features"],
                                      feats["q2"]["token_features"])


def _make_nlq_lmdb_fixture(tmp_path, cfg):
    """Synthetic NLQ split packed into reference-layout lmdb envs + jsonl."""
    from vilco_tpu.tasks.nlq import (
        SyntheticNLQFeatures, make_synthetic_nlq_split,
    )

    rng = np.random.default_rng(0)
    train_tasks, val_tasks = make_synthetic_nlq_split(
        rng, cfg, queries_per_template_train=4, queries_per_template_val=2)
    feat = SyntheticNLQFeatures(cfg.dataset.input_dim, cfg.model.n_txt_in)

    video_feats, text_feats = {}, {}
    paths = {}
    for name, tasks in (("train", train_tasks), ("val", val_tasks)):
        recs = []
        for tmpl, vids in tasks.items():
            for v in vids:
                recs.append(v["raw"])
                video_feats[str(v["video_id"])] = {"features": feat.video(v)}
                text_feats[str(v["id"])] = {"token_features": feat.text(v)}
        path = str(tmp_path / f"nlq_{name}.jsonl")
        with open(path, "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
        paths[name] = path
    video_env = str(tmp_path / "video_env")
    text_env = str(tmp_path / "text_env")
    write_feature_lmdb(video_env, video_feats)
    write_feature_lmdb(text_env, text_feats)
    return paths, video_env, text_env


def test_nlq_episode_from_lmdb(tmp_path):
    """train_cl --task nlq with lmdb features runs an episode end-to-end."""
    from vilco_tpu.bin.train_cl import main
    from vilco_tpu.tasks.nlq import nlq_tiny_config

    cfg = nlq_tiny_config()
    paths, video_env, text_env = _make_nlq_lmdb_fixture(tmp_path, cfg)
    results = main([
        "--task", "nlq", "--workdir", str(tmp_path / "run"),
        "--epochs", "2",
        "--nlq-train-jsonl", paths["train"],
        "--nlq-val-jsonl", paths["val"],
        "--nlq-video-lmdb", video_env,
        "--nlq-text-lmdb", text_env,
    ])
    assert "final" in results
    assert np.isfinite(results["final"]["avg_R1@0.3"])
    # one task per template in the jsonl (nlq_tiny_config: 3)
    assert len(results["final"]["per_task"]) == cfg.cl_cfg.num_tasks


def test_lmdb_deep_tree(tmp_path):
    """Depth-3+ B-tree (real NLQ text envs with 100k+ queries): the writer
    builds multi-level branches; the reader walks them."""
    # ~45k tiny entries -> ~300+ leaf pages -> >1 branch page -> depth 3
    entries = {f"{i:08d}".encode(): bytes([i % 251]) * (i % 7 + 1)
               for i in range(45000)}
    path = str(tmp_path / "deep")
    write_lmdb(path, entries)
    with LmdbReader(path) as db:
        assert db._main["depth"] >= 3, db._main
        assert len(db) == len(entries)
        assert db.get(b"00031415") == entries[b"00031415"]
        assert db.get(b"00044999") == entries[b"00044999"]
        keys = db.keys()
        assert len(keys) == len(entries)
        assert keys == sorted(entries)  # in-order traversal
