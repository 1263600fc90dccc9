"""NLQ plugin tests: dual-tower model + query CL episode end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vilco_tpu.models.point_transformer import PointTransformer, level_lengths
from vilco_tpu.tasks.nlq import (
    NLQEpisodeRunner,
    NLQTaskStream,
    SyntheticNLQFeatures,
    make_synthetic_nlq_split,
    nlq_tiny_config,
)


def test_dual_tower_forward_shapes():
    cfg = nlq_tiny_config()
    model = PointTransformer(cfg.model, cfg.cl_cfg)
    B, T = 2, cfg.dataset.max_seq_len
    feats = jnp.zeros((B, T, cfg.dataset.input_dim))
    mask = jnp.ones((B, T), bool)
    text = jnp.zeros((B, cfg.dataset.max_text_len, cfg.model.n_txt_in))
    tmask = jnp.ones((B, cfg.dataset.max_text_len), bool)
    params = model.init(jax.random.PRNGKey(0), feats, mask, text=text,
                        text_mask=tmask, deterministic=True)["params"]
    out = model.apply({"params": params}, feats, mask, text=text,
                      text_mask=tmask, deterministic=True)
    P = sum(level_lengths(cfg.model))
    assert cfg.model.num_fpn_levels == 4          # 1 + 0 + 3 branches
    assert out["cls_logits"].shape == (B, P, 1)   # class-agnostic
    # text tower must matter: zero vs nonzero text changes the logits
    out2 = model.apply({"params": params}, feats, mask,
                       text=text + 1.0, text_mask=tmask, deterministic=True)
    assert not np.allclose(np.asarray(out["cls_logits"]),
                           np.asarray(out2["cls_logits"]))


def test_nlq_stream_and_memory_quota():
    cfg = nlq_tiny_config()
    rng = np.random.default_rng(0)
    train, val = make_synthetic_nlq_split(rng, cfg, 4, 2)
    stream = NLQTaskStream(train, val)
    assert stream.num_tasks == 3
    assert stream.classes_upto(2) == [0]
    assert stream.memory_quota(12, 3) == 4
    v = stream.train_videos(0)
    assert len(v) == 4 and all(len(x["segments"]) == 1 for x in v)
    assert all(isinstance(x["query_key"], tuple) for x in v)


@pytest.mark.slow
def test_nlq_episode_end_to_end(tmp_path):
    cfg = nlq_tiny_config()
    rng = np.random.default_rng(0)
    train, val = make_synthetic_nlq_split(rng, cfg, 6, 3)
    stream = NLQTaskStream(train, val)
    feat = SyntheticNLQFeatures(cfg.dataset.input_dim, cfg.model.n_txt_in)
    runner = NLQEpisodeRunner(
        cfg, stream, feat.video, workdir=str(tmp_path),
        text_source=feat.text,
    )
    results = runner.run()
    assert len(results["tasks"]) == 3
    final = results["final"]
    # grounding must be learnable on the current task
    last_own = results["tasks"][-1]["eval"]["per_task"][-1]
    assert last_own["R5@0.3"] > 0.3, last_own
    assert np.isfinite(final["BwF_R1@0.3"])


@pytest.mark.slow
def test_nlq_vilco_method_cli(tmp_path):
    """--task nlq --method vilco end-to-end: the L2P pool must follow the
    text-token dim (cl_cfg.embed_dim derivation) and the SSL ring update
    must engage via the synthetic narration source (regressions: pool-dim
    mismatch crash; _ring_update on a narration-less batch)."""
    from vilco_tpu.bin import train_cl

    res = train_cl.main([
        "--task", "nlq", "--synthetic", "--method", "vilco",
        "--workdir", str(tmp_path), "--epochs", "1", "--num-tasks", "2",
    ])
    assert np.isfinite(res["final"]["avg_mAP"])
