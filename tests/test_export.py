"""Serving export: jax.export artifact round-trips and matches the model."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from vilco_tpu.bin.export_model import export_forward, load_exported
from vilco_tpu.data.synthetic import tiny_config
from vilco_tpu.models.point_transformer import PointTransformer


def test_export_roundtrip_matches_apply(tmp_path, rng):
    cfg = tiny_config()
    model = PointTransformer(cfg.model, cfg.cl_cfg)
    B, T, C = (cfg.loader.batch_size, cfg.dataset.max_seq_len,
               cfg.dataset.input_dim)
    feats = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    mask = jnp.asarray(np.arange(T)[None, :] < T - 3).repeat(B, axis=0)
    params = model.init(jax.random.PRNGKey(0), feats, mask,
                        deterministic=True)["params"]

    exp = export_forward(cfg, params, platforms=("cpu",))
    path = tmp_path / "m.hlo"
    path.write_bytes(exp.serialize())

    fn = load_exported(str(path))
    out = fn(feats, mask)
    ref = model.apply({"params": params}, feats, mask, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out["cls_logits"]), np.asarray(ref["cls_logits"]),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["offsets"]), np.asarray(ref["offsets"]),
        atol=1e-5, rtol=1e-5,
    )


def test_orbax_checkpoint_roundtrip(tmp_path):
    from vilco_tpu.core.checkpoint import restore_orbax, save_orbax

    tree = {
        "params": {"w": jnp.arange(12.0).reshape(3, 4),
                   "b": jnp.ones((5,), jnp.bfloat16)},
        "step": jnp.asarray(7, jnp.int32),
    }
    path = str(tmp_path / "ck")
    save_orbax(path, tree)
    back = restore_orbax(path, tree)
    np.testing.assert_allclose(np.asarray(back["params"]["w"]),
                               np.asarray(tree["params"]["w"]))
    assert back["params"]["b"].dtype == jnp.bfloat16
    assert int(back["step"]) == 7


def test_checkpoint_orbax_arrays_format(tmp_path):
    """save_checkpoint(arrays_format="orbax") keeps the manifest in the
    zip but stores array leaves in a tensorstore dir; load_checkpoint
    auto-detects and round-trips exactly (incl. tuples, int keys, bf16)."""
    import numpy as np
    from vilco_tpu.core.checkpoint import load_checkpoint, save_checkpoint

    tree = {
        "params": {"w": np.arange(12.0).reshape(3, 4).astype(np.float32),
                   "b": np.ones((5,), jnp.bfloat16)},
        "task": 3,
        "reg_list": [(np.ones((2,), np.float32), "ewc")],
        "by_id": {7: "seven", 0: None},
    }
    path = str(tmp_path / "task_003.ckpt")
    save_checkpoint(path, tree, arrays_format="orbax")
    assert os.path.isdir(path + ".arrays")
    # the zip itself must carry no array payload
    data = np.load(path, allow_pickle=False)
    assert data.files == ["__manifest__"]
    back = load_checkpoint(path)
    np.testing.assert_array_equal(back["params"]["w"], tree["params"]["w"])
    assert back["params"]["b"].dtype == jnp.bfloat16
    assert back["task"] == 3 and back["by_id"] == {7: "seven", 0: None}
    assert isinstance(back["reg_list"][0], tuple)
    np.testing.assert_array_equal(back["reg_list"][0][0], [1.0, 1.0])


def test_load_params_into_partial(tmp_path):
    """--init-from fine-tune semantics: matching leaves load, mismatched
    keep fresh init (NLQ/train_ft.py equivalent)."""
    import numpy as np
    from vilco_tpu.core.checkpoint import load_params_into, save_checkpoint

    src = {"trunk": {"kernel": np.ones((4, 4), np.float32)},
           "head": {"kernel": np.zeros((4, 2), np.float32)}}
    path = str(tmp_path / "ft.ckpt")
    save_checkpoint(path, {"params": src, "task": 0})

    tgt = {"trunk": {"kernel": np.zeros((4, 4), np.float32)},
           "head": {"kernel": np.full((4, 5), 7.0, np.float32)},  # resized
           "extra": {"bias": np.full((3,), 2.0, np.float32)}}     # new leaf
    out = load_params_into(path, tgt)
    assert np.asarray(out["trunk"]["kernel"]).sum() == 16          # loaded
    assert np.allclose(np.asarray(out["head"]["kernel"]), 7.0)     # fresh
    assert np.allclose(np.asarray(out["extra"]["bias"]), 2.0)      # fresh


def test_export_nlq_dual_tower(tmp_path):
    """The export path serves the text-conditioned NLQ dual tower too."""
    import numpy as np

    from vilco_tpu.bin.export_model import export_forward, load_exported
    from vilco_tpu.tasks.nlq import nlq_tiny_config

    cfg = nlq_tiny_config()
    import jax
    import jax.numpy as jnp

    from vilco_tpu.models.point_transformer import PointTransformer

    model = PointTransformer(cfg.model, cfg.cl_cfg)
    B, T, C = (cfg.loader.batch_size, cfg.dataset.max_seq_len,
               cfg.dataset.input_dim)
    L = cfg.dataset.max_text_len
    feats = jnp.zeros((B, T, C))
    mask = jnp.ones((B, T), bool)
    text = jnp.zeros((B, L, cfg.model.n_txt_in))
    tmask = jnp.ones((B, L), bool)
    params = model.init(jax.random.PRNGKey(0), feats, mask, text=text,
                        text_mask=tmask, deterministic=True)["params"]
    exp = export_forward(cfg, params, platforms=("cpu",))
    path = tmp_path / "nlq.stablehlo"
    path.write_bytes(exp.serialize())
    fn = load_exported(str(path))
    out = fn(feats, mask, text, tmask)
    ref = model.apply({"params": params}, feats, mask, text=text,
                      text_mask=tmask, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["cls_logits"]),
                               np.asarray(ref["cls_logits"]), atol=1e-5)


def test_export_vq_tracker(tmp_path, rng):
    """VQ ClipMatcher window-forward export round-trip (+ the --task vq
    CLI path on a persisted workdir manifest)."""
    from vilco_tpu.bin.export_model import export_vq_forward, load_exported
    from vilco_tpu.tasks.vq import build_clip_matcher

    matcher = build_clip_matcher(window=3, frame_size=16)
    S = matcher.clip_size
    clip = jnp.asarray(
        rng.standard_normal((1, 3, S, S, 3)).astype(np.float32))
    query = jnp.asarray(
        rng.standard_normal((1, S, S, 3)).astype(np.float32))
    params = matcher.init(jax.random.PRNGKey(0), clip, query,
                          deterministic=True)["params"]

    exp = export_vq_forward(matcher, params, platforms=("cpu",))
    path = tmp_path / "vq.hlo"
    path.write_bytes(exp.serialize())
    out = load_exported(str(path))(clip, query)
    ref = matcher.apply({"params": params}, clip, query,
                        deterministic=True)
    np.testing.assert_allclose(np.asarray(out["bbox"]),
                               np.asarray(ref["bbox"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["prob"]),
                               np.asarray(ref["prob"]), atol=1e-5)
