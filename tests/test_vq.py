"""VQ plugin tests: anchors, metrics, model forward, episode end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vilco_tpu.evals.vq_metrics import (
    BBox,
    ResponseTrack,
    compute_visual_query_metrics,
    predictions_to_response_track,
    spatio_temporal_iou,
)
from vilco_tpu.ops.anchors import (
    assign_anchor_labels,
    box_iou,
    generate_anchors,
    xyhw_to_xyxy,
)


def test_anchor_generation_matches_reference_shapes():
    a = generate_anchors(448, 16)
    assert a.shape == (16 * 16 * 12, 4)
    # centers tile the 16x16 grid at region centers
    assert np.isclose(a[0, 0], 448 / 16 * 0.5)
    xyxy = xyhw_to_xyxy(a)
    # aspect ratio 0.5 anchor: h = 0.5 * w, area == base area
    h = xyxy[0, 2] - xyxy[0, 0]
    w = xyxy[0, 3] - xyxy[0, 1]
    assert np.isclose(h / w, 0.5, atol=1e-5)
    assert np.isclose(h * w, 16 * 16, atol=1e-2)


def test_anchor_assignment_threshold_and_fallback():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [0, 0, 2, 2], [5, 5, 15, 15]], jnp.float32
    )
    gt = jnp.asarray([[[0, 0, 10, 10]]], jnp.float32)  # (1,1,4)
    lab = assign_anchor_labels(anchors, gt, iou_threshold=0.5, topk=1)
    assert np.asarray(lab)[0, 0].tolist() == [True, False, False]
    # no anchor passes threshold -> top-k fallback flips the best one
    gt2 = jnp.asarray([[[100, 100, 101, 101]]], jnp.float32)
    lab2 = assign_anchor_labels(anchors, gt2, iou_threshold=0.5, topk=1)
    assert np.asarray(lab2).sum() == 1


def test_st_iou_and_metrics_perfect_prediction():
    boxes = [BBox(f, 0, 0, 10, 10) for f in range(3, 8)]
    gt = ResponseTrack(boxes)
    pred = ResponseTrack(list(boxes), score=0.9)
    assert np.isclose(spatio_temporal_iou(pred, gt), 1.0)
    m = compute_visual_query_metrics([[pred]], [gt])
    assert np.isclose(m["tAP"], 1.0)
    assert np.isclose(m["stAP"], 1.0)
    assert np.isclose(m["Success"], 100.0)
    assert np.isclose(m["recovery%"], 100.0)


def test_metrics_shifted_prediction():
    gt = ResponseTrack([BBox(f, 0, 0, 10, 10) for f in range(0, 10)])
    # half-overlapping temporally, sligthly offset spatially
    pred = ResponseTrack([BBox(f, 1, 1, 11, 11) for f in range(5, 15)],
                         score=0.8)
    m = compute_visual_query_metrics([[pred]], [gt])
    assert 0.0 < m["tAP"] < 1.0 or m["tAP"] == 0.0
    assert m["stAP"] <= m["tAP"] + 1e-9


def test_paired_metrics_and_search_efficiency():
    from vilco_tpu.evals.vq_metrics import (
        compute_visual_query_metrics_paired,
    )

    # pixel-coordinate tracks: q0 has a LARGE gt max box (300x300), q1 small
    gt = [
        ResponseTrack([BBox(f, 0, 0, 300, 300) for f in range(3, 8)]),
        ResponseTrack([BBox(f, 0, 0, 20, 20) for f in range(3, 8)]),
    ]
    preds = [[ResponseTrack(list(g.bboxes), score=0.9)] for g in gt]
    crops = [BBox(0, 0, 0, 50, 50), BBox(0, 0, 0, 50, 50)]
    out = compute_visual_query_metrics_paired(
        preds, gt, crops, accessed_frames=[5, 5], total_frames=[10, 10]
    )
    # 'all' pairing = (crop any, gt-rt large) -> only q0 qualifies
    assert set(out) == {"all"}
    assert np.isclose(out["all"]["tAP"], 1.0)
    assert np.isclose(out["all"]["Success"], 100.0)
    assert np.isclose(out["all"]["search_eff%"], 50.0)
    # flat aggregator also reports efficiency when frame counts given
    m = compute_visual_query_metrics(preds, gt, [10, 10], [10, 10])
    assert np.isclose(m["search_eff%"], 0.0)


def test_peak_finding_recovers_span():
    T = 30
    scores = np.zeros(T)
    scores[10:18] = [0.3, 0.6, 0.9, 1.0, 0.95, 0.7, 0.4, 0.2]
    bboxes = np.tile(np.array([1.0, 2.0, 3.0, 4.0]), (T, 1))
    rt = predictions_to_response_track(scores, bboxes, query_frame=T)
    lo, hi = rt.temporal_extent
    assert 10 <= lo <= 13 and 12 <= hi <= 17, (lo, hi)


def test_clip_matcher_forward_and_hnm():
    from vilco_tpu.models.clip_matcher import tiny_clip_matcher

    model = tiny_clip_matcher()
    B, T, S = 2, 3, 16
    clip = jnp.zeros((B, T, S, S, 3))
    query = jnp.zeros((B, S, S, 3))
    params = model.init(jax.random.PRNGKey(0), clip, query,
                        deterministic=True)["params"]
    out = model.apply({"params": params}, clip, query, deterministic=True)
    N = 2 * 2 * 12
    assert out["bbox"].shape == (B, T, N, 4)
    assert out["prob"].shape == (B, T, N)
    out2 = model.apply({"params": params}, clip, query, hnm=True,
                       deterministic=True)
    assert out2["prob"].shape == (B * B, T, N)


def test_frozen_backbone_excluded_from_optimizer():
    """The reference filters requires_grad=False backbone params OUT of
    AdamW (VQ/utils/train_utils.py:8-15): they must receive neither
    weight decay nor Adam state. Regression for the bug where
    optax.adamw over the full tree decayed the frozen ViT by lr*wd/step."""
    from vilco_tpu.models.clip_matcher import tiny_clip_matcher
    from vilco_tpu.train.vq_engine import (
        VQTrainState,
        make_vq_optimizer,
        make_vq_train_step,
    )

    model = tiny_clip_matcher()
    B, T, S = 2, 3, 16
    rng = np.random.default_rng(0)
    batch = {
        "clip": jnp.asarray(rng.standard_normal((B, T, S, S, 3)),
                            jnp.float32),
        "query": jnp.asarray(rng.standard_normal((B, S, S, 3)),
                             jnp.float32),
        "clip_bbox": jnp.asarray(
            np.tile(np.array([0.2, 0.2, 0.6, 0.6], np.float32), (B, T, 1))),
        "clip_with_bbox": jnp.ones((B, T), jnp.float32),
        "before_query": jnp.ones((B, T), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["clip"],
                        batch["query"], deterministic=True)["params"]
    # large wd so a spurious decay of the frozen weights is unmissable
    tx = make_vq_optimizer(0.1, 0.5, freeze_backbone=True)
    state = VQTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), rng=jax.random.PRNGKey(3),
    )
    # no Adam m/v arrays for the frozen subtree: state leaf count covers
    # only the trainable params
    n_train = sum(x.size for k, v in params.items() if k != "backbone"
                  for x in jax.tree.leaves(v))
    n_state = sum(x.size for x in jax.tree.leaves(state.opt_state)
                  if hasattr(x, "size"))
    # m + v + the Adam step counter + the MultiStepLR schedule counter
    assert n_state == 2 * n_train + 2

    before = jax.tree.map(np.asarray, params)  # step() donates its state
    step = make_vq_train_step(model, tx)
    new_state, _ = step(state, batch)
    for a, b in zip(jax.tree.leaves(before["backbone"]),
                    jax.tree.leaves(new_state.params["backbone"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    # ...while trainable params did move
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for k in before if k != "backbone"
        for a, b in zip(jax.tree.leaves(before[k]),
                        jax.tree.leaves(new_state.params[k]))
    )
    assert moved


@pytest.mark.slow
def test_vq_episode_end_to_end(tmp_path):
    from vilco_tpu.tasks.vq import (
        SyntheticVQSource,
        VQEpisodeRunner,
        VQTaskStream,
        make_synthetic_vq_split,
    )

    rng = np.random.default_rng(0)
    train, val = make_synthetic_vq_split(
        rng, num_tasks=2, cats_per_task=1, samples_per_cat_train=3,
        samples_per_cat_val=2, num_frames=12, window=4,
    )
    stream = VQTaskStream(train, val)
    src = SyntheticVQSource(frame_size=32)
    runner = VQEpisodeRunner(
        stream, src, str(tmp_path), window=4, frame_size=32,
        method="naive", epochs=6, batch_size=2, lr=2e-3,
    )
    results = runner.run()
    assert len(results["tasks"]) == 2
    final = results["final"]
    for k in ("avg_tAP25", "avg_stAP25", "avg_success", "avg_recovery"):
        assert np.isfinite(final[k]), final
    assert (tmp_path / "vq_task_001.ckpt").exists()


@pytest.mark.parametrize("method", ["ewc", "mas"])
def test_vq_episode_ewc_mas_smoke(tmp_path, method):
    """EWC/MAS importance estimation after each task must not crash
    (regression: epoch_key=-1 fed np.random.SeedSequence, which rejects
    negative entropy -> ValueError on the first estimation batch) and must
    produce a non-empty importance stack used by the next task."""
    from vilco_tpu.tasks.vq import (
        SyntheticVQSource,
        VQEpisodeRunner,
        VQTaskStream,
        make_synthetic_vq_split,
    )

    rng = np.random.default_rng(0)
    train, val = make_synthetic_vq_split(
        rng, num_tasks=2, cats_per_task=1, samples_per_cat_train=3,
        samples_per_cat_val=1, num_frames=12, window=4,
    )
    stream = VQTaskStream(train, val)
    src = SyntheticVQSource(frame_size=32)
    runner = VQEpisodeRunner(
        stream, src, str(tmp_path), window=4, frame_size=32,
        method=method, epochs=1, batch_size=2, lr=2e-3,
    )
    results = runner.run()
    assert len(results["tasks"]) == 2
    # importance estimated after task 0 (only non-final tasks estimate)
    assert len(runner.reg_list) == 1
    imp, optpar = runner.reg_list[0]
    leaves = jax.tree.leaves(imp)
    assert leaves and all(np.all(np.isfinite(g)) for g in leaves)
    if method == "ewc":
        assert all((g >= 0).all() for g in leaves)


def test_vit_torch_checkpoint_import(tmp_path):
    """Round-trip: synthesize a timm/DINO-style torch state dict, import it,
    and check a forward pass equals a torch-free reference computation of
    the patch embedding."""
    import torch
    from vilco_tpu.models.vit import ViT, load_torch_vit_checkpoint

    model = ViT(patch_size=8, dim=16, depth=2, num_heads=2)
    x = jnp.ones((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    rng = np.random.default_rng(0)
    sd = {}
    sd["patch_embed.proj.weight"] = torch.tensor(
        rng.standard_normal((16, 3, 8, 8)).astype(np.float32))
    sd["patch_embed.proj.bias"] = torch.zeros(16)
    sd["cls_token"] = torch.zeros(1, 1, 16)
    sd["pos_embed"] = torch.zeros(1, 5, 16)
    for i in range(2):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = torch.ones(16)
        sd[p + "norm1.bias"] = torch.zeros(16)
        sd[p + "attn.qkv.weight"] = torch.tensor(
            rng.standard_normal((48, 16)).astype(np.float32) * 0.02)
        sd[p + "attn.qkv.bias"] = torch.zeros(48)
        sd[p + "attn.proj.weight"] = torch.tensor(
            rng.standard_normal((16, 16)).astype(np.float32) * 0.02)
        sd[p + "attn.proj.bias"] = torch.zeros(16)
        sd[p + "norm2.weight"] = torch.ones(16)
        sd[p + "norm2.bias"] = torch.zeros(16)
        sd[p + "mlp.fc1.weight"] = torch.tensor(
            rng.standard_normal((64, 16)).astype(np.float32) * 0.02)
        sd[p + "mlp.fc1.bias"] = torch.zeros(64)
        sd[p + "mlp.fc2.weight"] = torch.tensor(
            rng.standard_normal((16, 64)).astype(np.float32) * 0.02)
        sd[p + "mlp.fc2.bias"] = torch.zeros(16)
    sd["norm.weight"] = torch.ones(16)
    sd["norm.bias"] = torch.zeros(16)
    path = tmp_path / "vit.pth"
    torch.save(sd, str(path))

    loaded = load_torch_vit_checkpoint(params, str(path))
    # imported patch kernel matches the transposed torch weight
    np.testing.assert_allclose(
        np.asarray(loaded["patch_embed"]["kernel"]),
        sd["patch_embed.proj.weight"].numpy().transpose(2, 3, 1, 0),
    )
    out = ViT(patch_size=8, dim=16, depth=2, num_heads=2).apply(
        {"params": loaded}, x
    )
    assert out.shape == (1, 2, 2, 16)
    assert np.isfinite(np.asarray(out)).all()


def _tiny_vit_sd(rng, dim, depth, heads, patch, img):
    """Torch-layout ViT state dict matching ClipMatcher's backbone."""
    import torch

    n_tok = (img // patch) ** 2 + 1
    sd = {
        "patch_embed.proj.weight": torch.tensor(
            rng.standard_normal((dim, 3, patch, patch)).astype(np.float32)
            * 0.02),
        "patch_embed.proj.bias": torch.zeros(dim),
        "cls_token": torch.zeros(1, 1, dim),
        "pos_embed": torch.tensor(
            rng.standard_normal((1, n_tok, dim)).astype(np.float32) * 0.02),
        "norm.weight": torch.ones(dim),
        "norm.bias": torch.zeros(dim),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = torch.ones(dim)
        sd[p + "norm1.bias"] = torch.zeros(dim)
        sd[p + "attn.qkv.weight"] = torch.tensor(
            rng.standard_normal((3 * dim, dim)).astype(np.float32) * 0.02)
        sd[p + "attn.qkv.bias"] = torch.zeros(3 * dim)
        sd[p + "attn.proj.weight"] = torch.tensor(
            rng.standard_normal((dim, dim)).astype(np.float32) * 0.02)
        sd[p + "attn.proj.bias"] = torch.zeros(dim)
        sd[p + "norm2.weight"] = torch.ones(dim)
        sd[p + "norm2.bias"] = torch.zeros(dim)
        sd[p + "mlp.fc1.weight"] = torch.tensor(
            rng.standard_normal((4 * dim, dim)).astype(np.float32) * 0.02)
        sd[p + "mlp.fc1.bias"] = torch.zeros(4 * dim)
        sd[p + "mlp.fc2.weight"] = torch.tensor(
            rng.standard_normal((dim, 4 * dim)).astype(np.float32) * 0.02)
        sd[p + "mlp.fc2.bias"] = torch.zeros(dim)
    return sd


def test_vq_cli_with_config_and_vit_ckpt(tmp_path):
    """train_cl --task vq --config ... --vit-ckpt ...: the VQCfg shape and
    the pretrained backbone both reach the runner (VERDICT item 4; flagship
    yaml is configs/vq_vilco.yaml — this uses a CI-sized twin)."""
    import torch

    from vilco_tpu.bin.train_cl import main

    rng = np.random.default_rng(3)
    sd = _tiny_vit_sd(rng, dim=48, depth=2, heads=4, patch=8, img=32)
    ckpt = tmp_path / "vit_tiny.pth"
    torch.save(sd, str(ckpt))

    cfg_yaml = tmp_path / "vq_tiny.yaml"
    cfg_yaml.write_text(
        "task: vq\n"
        "vq:\n"
        "  dim: 64\n  clip_size: 32\n  query_size: 32\n  patch_size: 8\n"
        "  vit_dim: 48\n  vit_depth: 2\n  vit_heads: 4\n"
        "  resolution_transformer: 4\n  resolution_anchor_feat: 4\n"
        "  num_transformer: 1\n  num_frames: 4\n"
        "  batch_size: 2\n  lr: 0.002\n  use_hnm: false\n  augment: false\n"
    )
    results = main([
        "--task", "vq", "--synthetic", "--config", str(cfg_yaml),
        "--vit-ckpt", str(ckpt), "--workdir", str(tmp_path / "run"),
        "--epochs", "2", "--num-tasks", "2",
    ])
    assert len(results["tasks"]) == 2
    assert np.isfinite(results["final"]["avg_tAP25"])

    # the runner actually consumed the checkpoint: re-build and compare
    from vilco_tpu.core.config import load_config
    from vilco_tpu.tasks.vq import (
        SyntheticVQSource, VQEpisodeRunner, VQTaskStream,
        make_synthetic_vq_split,
    )

    cfg = load_config(str(cfg_yaml))
    train, val = make_synthetic_vq_split(np.random.default_rng(0),
                                         num_tasks=1)
    runner = VQEpisodeRunner(
        VQTaskStream(train, val), SyntheticVQSource(frame_size=32),
        str(tmp_path / "run2"), model_cfg=cfg.vq, vit_ckpt=str(ckpt),
    )
    assert runner.window == 4 and runner.frame_size == 32
    np.testing.assert_allclose(
        np.asarray(runner.params["backbone"]["patch_embed"]["kernel"]),
        sd["patch_embed.proj.weight"].numpy().transpose(2, 3, 1, 0),
    )


def test_vq_train_step_data_parallel_matches_single_device():
    """VQ data parallelism: one train step over a dp=2 mesh (batch sharded,
    params replicated, XLA gradient psum — the reference VQ's single-node
    DDP, VQ/train_cl.py:112-119) must match the unsharded step: identical
    loss, params equal to within bf16 recompilation noise (the sharded
    executable may pick different bf16 accumulation tilings; Adam's
    normalized update amplifies that to ~1e-3 of lr-scale)."""
    from vilco_tpu.models.clip_matcher import tiny_clip_matcher
    from vilco_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from vilco_tpu.train.vq_engine import (
        VQTrainState, make_vq_optimizer, make_vq_train_step,
    )

    model = tiny_clip_matcher()
    rng = np.random.default_rng(0)
    vb, vt, vs = 4, 3, 16
    batch_np = {
        "clip": rng.random((vb, vt, vs, vs, 3), np.float32),
        "query": rng.random((vb, vs, vs, 3), np.float32),
        "clip_bbox": np.tile([0.3, 0.3, 0.6, 0.6],
                             (vb, vt, 1)).astype(np.float32),
        "clip_with_bbox": np.ones((vb, vt), np.float32),
        "before_query": np.ones((vb, vt), np.float32),
    }
    params_np = jax.tree.map(np.asarray, model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch_np["clip"]),
        jnp.asarray(batch_np["query"]), deterministic=True)["params"])
    tx = make_vq_optimizer(1e-3, 1e-4,
                           freeze_backbone=model.freeze_backbone)
    step = make_vq_train_step(model, tx)

    def run(mesh):
        # fresh arrays per run: the step donates its state buffers
        p = jax.tree.map(jnp.asarray, params_np)
        st = VQTrainState(step=jnp.zeros((), jnp.int32), params=p,
                          opt_state=tx.init(p), rng=jax.random.PRNGKey(1))
        b = {k: jnp.asarray(v) for k, v in batch_np.items()}
        if mesh is not None:
            st = jax.device_put(st, replicated(st, mesh))
            b = shard_batch(b, mesh)
        st, m = step(st, b, None)
        return jax.tree.map(np.asarray, st.params), float(m["final_loss"])

    p1, l1 = run(None)
    p2, l2 = run(make_mesh(2))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b, atol=2e-3)


@pytest.mark.slow
def test_vq_episode_data_parallel_cli(tmp_path):
    """`train_cl --task vq --dp 2` runs the full episode data-parallel.
    (Unlike the MQ dp regression, final metrics are not pinned equal:
    the toy VQ success metric thresholds 8 val samples of a barely-
    trained bf16 tracker, which flips on recompilation-level noise —
    step-level equivalence is pinned above instead.)"""
    from vilco_tpu.bin.train_cl import main

    r = main(["--task", "vq", "--synthetic", "--epochs", "2",
              "--num-tasks", "2", "--batch-size", "2", "--dp", "2",
              "--workdir", str(tmp_path)])
    assert len(r["tasks"]) == 2
    for k in ("avg_tAP25", "avg_stAP25", "avg_success"):
        assert np.isfinite(r["final"][k]), k


def test_clip_matcher_query_roi():
    """use_query_roi (reference :399-403, defaults-off): the query feature
    map is roi-resampled onto the annotated query-frame bbox before the
    reduce stage. A sub-box must change the outputs; the param tree is
    unchanged (pure resample, no new weights)."""
    from vilco_tpu.models.clip_matcher import tiny_clip_matcher

    base = tiny_clip_matcher()
    roi_m = tiny_clip_matcher(use_query_roi=True)
    B, T, S = 2, 3, 16
    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.standard_normal((B, T, S, S, 3)), jnp.float32)
    query = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.float32)
    params = base.init(jax.random.PRNGKey(0), clip, query,
                       deterministic=True)["params"]
    bbox = jnp.asarray([[0.1, 0.2, 0.6, 0.7], [0.0, 0.0, 1.0, 1.0]])

    out_plain = base.apply({"params": params}, clip, query,
                           deterministic=True)
    # same params drive the roi variant (no extra weights)
    out_roi = roi_m.apply({"params": params}, clip, query,
                          deterministic=True, query_frame_bbox=bbox)
    assert out_roi["prob"].shape == out_plain["prob"].shape
    assert np.isfinite(np.asarray(out_roi["prob"])).all()
    assert not np.allclose(np.asarray(out_roi["prob"]),
                           np.asarray(out_plain["prob"]))
    # without a bbox the roi variant degrades to the plain forward
    out_none = roi_m.apply({"params": params}, clip, query,
                           deterministic=True)
    np.testing.assert_allclose(np.asarray(out_none["prob"]),
                               np.asarray(out_plain["prob"]), atol=1e-6)
