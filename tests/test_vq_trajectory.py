"""VQ multi-step training-trajectory lockstep vs the reference train loop.

Drives the ACTUAL reference VQ stack — assembled ClipMatcher
(VQ/model/corr_clip_spatial_transformer2_anchor_2heads_hnm.py), the
anchor loss stack (loss_utils.py::get_losses_with_anchor), AdamW over
trainable (non-backbone) params (VQ/utils/train_utils.py:8-15), global
grad clip at grad_max (train_anchor.py:104), and MultiStepLR
(train_utils.py:28-32) — for 4 optimizer steps from identical weights and
batches against our ClipMatcher + make_vq_train_step + make_vq_optimizer,
pinning the per-step total loss, the LR schedule (milestones inside the
window), and the trainable-param drift.

Deviations neutralized for the lockstep (both documented in PARITY.md):
BatchNorms run in eval mode on both sides (our training default is
GroupNorm — the TPU-native choice without cross-device stat sync — and
the frozen_bn twin has no train-mode batch statistics), and the head
dropout (p=0.2 both sides) is disabled.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_vq_training_trajectory_parity(rng, monkeypatch):
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace as NS

    from tests._reference import (
        AttrDict, load_reference_vq_model, load_reference_vq_utils,
    )
    from vilco_tpu.models.clip_matcher import ClipMatcher
    from vilco_tpu.models.torch_import import (
        load_torch_clip_matcher, state_dict_to_numpy,
    )
    from vilco_tpu.train.vq_engine import (
        VQTrainState, make_vq_optimizer, make_vq_train_step,
    )

    lu, _, _ = load_reference_vq_utils()
    corr, mae = load_reference_vq_model()
    S, T, B, STEPS = 64, 2, 2, 4
    LR, WD, GMAX, GAMMA = 1e-3, 1e-4, 20.0, 0.3
    MILESTONES = (2, 3)   # inside the 4-step window: lr drops twice

    cfg = AttrDict(
        dataset=AttrDict(query_size=S, clip_size_fine=S, clip_size_coarse=S,
                         clip_num_frames=T),
        model=AttrDict(backbone_name="mae", backbone_type="vitb16",
                       bakcbone_use_mae_weight=False, fix_backbone=True,
                       num_transformer=3, type_transformer="global",
                       window_transformer=5, resolution_transformer=8,
                       resolution_anchor_feat=16, pe_transformer="zero"),
        train=AttrDict(use_query_roi=False, use_hnm=False),
        cl=AttrDict(use_adapt=False, prompt_pool=False, length=None,
                    topk=None, pool_size=None, narration_ssl=False,
                    narration_dim=384, ssl_factor=0.0),
    )
    torch.manual_seed(0)
    monkeypatch.setattr(corr.torch, "load", lambda *a, **k: {"model": {}})
    monkeypatch.setattr(corr, "vit_base_patch16",
                        lambda: mae.vit_base_patch16(img_size=S))
    ref = corr.ClipMatcher(cfg)
    with torch.no_grad():
        ref.pe_3d.normal_(std=0.02)
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(std=0.1)
                m.running_var.uniform_(0.5, 2.0)

    # train mode minus the stochastic/stat-updating parts (see module
    # docstring): set_model_train puts the backbone in eval
    # (train_utils.py:35-41); BN-eval + dropout-off on both sides
    ref.train()
    ref.backbone.eval()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eval()
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    # reference optimizer: AdamW over non-backbone params only
    # (fix_backbone branch, train_utils.py:9-15) + MultiStepLR
    for p in ref.backbone.parameters():
        p.requires_grad = False
    t_opt = torch.optim.AdamW(
        [p for p in ref.parameters() if p.requires_grad],
        lr=LR, weight_decay=WD)
    t_sched = torch.optim.lr_scheduler.MultiStepLR(
        t_opt, list(MILESTONES), GAMMA)

    loss_cfg = NS(train=NS(use_hnm=False),
                  model=NS(positive_threshold=0.2, positive_topk=5),
                  loss=NS(weight_bbox_center=1.0, weight_bbox_hw=1.0,
                          weight_bbox_giou=0.3, weight_prob=100.0))

    # batch stream: clips, queries, gts (normalized xyxy + flags)
    batches = []
    for s in range(STEPS):
        clip = rng.standard_normal((B, T, 3, S, S)).astype(np.float32)
        query = rng.standard_normal((B, 3, S, S)).astype(np.float32)
        gt_bbox = np.tile(np.asarray([0.0, 0.0, 1e-4, 1e-4], np.float32),
                          (B, T, 1))
        gt_prob = np.zeros((B, T), np.float32)
        for i in range(B):
            j = int(rng.integers(0, T))
            x0, y0 = rng.uniform(0.1, 0.5, size=2)
            w_, h_ = rng.uniform(0.2, 0.4, size=2)
            gt_bbox[i, j] = [x0, y0, min(x0 + w_, 1), min(y0 + h_, 1)]
            gt_prob[i, j] = 1.0
        before = np.ones((B, T), np.float32)
        batches.append(dict(clip=clip, query=query, gt_bbox=gt_bbox,
                            gt_prob=gt_prob, before=before))

    start_sd = state_dict_to_numpy(ref)

    # ---- reference loop (train_anchor.py:61-108, accumulation_step=1)
    t_losses, t_lrs = [], []
    t_grads0 = None
    for si, bt in enumerate(batches):
        t_lrs.append(t_opt.param_groups[0]["lr"])
        preds = ref(torch.from_numpy(bt["clip"]),
                    torch.from_numpy(bt["query"]),
                    training=True, fix_backbone=True)
        gts = dict(clip_bbox=torch.from_numpy(bt["gt_bbox"]),
                   clip_with_bbox=torch.from_numpy(bt["gt_prob"]),
                   before_query=torch.from_numpy(bt["before"]).bool())
        losses, _, _ = lu.get_losses_with_anchor(loss_cfg, preds, gts)
        total = sum(losses[k.replace("loss_", "weight_")] * v
                    for k, v in losses.items() if k.startswith("loss"))
        t_opt.zero_grad(set_to_none=True)
        total.backward()
        if si == 0:
            # snapshot pre-clip grads for the leaf-by-leaf grad pin;
            # buffers (BN stats) get zeros so the state-dict import maps
            t_grads0 = {n: np.zeros_like(v) for n, v in start_sd.items()}
            for n, p in ref.named_parameters():
                if p.grad is not None:
                    t_grads0[n] = p.grad.detach().numpy().copy()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=GMAX,
                                       norm_type=2.0)
        t_opt.step()
        t_sched.step()
        t_losses.append(float(total))

    # ---- our loop
    model = ClipMatcher(
        dim=256, clip_size=S, patch_size=16, vit_dim=768, vit_depth=12,
        vit_heads=12, resolution_transformer=8, resolution_anchor_feat=16,
        num_transformer=3, window_transformer=5, num_frames=T,
        compute_dtype="float32", norm="frozen_bn", interp_feat_to=16,
        vit_final_norm=False, dropout=0.0,
    )
    b0 = batches[0]
    clip_j = jnp.asarray(b0["clip"].transpose(0, 1, 3, 4, 2))
    query_j = jnp.asarray(b0["query"].transpose(0, 2, 3, 1))
    tmpl = model.init(jax.random.PRNGKey(0), clip_j, query_j,
                      deterministic=True)["params"]
    params = jax.tree.map(jnp.asarray, load_torch_clip_matcher(
        start_sd, model, tmpl))

    # ---- leaf-by-leaf gradient pin at the start weights (the strong
    # invariant: forward+loss+backward through the full assembled model)
    from vilco_tpu.train.vq_engine import vq_losses

    b0j = dict(clip_bbox=jnp.asarray(b0["gt_bbox"]),
               clip_with_bbox=jnp.asarray(b0["gt_prob"]),
               before_query=jnp.asarray(b0["before"]))

    def loss_fn(p):
        preds = model.apply({"params": p}, clip_j, query_j,
                            deterministic=True)
        l, _, _ = vq_losses(preds, b0j)
        return l

    our_grads = jax.grad(loss_fn)(params)
    ref_grads = load_torch_clip_matcher(t_grads0, model, tmpl)
    for (pa, a), (pb, b_) in zip(
            jax.tree_util.tree_flatten_with_path(our_grads)[0],
            jax.tree_util.tree_flatten_with_path(ref_grads)[0]):
        assert pa == pb
        name = "/".join(str(getattr(q, "key", q)) for q in pa)
        if name.startswith("backbone/") or name.endswith(
                ("bn_mean", "bn_var")):
            continue
        a = np.asarray(a)
        b_ = np.asarray(b_)
        scale = max(np.max(np.abs(b_)), 1e-12)
        np.testing.assert_allclose(a, b_, atol=1e-6 + 0.05 * scale,
                                   err_msg=f"grad {name}")

    tx = make_vq_optimizer(LR, WD, freeze_backbone=True, grad_max=GMAX,
                           milestones=MILESTONES, gamma=GAMMA)
    step = make_vq_train_step(model, tx, deterministic=True)
    state = VQTrainState(step=jnp.zeros((), jnp.int32), params=params,
                         opt_state=tx.init(params),
                         rng=jax.random.PRNGKey(1))
    j_losses = []
    for bt in batches:
        batch = dict(
            clip=jnp.asarray(bt["clip"].transpose(0, 1, 3, 4, 2)),
            query=jnp.asarray(bt["query"].transpose(0, 2, 3, 1)),
            clip_bbox=jnp.asarray(bt["gt_bbox"]),
            clip_with_bbox=jnp.asarray(bt["gt_prob"]),
            before_query=jnp.asarray(bt["before"]),
        )
        state, metrics = step(state, batch)
        j_losses.append(float(metrics["final_loss"]))

    # LR schedule exact (milestones hit inside the window)
    np.testing.assert_allclose(
        t_lrs, [LR, LR, LR * GAMMA, LR * GAMMA ** 2], rtol=1e-7)

    # Step-0 loss is a pure same-weights forward+loss: tight. The later
    # sequence is chaotic: many VQ leaves carry near-zero gradients
    # (measured 1e-7..1e-11 scales on reduce/cq_corr/pe_3d at this
    # size), and Adam NORMALIZES them — a round-off-level grad
    # difference there becomes an O(lr) update difference, so per-leaf
    # 1e-4 pins are unattainable by construction (unlike MQ/NLQ, whose
    # trajectory locksteps stay tight). Gradient parity itself is
    # covered leaf-by-leaf at step 0 below; optimizer semantics are
    # pinned exactly on well-conditioned grads in
    # test_vq_optimizer_semantics_lockstep.
    np.testing.assert_allclose(j_losses[0], t_losses[0], rtol=2e-3)
    np.testing.assert_allclose(j_losses, t_losses, rtol=8e-2)

    # drift bounded by the cumulative Adam step budget; frozen backbone
    # and BN running stats must be bit-identical (never optimized)
    end_params = load_torch_clip_matcher(
        state_dict_to_numpy(ref), model, tmpl)
    for (pa, a), (pb, b_) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(end_params)[0]):
        assert pa == pb
        name = "/".join(str(getattr(q, "key", q)) for q in pa)
        frozen = (name.startswith("backbone/")
                  or name.endswith(("bn_mean", "bn_var")))
        tol = 0.0 if frozen else 2.5 * LR * STEPS
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=tol, err_msg=name)


def test_vq_optimizer_semantics_lockstep():
    """make_vq_optimizer == the reference optimizer stack, pinned exactly
    on deterministic well-conditioned grads: global-norm clip at grad_max
    (incl. one step where the clip is ACTIVE), AdamW update + decoupled
    weight decay over trainable params only, MultiStepLR drops at the
    milestones, and the frozen backbone / BN-running-stat leaves receive
    no update and no decay."""
    import jax
    import jax.numpy as jnp

    from vilco_tpu.train.vq_engine import make_vq_optimizer

    LR, WD, GMAX, GAMMA = 1e-3, 1e-4, 2.0, 0.3
    MILESTONES = (2, 3)
    rng = np.random.default_rng(7)
    shapes = {
        "backbone": {"w": (4, 4)},
        "head": {"w": (8, 3), "b": (3,), "bn_mean": (3,), "bn_var": (3,)},
        "reduce": {"k": (5,)},
    }
    params0 = jax.tree.map(
        lambda s: rng.standard_normal(s).astype(np.float32),
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    grads_seq = []
    for s in range(4):
        scale = 5.0 if s == 1 else 0.05   # step 1 trips the clip
        g = jax.tree.map(
            lambda sh: (scale * rng.standard_normal(sh)).astype(
                np.float32),
            shapes, is_leaf=lambda x: isinstance(x, tuple))
        grads_seq.append(g)

    # ---- torch: AdamW over trainable leaves only + clip + MultiStepLR
    trainable = [("head", "w"), ("head", "b"), ("reduce", "k")]
    tparams = {k: torch.from_numpy(params0[k[0]][k[1]].copy()
                                   ).requires_grad_(True)
               for k in trainable}
    t_opt = torch.optim.AdamW(list(tparams.values()), lr=LR,
                              weight_decay=WD)
    t_sched = torch.optim.lr_scheduler.MultiStepLR(
        t_opt, list(MILESTONES), GAMMA)
    for g in grads_seq:
        t_opt.zero_grad(set_to_none=True)
        for k, p in tparams.items():
            p.grad = torch.from_numpy(np.asarray(g[k[0]][k[1]]).copy())
        torch.nn.utils.clip_grad_norm_(list(tparams.values()),
                                       max_norm=GMAX, norm_type=2.0)
        t_opt.step()
        t_sched.step()

    # ---- ours
    tx = make_vq_optimizer(LR, WD, freeze_backbone=True, grad_max=GMAX,
                           milestones=MILESTONES, gamma=GAMMA)
    params = jax.tree.map(jnp.asarray, params0)
    opt_state = tx.init(params)
    import optax
    for g in grads_seq:
        updates, opt_state = tx.update(
            jax.tree.map(jnp.asarray, g), opt_state, params)
        params = optax.apply_updates(params, updates)

    for k in trainable:
        # 1e-6: f32 clip-norm reduction order differs (observed 2.4e-7)
        np.testing.assert_allclose(
            np.asarray(params[k[0]][k[1]]),
            tparams[k].detach().numpy(), atol=1e-6,
            err_msg=str(k))
    # frozen leaves: bit-identical to the start
    for k in (("backbone", "w"), ("head", "bn_mean"), ("head", "bn_var")):
        np.testing.assert_array_equal(
            np.asarray(params[k[0]][k[1]]), params0[k[0]][k[1]],
            err_msg=str(k))
