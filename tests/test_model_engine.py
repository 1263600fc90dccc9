"""Integration: model init + jitted train/eval steps on synthetic data.

Checks the full L2-L4 slice: forward shapes, loss decrease over steps,
decode output sanity, adapter EMA plumbing, prompt/SSL extras.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vilco_tpu.core.config import CLCfg
from vilco_tpu.data.synthetic import make_batch, tiny_config
from vilco_tpu.models.point_transformer import PointTransformer, level_lengths
from vilco_tpu.ops.assign import generate_points
from vilco_tpu.ops.decode import decode_and_nms_batch
from vilco_tpu.train.engine import (
    CLBatchExtras,
    TrainState,
    _extract_adapters,
    init_adapter_ema,
    make_eval_step,
    make_train_step,
)
from vilco_tpu.train.optim import make_optimizer


def _to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def build(cfg, rng_seed=0, batch=None):
    model = PointTransformer(cfg.model, cfg.cl_cfg)
    rng = np.random.default_rng(rng_seed)
    if batch is None:
        batch = make_batch(rng, cfg.loader.batch_size, cfg)
    variables = model.init(
        jax.random.PRNGKey(rng_seed),
        jnp.asarray(batch["feats"]), jnp.asarray(batch["mask"]),
        text=jnp.asarray(batch["text"]) if "text" in batch else None,
        text_mask=jnp.asarray(batch["text_mask"]) if "text_mask" in batch else None,
        narration=jnp.asarray(batch["narration"]) if "narration" in batch else None,
        narration_mask=jnp.asarray(batch["narration_mask"]) if "narration_mask" in batch else None,
        deterministic=True,
    )
    return model, variables["params"], batch


def test_forward_shapes_and_masks():
    cfg = tiny_config()
    model, params, batch = build(cfg)
    out = model.apply(
        {"params": params}, jnp.asarray(batch["feats"]),
        jnp.asarray(batch["mask"]), deterministic=True,
    )
    P = sum(level_lengths(cfg.model))
    B = cfg.loader.batch_size
    C = cfg.model.num_classes
    assert out["cls_logits"].shape == (B, P, C)
    assert out["offsets"].shape == (B, P, 2)
    assert out["fpn_mask"].shape == (B, P)
    assert out["level_lengths"] == level_lengths(cfg.model)
    assert bool(jnp.all(out["offsets"] >= 0))
    # masked positions produce masked fpn entries
    assert not bool(out["fpn_mask"].all())


def test_train_step_loss_decreases():
    cfg = tiny_config()
    model, params, batch = build(cfg)
    tx, _ = make_optimizer(cfg.opt, params, steps_per_epoch=10)
    points = jnp.asarray(generate_points(
        level_lengths(cfg.model), cfg.model.fpn_strides,
        cfg.model.regression_range,
    ))
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
        loss_normalizer=jnp.asarray(cfg.train_cfg.init_loss_norm),
        rng=jax.random.PRNGKey(1),
    )
    step = make_train_step(model, tx, points, cfg)
    cl = CLBatchExtras(class_mask=jnp.ones((cfg.model.num_classes,), bool))

    rng = np.random.default_rng(3)
    losses = []
    for i in range(8):
        b = _to_jnp(make_batch(rng, cfg.loader.batch_size, cfg))
        state, metrics, _ = step(state, b, cl)
        losses.append(float(metrics["final_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_eval_step_and_decode():
    cfg = tiny_config()
    model, params, batch = build(cfg)
    eval_step = make_eval_step(model, cfg)
    out = eval_step(params, _to_jnp(batch))
    points = jnp.asarray(generate_points(
        level_lengths(cfg.model), cfg.model.fpn_strides,
        cfg.model.regression_range,
    ))
    tcfg = cfg.test_cfg
    det = decode_and_nms_batch(
        points, out["cls_logits"], out["offsets"], out["fpn_mask"],
        jnp.ones((cfg.model.num_classes,), bool),
        num_classes=cfg.model.num_classes,
        pre_nms_topk=tcfg.pre_nms_topk, pre_nms_thresh=tcfg.pre_nms_thresh,
        duration_thresh=tcfg.duration_thresh, max_seg_num=tcfg.max_seg_num,
        iou_threshold=tcfg.iou_threshold, min_score=tcfg.min_score,
        nms_sigma=tcfg.nms_sigma, voting_thresh=tcfg.voting_thresh,
        use_soft_nms=True, multiclass=True,
    )
    assert det.segs.shape == (cfg.loader.batch_size, tcfg.max_seg_num, 2)


def test_vilco_extras_prompt_ssl_adapter():
    """Full ViLCo config: cross-modal text, L2P prompts, narration SSL,
    time adapters + EMA."""
    cfg = tiny_config(**{
        "dataset": {"use_text": True, "use_narration": True},
        "model": {"use_cross_modal": True, "n_txt_in": 12},
        "cl_cfg": {
            "prompt_pool": True, "pool_size": 6, "topk": 2, "length": 3,
            "embed_dim": 12, "narration_ssl": True, "narration_dim": 8,
            "memory_size": 32, "use_adapt": True, "adapt_blocks": (0, 1),
            "ssl_factor": 0.05,
        },
    })
    model, params, batch = build(cfg)
    adapters = _extract_adapters(params)
    assert len(adapters) > 0, "adapters must exist under branch blocks"

    tx, _ = make_optimizer(cfg.opt, params, steps_per_epoch=10)
    points = jnp.asarray(generate_points(
        level_lengths(cfg.model), cfg.model.fpn_strides,
        cfg.model.regression_range,
    ))
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
        loss_normalizer=jnp.asarray(cfg.train_cfg.init_loss_norm),
        rng=jax.random.PRNGKey(1),
        adapter_ema=init_adapter_ema(params),
    )
    step = make_train_step(
        model, tx, points, cfg, cl_method="vilco",
        use_ssl=True, use_prompt=True, n_known=2,
    )
    bank = jnp.zeros((cfg.cl_cfg.memory_size, cfg.model.embd_dim))
    cl = CLBatchExtras(
        class_mask=jnp.ones((cfg.model.num_classes,), bool),
        memory_bank=bank, memory_ptr=jnp.zeros((), jnp.int32),
    )
    rng = np.random.default_rng(5)
    b = _to_jnp(make_batch(rng, cfg.loader.batch_size, cfg))
    a0 = np.asarray(list(adapters.values())[0])  # snapshot before donation
    state, metrics, (bank2, ptr2) = step(state, b, cl)
    assert "ssl_loss" in metrics and np.isfinite(float(metrics["ssl_loss"]))
    assert "reduce_sim" in metrics
    # bank advanced by the number of valid narration rows
    assert int(ptr2) == int(b["narration_valid"].sum())
    # adapter EMA follows the updated adapters
    e0 = np.asarray(list(state.adapter_ema.values())[0])
    assert np.isfinite(e0).all() and e0.shape == a0.shape

    # eval with adapter ensemble runs
    ev = make_eval_step(model, cfg, ensemble_adapters=True)
    out = ev(state.params, b, state.adapter_ema)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()


def test_multi_step_scan_matches_sequential():
    """make_multi_train_step(K) == K sequential make_train_step calls."""
    from vilco_tpu.train.engine import make_multi_train_step

    cfg = tiny_config()
    model, params, _ = build(cfg)
    tx, _ = make_optimizer(cfg.opt, params, steps_per_epoch=10)
    points = jnp.asarray(generate_points(
        level_lengths(cfg.model), cfg.model.fpn_strides,
        cfg.model.regression_range,
    ))

    def fresh_state():
        # deep-copy: the donated step consumes the previous state's buffers
        p = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=p,
            opt_state=tx.init(p),
            loss_normalizer=jnp.asarray(cfg.train_cfg.init_loss_norm),
            rng=jax.random.PRNGKey(7),
        )

    cl = CLBatchExtras(class_mask=jnp.ones((cfg.model.num_classes,), bool))
    rng = np.random.default_rng(11)
    K = 3
    batches = [
        {k: jnp.asarray(v)
         for k, v in make_batch(rng, cfg.loader.batch_size, cfg).items()}
        for _ in range(K)
    ]

    step = make_train_step(model, tx, points, cfg)
    s1 = fresh_state()
    for b in batches:
        s1, m1, _ = step(s1, b, cl)

    multi = make_multi_train_step(model, tx, points, cfg, K)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    s2, m2, _ = multi(fresh_state(), stacked, cl)

    assert int(s2.step) == K
    np.testing.assert_allclose(
        float(m2["final_loss"]), float(m1["final_loss"]), rtol=1e-4
    )
    lead1 = jax.tree.leaves(s1.params)[0]
    lead2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(lead1), np.asarray(lead2),
                               atol=1e-4)


def test_conv_backbone_variant():
    """backbone_type='conv' (reference ConvBackbone, backbones.py:325-411)."""
    cfg = tiny_config(model={"backbone_type": "conv"})
    model, params, batch = build(cfg)
    out = model.apply(
        {"params": params}, jnp.asarray(batch["feats"]),
        jnp.asarray(batch["mask"]), deterministic=True,
    )
    P = sum(level_lengths(cfg.model))
    assert out["cls_logits"].shape == (cfg.loader.batch_size, P,
                                       cfg.model.num_classes)
    assert "backbone" in params and any(
        k.startswith("branch_") for k in params["backbone"]
    )


def test_full_model_ema():
    """opt.ema_decay > 0 maintains a full-model EMA (ModelEma,
    MQ/libs/utils/train_utils.py:247-277)."""
    cfg = tiny_config(opt={"ema_decay": 0.9})
    model, params, batch = build(cfg)
    tx, _ = make_optimizer(cfg.opt, params, steps_per_epoch=10)
    points = jnp.asarray(generate_points(
        level_lengths(cfg.model), cfg.model.fpn_strides,
        cfg.model.regression_range,
    ))
    ema0 = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
        loss_normalizer=jnp.asarray(cfg.train_cfg.init_loss_norm),
        rng=jax.random.PRNGKey(1),
        ema_params=ema0,
    )
    step = make_train_step(model, tx, points, cfg)
    cl = CLBatchExtras(class_mask=jnp.ones((cfg.model.num_classes,), bool))
    b = _to_jnp(batch)
    before = [np.asarray(x).copy() for x in jax.tree.leaves(ema0)]
    state, _, _ = step(state, b, cl)
    state, _, _ = step(state, b, cl)
    ema = [np.asarray(x) for x in jax.tree.leaves(state.ema_params)]
    live = [np.asarray(x) for x in jax.tree.leaves(state.params)]
    moved = max(np.abs(e - b).max() for e, b in zip(ema, before))
    lag = max(np.abs(e - l).max() for e, l in zip(ema, live))
    # EMA moved, but lags the live params
    assert moved > 1e-5, moved
    assert lag > 1e-5, lag


def test_flatten_optimizer_matches_per_tensor():
    """opt.flatten collapses the moment update into one flat buffer; the
    math must be identical to the per-tensor chain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vilco_tpu.core.config import OptCfg
    from vilco_tpu.train.optim import make_optimizer

    params = {
        "a": {"kernel": jnp.asarray(np.random.default_rng(0)
                                    .standard_normal((8, 4), np.float32))},
        "b": {"bias": jnp.ones((4,), jnp.float32)},
    }
    grads = jax.tree.map(lambda p: 0.1 * jnp.ones_like(p), params)
    for factored in ("full", "factored"):
        cfg = OptCfg(second_moment=factored)
        tx_ref, _ = make_optimizer(cfg, params, steps_per_epoch=10)
        tx_flat, _ = make_optimizer(cfg.updated(flatten=True), params,
                                    steps_per_epoch=10)
        s_ref, s_flat = tx_ref.init(params), tx_flat.init(params)
        p_ref, p_flat = params, params
        for _ in range(3):
            u_ref, s_ref = tx_ref.update(grads, s_ref, p_ref)
            u_flat, s_flat = tx_flat.update(grads, s_flat, p_flat)
            import optax
            p_ref = optax.apply_updates(p_ref, u_ref)
            p_flat = optax.apply_updates(p_flat, u_flat)
        for kr, kf in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_flat)):
            np.testing.assert_allclose(np.asarray(kr), np.asarray(kf),
                                       rtol=2e-6, atol=2e-7)


def test_fused_adamw_matches_optax_chain():
    """FusedAdamW.fused_apply must track the optax chain bit-for-bit over
    several steps (both mu dtypes), incl. the decay mask split."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vilco_tpu.core.config import OptCfg
    from vilco_tpu.train.optim import FusedAdamW, make_optimizer, make_schedule

    rng = np.random.default_rng(0)
    params = {
        "w": {"kernel": jnp.asarray(rng.standard_normal((6, 4), np.float32))},
        "b": {"bias": jnp.asarray(rng.standard_normal((4,), np.float32))},
    }
    for mu in ("float32", "bfloat16"):
        # nu pinned f32: this test checks exact math equivalence against
        # the optax chain, which has no second-moment dtype control
        cfg = OptCfg(mu_dtype=mu, nu_dtype="float32")
        tx, sched = make_optimizer(cfg, params, steps_per_epoch=10)
        assert isinstance(tx, FusedAdamW)   # default-on
        ref = tx._chain
        s_f, s_r = tx.init(params), ref.init(params)
        p_f, p_r = params, params
        for i in range(4):
            g = jax.tree.map(
                lambda p: jnp.asarray(
                    rng.standard_normal(p.shape, np.float32)) * 0.1,
                params,
            )
            p_f, s_f = tx.fused_apply(g, s_f, p_f)
            u, s_r = ref.update(g, s_r, p_r)
            p_r = optax.apply_updates(p_r, u)
        for kf, kr in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_r)):
            np.testing.assert_allclose(np.asarray(kf), np.asarray(kr),
                                       rtol=1e-6, atol=1e-7)
        # state counters advanced identically
        assert int(s_f[0].count) == int(s_r[0].count) == 4
        assert int(s_f[2].count) == int(s_r[2].count) == 4
        for kf, kr in zip(jax.tree.leaves(s_f[0].nu),
                          jax.tree.leaves(s_r[0].nu)):
            np.testing.assert_allclose(np.asarray(kf), np.asarray(kr),
                                       rtol=1e-6, atol=1e-8)


def test_fused_adamw_nu_bf16_storage():
    """nu_dtype=bfloat16 (the default since round 3) stores the second
    moment in bf16 (init + every step) while the update math stays in
    f32: the parameter trajectory must stay close to the f32-state
    trajectory over several steps, and the non-fused optax path must
    warn and keep f32 storage (optax has no nu dtype control)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from vilco_tpu.core.config import OptCfg
    from vilco_tpu.train.optim import FusedAdamW, make_optimizer

    rng = np.random.default_rng(1)
    params = {
        "w": {"kernel": jnp.asarray(rng.standard_normal((6, 4), np.float32))},
        "b": {"bias": jnp.asarray(rng.standard_normal((4,), np.float32))},
    }
    # warmup off + a real lr so the params actually move: with the config
    # defaults the schedule is ~0 for the first steps and any closeness
    # assertion would be vacuous
    mk = lambda **kw: OptCfg(warmup=False, learning_rate=1e-2, **kw)
    tx_bf, _ = make_optimizer(mk(nu_dtype="bfloat16"), params, 10)
    tx_f32, _ = make_optimizer(mk(nu_dtype="float32"), params, 10)
    assert isinstance(tx_bf, FusedAdamW)
    s_bf, s_f32 = tx_bf.init(params), tx_f32.init(params)
    for leaf in jax.tree.leaves(s_bf[0].nu):
        assert leaf.dtype == jnp.bfloat16
    p_bf, p_f = params, params
    for _ in range(6):
        g = jax.tree.map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape, np.float32)) * 0.1,
            params,
        )
        p_bf, s_bf = tx_bf.fused_apply(g, s_bf, p_bf)
        p_f, s_f32 = tx_f32.fused_apply(g, s_f32, p_f)
    for leaf in jax.tree.leaves(s_bf[0].nu):
        assert leaf.dtype == jnp.bfloat16      # dtype stable across steps
    # params moved by ~6 * lr = 6e-2 per coordinate; bf16 nu quantization
    # (~2^-9 relative on sqrt(nu)) perturbs that by well under 2e-3 — a
    # bf16-accumulated EMA would drift far past the tolerance
    moved = max(float(jnp.abs(kb - k0).max()) for kb, k0 in
                zip(jax.tree.leaves(p_bf), jax.tree.leaves(params)))
    assert moved > 1e-2, moved
    for kb, kf in zip(jax.tree.leaves(p_bf), jax.tree.leaves(p_f)):
        np.testing.assert_allclose(np.asarray(kb), np.asarray(kf),
                                   rtol=0, atol=2e-3)
    # nu tracks the f32 second moment within bf16 quantization error
    for nb, nf in zip(jax.tree.leaves(s_bf[0].nu),
                      jax.tree.leaves(s_f32[0].nu)):
        np.testing.assert_allclose(np.asarray(nb, np.float32),
                                   np.asarray(nf), rtol=2e-2, atol=1e-9)
    # the optax-interface path must preserve the storage dtype too
    g = jax.tree.map(jnp.ones_like, params)
    _, s_upd = tx_bf.update(g, s_bf, p_bf)
    for leaf in jax.tree.leaves(s_upd[0].nu):
        assert leaf.dtype == jnp.bfloat16
    # non-fused path: warns and keeps f32 storage (downgrade, not error —
    # bf16 nu is the config default and must not break --factored/--flatten)
    with pytest.warns(UserWarning, match="FusedAdamW"):
        tx_plain, _ = make_optimizer(
            OptCfg(nu_dtype="bfloat16", fused_apply=False), params, 10)
    s_plain = tx_plain.init(params)
    nus = [s.nu for s in jax.tree.leaves(
        s_plain, is_leaf=lambda x: hasattr(x, "nu")) if hasattr(s, "nu")]
    assert nus, "optax adam state not found"
    for leaf in jax.tree.leaves(nus):
        assert leaf.dtype == jnp.float32


def test_params_bf16_compute_overlay():
    """param_compute_dtype=bfloat16 (persistent bf16 kernel overlay +
    bf16 grads over the f32 AdamW master): the overlaid forward must
    match the default per-step-cast forward exactly (the stored copy IS
    the cast), the trajectory must track the default within bf16-grad
    rounding, and the overlay must stay consistent with the master."""
    from vilco_tpu.train.engine import inject_adapters
    from vilco_tpu.train.optim import make_compute_copy

    base = tiny_config()
    # a real lr so trajectories move (defaults warm up from ~0), and bf16
    # activations — the overlay is only valid (and only a no-op for the
    # forward) when kernels are consumed at bf16, as on the TPU flagship
    base = base.updated(
        opt=base.opt.updated(warmup=False, learning_rate=1e-2),
        model=base.model.updated(compute_dtype="bfloat16"))
    cfg_pc = base.updated(
        opt=base.opt.updated(param_compute_dtype="bfloat16"))
    model, params, batch = build(base)
    points = jnp.asarray(generate_points(
        level_lengths(base.model), base.model.fpn_strides,
        base.model.regression_range,
    ))
    overlay = make_compute_copy(params)
    assert overlay, "no kernels overlaid — mask matched nothing"
    assert all(v.dtype == jnp.bfloat16 for v in overlay.values())
    assert all(k.startswith(("backbone", "neck", "cls_head", "reg_head"))
               for k in overlay)

    # forward equivalence: bf16 overlay injected == f32 master (the model
    # casts kernels to the activation dtype per use either way)
    b = _to_jnp(batch)
    out_f32 = model.apply({"params": params}, b["feats"], b["mask"],
                          deterministic=True)
    out_pc = model.apply({"params": inject_adapters(params, overlay)},
                         b["feats"], b["mask"], deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_pc["cls_logits"]), np.asarray(out_f32["cls_logits"]),
        rtol=1e-6, atol=1e-6)

    def mk_state(cfg, pc):
        # each state owns its buffers: the jitted step donates them
        p = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        tx, _ = make_optimizer(cfg.opt, p, steps_per_epoch=10)
        st = TrainState(
            step=jnp.zeros((), jnp.int32), params=p,
            opt_state=tx.init(p),
            loss_normalizer=jnp.asarray(base.train_cfg.init_loss_norm),
            rng=jax.random.PRNGKey(1),
            params_c=make_compute_copy(p) if pc else None,
        )
        return make_train_step(model, tx, points, cfg), st

    step0, s0 = mk_state(base, pc=False)
    step1, s1 = mk_state(cfg_pc, pc=True)
    cl = CLBatchExtras(class_mask=jnp.ones((base.model.num_classes,), bool))
    params_np = jax.tree.map(np.asarray, params)
    rng = np.random.default_rng(3)
    for i in range(3):
        bi = _to_jnp(make_batch(rng, base.loader.batch_size, base))
        s0, m0, _ = step0(s0, bi, cl)
        s1, m1, _ = step1(s1, bi, cl)
        if i == 0:
            # pre-update forwards identical -> identical first loss
            np.testing.assert_allclose(float(m1["final_loss"]),
                                       float(m0["final_loss"]), rtol=1e-6)
        if i == 1:
            # Trajectory bound, not a tight pin: the schedule's reference
            # closed form (round-3 parity fix) runs the FIRST step at full
            # lr, where bias-corrected Adam is a pure sign step — and the
            # overlay arm's grads come from bf16 backprop, so coordinates
            # with |g| below the bf16 backprop noise legitimately flip
            # update sign. Each arm's per-step |u| <= ~(1 + wd|p|), so
            # after 2 steps the arms can differ by at most ~2 full
            # opposite-sign updates; a double-apply / dtype-contamination
            # bug would blow well past this.
            moved = max(float(jnp.abs(jnp.asarray(a) - b).max())
                        for a, b in zip(jax.tree.leaves(s0.params),
                                        jax.tree.leaves(params_np)))
            assert moved > 1e-3, moved
            lr_bound = 2 * 2 * 1e-2 * 1.2  # steps x arms x lr x wd-slack
            for a, b in zip(jax.tree.leaves(s1.params),
                            jax.tree.leaves(s0.params)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=0, atol=lr_bound)
        # losses stay finite and track loosely across steps
        assert np.isfinite(float(m1["final_loss"]))
        np.testing.assert_allclose(float(m1["final_loss"]),
                                   float(m0["final_loss"]), rtol=0.1)
    # overlay invariant: params_c == bf16 cast of the updated master
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): leaf
        for path, leaf in
        jax.tree_util.tree_flatten_with_path(s1.params)[0]
    }
    for k, v in s1.params_c.items():
        assert v.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(v, np.float32),
            np.asarray(flat[k].astype(jnp.bfloat16), np.float32), k)
    # non-fused optimizer path must reject the flag
    with pytest.raises(ValueError, match="FusedAdamW"):
        make_optimizer(
            cfg_pc.opt.updated(fused_apply=False), params, 10)


def test_vit_qkv_contiguous_split_matches_torch_packing():
    """ViTBlock splits the packed qkv Dense output into contiguous thirds;
    this must equal reshape(B, L, 3, H, D) slicing — the torch qkv weight
    layout that load_torch_vit_checkpoint imports."""
    import numpy as np

    rng = np.random.default_rng(0)
    B, L, H, D = 2, 5, 3, 4
    C = H * D
    qkv = rng.standard_normal((B, L, 3 * C)).astype(np.float32)
    ref = qkv.reshape(B, L, 3, H, D)
    np.testing.assert_array_equal(qkv[..., :C].reshape(B, L, H, D),
                                  ref[:, :, 0])
    np.testing.assert_array_equal(qkv[..., C:2 * C].reshape(B, L, H, D),
                                  ref[:, :, 1])
    np.testing.assert_array_equal(qkv[..., 2 * C:].reshape(B, L, H, D),
                                  ref[:, :, 2])


def test_prompt_pool_dim_mismatch_raises():
    """A pool/text embed-dim mismatch must raise the explanatory ValueError
    (previously an opaque dot_general shape error from flax init)."""
    import pytest

    from vilco_tpu.cl.prompt import PromptPool

    pool = PromptPool(pool_size=4, length=2, embed_dim=16, top_k=2)
    with pytest.raises(ValueError, match="n_txt_in"):
        pool.init(jax.random.PRNGKey(0), jnp.ones((2, 5, 12)))


def test_abs_pe_over_length_matches_torch_interpolate():
    """Inference-time PE re-interpolation for over-length inputs pins to
    F.interpolate(mode='linear', align_corners=False)
    (MQ backbones.py:228-235 / NLQ :575-580); training raises like the
    reference's 'Reached max length.' assert."""
    import torch
    import torch.nn.functional as F

    from vilco_tpu.models.backbone import _abs_pe_table
    from vilco_tpu.ops.masked import sinusoid_encoding

    cfg = tiny_config().model
    E, max_len, T = cfg.embd_dim, cfg.max_seq_len, cfg.max_seq_len + 13

    got = _abs_pe_table(cfg, T, deterministic=True)
    table = sinusoid_encoding(max_len, E) / (E ** 0.5)
    want = F.interpolate(
        torch.from_numpy(table.T[None]), T, mode="linear",
        align_corners=False,
    ).numpy()[0].T
    np.testing.assert_allclose(got, want, atol=1e-6)

    # T <= max_len: plain truncated table, no resize
    same = _abs_pe_table(cfg, max_len, deterministic=True)
    np.testing.assert_array_equal(same, table)

    with pytest.raises(ValueError, match="max_seq_len"):
        _abs_pe_table(cfg, T, deterministic=False)


def test_backbone_forward_over_length_inference():
    """The MQ backbone accepts an over-length clip at inference (native-length
    eval path of the reference when force_upsampling is off)."""
    cfg = tiny_config()
    T = cfg.model.max_seq_len * 2
    from vilco_tpu.models.backbone import ConvTransformerBackbone

    bb = ConvTransformerBackbone(cfg.model)
    x = jnp.ones((1, T, cfg.model.input_dim), jnp.float32)
    mask = jnp.ones((1, T), bool)
    variables = bb.init(jax.random.PRNGKey(0), x, mask, deterministic=True)
    feats, masks = bb.apply(variables, x, mask, deterministic=True)
    assert feats[0].shape[1] == T
