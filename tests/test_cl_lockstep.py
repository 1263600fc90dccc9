"""CL-method update locksteps against the ACTUAL reference torch code.

The naive train step has a 6-step trajectory lockstep
(test_torch_parity.py::test_training_trajectory_parity); these tests pin
the CL deltas — the point of ViLCo — the same way: drive the reference
cl_methods code and ours from identical weights/batches and compare the
resulting importance tensors / penalty values / losses / prompted tokens.

Covered:
  - EWC on_task_update + get_regularized_loss
    (MQ/libs/cl_methods/EWC.py:24-56, :6-22)
  - MAS on_task_mas_update + get_mas_regularized_loss
    (MQ/libs/cl_methods/MAS.py:23-57, :5-21)
  - iCaRL logit snapshot + BCE distill
    (MQ/train_cl.py:226-235, meta_archs.py:1503-1519)
  - BiC softmax-T distill + bias-layer application
    (meta_archs.py:1481-1501, :823-836)
  - L2P prompt pool forward (cl_methods/prompt.py:47-117)
"""

import numpy as np
import pytest

from tests._reference import load_reference_mq
from tests._mq_fixture import (
    B, NC, T, L, CTXT, SPE, LR, WD, WARM_EP, EPOCHS, INIT_NORM,
    build_our_model, build_ref_model, make_batches, make_points,
    our_config, to_jax_batch,
)
from vilco_tpu.models.torch_import import (
    load_torch_point_transformer,
    state_dict_to_numpy,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    return load_reference_mq()


@pytest.fixture(autouse=True)
def _exact_gelu():
    from vilco_tpu.ops.activations import exact_gelu

    with exact_gelu():
        yield


def _opt_cfg():
    return {"type": "AdamW", "learning_rate": LR, "weight_decay": WD,
            "momentum": 0.9, "warmup": True, "warmup_epochs": WARM_EP,
            "epochs": EPOCHS, "schedule_type": "cosine"}


def _leafcmp(ours_tree, ref_tree, atol, rtol, what):
    import jax

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ours_tree)[0],
            jax.tree_util.tree_flatten_with_path(ref_tree)[0]):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol, rtol=rtol,
            err_msg=what + ": " + "/".join(
                str(getattr(q, "key", q)) for q in pa))


# ------------------------------------------------------- EWC / MAS

@pytest.mark.parametrize("mode", ["ewc", "mas"])
def test_importance_lockstep(ref, rng, tmp_path, monkeypatch, mode):
    """on_task_update / on_task_mas_update lockstep: the reference zeroes
    grads at the TOP of every loader iteration
    (EWC.py:38, MAS.py:39 `optimizer.zero_grad(set_to_none=True)`), so
    fisher/importance comes from the LAST batch's gradient only — pinned
    here, along with optpar and the quadratic penalty (which skips every
    param whose name contains 'scale', EWC.py:14/MAS.py:13)."""
    import jax
    import jax.numpy as jnp

    from vilco_tpu.cl.regularizers import (
        estimate_importance, make_grad_step, stack_reg_tasks,
    )
    from vilco_tpu.train.engine import CLBatchExtras, reg_penalty

    tmodel = build_ref_model(ref, tmp_path, monkeypatch)
    batches = make_batches(rng, 3)
    start_sd = state_dict_to_numpy(tmodel)

    # ---- reference estimation loop (EWC.py:24-56 / MAS.py:23-57)
    tmodel.reg_params = {}
    t_opt = ref.utils.make_optimizer(tmodel, _opt_cfg())
    if mode == "ewc":
        reg = ref.cl_methods.on_task_update(
            [bt["video_list"] for bt in batches], "cpu", t_opt, tmodel)
        fisher_sd, optpar_sd = reg["fisher"][0], reg["optpar"][0]
    else:
        reg = ref.cl_methods.on_task_mas_update(
            [bt["video_list"] for bt in batches], "cpu", t_opt, tmodel)
        fisher_sd, optpar_sd = reg["importance"][0], reg["optpar"][0]

    # ---- ours
    cfg = our_config()
    model, tmpl, params = build_our_model(cfg, tmodel, batches[0])
    points = make_points(cfg)
    grad_step = make_grad_step(model, points, cfg, mode)
    cl = CLBatchExtras(class_mask=jnp.ones((NC,), bool))
    imp, optpar, _ = estimate_importance(
        grad_step, params,
        [to_jax_batch(bt) for bt in batches], cl,
        jnp.asarray(INIT_NORM), mode=mode)

    # map the reference dicts into our tree layout for comparison
    # the importer's rules are pure permutations (transpose/reshape/
    # slice), so elementwise functions of grads map through them 1:1
    ref_imp = load_torch_point_transformer(
        {k: np.asarray(v) for k, v in fisher_sd.items()}, cfg.model, tmpl)
    ref_opt = load_torch_point_transformer(
        {k: np.asarray(v) for k, v in optpar_sd.items()}, cfg.model, tmpl)
    _leafcmp(optpar, ref_opt, 1e-6, 1e-6, f"{mode} optpar")
    # grads usually match ~1e-6 abs, but the XLA:CPU AOT cache makes the
    # rounding run-order-dependent (cached executables compiled under
    # different machine-feature sets reload with e.g. prefer-no-scatter
    # dropped): the full-suite run has shown single elements of |grad|
    # off by ~2e-5 where the isolated run matches — hence atol 5e-5
    _leafcmp(imp, ref_imp, 5e-5, 5e-3, f"{mode} importance")

    # ---- penalty lockstep on perturbed params
    with torch.no_grad():
        for p in tmodel.parameters():
            p.add_(0.01 * torch.randn_like(p))
    lam = 0.25
    zero = torch.zeros(())
    if mode == "ewc":
        t_pen = ref.cl_methods.get_regularized_loss(zero, tmodel, lam)
    else:
        t_pen = ref.cl_methods.get_mas_regularized_loss(zero, tmodel, lam)
    pert = load_torch_point_transformer(
        state_dict_to_numpy(tmodel), cfg.model, tmpl)
    fisher, optpars = stack_reg_tasks([(imp, optpar)])
    pen = reg_penalty(jax.tree.map(jnp.asarray, pert),
                      jax.tree.map(jnp.asarray, fisher),
                      jax.tree.map(jnp.asarray, optpars), lam)
    np.testing.assert_allclose(float(pen), float(t_pen), rtol=2e-3,
                               err_msg=f"{mode} penalty")


# ------------------------------------------------------- iCaRL distill

def test_icarl_distill_lockstep(ref, rng, tmp_path, monkeypatch):
    """Snapshot sigmoid logits (train_cl.py:226-235) then forward with
    prev_out_cls_logits: dist_loss = 0.01 * sum over levels of
    sum_{y<n_known} BCEWithLogits(cur[0,:,y], prev[:,y])
    (meta_archs.py:1503-1519). B=1: the reference branch is only
    well-defined there (it compares batch element 0's logits against the
    LAST element's snapshot; train_utils.py:327-333)."""
    import jax
    import jax.numpy as jnp

    from vilco_tpu.train.engine import CLBatchExtras, compute_losses

    n_known = 4
    tmodel = build_ref_model(ref, tmp_path, monkeypatch,
                             cl_overrides={"name": "icarl"})
    tmodel.n_known = n_known
    tmodel.cl_name = "icarl"
    batches = make_batches(rng, 2, batch_size=1)

    # ---- reference: snapshot + distill forward
    snap, losses_t = {}, []
    with torch.no_grad():
        for bt in batches:
            out_cls_logits, out_offsets, fpn_masks = tmodel(
                bt["video_list"], get_emb=True)
            vid = bt["video_list"][0]["video_id"]
            snap[vid] = [
                np.asarray(torch.sigmoid(lvl[0]).detach())
                for lvl in out_cls_logits
            ]
    for bt in batches:
        vid = bt["video_list"][0]["video_id"]
        losses = tmodel(bt["video_list"], task_id=1,
                        prev_out_cls_logits=[snap[vid]])
        losses_t.append({k: float(v) for k, v in losses.items()})

    # ---- ours
    cfg = our_config()
    model, tmpl, params = build_our_model(cfg, tmodel, batches[0])
    points = make_points(cfg)

    @jax.jit
    def fwd(params, batch, cl, norm):
        outputs = model.apply(
            {"params": params}, batch["feats"], batch["mask"],
            text=batch["text"], text_mask=batch["text_mask"],
            deterministic=True)
        return compute_losses(outputs, batch, points, cfg, cl,
                              norm, "icarl", n_known)

    eval_fwd = jax.jit(lambda p, b: model.apply(
        {"params": p}, b["feats"], b["mask"], text=b["text"],
        text_mask=b["text_mask"], deterministic=True)["cls_logits"])

    norm = jnp.asarray(INIT_NORM)
    for bt, ref_losses in zip(batches, losses_t):
        jb = to_jax_batch(bt)
        prev = jax.nn.sigmoid(eval_fwd(params, jb))
        cl = CLBatchExtras(class_mask=jnp.ones((NC,), bool),
                           prev_logits=prev)
        _, metrics, norm = fwd(params, jb, cl, norm)
        # snapshot itself must match the reference's per-level sigmoids
        flat_ref = np.concatenate(
            snap[bt["video_list"][0]["video_id"]], axis=0)
        np.testing.assert_allclose(np.asarray(prev[0]), flat_ref,
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(float(metrics["dist_loss"]),
                                   ref_losses["dist_loss"],
                                   rtol=2e-4, err_msg="icarl dist_loss")
        np.testing.assert_allclose(float(metrics["final_loss"]),
                                   ref_losses["final_loss"], rtol=2e-3,
                                   err_msg="icarl final_loss")


# ------------------------------------------------------- BiC

def test_bic_distill_lockstep(ref, rng, tmp_path, monkeypatch):
    """BiC stage-1 soft-target distillation: prev = softmax(cur/T)[:n_known]
    snapshots (train_bic.py:424-434), dist = 0.01 * (n_known/C) * sum over
    levels of mean_t(-sum_y prev*logp) with logp = log_softmax(cur[0]/T)
    (meta_archs.py:1481-1501)."""
    import jax
    import jax.numpy as jnp

    from vilco_tpu.train.engine import CLBatchExtras, compute_losses

    n_known = 4
    tmodel = build_ref_model(ref, tmp_path, monkeypatch,
                             cl_overrides={"name": "bic"})
    tmodel.n_known = n_known
    tmodel.cl_name = "bic"
    # identity bias layer so the forward's bias loop (meta_archs.py:823-
    # 836) is a no-op on both sides
    tmodel.list_splits = [NC]
    tmodel.list_bias_layers = [ref.modeling.meta_archs.BiasLayer()]
    batches = make_batches(rng, 2, batch_size=1)
    TEMP = 2.0

    snap, losses_t = {}, []
    with torch.no_grad():
        for bt in batches:
            out_cls_logits, _, _ = tmodel(bt["video_list"], get_emb=True)
            vid = bt["video_list"][0]["video_id"]
            snap[vid] = [
                np.asarray(torch.nn.functional.softmax(
                    lvl[0][:, :n_known] / TEMP, dim=1).detach())
                for lvl in out_cls_logits
            ]
    for bt in batches:
        vid = bt["video_list"][0]["video_id"]
        # bic indexes prev_out_cls_logits per LEVEL directly
        # (train_utils.py:493 passes the dict value unwrapped)
        losses = tmodel(bt["video_list"], task_id=1,
                        prev_out_cls_logits=snap[vid])
        losses_t.append({k: float(v) for k, v in losses.items()})

    cfg = our_config()
    model, tmpl, params = build_our_model(cfg, tmodel, batches[0])
    points = make_points(cfg)

    @jax.jit
    def fwd(params, batch, cl, norm):
        outputs = model.apply(
            {"params": params}, batch["feats"], batch["mask"],
            text=batch["text"], text_mask=batch["text_mask"],
            deterministic=True)
        return compute_losses(outputs, batch, points, cfg, cl,
                              norm, "bic", n_known)

    eval_fwd = jax.jit(lambda p, b: model.apply(
        {"params": p}, b["feats"], b["mask"], text=b["text"],
        text_mask=b["text_mask"], deterministic=True)["cls_logits"])

    norm = jnp.asarray(INIT_NORM)
    for bt, ref_losses in zip(batches, losses_t):
        jb = to_jax_batch(bt)
        cur = eval_fwd(params, jb)
        prev = jax.nn.softmax(cur[..., :n_known] / TEMP, axis=-1)
        prev = jnp.pad(prev, ((0, 0), (0, 0), (0, NC - n_known)))
        cl = CLBatchExtras(class_mask=jnp.ones((NC,), bool),
                           prev_logits=prev)
        _, metrics, norm = fwd(params, jb, cl, norm)
        np.testing.assert_allclose(float(metrics["dist_loss"]),
                                   ref_losses["dist_loss"],
                                   rtol=2e-4, err_msg="bic dist_loss")
        np.testing.assert_allclose(float(metrics["final_loss"]),
                                   ref_losses["final_loss"], rtol=2e-3,
                                   err_msg="bic final_loss")


def test_bic_bias_apply_lockstep(ref, rng, tmp_path, monkeypatch):
    """Bias-layer application in the forward (meta_archs.py:823-836):
    per-task slices of the class axis get logits*alpha_i + beta_i. Ours is
    the vectorized per-class expansion (cl/bic.py::apply_bias)."""
    import jax
    import jax.numpy as jnp

    from vilco_tpu.cl.bic import BicState, apply_bias

    tmodel = build_ref_model(ref, tmp_path, monkeypatch,
                             cl_overrides={"name": "bic"})
    tmodel.cl_name = "bic"
    tmodel.n_known = 4
    # two tasks: classes [0,4) then [4,7)
    vals = [(1.25, -0.5), (0.75, 0.3)]
    tmodel.list_splits = [4, NC]
    tmodel.list_bias_layers = []
    for a, b in vals:
        layer = ref.modeling.meta_archs.BiasLayer()
        with torch.no_grad():
            layer.alpha.fill_(a)
            layer.beta.fill_(b)
        tmodel.list_bias_layers.append(layer)

    bt = make_batches(rng, 1, batch_size=1)[0]
    with torch.no_grad():
        out_cls_logits, _, _ = tmodel(bt["video_list"], get_emb=True)
    ref_biased = np.concatenate(
        [np.asarray(lvl[0].detach()) for lvl in out_cls_logits], axis=0)

    cfg = our_config()
    model, tmpl, params = build_our_model(cfg, tmodel, bt)
    bic = BicState(NC, 2)
    bic.register_task(0, range(0, 4))
    bic.register_task(1, range(4, NC))
    bic.alphas[:] = [v[0] for v in vals]
    bic.betas[:] = [v[1] for v in vals]
    alpha, beta = bic.per_class(upto_task=1)

    jb = to_jax_batch(bt)
    cur = model.apply({"params": params}, jb["feats"], jb["mask"],
                      text=jb["text"], text_mask=jb["text_mask"],
                      deterministic=True)["cls_logits"]
    ours = apply_bias(cur, jnp.asarray(alpha), jnp.asarray(beta))
    np.testing.assert_allclose(np.asarray(ours[0]), ref_biased,
                               atol=5e-5, rtol=1e-4)


# ------------------------------------------------------- L2P prompt pool

def test_l2p_prompt_forward_lockstep(ref, rng):
    """Prompt pool forward lockstep (cl_methods/prompt.py:47-117): cosine
    top-k selection, batchwise majority vote, pull constraint, prompt
    concatenation — same weights, same inputs, both the free-selection and
    the prompt_mask (task-slice) paths."""
    import jax
    import jax.numpy as jnp

    from vilco_tpu.cl.prompt import PromptPool

    POOL, LEN, DIM, K, BB = 10, 5, 48, 4, 6
    # the Prompt init draws from torch's GLOBAL rng — pin it so the test
    # is order-independent under the full suite
    torch.manual_seed(3)
    tprompt = ref.cl_methods.Prompt(
        length=LEN, embed_dim=DIM, embedding_key="mean",
        prompt_init="uniform", prompt_pool=True, prompt_key=True,
        pool_size=POOL, top_k=K, batchwise_prompt=True,
        prompt_key_init="uniform")
    tprompt.eval()

    pool = PromptPool(pool_size=POOL, length=LEN, embed_dim=DIM, top_k=K,
                      batchwise_prompt=True)
    # ENGINEERED inputs: the batchwise vote's idx parity is only defined
    # when the counts are TIE-FREE (torch.topk's order for equal values
    # is unspecified — observed flipping under suite-order rng drift;
    # ours is deterministically lowest-id, documented in cl/prompt.py).
    # Make the keys exactly orthogonal (one-hot; random 48-d keys have
    # ~0.14 cross-talk, enough to scramble small weight gaps) and build
    # each row's mean embedding with distinct per-row weights, so the
    # per-row top-4 and the vote counts (6,5,4,3 over prompts 0,1,2,3;
    # singletons elsewhere) are unambiguous on both sides.
    with torch.no_grad():
        tprompt.prompt_key.zero_()
        for p in range(POOL):
            tprompt.prompt_key[p, p] = 1.0
    row_sets = [(0, 1, 2, 3), (0, 1, 2, 3), (0, 1, 2, 4),
                (0, 1, 2, 5), (0, 1, 3, 6), (0, 7, 8, 9)]
    wts = np.asarray([4.0, 3.0, 2.0, 1.0])
    x = np.zeros((BB, L, DIM), np.float32)
    for r, sel in enumerate(row_sets):
        for w, p in zip(wts, sel):
            x[r, :, p] = w
    x += 0.001 * rng.standard_normal((BB, L, DIM)).astype(np.float32)
    params = {
        "prompt": jnp.asarray(tprompt.prompt.detach().numpy()),
        "prompt_key": jnp.asarray(tprompt.prompt_key.detach().numpy()),
    }

    # free selection (batchwise vote)
    tout = tprompt(torch.from_numpy(x))
    ours = pool.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(ours["idx"]),
                                  tout["prompt_idx"].detach().numpy())
    np.testing.assert_allclose(np.asarray(ours["prompted"]),
                               tout["prompted_embedding"].detach().numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(float(ours["reduce_sim"]),
                               float(tout["reduce_sim"]), rtol=1e-5)

    # prompt_mask path (task-slice selection, meta_archs.py:759-769)
    mask = np.broadcast_to(np.arange(K, 2 * K)[None], (BB, K)).copy()
    tout = tprompt(torch.from_numpy(x),
                   prompt_mask=torch.from_numpy(mask))
    ours = pool.apply({"params": params}, jnp.asarray(x),
                      prompt_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ours["prompted"]),
                               tout["prompted_embedding"].detach().numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(float(ours["reduce_sim"]),
                               float(tout["reduce_sim"]), rtol=1e-5)


# ------------------------------------------------ narration-SSL InfoNCE

def test_narration_ssl_lockstep(ref, rng, monkeypatch):
    """MemoryBank ring updates (meta_archs.py:38-60) + the masked
    contrastive loss (:1350-1371) with the reference's call-site order
    (:941-943: bank.update BEFORE the loss, so each valid row's own
    detached narration sits among its negatives). Drives both through 4
    batches with varying validity masks, pinning the bank contents, the
    wrap-around pointer, and every loss value."""
    import jax
    import jax.numpy as jnp

    from vilco_tpu.train.engine import _ring_update, narration_ssl_loss

    # the reference hardcodes .cuda() on the bank and the CE labels
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self: self)

    M, D, BB, TEMP = 10, 16, 4, 0.07
    torch.manual_seed(0)
    tbank = ref.modeling.meta_archs.MemoryBank(M, D)
    bank = jnp.asarray(tbank.memory.numpy())
    ptr = jnp.asarray(0, jnp.int32)

    masks = [np.array([1, 1, 0, 1]), np.array([1, 1, 1, 1]),
             np.array([0, 1, 1, 0]), np.array([1, 0, 1, 1])]
    for step_i, mvec in enumerate(masks):
        nf = rng.standard_normal((BB, D)).astype(np.float32)
        vf = rng.standard_normal((BB, D)).astype(np.float32)
        nf /= np.linalg.norm(nf, axis=1, keepdims=True)
        vf /= np.linalg.norm(vf, axis=1, keepdims=True)
        mask_b = mvec.astype(bool)

        # reference call-site order (meta_archs.py:941-943)
        tnf = torch.from_numpy(nf)
        tvf = torch.from_numpy(vf)
        tmask = torch.from_numpy(mask_b)
        tbank.update(tnf[tmask])
        holder = ref.modeling.meta_archs.PtTransformer.__new__(
            ref.modeling.meta_archs.PtTransformer)
        holder.memory_bank = tbank
        t_loss = ref.modeling.meta_archs.PtTransformer.\
            masked_contrastive_loss(holder, tnf, tvf, tmask,
                                    temperature=TEMP)

        ours = narration_ssl_loss(
            jnp.asarray(nf), jnp.asarray(vf), jnp.asarray(mask_b),
            bank, ptr, TEMP)
        np.testing.assert_allclose(float(ours), float(t_loss), rtol=1e-5,
                                   err_msg=f"ssl step {step_i}")

        # advance our persistent bank exactly like the train step does
        bank, ptr = _ring_update(bank, ptr, jnp.asarray(nf),
                                 jnp.asarray(mask_b))
        np.testing.assert_allclose(np.asarray(bank),
                                   tbank.memory.numpy(), atol=1e-7,
                                   err_msg=f"bank step {step_i}")
        assert int(ptr) == tbank.ptr % M, f"ptr step {step_i}"
