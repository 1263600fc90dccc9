"""Full inference-path LOCKSTEP against the reference eval chain.

Round-4 item 1 (VERDICT.md): nobody had ever run weights through the
*complete* reference decode chain — per-level pre-NMS threshold/top-k,
offsets->segments (MQ/libs/modeling/meta_archs.py:1594-1692), then
`postprocessing` with the REAL compiled C++ (Soft-)NMS op
(MQ/libs/utils/csrc/nms_cpu.cpp:19-160 via libs/utils/nms.py:103-190) and
grid->seconds conversion — and compared final detections against our jitted
`ops/decode.py::decode_and_nms_batch` + `grid_to_seconds`.

These tests compile the reference's own nms_cpu.cpp here (torch
cpp_extension, cached in .cache/ref_nms_ext), patch it into the loaded
reference `libs.utils.nms` in place of the raising stub from
tests/_reference.py, and pin:

  - the raw C++ ops (hard nms + gaussian soft-NMS) vs our on-device
    `soft_nms_1d` loop;
  - reference `batched_nms` class-agnostic + seg_voting path vs ours;
  - the MQ end-to-end eval chain: reference
    PtTransformer.forward(is_training=False) -> inference_single_video ->
    postprocessing (real C++ soft-NMS, multiclass) vs our model forward ->
    decode_and_nms_batch -> grid_to_seconds on imported weights, plus the
    resulting ANET mAP on both detection sets;
  - the NLQ end-to-end eval chain the same way
    (NLQ/libs/modeling/meta_archs.py:1200-1382).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference import (
    load_reference_mq,
    load_reference_nlq,
)
from tests.test_torch_parity import _mask_np, _np
from vilco_tpu.models.torch_import import (
    load_torch_nlq_point_transformer,
    load_torch_point_transformer,
    state_dict_to_numpy,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def ref_nms_ext():
    """Compile the reference's actual C++ NMS op (nms_cpu.cpp) for this
    host. ~30 s cold, cached in .cache/ref_nms_ext across runs."""
    src = "/root/reference/MQ/libs/utils/csrc/nms_cpu.cpp"
    if not os.path.isfile(src):
        pytest.skip("reference checkout not available")
    from torch.utils.cpp_extension import load

    build_dir = os.path.join(REPO, ".cache", "ref_nms_ext")
    os.makedirs(build_dir, exist_ok=True)
    return load(
        name="nms_1d_cpu_ref", sources=[src],
        extra_cflags=["-fopenmp", "-O2"], extra_ldflags=["-fopenmp"],
        build_directory=build_dir, verbose=False,
    )


@pytest.fixture()
def ref(ref_nms_ext, monkeypatch):
    """Reference MQ libs with the REAL C++ op patched into libs.utils.nms
    (tests/_reference.py stubs it with a raiser by default)."""
    r = load_reference_mq()
    monkeypatch.setattr(r.utils.nms, "nms_1d_cpu", ref_nms_ext)
    return r


@pytest.fixture()
def ref_nlq(ref_nms_ext, monkeypatch):
    r = load_reference_nlq()
    monkeypatch.setattr(r.utils.nms, "nms_1d_cpu", ref_nms_ext)
    return r


@pytest.fixture(autouse=True)
def _exact_gelu():
    from vilco_tpu.ops.activations import exact_gelu

    with exact_gelu():
        yield


# ------------------------------------------------------ raw C++ op parity

def test_soft_nms_vs_cpp_op(ref_nms_ext, rng):
    """Our on-device soft_nms_1d (gaussian) against softnms_1d_cpu
    (nms_cpu.cpp:67-160, method=2) on dense random overlaps."""
    from vilco_tpu.ops.nms import soft_nms_1d

    M = 64
    starts = rng.uniform(0, 40, M).astype(np.float32)
    segs = np.stack([starts, starts + rng.uniform(1, 12, M)], -1)
    segs = segs.astype(np.float32)
    scores = rng.uniform(0.01, 1.0, M).astype(np.float32)

    dets = torch.empty((M, 3))
    inds = ref_nms_ext.softnms(
        torch.from_numpy(segs), torch.from_numpy(scores), dets,
        iou_threshold=0.1, sigma=0.5, min_score=0.01, method=2)
    n = len(inds)
    ref_rows = dets[:n].numpy()

    res = soft_nms_1d(
        segs, scores, np.ones(M, bool), max_out=M,
        iou_threshold=0.1, sigma=0.5, min_score=0.01, method="gaussian")
    got_segs = np.asarray(res.segs)[np.asarray(res.valid)]
    got_scores = np.asarray(res.scores)[np.asarray(res.valid)]
    assert got_segs.shape[0] == n
    np.testing.assert_allclose(got_segs, ref_rows[:, :2], atol=1e-5)
    np.testing.assert_allclose(got_scores, ref_rows[:, 2], atol=1e-5)


def test_hard_nms_vs_cpp_op(ref_nms_ext, rng):
    """Our method='hard' loop against nms_1d_cpu (nms_cpu.cpp:19-58)."""
    from vilco_tpu.ops.nms import soft_nms_1d

    M = 64
    starts = rng.uniform(0, 40, M).astype(np.float32)
    segs = np.stack([starts, starts + rng.uniform(1, 12, M)], -1)
    segs = segs.astype(np.float32)
    scores = rng.uniform(0.01, 1.0, M).astype(np.float32)

    inds = ref_nms_ext.nms(
        torch.from_numpy(segs), torch.from_numpy(scores),
        iou_threshold=0.3).numpy()

    res = soft_nms_1d(
        segs, scores, np.ones(M, bool), max_out=M,
        iou_threshold=0.3, min_score=0.0, method="hard")
    valid = np.asarray(res.valid)
    np.testing.assert_allclose(np.asarray(res.segs)[valid], segs[inds],
                               atol=0)
    np.testing.assert_allclose(np.asarray(res.scores)[valid], scores[inds],
                               atol=0)


def test_class_agnostic_voting_vs_reference(ref, rng):
    """Reference batched_nms class-agnostic path — real C++ soft-NMS
    followed by seg_voting (nms.py:163-190) — vs ours end to end."""
    from vilco_tpu.ops.nms import batched_nms

    M, K = 80, 20
    starts = rng.uniform(0, 50, M).astype(np.float32)
    segs = np.stack([starts, starts + rng.uniform(1, 10, M)], -1)
    segs = segs.astype(np.float32)
    scores = rng.uniform(0.01, 1.0, M).astype(np.float32)
    cls = np.zeros(M, np.int64)

    t_segs, t_scores, t_cls = ref.utils.nms.batched_nms(
        torch.from_numpy(segs), torch.from_numpy(scores),
        torch.from_numpy(cls), iou_threshold=0.1, min_score=0.001,
        max_seg_num=K, use_soft_nms=True, multiclass=False, sigma=0.9,
        voting_thresh=0.75)

    det = batched_nms(
        segs, scores, cls.astype(np.int32), np.ones(M, bool),
        num_classes=1, max_seg_num=K, iou_threshold=0.1, min_score=0.001,
        nms_sigma=0.9, voting_thresh=0.75, use_soft_nms=True,
        multiclass=False)
    valid = np.asarray(det.valid)
    got = np.asarray(det.segs)[valid], np.asarray(det.scores)[valid]
    assert got[0].shape[0] == t_segs.shape[0]
    np.testing.assert_allclose(got[0], _np(t_segs), atol=1e-4)
    np.testing.assert_allclose(got[1], _np(t_scores), atol=1e-5)


# ------------------------------------------------- full-chain MQ lockstep

def _sorted_dets(segs, scores, labels):
    order = np.argsort(-scores, kind="stable")
    return segs[order], scores[order], labels[order]


def _assert_dets_match(g_segs, g_scores, g_labels, t_segs, t_scores,
                       t_labels, *, seg_atol, score_atol, msg):
    """One-to-one matched-set detection comparison.

    Greedy soft-NMS decays chain the pick order through every score, so two
    forwards that agree to ~1e-4 can swap near-tie picks and land the same
    detections at slightly different list positions; an element-wise sorted
    compare is brittle there. Instead require a perfect matching: every
    reference detection must have exactly one unmatched counterpart with the
    same label, segment within seg_atol and score within score_atol."""
    assert g_segs.shape[0] == t_segs.shape[0], msg
    used = np.zeros(len(g_scores), bool)
    for i in range(len(t_scores)):
        ok = (
            ~used
            & (np.asarray(g_labels) == t_labels[i])
            & (np.abs(g_scores - t_scores[i]) <= score_atol)
            & (np.abs(g_segs - t_segs[i]).max(-1) <= seg_atol)
        )
        j = int(np.argmax(ok))
        if not ok.any():
            same = np.asarray(g_labels) == t_labels[i]
            near = np.argsort(np.abs(g_scores - t_scores[i]))[:3]
            raise AssertionError(
                f"{msg}: no match for ref det {i} seg={t_segs[i]} "
                f"score={t_scores[i]} label={t_labels[i]}; nearest ours: "
                + "; ".join(
                    f"seg={g_segs[k]} score={g_scores[k]} "
                    f"label={g_labels[k]} used={used[k]}" for k in near))
        used[j] = True


def test_mq_inference_chain_lockstep(ref, rng):
    """Weights-imported MQ eval-path lockstep: the reference's complete
    forward(is_training=False) -> inference_single_video (per-level
    threshold/top-k/duration filter) -> postprocessing (real C++ gaussian
    soft-NMS per class + grid->seconds, meta_archs.py:1526-1736) vs our
    forward -> decode_and_nms_batch -> grid_to_seconds; detections pinned
    to float tolerance and ANET mAP pinned equal on both sets."""
    import jax
    import jax.numpy as jnp

    from vilco_tpu.core.config import Config
    from vilco_tpu.evals.anet_map import ANETDetection
    from vilco_tpu.models.point_transformer import (
        PointTransformer,
        level_lengths,
    )
    from vilco_tpu.ops.assign import generate_points
    from vilco_tpu.ops.decode import decode_and_nms_batch, grid_to_seconds

    E, H, T, L, NC, CIN, CTXT = 64, 4, 64, 12, 7, 32, 48
    arch = (2, 2, 3)
    rr = [(0, 4), (2, 8), (4, 16), (8, 10000)]
    NVID = 3
    FPS, STRIDE_S, NFRAMES = 1.875, 16.0, 32.0
    DURATION = 600.0

    # flagship mq_vilco.yaml test_cfg (pre_nms_topk shrunk to cover
    # every candidate on both sides, making per-level vs global top-k
    # provably identical; max_seg_num shrunk for the 1-core host)
    test_cfg = dict(
        pre_nms_thresh=0.001, pre_nms_topk=5000, iou_threshold=0.1,
        min_score=0.0001, max_seg_num=40, nms_method="soft",
        nms_sigma=0.99, duration_thresh=0.01, multiclass_nms=True,
        ext_score_file=None, voting_thresh=0.9)
    train_cfg = dict(
        center_sample="radius", center_sample_radius=1.5, loss_weight=1.0,
        cls_prior_prob=0.01, init_loss_norm=100, head_empty_cls=[],
        dropout=0.0, droppath=0.0, label_smoothing=0.0, t_c_alpha=0.8,
        use_dcn=False, dcn_start_layer=-1, use_us_fpn=False,
        al_loss_weight=0.0, cont_loss_weight=0.0, seg_loss_weight=0.0,
        imp_loss_weight=0.0, temperature=0.07, queue_size=256,
        length_theta=0.2, use_trident_head=False, num_bins=16,
        iou_weight_power=1.0)
    cl_cfg = dict(
        name=None, memory_size=0, random_order=False, reg_lambda=0,
        type_sampling="icarl", path_memory="m.pkl", adv_lambda=0,
        prompt_pool=False, pool_size=0, topk=4, length=20, embed_dim=768,
        narration_ssl=False, narration_dim=512, ssl_factor=0.01,
        use_adapt=False, adapt_blocks=[])

    tmodel = ref.modeling.meta_archs.PtTransformer(
        backbone_type="convTransformer", fpn_type="identity", use_xl=False,
        backbone_arch=arch, scale_factor=2, input_dim=CIN, max_seq_len=T,
        max_buffer_len_factor=1.0, n_head=H, n_mha_win_size=-1,
        embd_kernel_size=3, embd_dim=E, embd_with_ln=True, fpn_dim=E,
        fpn_with_ln=True, fpn_start_level=0, head_dim=E,
        regression_range=rr, head_num_layers=3, head_kernel_size=3,
        head_with_ln=True, use_abs_pe=True, use_rel_pe=False,
        num_classes=NC, train_cfg=train_cfg, test_cfg=test_cfg,
        cl_cfg=cl_cfg, use_cross_modal=True, n_txt_in=CTXT)
    # std 0.5 saturates the cls sigmoid (every candidate ~0.99) — dense
    # near-ties where 1e-4 f32 forward drift flips greedy NMS order; the
    # trajectory test's tamer 0.15 keeps scores spread. Seeded: near-tie
    # pick-divergence risk is seed-dependent.
    torch.manual_seed(7)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(0.0, 0.15)
    tmodel.eval()

    # per-video fixture batch (reference eval asserts batch_size == 1,
    # meta_archs.py:1161 — loop singleton lists)
    vids = []
    for v in range(NVID):
        t_len = [T, 48, 57][v]
        l_len = [L, 7, 9][v]
        x = rng.standard_normal((t_len, CIN), dtype=np.float32)
        txt = rng.standard_normal((l_len, CTXT), dtype=np.float32)
        n = 2
        s = rng.uniform(0, t_len - 13, size=n).astype(np.float32)
        e = s + rng.uniform(2, 12, size=n).astype(np.float32)
        lab = rng.integers(0, NC, size=n)
        vids.append(dict(x=x, txt=txt, t_len=t_len, l_len=l_len,
                         gt_seg=np.stack([s, e], 1), gt_lab=lab,
                         video_id=f"v{v}"))

    t_results = []
    for v in vids:
        video_list = [dict(
            video_id=v["video_id"], fps=FPS, duration=DURATION,
            feat_stride=STRIDE_S, feat_num_frames=NFRAMES,
            feats=torch.from_numpy(v["x"].T.copy()),
            segments=torch.from_numpy(v["gt_seg"].copy()),
            labels=torch.from_numpy(v["gt_lab"].copy()),
            segmentation_labels=torch.zeros(v["t_len"], NC),
            prompt_feature=torch.from_numpy(v["txt"].T.copy()),
        )]
        with torch.no_grad():
            out = tmodel(video_list, is_training=False)
        t_results.append(out[0])

    # ---- ours: batched static-shape forward + jitted decode
    cfg = Config.from_dict({
        "task": "mq",
        "dataset": {"num_classes": NC, "max_seq_len": T, "input_dim": CIN,
                    "input_txt_dim": CTXT, "max_segments": 2,
                    "use_text": True},
        "model": {"backbone_arch": arch, "embd_dim": E, "fpn_dim": E,
                  "head_dim": E, "n_head": H, "use_abs_pe": True,
                  "use_xl": False, "use_cross_modal": True,
                  "n_txt_in": CTXT, "compute_dtype": "float32",
                  "regression_range": tuple(tuple(r) for r in rr)},
        "train_cfg": {"droppath": 0.0, "dropout": 0.0},
        "test_cfg": test_cfg,
    }).derived()
    model = PointTransformer(cfg.model, cfg.cl_cfg)
    B = NVID
    x = np.zeros((B, T, CIN), np.float32)
    txt = np.zeros((B, L, CTXT), np.float32)
    mask = _mask_np(B, T, [v["t_len"] for v in vids])
    tmask = _mask_np(B, L, [v["l_len"] for v in vids])
    for b, v in enumerate(vids):
        x[b, :v["t_len"]] = v["x"]
        txt[b, :v["l_len"]] = v["txt"]
    tmpl = model.init(jax.random.PRNGKey(0), x, mask, text=txt,
                      text_mask=tmask, deterministic=True)["params"]
    params = load_torch_point_transformer(
        state_dict_to_numpy(tmodel), cfg.model, tmpl)
    out = model.apply({"params": params}, x, mask, text=txt,
                      text_mask=tmask, deterministic=True)

    points = jnp.asarray(generate_points(
        level_lengths(cfg.model), cfg.model.fpn_strides,
        cfg.model.regression_range))
    det = decode_and_nms_batch(
        points, out["cls_logits"], out["offsets"], out["fpn_mask"],
        jnp.ones((NC,), bool),
        num_classes=NC,
        pre_nms_topk=test_cfg["pre_nms_topk"],
        pre_nms_thresh=test_cfg["pre_nms_thresh"],
        duration_thresh=test_cfg["duration_thresh"],
        max_seg_num=test_cfg["max_seg_num"],
        iou_threshold=test_cfg["iou_threshold"],
        min_score=test_cfg["min_score"],
        nms_sigma=test_cfg["nms_sigma"],
        voting_thresh=test_cfg["voting_thresh"],
        use_soft_nms=True, multiclass=True)
    secs = np.asarray(grid_to_seconds(
        det.segs, STRIDE_S, NFRAMES, FPS, DURATION))

    ours_pred = {"video-id": [], "t-start": [], "t-end": [], "label": [],
                 "score": []}
    ref_pred = {"video-id": [], "t-start": [], "t-end": [], "label": [],
                "score": []}
    for b, (v, tr) in enumerate(zip(vids, t_results)):
        valid = np.asarray(det.valid[b])
        g_segs = secs[b][valid]
        g_scores = np.asarray(det.scores[b])[valid]
        g_labels = np.asarray(det.labels[b])[valid]
        t_segs = _np(tr["segments"])
        t_scores = _np(tr["scores"])
        t_labels = _np(tr["labels"])

        gs, gsc, gl = _sorted_dets(g_segs, g_scores, g_labels)
        ts, tsc, tl = _sorted_dets(t_segs, t_scores, t_labels)
        _assert_dets_match(gs, gsc, gl, ts, tsc, tl,
                           seg_atol=5e-2, score_atol=3e-4,
                           msg=v["video_id"])

        for store, (ss, cc, ll) in ((ours_pred, (gs, gsc, gl)),
                                    (ref_pred, (ts, tsc, tl))):
            store["video-id"] += [v["video_id"]] * len(ss)
            store["t-start"] += list(ss[:, 0])
            store["t-end"] += list(ss[:, 1])
            store["label"] += list(np.asarray(ll, np.int64))
            store["score"] += list(cc)

    # identical mAP through the metric engine on synthetic seconds GT
    gt = {"video-id": [], "t-start": [], "t-end": [], "label": []}
    for v in vids:
        seg_s = (v["gt_seg"] * STRIDE_S + 0.5 * NFRAMES) / FPS
        gt["video-id"] += [v["video_id"]] * len(v["gt_lab"])
        gt["t-start"] += list(seg_s[:, 0])
        gt["t-end"] += list(seg_s[:, 1])
        gt["label"] += list(v["gt_lab"])
    evaluator = ANETDetection(gt)
    _, ours_map = evaluator.evaluate(ours_pred)
    _, ref_map = evaluator.evaluate(ref_pred)
    # near-tie rank swaps (see _assert_dets_match) can nudge AP by a hair
    np.testing.assert_allclose(ours_map, ref_map, atol=2e-3)


# ------------------------------------------------ full-chain NLQ lockstep

def test_nlq_inference_chain_lockstep(ref_nlq, rng, monkeypatch):
    """Weights-imported NLQ eval-path lockstep vs the reference decode
    (NLQ/libs/modeling/meta_archs.py:1200-1382): dual-tower eval forward,
    per-level top-k decode, real C++ soft-NMS (single class),
    grid->seconds — against our variant='nlq' forward + jitted decode."""
    import jax
    import jax.numpy as jnp

    from vilco_tpu.core.config import Config
    from vilco_tpu.models.point_transformer import (
        PointTransformer,
        level_lengths,
    )
    from vilco_tpu.ops.assign import generate_points
    from vilco_tpu.ops.decode import decode_and_nms_batch, grid_to_seconds

    E, H, T, L, NC, CIN, CTXT = 32, 4, 64, 8, 1, 16, 24
    arch = (2, 1, 1, 0, 3)
    WIN = 9
    rr = [(0, 4), (2, 8), (4, 16), (8, 10000)]
    FPS, STRIDE_S, NFRAMES = 1.875, 16.0, 16.0
    DURATION = 480.0
    NVID = 2

    # the shipped NLQ CL config's test_cfg (max_seg_num=5)
    test_cfg = dict(
        pre_nms_thresh=0.001, pre_nms_topk=2000, iou_threshold=0.1,
        min_score=0.001, max_seg_num=5, nms_method="soft", nms_sigma=0.75,
        duration_thresh=0.001, multiclass_nms=True, ext_score_file=None,
        voting_thresh=0.9)
    train_cfg = dict(
        center_sample="radius", center_sample_radius=1.5, loss_weight=1.0,
        cls_prior_prob=0.01, init_loss_norm=100, head_empty_cls=[],
        dropout=0.0, droppath=0.0, label_smoothing=0.0)
    cl_cfg = dict(
        name=None, memory_size=0, type_sampling="icarl", adv_lambda=0,
        prompt_pool=False, pool_size=0, topk=4, length=20, embed_dim=768,
        narration_ssl=False, narration_dim=512, ssl_factor=0.01,
        use_adapter=False, adapt_blocks=[])

    tmodel = ref_nlq.modeling.meta_archs.PtTransformer(
        backbone_type="convTransformer", fpn_type="identity",
        backbone_arch=arch, scale_factor=2, input_vid_dim=CIN,
        input_txt_dim=CTXT, max_seq_len=T, max_buffer_len_factor=1.0,
        n_head=H, n_mha_win_size=WIN, embd_kernel_size=3, embd_dim=E,
        embd_with_ln=True, fpn_dim=E, fpn_with_ln=True, fpn_start_level=0,
        head_dim=E, regression_range=rr, head_num_layers=3,
        head_kernel_size=3, head_with_ln=True, use_abs_pe=True,
        use_rel_pe=False, num_classes=NC, train_cfg=train_cfg,
        test_cfg=test_cfg, cl_cfg=cl_cfg)
    monkeypatch.setattr(type(tmodel), "device",
                        property(lambda s: torch.device("cpu")))
    torch.manual_seed(7)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(0.0, 0.15)   # see the MQ test: keep sigmoids spread
    tmodel.eval()

    vids = []
    for v in range(NVID):
        t_len = [T, 44][v]
        l_len = [L, 5][v]
        vids.append(dict(
            x=rng.standard_normal((t_len, CIN), dtype=np.float32),
            txt=rng.standard_normal((l_len, CTXT), dtype=np.float32),
            t_len=t_len, l_len=l_len, video_id=f"v{v}"))

    t_results = []
    for v in vids:
        video_list = [dict(
            video_id=v["video_id"], fps=FPS, duration=DURATION,
            feat_stride=STRIDE_S, feat_num_frames=NFRAMES,
            feats=torch.from_numpy(v["x"].T.copy()),
            query_feats=torch.from_numpy(v["txt"].T.copy()),
            segments=None, one_hot_labels=None,
        )]
        with torch.no_grad():
            out = tmodel(video_list, is_training=False)
        t_results.append(out[0])

    cfg = Config.from_dict({
        "task": "nlq",
        "dataset": {"num_classes": NC, "max_seq_len": T, "input_dim": CIN,
                    "input_txt_dim": CTXT, "max_segments": 2,
                    "use_text": True},
        "model": {"variant": "nlq", "backbone_arch": arch, "embd_dim": E,
                  "fpn_dim": E, "head_dim": E, "n_head": H,
                  "n_mha_win_size": WIN, "use_abs_pe": True,
                  "use_cross_modal": True, "n_txt_in": CTXT,
                  "compute_dtype": "float32",
                  "regression_range": tuple(tuple(r) for r in rr)},
        "train_cfg": {"droppath": 0.0, "dropout": 0.0},
        "test_cfg": test_cfg,
    }).derived()
    model = PointTransformer(cfg.model, cfg.cl_cfg)
    B = NVID
    x = np.zeros((B, T, CIN), np.float32)
    txt = np.zeros((B, L, CTXT), np.float32)
    mask = _mask_np(B, T, [v["t_len"] for v in vids])
    tmask = _mask_np(B, L, [v["l_len"] for v in vids])
    for b, v in enumerate(vids):
        x[b, :v["t_len"]] = v["x"]
        txt[b, :v["l_len"]] = v["txt"]
    tmpl = model.init(jax.random.PRNGKey(0), x, mask, text=txt,
                      text_mask=tmask, deterministic=True)["params"]
    params = load_torch_nlq_point_transformer(
        state_dict_to_numpy(tmodel), cfg.model, tmpl)
    out = model.apply({"params": params}, x, mask, text=txt,
                      text_mask=tmask, deterministic=True)

    points = jnp.asarray(generate_points(
        level_lengths(cfg.model), cfg.model.fpn_strides,
        cfg.model.regression_range))
    det = decode_and_nms_batch(
        points, out["cls_logits"], out["offsets"], out["fpn_mask"],
        jnp.ones((NC,), bool),
        num_classes=NC,
        pre_nms_topk=test_cfg["pre_nms_topk"],
        pre_nms_thresh=test_cfg["pre_nms_thresh"],
        duration_thresh=test_cfg["duration_thresh"],
        max_seg_num=test_cfg["max_seg_num"],
        iou_threshold=test_cfg["iou_threshold"],
        min_score=test_cfg["min_score"],
        nms_sigma=test_cfg["nms_sigma"],
        voting_thresh=test_cfg["voting_thresh"],
        use_soft_nms=True, multiclass=True)
    secs = np.asarray(grid_to_seconds(
        det.segs, STRIDE_S, NFRAMES, FPS, DURATION))

    for b, (v, tr) in enumerate(zip(vids, t_results)):
        valid = np.asarray(det.valid[b])
        g_segs = secs[b][valid]
        g_scores = np.asarray(det.scores[b])[valid]
        t_segs = _np(tr["segments"])
        t_scores = _np(tr["scores"])
        gs, gsc, _ = _sorted_dets(g_segs, g_scores, g_scores)
        ts, tsc, _ = _sorted_dets(t_segs, t_scores, t_scores)
        # one grid unit is STRIDE_S/FPS = 8.53 s here; 0.2 s = 0.023 grid
        # units of offset-head drift
        _assert_dets_match(gs, gsc, np.zeros(len(gsc)), ts, tsc,
                           np.zeros(len(tsc)), seg_atol=0.2,
                           score_atol=3e-4, msg=v["video_id"])
