"""Shared builder for MQ reference-vs-ours lockstep tests.

Builds the SAME paired setup as test_torch_parity.py's
test_training_trajectory_parity (reference PtTransformer + our
PointTransformer from imported weights, identical batch streams) so the
CL-method locksteps (tests/test_cl_lockstep.py) can drive both stacks
from identical state without re-deriving the config plumbing.

Always use_xl=True: with use_xl=False the reference re-applies the SHARED
stem.0 before the branch (MQ/libs/modeling/backbones.py:276-278), so its
grads sum over both applications while our documented untying splits them
— gradient-based locksteps (EWC/MAS fisher) are only parity-able on the
XL variant.
"""

from __future__ import annotations

import json

import numpy as np
import torch

from vilco_tpu.models.torch_import import (
    load_torch_point_transformer,
    state_dict_to_numpy,
)

# flagship-shaped but tiny (mirrors test_training_trajectory_parity)
E, H, B, T, L, NC, CIN, CTXT = 64, 4, 2, 64, 12, 7, 32, 48
ARCH = (2, 2, 3)
RR = [(0, 4), (2, 8), (4, 16), (8, 10000)]
INIT_NORM, CLIP, LR, WD = 20.0, 1.0, 1e-3, 0.05
SPE, WARM_EP, EPOCHS = 4, 1, 2


def ref_cfg_dicts(cl_overrides=None):
    train_cfg = dict(
        center_sample="radius", center_sample_radius=1.5, loss_weight=1.0,
        cls_prior_prob=0.01, init_loss_norm=INIT_NORM, head_empty_cls=[],
        dropout=0.0, droppath=0.0, label_smoothing=0.0,
        t_c_alpha=0.8, use_dcn=False, dcn_start_layer=-1, use_us_fpn=False,
        al_loss_weight=0.0, cont_loss_weight=0.0, seg_loss_weight=0.0,
        imp_loss_weight=0.0, temperature=0.07, queue_size=256,
        length_theta=0.2, use_trident_head=False, num_bins=16,
        iou_weight_power=1.0)
    test_cfg = dict(
        pre_nms_thresh=0.001, pre_nms_topk=5000, iou_threshold=0.1,
        min_score=0.01, max_seg_num=1000, nms_method="soft", nms_sigma=0.5,
        duration_thresh=0.05, multiclass_nms=True, ext_score_file=None,
        voting_thresh=0.75)
    cl_cfg = dict(
        name=None, memory_size=0, random_order=False, reg_lambda=0,
        type_sampling="icarl", path_memory="m.pkl", adv_lambda=0,
        prompt_pool=False, pool_size=0, topk=4, length=20, embed_dim=768,
        narration_ssl=False, narration_dim=512, ssl_factor=0.01,
        use_adapt=False, adapt_blocks=[])
    if cl_overrides:
        cl_cfg.update(cl_overrides)
    return train_cfg, test_cfg, cl_cfg


def write_xlnet_config(tmp_path):
    """The reference backbone reads configs/xlnet_config_{E}.json from CWD
    (backbones.py:130-135)."""
    (tmp_path / "configs").mkdir(exist_ok=True)
    (tmp_path / "configs" / f"xlnet_config_{E}.json").write_text(
        json.dumps(dict(
            attn_type="bi", bi_data=False, clamp_len=-1, d_head=E // H,
            d_inner=128, d_model=E, dropout=0.0, ff_activation="gelu",
            layer_norm_eps=1e-12, mem_len=256, model_type="xlnet",
            n_head=H, n_layer=1, untie_r=True, reuse_len=None,
            same_length=False, vocab_size=1000)))


def build_ref_model(ref, tmp_path, monkeypatch, cl_overrides=None,
                    seed_std=0.15):
    """Reference PtTransformer with tamed random init (std 0.5 saturates
    the 9-deep residual stack; see test_training_trajectory_parity)."""
    write_xlnet_config(tmp_path)
    monkeypatch.chdir(tmp_path)
    train_cfg, test_cfg, cl_cfg = ref_cfg_dicts(cl_overrides)
    tmodel = ref.modeling.meta_archs.PtTransformer(
        backbone_type="convTransformer", fpn_type="identity", use_xl=True,
        backbone_arch=ARCH, scale_factor=2, input_dim=CIN, max_seq_len=T,
        max_buffer_len_factor=1.0, n_head=H, n_mha_win_size=-1,
        embd_kernel_size=3, embd_dim=E, embd_with_ln=True, fpn_dim=E,
        fpn_with_ln=True, fpn_start_level=0, head_dim=E,
        regression_range=RR, head_num_layers=3, head_kernel_size=3,
        head_with_ln=True, use_abs_pe=True, use_rel_pe=False,
        num_classes=NC, train_cfg=train_cfg, test_cfg=test_cfg,
        cl_cfg=cl_cfg, use_cross_modal=True, n_txt_in=CTXT)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(0.0, seed_std)
        for name, p in tmodel.named_parameters():
            if "sigma" in name:
                p.abs_().add_(0.5)
    tmodel.train()
    return tmodel


def our_config(**model_extra):
    from vilco_tpu.core.config import Config

    model = {"backbone_arch": ARCH, "embd_dim": E, "fpn_dim": E,
             "head_dim": E, "n_head": H, "use_abs_pe": True,
             "use_xl": True, "xl_d_inner": 128, "xl_dropout": 0.0,
             "use_cross_modal": True, "n_txt_in": CTXT,
             "compute_dtype": "float32",
             "regression_range": tuple(tuple(r) for r in RR)}
    model.update(model_extra)
    return Config.from_dict({
        "task": "mq",
        "dataset": {"num_classes": NC, "max_seq_len": T, "input_dim": CIN,
                    "input_txt_dim": CTXT, "max_segments": 3,
                    "use_text": True},
        "model": model,
        "train_cfg": {"droppath": 0.0, "dropout": 0.0,
                      "label_smoothing": 0.0, "al_loss_weight": 0.0,
                      "init_loss_norm": INIT_NORM, "loss_weight": 1.0,
                      "center_sample": "radius",
                      "center_sample_radius": 1.5,
                      "clip_grad_l2norm": CLIP},
        "opt": {"type": "adamw", "learning_rate": LR, "weight_decay": WD,
                "warmup": True, "warmup_epochs": WARM_EP,
                "epochs": EPOCHS, "schedule_type": "cosine",
                "mu_dtype": "float32", "nu_dtype": "float32"},
    }).derived()


def build_our_model(cfg, tmodel, b0):
    """Our PointTransformer with the reference's weights imported."""
    import jax
    import jax.numpy as jnp

    from vilco_tpu.models.point_transformer import PointTransformer

    model = PointTransformer(cfg.model, cfg.cl_cfg)
    tmpl = model.init(jax.random.PRNGKey(0), b0["x"], b0["mask"],
                      text=b0["txt"], text_mask=b0["tmask"],
                      deterministic=True)["params"]
    params = jax.tree.map(jnp.asarray, load_torch_point_transformer(
        state_dict_to_numpy(tmodel), cfg.model, tmpl))
    return model, tmpl, params


def mask_np(n_rows, n_cols, valid):
    m = np.zeros((n_rows, n_cols), bool)
    for b, v in enumerate(valid):
        m[b, :v] = True
    return m


def make_batches(rng, steps, batch_size=B, n_gt=(3, 2)):
    """Identical batch stream both sides. Fully-valid rows only: the
    reference forward is padding-dependent (see
    test_training_trajectory_parity's note), so lockstep inputs must have
    no padding ambiguity."""
    out = []
    for _ in range(steps):
        lens = [T] * batch_size
        txt_lens = [L] * batch_size
        gts = [n_gt[b % len(n_gt)] for b in range(batch_size)]
        NMAX = max(gts)
        x = np.zeros((batch_size, T, CIN), np.float32)
        txt = np.zeros((batch_size, L, CTXT), np.float32)
        mask = mask_np(batch_size, T, lens)
        tmask = mask_np(batch_size, L, txt_lens)
        gt_seg = np.zeros((batch_size, NMAX, 2), np.float32)
        gt_lab = np.zeros((batch_size, NMAX), np.int64)
        gt_valid = np.zeros((batch_size, NMAX), bool)
        video_list = []
        for b, (t_i, l_i, n) in enumerate(zip(lens, txt_lens, gts)):
            x[b, :t_i] = rng.standard_normal((t_i, CIN), dtype=np.float32)
            txt[b, :l_i] = rng.standard_normal((l_i, CTXT),
                                               dtype=np.float32)
            s = rng.uniform(0, t_i - 13, size=n).astype(np.float32)
            e = s + rng.uniform(2, 12, size=n).astype(np.float32)
            gt_seg[b, :n] = np.stack([s, e], 1)
            gt_lab[b, :n] = rng.integers(0, NC, size=n)
            gt_valid[b, :n] = True
            video_list.append(dict(
                video_id=f"v{len(out)}_{b}",
                feats=torch.from_numpy(x[b, :t_i].T.copy()),
                segments=torch.from_numpy(gt_seg[b, :n].copy()),
                labels=torch.from_numpy(gt_lab[b, :n].copy()),
                segmentation_labels=torch.zeros(t_i, NC),
                prompt_feature=torch.from_numpy(txt[b, :l_i].T.copy()),
            ))
        out.append(dict(x=x, txt=txt, mask=mask, tmask=tmask,
                        gt_seg=gt_seg, gt_lab=gt_lab, gt_valid=gt_valid,
                        video_list=video_list))
    return out


def to_jax_batch(bt):
    import jax.numpy as jnp

    return {"feats": jnp.asarray(bt["x"]),
            "mask": jnp.asarray(bt["mask"]),
            "text": jnp.asarray(bt["txt"]),
            "text_mask": jnp.asarray(bt["tmask"]),
            "gt_segments": jnp.asarray(bt["gt_seg"]),
            "gt_labels": jnp.asarray(bt["gt_lab"]),
            "gt_valid": jnp.asarray(bt["gt_valid"])}


def make_points(cfg):
    import jax.numpy as jnp

    from vilco_tpu.models.point_transformer import level_lengths
    from vilco_tpu.ops.assign import generate_points

    return jnp.asarray(generate_points(
        level_lengths(cfg.model), cfg.model.fpn_strides,
        cfg.model.regression_range))
