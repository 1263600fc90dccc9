"""Import reference (torch) PtTransformer checkpoints into Flax params.

Maps a torch ``state_dict`` of the reference MQ meta-arch
(MQ/libs/modeling/meta_archs.py:351 ``PtTransformer``, backbone
``ConvTransformerBackbone`` backbones.py:11, blocks blocks.py) onto the
parameter tree of :class:`vilco_tpu.models.point_transformer.PointTransformer`.

Layout translations (torch -> flax):
  Conv1d weight   (Cout, Cin/g, K) -> (K, Cin/g, Cout)
  Conv1d 1x1      (Cout, Cin, 1)   -> Dense kernel (Cin, Cout)
  Linear weight   (Cout, Cin)      -> Dense kernel (Cin, Cout)
  channel LayerNorm (1, C, 1)      -> (C,)
  AffineDropPath scale (1, C, 1)   -> (1, 1, C)
  XLNet rel-attn q/k/v/r/o         -> identical (d_model, H, D)

Documented parameter-sharing quirks of the reference that the import
reproduces by copying (the rebuild unties them; PARITY.md):
  - ``drop_path_attn`` is applied to BOTH the self-attn and the cross-attn
    residual (blocks.py:567,573) -> our TransformerBlock shares the same
    AffineDropPath module for both;
  - with ``use_xl=False`` the backbone re-applies ``stem.0`` before the
    branch (backbones.py:276-278) -> copied into our ``pre_branch``;
  - ``ln3`` is shared between the cross query and cross memory; both repos
    share it, no action needed.

Use :func:`load_torch_point_transformer` with a params template from
``model.init`` — every leaf of the template must be matched by a state-dict
entry (missing/mismatched leaves raise), which is what makes this usable as
a numeric-parity harness (tests/test_torch_parity.py).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Tuple

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


def _dense_from_conv1x1(w: np.ndarray) -> np.ndarray:
    return np.transpose(w[:, :, 0])


def _dense_from_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def _chan(w: np.ndarray) -> np.ndarray:
    return np.reshape(w, (-1,))


def _adp(w: np.ndarray) -> np.ndarray:          # AffineDropPath scale
    return np.transpose(w, (0, 2, 1))


def _id(w: np.ndarray) -> np.ndarray:
    return np.asarray(w)


def _squeeze1(w: np.ndarray) -> np.ndarray:     # (C, 1) -> (C,)
    return np.reshape(w, (-1,))


def _scalar(w: np.ndarray) -> np.ndarray:
    return np.reshape(w, ())


# ---------------------------------------------------------------- block map

def _block_rules(ref: str) -> Dict[str, Tuple[str, Callable]]:
    """Leaf-path -> (ref state_dict key, transform) inside a
    TransformerBlock (ours) given the reference module prefix `ref`."""
    r: Dict[str, Tuple[str, Callable]] = {}
    for ln in ("ln1", "ln2", "ln3"):
        r[f"{ln}/weight"] = (f"{ref}.{ln}.weight", _chan)
        r[f"{ln}/bias"] = (f"{ref}.{ln}.bias", _chan)
    for n in ("query", "key", "value"):
        r[f"attn/{n}_conv/kernel"] = (f"{ref}.attn.{n}_conv.conv.weight",
                                      _conv_w)
        r[f"attn/{n}_norm/weight"] = (f"{ref}.attn.{n}_norm.weight", _chan)
        r[f"attn/{n}_norm/bias"] = (f"{ref}.attn.{n}_norm.bias", _chan)
        r[f"attn/{n}/kernel"] = (f"{ref}.attn.{n}.weight", _dense_from_conv1x1)
        r[f"attn/{n}/bias"] = (f"{ref}.attn.{n}.bias", _id)
        r[f"cross_attn/{n}/kernel"] = (f"{ref}.cross_attn.{n}.weight",
                                       _dense_from_conv1x1)
        r[f"cross_attn/{n}/bias"] = (f"{ref}.cross_attn.{n}.bias", _id)
    r["attn/proj/kernel"] = (f"{ref}.attn.proj.weight", _dense_from_conv1x1)
    r["attn/proj/bias"] = (f"{ref}.attn.proj.bias", _id)
    r["cross_attn/proj/kernel"] = (f"{ref}.cross_attn.proj.weight",
                                   _dense_from_conv1x1)
    r["cross_attn/proj/bias"] = (f"{ref}.cross_attn.proj.bias", _id)
    # FFN: reference mlp = Sequential(Conv1d, GELU, Dropout, Conv1d, Dropout)
    r["mlp_fc1/kernel"] = (f"{ref}.mlp.0.weight", _dense_from_conv1x1)
    r["mlp_fc1/bias"] = (f"{ref}.mlp.0.bias", _id)
    r["mlp_fc2/kernel"] = (f"{ref}.mlp.3.weight", _dense_from_conv1x1)
    r["mlp_fc2/bias"] = (f"{ref}.mlp.3.bias", _id)
    r["drop_path_attn/scale"] = (f"{ref}.drop_path_attn.scale", _adp)
    r["drop_path_mlp/scale"] = (f"{ref}.drop_path_mlp.scale", _adp)
    # channel block (reference ChannelBlock: norm1 exists but is unused)
    r["channel_attn/qkv/kernel"] = (f"{ref}.channel_attn.attn.qkv.weight",
                                    _dense_from_linear)
    r["channel_attn/proj/kernel"] = (f"{ref}.channel_attn.attn.proj.weight",
                                     _dense_from_linear)
    r["channel_attn/proj/bias"] = (f"{ref}.channel_attn.attn.proj.bias", _id)
    r["channel_attn/norm2/scale"] = (f"{ref}.channel_attn.norm2.weight", _id)
    r["channel_attn/norm2/bias"] = (f"{ref}.channel_attn.norm2.bias", _id)
    r["channel_attn/mlp_fc1/kernel"] = (f"{ref}.channel_attn.mlp.0.weight",
                                        _dense_from_linear)
    r["channel_attn/mlp_fc1/bias"] = (f"{ref}.channel_attn.mlp.0.bias", _id)
    r["channel_attn/mlp_fc2/kernel"] = (f"{ref}.channel_attn.mlp.2.weight",
                                        _dense_from_linear)
    r["channel_attn/mlp_fc2/bias"] = (f"{ref}.channel_attn.mlp.2.bias", _id)
    return r


def _xl_rules(ref: str) -> Dict[str, Tuple[str, Callable]]:
    """Leaf map for one XLRelAttention layer <- HF XLNetLayer
    (reference modeling_xlnet_x.py: rel_attn + ff)."""
    r: Dict[str, Tuple[str, Callable]] = {}
    for n in ("q", "k", "v", "r", "o"):
        r[n] = (f"{ref}.rel_attn.{n}", _id)
    r["r_w_bias"] = (f"{ref}.rel_attn.r_w_bias", _id)
    r["r_r_bias"] = (f"{ref}.rel_attn.r_r_bias", _id)
    # segment-attention params exist only when the layer is driven with
    # seg_ids; extra rules are ignored for templates without them
    r["r_s_bias"] = (f"{ref}.rel_attn.r_s_bias", _id)
    r["seg_embed"] = (f"{ref}.rel_attn.seg_embed", _id)
    r["ln_attn/scale"] = (f"{ref}.rel_attn.layer_norm.weight", _id)
    r["ln_attn/bias"] = (f"{ref}.rel_attn.layer_norm.bias", _id)
    r["ff1/kernel"] = (f"{ref}.ff.layer_1.weight", _dense_from_linear)
    r["ff1/bias"] = (f"{ref}.ff.layer_1.bias", _id)
    r["ff2/kernel"] = (f"{ref}.ff.layer_2.weight", _dense_from_linear)
    r["ff2/bias"] = (f"{ref}.ff.layer_2.bias", _id)
    r["ln_ff/scale"] = (f"{ref}.ff.layer_norm.weight", _id)
    r["ln_ff/bias"] = (f"{ref}.ff.layer_norm.bias", _id)
    return r


def _masked_conv_rules(ours: str, ref: str) -> Dict[str, Tuple[str, Callable]]:
    return {
        f"{ours}/kernel": (f"{ref}.conv.weight", _conv_w),
        f"{ours}/bias": (f"{ref}.conv.bias", _id),
    }


def _cln_rules(ours: str, ref: str) -> Dict[str, Tuple[str, Callable]]:
    return {
        f"{ours}/weight": (f"{ref}.weight", _chan),
        f"{ours}/bias": (f"{ref}.bias", _chan),
    }


def _prefix(rules: Dict[str, Tuple[str, Callable]],
            p: str) -> Dict[str, Tuple[str, Callable]]:
    return {f"{p}/{k}": v for k, v in rules.items()}


def point_transformer_rules(use_xl: bool, xl_layers: int = 1,
                            n_branch: int = 0, n_stem: int = 0,
                            n_convs: int = 0, n_levels: int = 0,
                            head_layers: int = 3,
                            use_cross_modal: bool = False,
                            ) -> Dict[str, Tuple[str, Callable]]:
    """Full leaf map for PointTransformer <- reference PtTransformer."""
    r: Dict[str, Tuple[str, Callable]] = {}
    bb = "backbone"
    for i in range(n_convs):
        r.update(_prefix(_masked_conv_rules(f"embd_{i}",
                                            f"{bb}.embd.{i}"), bb))
        r.update(_prefix(_cln_rules(f"embd_norm_{i}",
                                    f"{bb}.embd_norm.{i}"), bb))
        if use_cross_modal:
            r.update(_prefix(_masked_conv_rules(
                f"txt_embd_{i}", f"{bb}.txt_embd.{i}"), bb))
            r.update(_prefix(_cln_rules(
                f"txt_embd_norm_{i}", f"{bb}.txt_embd_norm.{i}"), bb))
    for i in range(n_stem):
        r.update(_prefix(_block_rules(f"{bb}.stem.{i}"), f"{bb}/stem_{i}"))
        if use_cross_modal:
            r.update(_prefix(_block_rules(f"{bb}.txt_stem.{i}"),
                             f"{bb}/txt_stem_{i}"))
    if use_xl:
        for i in range(xl_layers):
            r.update(_prefix(_xl_rules(f"{bb}.xlnet.layer.{i}"),
                             f"{bb}/xl_{i}"))
    else:
        # reference re-applies stem.0 pre-branch (backbones.py:276-278)
        r.update(_prefix(_block_rules(f"{bb}.stem.0"), f"{bb}/pre_branch"))
    for i in range(n_branch):
        r.update(_prefix(_block_rules(f"{bb}.branch.{i}"),
                         f"{bb}/branch_{i}"))
    for i in range(n_levels):
        r.update(_prefix(_cln_rules(f"norm_{i}", f"neck.fpn_norms.{i}"),
                         "neck"))
    for i in range(head_layers - 1):
        r.update(_prefix(_masked_conv_rules(
            f"head_{i}", f"cls_head.head.{i}"), "cls_head"))
        r.update(_prefix(_cln_rules(f"norm_{i}", f"cls_head.norm.{i}"),
                         "cls_head"))
        r.update(_prefix(_masked_conv_rules(
            f"head_{i}", f"reg_head.head.{i}"), "reg_head"))
        r.update(_prefix(_cln_rules(f"norm_{i}", f"reg_head.norm.{i}"),
                         "reg_head"))
    r.update(_prefix(_masked_conv_rules("cls", "cls_head.cls_head"),
                     "cls_head"))
    r.update(_prefix(_masked_conv_rules("offset", "reg_head.offset_head"),
                     "reg_head"))
    for l in range(n_levels):
        r[f"reg_head/scale_{l}/scale"] = (f"reg_head.scale.{l}.scale",
                                          _scalar)
    for n in ("mu", "sigma", "mu_reg_left", "sigma_reg_left",
              "mu_reg_right", "sigma_reg_right"):
        r[n] = (n, _squeeze1)
    return r


def dual_tower_rules(n_convs: int, n_txt_stem: int, n_vid_stem: int,
                     n_branch: int) -> Dict[str, Tuple[str, Callable]]:
    """Leaf map for DualTowerBackbone <- the reference NLQ
    ConvTransformerBackbone (NLQ/libs/modeling/backbones.py:409-614):
    vid/txt conv embeds, txt self-attn stem, cross-modal vid stem,
    strided branch. NLQ blocks have no channel attention, so the
    channel_attn entries of _block_rules simply go unused."""
    r: Dict[str, Tuple[str, Callable]] = {}
    for i in range(n_convs):
        r.update(_masked_conv_rules(f"vid_embd_{i}", f"vid_embd.{i}"))
        r.update(_cln_rules(f"vid_embd_norm_{i}", f"vid_embd_norm.{i}"))
        r.update(_masked_conv_rules(f"txt_embd_{i}", f"txt_embd.{i}"))
        r.update(_cln_rules(f"txt_embd_norm_{i}", f"txt_embd_norm.{i}"))
    for i in range(n_txt_stem):
        r.update(_prefix(_block_rules(f"txt_stem.{i}"), f"txt_stem_{i}"))
    for i in range(n_vid_stem):
        r.update(_prefix(_block_rules(f"vid_stem.{i}"), f"vid_stem_{i}"))
    for i in range(n_branch):
        r.update(_prefix(_block_rules(f"branch.{i}"), f"branch_{i}"))
    return r


def nlq_point_transformer_rules(arch, n_levels: int, head_layers: int = 3,
                                ) -> Dict[str, Tuple[str, Callable]]:
    """Full leaf map for ``PointTransformer(variant='nlq')`` <- the
    reference NLQ PtTransformer (NLQ/libs/modeling/meta_archs.py:340):
    the DualTowerBackbone map under the ``backbone.`` prefix plus the
    neck norms, cls/reg heads, and per-level scales (identical layout to
    the MQ meta-arch). The reference NLQ model has no learnable label
    Gaussians — our model's (unused at use_gaussian_weights=False)
    mu/sigma params are left at init via ``allowed_missing``."""
    n_convs, n_txt_stem, n_vid_stem = arch[0], arch[1], arch[2]
    n_branch = arch[3] + arch[4]
    r = {
        k: (f"backbone.{key}", tf)
        for k, (key, tf) in _prefix(
            dual_tower_rules(n_convs, n_txt_stem, n_vid_stem, n_branch),
            "backbone").items()
    }
    for i in range(n_levels):
        r.update(_prefix(_cln_rules(f"norm_{i}", f"neck.fpn_norms.{i}"),
                         "neck"))
    for i in range(head_layers - 1):
        r.update(_prefix(_masked_conv_rules(
            f"head_{i}", f"cls_head.head.{i}"), "cls_head"))
        r.update(_prefix(_cln_rules(f"norm_{i}", f"cls_head.norm.{i}"),
                         "cls_head"))
        r.update(_prefix(_masked_conv_rules(
            f"head_{i}", f"reg_head.head.{i}"), "reg_head"))
        r.update(_prefix(_cln_rules(f"norm_{i}", f"reg_head.norm.{i}"),
                         "reg_head"))
    r.update(_prefix(_masked_conv_rules("cls", "cls_head.cls_head"),
                     "cls_head"))
    r.update(_prefix(_masked_conv_rules("offset", "reg_head.offset_head"),
                     "reg_head"))
    for l in range(n_levels):
        r[f"reg_head/scale_{l}/scale"] = (f"reg_head.scale.{l}.scale",
                                          _scalar)
    return r


NLQ_GAUSSIAN_PARAMS = ("mu", "sigma", "mu_reg_left", "sigma_reg_left",
                       "mu_reg_right", "sigma_reg_right")


# --------------------------------------------------------------- tree utils

def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


def _unflatten(flat):
    root: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return root


def fill_from_rules(template, state_dict, rules, strict: bool = True,
                    allowed_missing: Tuple[str, ...] = ()):
    """Return a params tree with the template's structure and the state
    dict's values. Every template leaf must be covered by `rules` and
    present in `state_dict` with a shape-compatible transform (strict).
    Leaves listed in `allowed_missing` (exact flat paths) keep their
    template values without an error — for params our models carry that
    the reference checkpoint legitimately lacks (e.g. the NLQ model's
    unused label Gaussians)."""
    flat = _flatten(template)
    out = {}
    missing, mismatched = [], []
    for path, leaf in flat.items():
        if path in allowed_missing:
            continue
        if path not in rules:
            missing.append(path)
            continue
        key, tf = rules[path]
        if key not in state_dict:
            missing.append(f"{path} <- {key} (absent)")
            continue
        w = tf(np.asarray(state_dict[key]))
        if tuple(w.shape) != tuple(np.shape(leaf)):
            mismatched.append(f"{path}: ref {w.shape} vs ours "
                              f"{tuple(np.shape(leaf))}")
            continue
        out[path] = w.astype(np.asarray(leaf).dtype)
    if strict and (missing or mismatched):
        raise ValueError(
            "torch_import: unmatched parameters\n  missing: "
            + "\n  missing: ".join(missing[:20])
            + "\n  mismatch: " + "\n  mismatch: ".join(mismatched[:20]))
    merged = dict(flat)
    merged.update(out)
    return _unflatten(merged)


def load_torch_point_transformer(state_dict, cfg, params_template):
    """Port a reference MQ PtTransformer state_dict onto a params template
    produced by ``PointTransformer(cfg, cl).init(...)["params"]``.

    `state_dict` maps torch names to numpy arrays (call ``.numpy()`` on
    tensors or load with ``torch.load(..., map_location="cpu")``).
    """
    rules = point_transformer_rules(
        use_xl=cfg.use_xl,
        xl_layers=getattr(cfg, "xl_layers", 1),
        n_branch=cfg.backbone_arch[-1],
        n_stem=cfg.backbone_arch[1],
        n_convs=cfg.backbone_arch[0],
        n_levels=cfg.backbone_arch[-1] + 1,
        head_layers=cfg.head_num_layers,
        use_cross_modal=cfg.use_cross_modal,
    )
    return fill_from_rules(params_template, state_dict, rules)


def load_torch_nlq_point_transformer(state_dict, cfg, params_template):
    """Port a reference NLQ PtTransformer state_dict
    (NLQ/libs/modeling/meta_archs.py:340) onto a params template from
    ``PointTransformer(cfg, cl).init(...)["params"]`` with
    ``cfg.variant == 'nlq'``. The label-Gaussian params (absent in the
    reference NLQ model, unused at use_gaussian_weights=False) keep
    their init values."""
    arch = cfg.backbone_arch
    rules = nlq_point_transformer_rules(
        arch,
        n_levels=arch[-2] + arch[-1] + 1,
        head_layers=cfg.head_num_layers,
    )
    return fill_from_rules(params_template, state_dict, rules,
                           allowed_missing=NLQ_GAUSSIAN_PARAMS)


def state_dict_to_numpy(module) -> Dict[str, np.ndarray]:
    """torch nn.Module -> {name: np.ndarray} (detached, cpu). COPIES:
    .numpy() alone aliases the live parameters, so an optimizer.step()
    after the snapshot would silently rewrite it (the trajectory-parity
    lockstep snapshots start weights, then trains the torch model)."""
    return {k: v.detach().cpu().numpy().copy()
            for k, v in module.state_dict().items()}


# --------------------------------------------------------- VQ ClipMatcher

def _conv2d_w(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (Cout, Cin, kh, kw) -> flax (kh, kw, Cin, Cout)."""
    return np.transpose(w, (2, 3, 1, 0))


def _convT2d_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (Cin, Cout, kh, kw) -> flax ConvTranspose
    kernel (kh, kw, Cin, Cout). flax's conv_transpose correlates the
    UN-flipped kernel while torch convolves, so the spatial dims flip."""
    return np.ascontiguousarray(
        np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def _third_w(i: int) -> Callable:
    """Row-third of a packed torch in_proj_weight (3C, C), transposed to
    a Dense kernel (C, C)."""
    def tf(w):
        c = w.shape[0] // 3
        return np.transpose(w[i * c:(i + 1) * c])
    return tf


def _third_b(i: int) -> Callable:
    def tf(b):
        c = b.shape[0] // 3
        return np.asarray(b[i * c:(i + 1) * c])
    return tf


def _frozen_bn_rules(ours: str, ref: str) -> Dict[str, Tuple[str, Callable]]:
    """ConvBlock2D(norm="frozen_bn") <- torch BatchNorm2d running stats."""
    return {
        f"{ours}/bn_scale": (f"{ref}.weight", _id),
        f"{ours}/bn_bias": (f"{ref}.bias", _id),
        f"{ours}/bn_mean": (f"{ref}.running_mean", _id),
        f"{ours}/bn_var": (f"{ref}.running_var", _id),
    }


def _conv_block_rules(ours: str, ref_conv: str,
                      ref_bn: str) -> Dict[str, Tuple[str, Callable]]:
    r = {
        f"{ours}/conv/kernel": (f"{ref_conv}.weight", _conv2d_w),
        f"{ours}/conv/bias": (f"{ref_conv}.bias", _id),
    }
    r.update(_frozen_bn_rules(ours, ref_bn))
    return r


def _vit_rules(depth: int) -> Dict[str, Tuple[str, Callable]]:
    """timm/DINO/MAE ViT state_dict -> models/vit.py param paths. The
    final `norm` is intentionally absent: the reference MAE path's
    forward_features skips it (VQ/model/mae.py:21-34), matching
    ViT(final_norm=False)."""
    r = {
        "backbone/patch_embed/kernel":
            ("backbone.patch_embed.proj.weight", _conv2d_w),
        "backbone/patch_embed/bias": ("backbone.patch_embed.proj.bias", _id),
        "backbone/cls_token": ("backbone.cls_token", _id),
        "backbone/pos_embed": ("backbone.pos_embed", _id),
    }
    for i in range(depth):
        o, p = f"backbone/block_{i}", f"backbone.blocks.{i}"
        r.update({
            f"{o}/norm1/scale": (f"{p}.norm1.weight", _id),
            f"{o}/norm1/bias": (f"{p}.norm1.bias", _id),
            f"{o}/qkv/kernel": (f"{p}.attn.qkv.weight", _dense_from_linear),
            f"{o}/qkv/bias": (f"{p}.attn.qkv.bias", _id),
            f"{o}/proj/kernel": (f"{p}.attn.proj.weight", _dense_from_linear),
            f"{o}/proj/bias": (f"{p}.attn.proj.bias", _id),
            f"{o}/norm2/scale": (f"{p}.norm2.weight", _id),
            f"{o}/norm2/bias": (f"{p}.norm2.bias", _id),
            f"{o}/fc1/kernel": (f"{p}.mlp.fc1.weight", _dense_from_linear),
            f"{o}/fc1/bias": (f"{p}.mlp.fc1.bias", _id),
            f"{o}/fc2/kernel": (f"{p}.mlp.fc2.weight", _dense_from_linear),
            f"{o}/fc2/bias": (f"{p}.mlp.fc2.bias", _id),
        })
    return r


def _mha_rules(ours: str, ref: str) -> Dict[str, Tuple[str, Callable]]:
    """torch nn.MultiheadAttention -> our q/k/v/o Dense quartet."""
    r = {}
    for i, part in enumerate("qkv"):
        r[f"{ours}_{part}/kernel"] = (f"{ref}.in_proj_weight", _third_w(i))
        r[f"{ours}_{part}/bias"] = (f"{ref}.in_proj_bias", _third_b(i))
    r[f"{ours}_o/kernel"] = (f"{ref}.out_proj.weight", _dense_from_linear)
    r[f"{ours}_o/bias"] = (f"{ref}.out_proj.bias", _id)
    return r


def _ln_rules(ours: str, ref: str) -> Dict[str, Tuple[str, Callable]]:
    return {f"{ours}/scale": (f"{ref}.weight", _id),
            f"{ours}/bias": (f"{ref}.bias", _id)}


def vq_clip_matcher_rules(vit_depth: int, n_down: int, n_st: int,
                          n_up: int) -> Dict[str, Tuple[str, Callable]]:
    """Full reference ClipMatcher state_dict
    (VQ/model/corr_clip_spatial_transformer2_anchor_2heads_hnm.py:137-576)
    -> models/clip_matcher.py param paths (norm="frozen_bn").

    Reference modules with no counterpart in the forward path are simply
    not mapped: query_down_heads (built :165-174, never called), the
    down_heads beyond the break at resolution_transformer (:422-430), and
    the backbone's final norm (mae forward_features skips it)."""
    r = _vit_rules(vit_depth)
    # reduce stack: Sequential(conv, bn, lrelu, conv, bn, lrelu) :177-184
    r.update(_conv_block_rules("reduce1", "reduce.0", "reduce.1"))
    r.update(_conv_block_rules("reduce2", "reduce.3", "reduce.4"))
    # CQ decoder layer (torch TransformerDecoderLayer) :187-199
    cq = "CQ_corr_transformer.0"
    r.update(_mha_rules("cq_corr/self", f"{cq}.self_attn"))
    r.update(_mha_rules("cq_corr/cross", f"{cq}.multihead_attn"))
    r.update({
        "cq_corr/ff1/kernel": (f"{cq}.linear1.weight", _dense_from_linear),
        "cq_corr/ff1/bias": (f"{cq}.linear1.bias", _id),
        "cq_corr/ff2/kernel": (f"{cq}.linear2.weight", _dense_from_linear),
        "cq_corr/ff2/bias": (f"{cq}.linear2.bias", _id),
    })
    for i in range(1, 4):
        r.update(_ln_rules(f"cq_corr/norm{i}", f"{cq}.norm{i}"))
    # spatial downsample heads (only the applied ones) :201-211
    for i in range(n_down):
        r.update(_conv_block_rules(f"down_{i}", f"down_heads.{i}.0",
                                   f"down_heads.{i}.1"))
    r["pe_3d"] = ("pe_3d", _id)
    # spatio-temporal encoder layers (torch TransformerEncoderLayer)
    for i in range(n_st):
        o, p = f"st_{i}", f"feat_corr_transformer.{i}"
        r.update({
            f"{o}/qkv/kernel": (f"{p}.self_attn.in_proj_weight",
                                _dense_from_linear),
            f"{o}/qkv/bias": (f"{p}.self_attn.in_proj_bias", _id),
            f"{o}/proj/kernel": (f"{p}.self_attn.out_proj.weight",
                                 _dense_from_linear),
            f"{o}/proj/bias": (f"{p}.self_attn.out_proj.bias", _id),
            f"{o}/ff1/kernel": (f"{p}.linear1.weight", _dense_from_linear),
            f"{o}/ff1/bias": (f"{p}.linear1.bias", _id),
            f"{o}/ff2/kernel": (f"{p}.linear2.weight", _dense_from_linear),
            f"{o}/ff2/bias": (f"{p}.linear2.bias", _id),
        })
        r.update(_ln_rules(f"{o}/norm1", f"{p}.norm1"))
        r.update(_ln_rules(f"{o}/norm2", f"{p}.norm2"))
    # anchor head (Head :509-576)
    for i in range(n_up):
        r[f"head/up_{i}/kernel"] = (f"head.up_convs.{i}.weight", _convT2d_w)
        r[f"head/up_{i}/bias"] = (f"head.up_convs.{i}.bias", _id)
    r.update(_conv_block_rules("head/in_conv", "head.in_conv.0",
                               "head.in_conv.1"))
    for i in range(3):
        r.update(_conv_block_rules(f"head/reg_{i}",
                                   f"head.regression_conv.{i}.0",
                                   f"head.regression_conv.{i}.1"))
        r.update(_conv_block_rules(f"head/cls_{i}",
                                   f"head.classification_conv.{i}.0",
                                   f"head.classification_conv.{i}.1"))
    r.update({
        "head/reg_head/kernel": ("head.regression_head.weight", _conv2d_w),
        "head/reg_head/bias": ("head.regression_head.bias", _id),
        "head/cls_head/kernel": ("head.classification_head.weight",
                                 _conv2d_w),
        "head/cls_head/bias": ("head.classification_head.bias", _id),
    })
    return r


def load_torch_clip_matcher(state_dict, model, params_template):
    """Port a reference VQ ClipMatcher state_dict onto a params template
    from ``ClipMatcher(norm="frozen_bn", ...).init(...)["params"]``."""
    feat_res = model.interp_feat_to or (model.clip_size // model.patch_size)
    rules = vq_clip_matcher_rules(
        vit_depth=model.vit_depth,
        n_down=max(0, int(np.log2(
            max(feat_res // model.resolution_transformer, 1)))),
        n_st=model.num_transformer,
        n_up=int(np.log2(model.resolution_anchor_feat
                         // model.resolution_transformer)),
    )
    return fill_from_rules(params_template, state_dict, rules)
