"""Load the read-only reference implementation (/root/reference/MQ) for
numeric-parity tests.

The reference targets an older transformers/timm environment and a compiled
NMS extension; this shim stubs exactly what its import graph touches so the
*modeling* code runs unmodified on the installed torch:

  - transformers.modeling_utils pooler heads moved in newer transformers
    (reference MQ/libs/modeling/modeling_xlnet_x.py:28-35 imports them);
  - timm.utils.model_ema.ModelEmaV2 (meta_archs.py:18) — stubbed with a
    deepcopy-holder;
  - nms_1d_cpu compiled extension (libs/utils/nms.py:5) — stubbed to raise
    if actually called (parity tests never run NMS through torch);
  - libs.utils must import before libs.modeling (their circular import only
    resolves in that order).
"""

from __future__ import annotations

import os
import sys
import types

REF_MQ = "/root/reference/MQ"
REF_NLQ = "/root/reference/NLQ"

_loaded: dict = {}


def _install_shims():
    """Shared stubs for every reference sub-repo (see module docstring)."""
    import pytest

    torch = pytest.importorskip("torch")

    import transformers.modeling_utils as mu

    class _Stub(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    for name in ("PoolerAnswerClass", "PoolerEndLogits", "PoolerStartLogits",
                 "SequenceSummary"):
        if not hasattr(mu, name):
            setattr(mu, name, _Stub)
    if not hasattr(mu, "apply_chunking_to_forward"):
        from transformers.pytorch_utils import apply_chunking_to_forward
        mu.apply_chunking_to_forward = apply_chunking_to_forward
    for name in ("find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, name):
            try:
                import transformers.pytorch_utils as ptu

                setattr(mu, name, getattr(ptu, name))
            except (ImportError, AttributeError):
                setattr(mu, name, lambda *a, **k: None)

    if "timm" not in sys.modules:
        try:
            import timm  # noqa: F401
        except ImportError:
            import copy

            class _Ema(torch.nn.Module):
                def __init__(self, model, decay=0.9999, device=None):
                    super().__init__()
                    self.module = copy.deepcopy(model)

            timm_mod = types.ModuleType("timm")
            utils_mod = types.ModuleType("timm.utils")
            ema_mod = types.ModuleType("timm.utils.model_ema")
            ema_mod.ModelEmaV2 = _Ema
            utils_mod.model_ema = ema_mod
            timm_mod.utils = utils_mod
            sys.modules["timm"] = timm_mod
            sys.modules["timm.utils"] = utils_mod
            sys.modules["timm.utils.model_ema"] = ema_mod

    if "lmdb" not in sys.modules:
        try:
            import lmdb  # noqa: F401
        except ImportError:    # narration features only (use_narration off)
            lm = types.ModuleType("lmdb")

            def _no_lmdb(*a, **k):
                raise RuntimeError("lmdb stub: narration lmdb not here")

            lm.open = _no_lmdb
            sys.modules["lmdb"] = lm

    if "nms_1d_cpu" not in sys.modules:
        def _no_ext(*a, **k):
            raise RuntimeError("nms_1d_cpu extension is not built here")

        fake = types.ModuleType("nms_1d_cpu")
        fake.nms = _no_ext
        fake.softnms = _no_ext
        sys.modules["nms_1d_cpu"] = fake

    if "terminaltables" not in sys.modules:
        try:
            import terminaltables  # noqa: F401
        except ImportError:        # NLQ metrics printing only
            tt = types.ModuleType("terminaltables")

            class _Table:
                def __init__(self, *a, **k):
                    self.table = ""
                    self.inner_footing_row_border = False

            tt.AsciiTable = _Table
            sys.modules["terminaltables"] = tt


def _load_isolated(root: str):
    """Import `libs` from `root` without clobbering another sub-repo's
    already-loaded `libs` (MQ and NLQ both name their package `libs`):
    swap the sys.modules entries out, import, swap back."""
    saved_mods = {k: v for k, v in sys.modules.items()
                  if k == "libs" or k.startswith("libs.")}
    for k in list(saved_mods):
        del sys.modules[k]
    saved_path = list(sys.path)
    saved_cwd = os.getcwd()
    sys.path.insert(0, root)
    os.chdir(root)     # some modules open cwd-relative files at import
    try:
        import libs.utils  # noqa: F401  (must precede libs.modeling —
        # their circular import only resolves in that order)
        import libs.modeling  # noqa: F401
        import libs.datasets  # noqa: F401  (QILSetTask + Ego4dCLDataset
        # for the episode-composition lockstep)
        import libs.cl_methods  # noqa: F401
        pkg = sys.modules["libs"]
    finally:
        os.chdir(saved_cwd)
        for k in [k for k in sys.modules
                  if k == "libs" or k.startswith("libs.")]:
            del sys.modules[k]
        sys.modules.update(saved_mods)
        sys.path[:] = saved_path
    return pkg


def _load(root: str):
    import pytest

    if root in _loaded:
        return _loaded[root]
    if not os.path.isdir(root):
        pytest.skip("reference checkout not available")
    _install_shims()
    _loaded[root] = _load_isolated(root)
    return _loaded[root]


def load_reference_mq():
    """Import and return the reference MQ `libs` package (or skip)."""
    return _load(REF_MQ)


def load_reference_nlq():
    """Import and return the reference NLQ `libs` package (or skip)."""
    return _load(REF_NLQ)


REF_VQ = "/root/reference/VQ"

_vq_utils: dict = {}


def load_reference_vq_utils():
    """Import the reference VQ loss/anchor/dataset utils
    (VQ/utils/loss_utils.py, VQ/utils/anchor_utils.py,
    VQ/dataset/dataset_utils.py) for numeric-parity tests.

    Their import graph reaches kornia/decord/torchvision (uninstalled)
    and the heavy dataset classes; those are stubbed — the parity tests
    only call the pure-torch loss/assignment/replication functions.
    sys.modules pollution ('dataset', 'utils', stub packages) is rolled
    back after loading; the loaded modules are cached.
    """
    import importlib.util

    import pytest

    if _vq_utils:
        return (_vq_utils["loss"], _vq_utils["anchor"], _vq_utils["data"])
    if not os.path.isdir(REF_VQ):
        pytest.skip("reference checkout not available")
    pytest.importorskip("torch")

    saved = {
        k: sys.modules.get(k)
        for k in ("dataset", "dataset.base_dataset", "dataset.dataset_utils",
                  "dataset.egotracks_dataset", "utils", "utils.anchor_utils",
                  "utils.loss_utils", "kornia", "kornia.augmentation",
                  "kornia.constants", "decord", "torchvision",
                  "torchvision.transforms")
    }

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    def from_file(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    try:
        k_mod = stub("kornia")
        k_mod.augmentation = stub("kornia.augmentation")
        stub("kornia.constants", DataKey=object)
        stub("decord")
        tv = stub("torchvision")
        tv.transforms = stub("torchvision.transforms")

        dpkg = stub("dataset")
        dpkg.__path__ = [os.path.join(REF_VQ, "dataset")]
        stub("dataset.base_dataset", QueryVideoDataset=object,
             QueryVideoCLDataset=object)
        stub("dataset.egotracks_dataset", EgoTracksDataset=object)
        data_utils = from_file(
            "dataset.dataset_utils",
            os.path.join(REF_VQ, "dataset", "dataset_utils.py"))
        dpkg.dataset_utils = data_utils

        upkg = stub("utils")
        upkg.__path__ = [os.path.join(REF_VQ, "utils")]
        anchor_utils = from_file(
            "utils.anchor_utils",
            os.path.join(REF_VQ, "utils", "anchor_utils.py"))
        upkg.anchor_utils = anchor_utils
        loss_utils = from_file(
            "utils.loss_utils",
            os.path.join(REF_VQ, "utils", "loss_utils.py"))
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    _vq_utils.update(loss=loss_utils, anchor=anchor_utils, data=data_utils)
    return loss_utils, anchor_utils, data_utils


class AttrDict(dict):
    """Minimal easydict stand-in: the reference VQ config object is read
    both as attributes (config.model.backbone_name) and as items
    (config['cl']['use_adapt'])."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def _install_timm_vit_stub():
    """A faithful mini-timm ``VisionTransformer`` so the reference's
    ``VQ/model/mae.py`` (``import timm.models.vision_transformer``,
    subclasses it) loads without timm installed. Standard pre-LN ViT with
    timm's exact parameter naming (patch_embed.proj, blocks.N.{norm1,
    attn.{qkv,proj}, norm2, mlp.{fc1,fc2}}, norm) — the same layout the
    published DINO/MAE checkpoints carry, which is what keeps this stub
    honest: any deviation from real timm would break real-checkpoint
    loading, not just this test double. Accepts ``img_size`` so pos_embed
    matches reduced test resolutions."""
    import torch
    import torch.nn as nn

    if "timm.models.vision_transformer" in sys.modules:
        return

    class PatchEmbed(nn.Module):
        def __init__(self, img_size, patch_size, embed_dim):
            super().__init__()
            self.patch_size = (patch_size, patch_size)
            self.num_patches = (img_size // patch_size) ** 2
            self.proj = nn.Conv2d(3, embed_dim, patch_size,
                                  stride=patch_size)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class Attention(nn.Module):
        def __init__(self, dim, num_heads, qkv_bias):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(
                B, N, 3, self.num_heads, C // self.num_heads
            ).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = (q @ k.transpose(-2, -1)) * self.scale
            a = a.softmax(dim=-1)
            x = (a @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self, dim, hidden):
            super().__init__()
            self.fc1 = nn.Linear(dim, hidden)
            self.act = nn.GELU()
            self.fc2 = nn.Linear(hidden, dim)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class Block(nn.Module):
        def __init__(self, dim, num_heads, mlp_ratio, qkv_bias, norm_layer):
            super().__init__()
            self.norm1 = norm_layer(dim)
            self.attn = Attention(dim, num_heads, qkv_bias)
            self.norm2 = norm_layer(dim)
            self.mlp = Mlp(dim, int(dim * mlp_ratio))

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class VisionTransformer(nn.Module):
        def __init__(self, img_size=224, patch_size=16, embed_dim=768,
                     depth=12, num_heads=12, mlp_ratio=4.0, qkv_bias=True,
                     norm_layer=nn.LayerNorm, **kwargs):
            super().__init__()
            self.patch_embed = PatchEmbed(img_size, patch_size, embed_dim)
            self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
            self.pos_embed = nn.Parameter(
                torch.zeros(1, self.patch_embed.num_patches + 1, embed_dim))
            self.pos_drop = nn.Dropout(0.0)
            self.blocks = nn.ModuleList([
                Block(embed_dim, num_heads, mlp_ratio, qkv_bias, norm_layer)
                for _ in range(depth)
            ])
            self.norm = norm_layer(embed_dim)
            nn.init.normal_(self.cls_token, std=0.02)
            nn.init.normal_(self.pos_embed, std=0.02)

    vt_mod = types.ModuleType("timm.models.vision_transformer")
    vt_mod.VisionTransformer = VisionTransformer
    timm_mod = sys.modules["timm"]       # created by _install_shims
    models_mod = types.ModuleType("timm.models")
    models_mod.vision_transformer = vt_mod
    timm_mod.models = models_mod
    sys.modules["timm.models"] = models_mod
    sys.modules["timm.models.vision_transformer"] = vt_mod


_vq_model: dict = {}


def load_reference_vq_model():
    """Import the reference VQ ClipMatcher module
    (VQ/model/corr_clip_spatial_transformer2_anchor_2heads_hnm.py) plus its
    mae module, with stubs for uninstalled deps (timm ViT — see
    _install_timm_vit_stub — torchvision, kornia/decord). Returns
    (corr_module, mae_module). sys.modules pollution is rolled back."""
    import importlib.util

    import pytest

    if _vq_model:
        return _vq_model["corr"], _vq_model["mae"]
    if not os.path.isdir(REF_VQ):
        pytest.skip("reference checkout not available")
    pytest.importorskip("torch")
    _install_shims()
    _install_timm_vit_stub()

    names = ("dataset", "dataset.dataset_utils", "dataset.base_dataset",
             "dataset.egotracks_dataset", "utils",
             "utils.model_utils", "utils.anchor_utils", "model",
             "model.transformer", "model.mae",
             "model.corr_clip_spatial_transformer2_anchor_2heads_hnm",
             "cl_methods", "cl_methods.prompt", "torchvision",
             "torchvision.ops", "kornia", "kornia.augmentation",
             "kornia.constants", "decord")
    saved = {k: sys.modules.get(k) for k in names}

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    def from_file(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    def _no_tv(*a, **k):
        raise RuntimeError("torchvision stub: roi_align not available "
                           "(use_query_roi must stay False)")

    try:
        tv = stub("torchvision")
        tv.ops = stub("torchvision.ops", roi_align=_no_tv)
        # dataset_utils' import graph reaches kornia/decord + the heavy
        # dataset classes (same stubs as load_reference_vq_utils)
        k_mod = stub("kornia")
        k_mod.augmentation = stub("kornia.augmentation")
        stub("kornia.constants", DataKey=object)
        stub("decord")

        dpkg = stub("dataset")
        dpkg.__path__ = [os.path.join(REF_VQ, "dataset")]
        stub("dataset.base_dataset", QueryVideoDataset=object,
             QueryVideoCLDataset=object)
        stub("dataset.egotracks_dataset", EgoTracksDataset=object)
        dpkg.dataset_utils = from_file(
            "dataset.dataset_utils",
            os.path.join(REF_VQ, "dataset", "dataset_utils.py"))

        upkg = stub("utils")
        upkg.__path__ = [os.path.join(REF_VQ, "utils")]
        upkg.model_utils = from_file(
            "utils.model_utils",
            os.path.join(REF_VQ, "utils", "model_utils.py"))
        upkg.anchor_utils = from_file(
            "utils.anchor_utils",
            os.path.join(REF_VQ, "utils", "anchor_utils.py"))

        clpkg = stub("cl_methods")
        clpkg.__path__ = [os.path.join(REF_VQ, "cl_methods")]
        prompt_mod = from_file(
            "cl_methods.prompt",
            os.path.join(REF_VQ, "cl_methods", "prompt.py"))
        clpkg.prompt = prompt_mod
        clpkg.Prompt = prompt_mod.Prompt

        mpkg = stub("model")
        mpkg.__path__ = [os.path.join(REF_VQ, "model")]
        mpkg.transformer = from_file(
            "model.transformer",
            os.path.join(REF_VQ, "model", "transformer.py"))
        mae_mod = from_file(
            "model.mae", os.path.join(REF_VQ, "model", "mae.py"))
        mpkg.mae = mae_mod
        corr_mod = from_file(
            "model.corr_clip_spatial_transformer2_anchor_2heads_hnm",
            os.path.join(
                REF_VQ, "model",
                "corr_clip_spatial_transformer2_anchor_2heads_hnm.py"))
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    _vq_model.update(corr=corr_mod, mae=mae_mod)
    return corr_mod, mae_mod
