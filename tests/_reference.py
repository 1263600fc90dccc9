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
