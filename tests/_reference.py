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
