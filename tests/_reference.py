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


def load_reference_mq():
    """Import and return the reference `libs` package (or skip the test)."""
    import pytest

    if not os.path.isdir(REF_MQ):
        pytest.skip("reference checkout not available")
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

    if REF_MQ not in sys.path:
        sys.path.insert(0, REF_MQ)
    import libs.utils  # noqa: F401  (must precede libs.modeling)
    import libs.modeling
    return libs
