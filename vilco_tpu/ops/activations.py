"""Activation helpers with a TPU-speed/parity switch.

The reference uses torch's exact-erf GELU everywhere; flax's default is
the tanh approximation. On the TPU VPU the erf polynomial measures 2.6x
slower per call at the VQ ViT FFN shape (7.26 vs 2.76 ms — enough to
cost the VQ step ~13%), while the tanh form differs by ~1e-3 absolute on
unit-scale activations and is training-neutral. So the COMPUTE path uses
the tanh approximation, and :func:`exact_gelu` switches to exact erf for
the numeric-parity tests (tests/test_torch_parity.py) or when
reproducing reference logits bit-closely matters more than speed.
"""

from __future__ import annotations

from contextlib import contextmanager

import flax.linen as nn

_EXACT = False


def gelu(x):
    """GELU: tanh-approximate by default (TPU-fast), exact erf inside an
    :func:`exact_gelu` context (reference parity)."""
    return nn.gelu(x, approximate=not _EXACT)


@contextmanager
def exact_gelu():
    """Trace models with the reference's exact-erf GELU."""
    global _EXACT
    prev = _EXACT
    _EXACT = True
    try:
        yield
    finally:
        _EXACT = prev
