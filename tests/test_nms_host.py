"""Native C++ NMS vs the on-device JAX op and the C++-reference
transcription — three-way parity."""

import shutil

import numpy as np
import pytest

import jax.numpy as jnp

from vilco_tpu.ops import nms as NMS

pytestmark = pytest.mark.skipif(
    shutil.which("make") is None or shutil.which("g++") is None,
    reason="native toolchain unavailable",
)


def test_host_soft_nms_matches_device_and_transcription(rng):
    from vilco_tpu.ops.nms_host import soft_nms_1d_host
    from tests.test_nms import np_softnms

    M = 50
    starts = rng.uniform(0, 40, M).astype(np.float32)
    segs = np.stack([starts, starts + rng.uniform(1, 8, M)], -1).astype(
        np.float32
    )
    scores = rng.uniform(0.01, 1.0, M).astype(np.float32)

    h_segs, h_scores, h_inds = soft_nms_1d_host(
        segs, scores, iou_threshold=0.1, sigma=0.6, min_score=0.05,
        method="gaussian",
    )
    dets, inds = np_softnms(segs, scores, 0.1, 0.6, 0.05, method=2)
    assert len(h_scores) == len(dets)
    np.testing.assert_allclose(h_segs, dets[:, :2], atol=1e-5)
    np.testing.assert_allclose(h_scores, dets[:, 2], atol=1e-5)

    dev = NMS.soft_nms_1d(
        jnp.asarray(segs), jnp.asarray(scores), jnp.ones(M, bool),
        max_out=M, iou_threshold=0.1, sigma=0.6, min_score=0.05,
        method="gaussian",
    )
    n = int(np.asarray(dev.valid).sum())
    assert n == len(h_scores)
    np.testing.assert_allclose(np.asarray(dev.segs)[:n], h_segs, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dev.scores)[:n], h_scores,
                               atol=1e-4)


def test_host_hard_nms(rng):
    from vilco_tpu.ops.nms_host import nms_1d_host

    M = 40
    starts = rng.uniform(0, 30, M).astype(np.float32)
    segs = np.stack([starts, starts + rng.uniform(1, 8, M)], -1).astype(
        np.float32
    )
    scores = rng.uniform(0.01, 1.0, M).astype(np.float32)
    inds = nms_1d_host(segs, scores, iou_threshold=0.3)
    # kept segments must be mutually below the IoU threshold
    for a in range(len(inds)):
        for b in range(a + 1, len(inds)):
            i, j = inds[a], inds[b]
            l = max(segs[i, 0], segs[j, 0])
            r = min(segs[i, 1], segs[j, 1])
            inter = max(0.0, r - l)
            area_i = segs[i, 1] - segs[i, 0] + 1e-6
            area_j = segs[j, 1] - segs[j, 0] + 1e-6
            assert inter / (area_i + area_j - inter) < 0.3
    # scores sorted descending
    assert (np.diff(scores[inds]) <= 1e-7).all()
