"""bin/vq_infer.py CLI end-to-end: rebuild the tracker from only the
workdir (vq_config.json manifest) and score the latest checkpoint.

Covers the reference's 3-stage VQ inference pipeline entry point
(VQ/inference_predict.py -> inference_results.py -> evaluate.py) plus
the manifest restore: a NON-default model geometry at training time must
come back at inference without re-passing the flags.
"""

import json
import os

import numpy as np
import pytest

from vilco_tpu.bin import train_cl, vq_infer


@pytest.mark.slow
def test_vq_infer_cli_restores_model_shape(tmp_path):
    wd = str(tmp_path / "run")
    # non-default geometry: without the manifest restore, vq_infer would
    # rebuild the default 32px/4-frame tracker and the checkpoint's
    # 16px/3-frame params could not evaluate
    res = train_cl.main([
        "--task", "vq", "--synthetic", "--workdir", wd,
        "--epochs", "1", "--num-tasks", "2",
        "--vq-frame-size", "16", "--vq-window", "3",
    ])
    assert np.isfinite(res["final"]["avg_tAP25"])

    with open(os.path.join(wd, "vq_config.json")) as f:
        man = json.load(f)
    assert man == {"window": 3, "frame_size": 16, "model_cfg": None}

    out = vq_infer.main(["--workdir", wd, "--synthetic",
                         "--num-tasks", "2"])
    assert len(out["per_task"]) == 2
    for k in ("avg_tAP25", "avg_stAP25", "avg_success"):
        assert np.isfinite(out[k]), (k, out[k])
