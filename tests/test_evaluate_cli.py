"""bin/evaluate.py CLI end-to-end: restore a finished run from only its
workdir and reproduce the training-time cumulative evaluation.

Covers the reference's standalone eval entry points (MQ/eval.py,
NLQ/eval_nlq.py) plus our improvement over them: the episode runner
persists its resolved config (workdir/config.json), so evaluation does
not need the original yaml/CLI invocation re-passed.
"""

import json

import numpy as np
import pytest

from vilco_tpu.bin import evaluate, train_cl


@pytest.mark.slow
def test_evaluate_cli_reproduces_final_eval(tmp_path):
    wd = str(tmp_path / "run")
    res = train_cl.main([
        "--synthetic", "--workdir", wd, "--epochs", "2", "--num-tasks", "2",
    ])

    # the runner persisted its resolved config, CLI overrides included
    with open(tmp_path / "run" / "config.json") as f:
        saved = json.load(f)
    assert saved["cl_cfg"]["num_tasks"] == 2
    assert saved["opt"]["epochs"] == 2

    # fresh process-equivalent: only --workdir, config restored from json
    ev = evaluate.main(["--workdir", wd, "--synthetic"])
    train_eval = res["tasks"][-1]["eval"]
    assert len(ev["per_task"]) == 2
    np.testing.assert_allclose(ev["avg_mAP"], train_eval["avg_mAP"],
                               rtol=1e-5)
    np.testing.assert_allclose(ev["avg_R1@0.5"], train_eval["avg_R1@0.5"],
                               rtol=1e-5)
    for a, b in zip(ev["per_task"], train_eval["per_task"]):
        np.testing.assert_allclose(a["avg_mAP"], b["avg_mAP"], rtol=1e-5)

    # --task-idx selects the mid-run checkpoint: only task 0 seen
    ev0 = evaluate.main(["--workdir", wd, "--synthetic", "--task-idx", "0"])
    assert len(ev0["per_task"]) == 1
    np.testing.assert_allclose(
        ev0["avg_mAP"], res["tasks"][0]["eval"]["avg_mAP"], rtol=1e-5
    )


@pytest.mark.slow
def test_seed_flag_persists_and_changes_the_run(tmp_path):
    """--seed overrides config.init_rand_seed (the reference's
    fix_random_seed knob, MQ/libs/utils/train_utils.py:33) and flows into
    the persisted workdir config + the synthetic data stream."""
    runs = {}
    for seed in (0, 7):
        wd = str(tmp_path / f"s{seed}")
        runs[seed] = train_cl.main([
            "--synthetic", "--workdir", wd, "--epochs", "1",
            "--num-tasks", "2", "--seed", str(seed),
        ])
        with open(tmp_path / f"s{seed}" / "config.json") as f:
            assert json.load(f)["init_rand_seed"] == seed
    # different seeds -> different synthetic splits/init -> different losses
    a = runs[0]["tasks"][0]["train"]["last_metrics"]["final_loss"]
    b = runs[7]["tasks"][0]["train"]["last_metrics"]["final_loss"]
    assert a != b
