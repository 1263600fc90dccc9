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


@pytest.mark.slow
def test_nlq_submission_and_ensemble_chain(tmp_path):
    """evaluate --submission writes the official ego4d_nlq_challenge file
    (NLQ/evaluate_ego4d_nlq.py:116-128 record shape) and the per-model
    files feed bin/ensemble.py end-to-end."""
    from vilco_tpu.bin import ensemble

    wd = str(tmp_path / "nlq")
    train_cl.main([
        "--synthetic", "--task", "nlq", "--workdir", wd,
        "--epochs", "1", "--num-tasks", "2",
    ])
    sub_path = tmp_path / "pred_a.json"
    evaluate.main(["--workdir", wd, "--synthetic", "--task", "nlq",
                   "--submission", str(sub_path)])
    sub = json.loads(sub_path.read_text())
    assert sub["version"] == "1.0"
    assert sub["challenge"] == "ego4d_nlq_challenge"
    assert len(sub["results"]) > 0
    for rec in sub["results"]:
        assert set(rec) == {"clip_uid", "annotation_uid", "query_idx",
                            "predicted_times"}
        for t in rec["predicted_times"]:
            assert len(t) == 3 and t[0] <= t[1]  # [start, end, score]
        # score-sorted proposals
        scores = [t[2] for t in rec["predicted_times"]]
        assert scores == sorted(scores, reverse=True)

    # two "models" (same file twice) through the official ensemble fusion
    out_path = tmp_path / "ensemble.json"
    ensemble.main([str(sub_path), str(sub_path), "--out", str(out_path)])
    fused = json.loads(out_path.read_text())
    assert fused["challenge"] == "ego4d_nlq_challenge"
    assert len(fused["results"]) == len(sub["results"])
    for rec in fused["results"]:
        assert len(rec["predicted_times"]) == 5  # exactly-5 spans


@pytest.mark.slow
def test_mq_submission_dump(tmp_path):
    """evaluate --submission for MQ writes the reference's test-set dump
    shape (train_utils.py:876-895): results keyed by video with label
    NAMES from the activity index."""
    wd = str(tmp_path / "mq")
    train_cl.main(["--synthetic", "--workdir", wd, "--epochs", "1",
                   "--num-tasks", "2"])
    sub_path = tmp_path / "mq_sub.json"
    evaluate.main(["--workdir", wd, "--synthetic",
                   "--submission", str(sub_path)])
    sub = json.loads(sub_path.read_text())
    assert set(sub) == {"version", "external_data", "results"}
    assert sub["results"], "no videos predicted"
    with open(f"{wd}/config.json") as f:
        n_classes = json.load(f)["model"]["num_classes"]
    for vid, dets in sub["results"].items():
        for d in dets:
            assert set(d) == {"segment", "score", "label"}
            assert d["segment"][0] <= d["segment"][1]
            # label is the activity-index NAME (synthetic names are the
            # class ints), never an out-of-range raw index
            assert isinstance(d["label"], str)
            assert int(d["label"]) < n_classes
