"""MQ preprocessing: prompt building, adjacency graph, val-label histogram."""

import numpy as np

from vilco_tpu.bin.preprocess import (
    build_adj_graph,
    clean_labels_and_build_prompts,
    val_label_histogram,
)


def _anno():
    return {
        "clipA": {"subset": "train", "duration": 30.0, "clip_id": "clipA",
                  "annotations": [
                      {"label": "use_phone", "label_id": 1,
                       "segment": [2.0, 8.0]},
                      {"label": "cook/heat", "label_id": 0,
                       "segment": [5.0, 12.0]},
                      {"label": "wash_dishes", "label_id": 2,
                       "segment": [20.0, 25.0]}]},
        "clipB": {"subset": "val", "duration": 20.0, "clip_id": "clipB",
                  "annotations": [
                      {"label": "use_phone", "label_id": 1,
                       "segment": [1.0, 4.0]},
                      {"label": "use_phone", "label_id": 1,
                       "segment": [10.0, 14.0]}]},
    }


CLASSES = {"cook/heat": 0, "use_phone": 1, "wash_dishes": 2,
           "read_book": 3, "drive_car": 4}


def test_prompt_building_narrates_in_order():
    out = clean_labels_and_build_prompts(_anno(), CLASSES, seed=0)
    a = out["clipA"]
    # label cleanup: '/'->'or' (no spaces), '_'->' '  (preprocess.py:36-37)
    assert [x["label"] for x in a["annotations"]] == [
        "use phone", "cookorheat", "wash dishes"]
    p = a["prompt"]
    # temporal order with connectives: overlap word between the first two
    # (cook starts at 5 < use_phone end 8 - 1), sequence word before wash
    assert p.startswith("I use phone .")
    assert any(w.strip() in p for w in
               ("meanwhile", "simultaneously", "same time", "meantime"))
    assert "I wash dishes ." in p
    assert len(a["negative_prompt"]) == 31
    # negatives never narrate with the exact positive wording
    assert all(n != p for n in a["negative_prompt"])


def test_adj_graph_counts_overlaps():
    # duplicate the overlapping clip so the co-occurrence count is 2
    anno = {"a": _anno()["clipA"], "b": _anno()["clipA"]}
    g = build_adj_graph(anno, num_classes=5)
    # classes 0 and 1 overlap (seconds 5..8) in both clips -> log(2)
    assert np.isclose(g["adj"][0, 1], np.log(2))
    assert np.isclose(g["adj"][1, 0], np.log(2))
    # non-overlapping pair (1, 2) stays 0; diagonal zeroed
    assert g["adj"][1, 2] == 0 and g["adj"][1, 1] == 0
    assert g["nums"][1] == 2  # use_phone appears once per clip


def test_val_label_histogram():
    h = val_label_histogram(_anno())
    assert h == {"clipB": {1: 2}}


def test_shipped_configs_parse_and_derive():
    """The flagship YAML configs stay loadable and self-consistent."""
    import os

    from vilco_tpu.core.config import load_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("mq_vilco.yaml", "nlq_vilco.yaml"):
        cfg = load_config(os.path.join(root, "configs", name))
        assert cfg.model.embd_dim > 0
        assert len(cfg.model.regression_range) == len(cfg.model.fpn_strides)
        assert cfg.opt.epochs > 0

    # the VQ flagship (mirrors VQ/config/train_cl.yaml): DINOv2 ViT-B/14,
    # 30x448^2 clips, dim-256 matcher
    cfg = load_config(os.path.join(root, "configs", "vq_vilco.yaml"))
    assert cfg.task == "vq"
    assert (cfg.vq.vit_dim, cfg.vq.vit_depth, cfg.vq.patch_size) == \
        (768, 12, 14)
    assert (cfg.vq.clip_size, cfg.vq.num_frames, cfg.vq.dim) == (448, 30, 256)
    assert cfg.vq.resolution_anchor_feat == 16 and cfg.vq.use_hnm
