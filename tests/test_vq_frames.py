"""Real-data VQ path: Ego4D annotation adapter + frame sources.

Renders a tiny synthetic "real" dataset on disk (jpg frame dirs and an
mp4 clip) in the reference's exact layouts, then drives annotation
parsing, geometry, balanced sampling, and the full episode runner
through the FrameDirSource/VideoFrameSource path.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vilco_tpu.data.vq_frames import (
    FrameDirSource,
    VideoFrameSource,
    balanced_frame_indices,
    clean_box_flags,
    group_by_category,
    load_vq_annotations,
    normalize_track_box,
    square_pad_resize,
)

H, W = 48, 64            # non-square original frames to exercise padding
N_FRAMES = 12
FRAME_SIZE = 32


def _box_entry(fno, x, y, w, h):
    return {"frame_number": fno, "x": x, "y": y, "width": w, "height": h,
            "original_width": W, "original_height": H}


def _render_frame(fno: int, box=None) -> np.ndarray:
    rng = np.random.default_rng(1000 + fno)
    img = (rng.random((H, W, 3)) * 40).astype(np.uint8)
    if box is not None:
        x, y, bw, bh = box
        img[y:y + bh, x:x + bw] = (250, 30, 30)
    return img


def _track_boxes():
    # object moves right over frames 2..8
    return {f: (10 + 2 * (f - 2), 14, 16, 16) for f in range(2, 9)}


def _write_dataset(tmp_path):
    boxes = _track_boxes()
    clip_uid = "clip-abc"
    img_dir = tmp_path / "images" / clip_uid
    os.makedirs(img_dir)
    frames = []
    for f in range(N_FRAMES):
        img = _render_frame(f, boxes.get(f))
        frames.append(img)
        cv2.imwrite(str(img_dir / f"frame_{f + 1:07d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    anno = {"videos": [{
        "video_uid": "vid-1",
        "clips": [{
            "clip_uid": clip_uid, "clip_fps": 5,
            "annotations": [{
                "annotation_uid": "anno-1",
                "query_sets": {
                    "1": {
                        "is_valid": True,
                        "query_frame": 10,
                        "object_title": "red box",
                        "visual_crop": _box_entry(5, 16, 14, 16, 16),
                        "response_track": [
                            _box_entry(f, *boxes[f]) for f in sorted(boxes)
                        ],
                    },
                    "2": {"is_valid": False, "query_frame": 3,
                          "object_title": "skip me",
                          "visual_crop": _box_entry(0, 0, 0, 4, 4),
                          "response_track": []},
                },
            }],
        }],
    }]}
    anno_path = tmp_path / "vq_val.json"
    anno_path.write_text(json.dumps(anno))
    return anno_path, tmp_path / "images", frames


def test_normalize_track_box_pad_geometry():
    # W > H: pad height; a box at x=0 keeps x1=0, y gets the pad offset
    b = normalize_track_box(_box_entry(0, 0, 0, W, H))
    assert b[0] == 0.0 and b[2] == pytest.approx(1.0)
    assert b[1] == pytest.approx((W - H) / 2 / W)
    assert b[3] == pytest.approx(1.0 - (W - H) / 2 / W)


def test_clean_box_flags():
    track = {0: normalize_track_box(_box_entry(0, 10, 10, 20, 20)),
             1: normalize_track_box(_box_entry(1, 10, 10, 1, 1)),       # tiny
             2: normalize_track_box(_box_entry(2, 10, 10, 40, 4))}      # flat
    kept = clean_box_flags(track, (H, W))
    assert sorted(kept) == [0]
    # never clean a track away entirely
    only_bad = {1: track[1]}
    from vilco_tpu.data.vq_frames import load_vq_annotations  # noqa: F401
    assert clean_box_flags(only_bad, (H, W)) == {}


def test_balanced_frame_indices_covers_track():
    sample = {"track": {f: None for f in range(2, 9)},
              "valid_range": (2, 8), "query_frame": 10}
    rng = np.random.default_rng(0)
    for w, lo_req in ((4, 2), (16, 0)):
        idxs = balanced_frame_indices(w, sample, rng)
        assert len(idxs) == w and (idxs >= 0).all()
        # covers a contiguous-ish span overlapping the annotation
        assert idxs.max() >= 2 and idxs.min() <= 8


def test_square_pad_resize_centered():
    img = np.zeros((H, W, 3), np.float32)
    img[:, :, 0] = 1.0
    out = square_pad_resize(img, FRAME_SIZE, pad_value=0.0)
    assert out.shape == (FRAME_SIZE, FRAME_SIZE, 3)
    pad_rows = int((W - H) / 2 / W * FRAME_SIZE)
    assert out[pad_rows + 2:-pad_rows - 2, :, 0].min() > 0.9
    assert out[0, :, 0].max() == 0.0 and out[-1, :, 0].max() == 0.0


def test_load_and_frame_dir_source(tmp_path):
    anno_path, images_dir, frames = _write_dataset(tmp_path)
    samples = load_vq_annotations(str(anno_path), split="val")
    assert len(samples) == 1  # invalid query set skipped
    s = samples[0]
    assert s["category"] == "red box"
    assert s["query_frame"] == 10 and s["valid_range"] == (2, 8)
    assert sorted(s["track"]) == list(range(2, 9))

    src = FrameDirSource(str(images_dir), frame_size=FRAME_SIZE)
    clip = src.frames(s, [2, 5])
    assert clip.shape == (2, FRAME_SIZE, FRAME_SIZE, 3)
    # the red object pixel should be red at its padded-normalized box center
    x1, y1, x2, y2 = s["track"][2]
    cx, cy = int((x1 + x2) / 2 * FRAME_SIZE), int((y1 + y2) / 2 * FRAME_SIZE)
    pix = clip[0, cy, cx]
    assert pix[0] > 0.7 and pix[1] < 0.4

    q = src.query(s)
    assert q.shape == (FRAME_SIZE, FRAME_SIZE, 3)
    assert q[:, :, 0].mean() > 0.5  # query crop is mostly the red object


def test_video_frame_source(tmp_path):
    anno_path, images_dir, frames = _write_dataset(tmp_path)
    clip_dir = tmp_path / "clips"
    os.makedirs(clip_dir)
    path = str(clip_dir / "clip-abc.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5, (W, H))
    if not vw.isOpened():
        pytest.skip("no mp4 encoder in this cv2 build")
    for img in frames:
        vw.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    vw.release()

    samples = load_vq_annotations(str(anno_path), split="val")
    src = VideoFrameSource(str(clip_dir), frame_size=FRAME_SIZE)
    clip = src.frames(samples[0], [0, 3, 3, 2])  # seeks fwd + back
    assert clip.shape == (4, FRAME_SIZE, FRAME_SIZE, 3)
    assert np.allclose(clip[1], clip[2])
    # frame 3 carries the track box, frame 0 does not (lossy codec: loose)
    assert clip[1][:, :, 0].max() > 0.7


def test_runner_end_to_end_on_frame_dir(tmp_path):
    from vilco_tpu.tasks.vq import VQEpisodeRunner, VQTaskStream

    anno_path, images_dir, _ = _write_dataset(tmp_path)
    samples = load_vq_annotations(str(anno_path), split="val")
    tasks = group_by_category(samples, categories_per_task=1)
    stream = VQTaskStream(tasks, tasks)
    src = FrameDirSource(str(images_dir), frame_size=FRAME_SIZE)
    runner = VQEpisodeRunner(
        stream, src, str(tmp_path / "work"), window=4,
        frame_size=FRAME_SIZE, epochs=1, batch_size=1,
    )
    out = runner.run()
    assert len(out["tasks"]) == 1
    m = out["final"]
    assert np.isfinite(m["avg_tAP25"]) and np.isfinite(m["avg_success"])


def test_denormalize_track_box_roundtrip():
    from vilco_tpu.data.vq_frames import denormalize_track_box

    for (x, y, bw, bh) in [(0, 0, W, H), (10, 14, 16, 16), (50, 30, 14, 18)]:
        norm = normalize_track_box(_box_entry(0, x, y, bw, bh))
        x1, y1, x2, y2 = denormalize_track_box(norm, H, W)
        np.testing.assert_allclose([x1, y1, x2, y2],
                                   [x, y, x + bw, y + bh], atol=1e-6)
    # out-of-band coords (model predicted into the padding) clamp to the
    # original frame like the reference's process_bbox_prediction
    x1, y1, x2, y2 = denormalize_track_box([0.0, 0.0, 1.0, 1.0], H, W)
    assert (x1, y1, x2, y2) == (0.0, 0.0, float(W), float(H))


@pytest.mark.slow
def test_vq_submission_cli(tmp_path):
    """--submission writes the official ego4d_vq2d_challenge file: every
    query_set of the raw json present, predicted bboxes in original-pixel
    ints, unknown/invalid queries empty (inference_results.py:88-115)."""
    from vilco_tpu.bin import vq_infer

    anno_path, images_dir, _ = _write_dataset(tmp_path)
    sub_path = tmp_path / "sub.json"
    vq_infer.main([
        "--workdir", str(tmp_path / "work"),
        "--annotations", str(anno_path),
        "--images-dir", str(images_dir),
        "--frame-size", str(FRAME_SIZE), "--window", "4",
        "--categories-per-task", "1",
        "--submission", str(sub_path),
    ])
    sub = json.loads(sub_path.read_text())
    assert sub["challenge"] == "ego4d_vq2d_challenge"
    assert set(sub) >= {"version", "challenge", "results"}
    vids = sub["results"]["videos"]
    assert vids[0]["video_uid"] == "vid-1"
    preds = vids[0]["clips"][0]["predictions"][0]
    assert preds["annotation_uid"] == "anno-1"
    qs = preds["query_sets"]
    assert set(qs) == {"1", "2"}
    # the invalid query gets the reference's empty entry
    assert qs["2"] == {"bboxes": [], "score": 0.0}
    assert len(qs["1"]["bboxes"]) >= 1
    for b in qs["1"]["bboxes"]:
        assert set(b) == {"fno", "x1", "x2", "y1", "y2"}
        assert all(isinstance(b[k], int) for k in b)
        assert 0 <= b["x1"] <= b["x2"] <= W
        assert 0 <= b["y1"] <= b["y2"] <= H
        assert 0 <= b["fno"] < N_FRAMES
