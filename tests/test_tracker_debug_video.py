"""Trackers driver: debug-video rendering when raw videos + labels exist."""

import json
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from objectpermanence_tpu.infer.trackers import trackers_inference_main


def test_heuristic_with_debug_video(tmp_path):
    name = "vid_000001"
    num_frames = 6

    samples = tmp_path / "samples"
    labels = tmp_path / "labels"
    videos = tmp_path / "videos"
    for d in (samples, labels, videos):
        d.mkdir()

    # detections: snitch visible frames 0-1 and 4-5, hidden 2-3 near a cube
    bb, lab = [], []
    for f in range(num_frames):
        if f in (2, 3):
            bb.append(np.array([[50.0, 50.0, 90.0, 90.0]]))
            lab.append(np.array([5]))
        else:
            bb.append(np.array([[40.0, 40.0, 60.0, 60.0], [120.0, 30.0, 150.0, 70.0]]))
            lab.append(np.array([140, 5]))
    with open(samples / f"{name}.pkl", "wb") as f:
        pickle.dump({"bb": bb, "labels": lab}, f)

    gt = {"small_gold_spl_metal_Spl_0": [[40, 40, 20, 20]] * num_frames}
    (labels / f"{name}_bb.json").write_text(json.dumps(gt))

    writer = cv2.VideoWriter(str(videos / f"{name}.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 24, (160, 120))
    for _ in range(num_frames + 1):
        writer.write(np.zeros((120, 160, 3), np.uint8))
    writer.release()

    preds = trackers_inference_main("detector_heuristic", str(tmp_path / "out"), {
        "sample_dir": str(samples), "labels_dir": str(labels),
        "videos_dir": str(videos),
    })
    assert name in preds and len(preds[name]) == num_frames
    # snapped to the detection when visible
    assert preds[name][0] == [40, 40, 60, 60]
    out_video = tmp_path / "out" / f"{name}_results.avi"
    assert out_video.exists()
    cap = cv2.VideoCapture(str(out_video))
    assert cap.isOpened() and int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) >= num_frames
    cap.release()
