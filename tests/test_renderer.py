"""Renderer tests: frames contain the drawn objects, videos + detection CSV
round-trip into the existing dataset loaders."""

import numpy as np
import pytest

pytest.importorskip("cv2")

from objectpermanence_tpu.data.detection_dataset import DetectionDataset
from objectpermanence_tpu.datagen.renderer import render_dataset, render_video
from objectpermanence_tpu.datagen.simulator import SceneSimulator, simulate_dataset


def test_render_video_hides_contained_snitch():
    sim = SceneSimulator(seed=5, num_frames=40, num_objects=5)
    objs, movements = sim.build()
    scene = sim.scene_json(objs, movements)
    gt = sim.gt_bb_json(objs)

    frames, annotations = render_video(scene, gt, 40)
    assert frames.shape == (40, 240, 320, 3)
    # containment event (scripted at quarter = frame 10): snitch absent
    contain = next(m for m in movements["Cone_1"] if m[0] == "_contain")
    hidden_frame = contain[3] + 1
    assert 140 not in annotations[hidden_frame]["labels"]
    assert 140 in annotations[0]["labels"]
    # background and objects are distinguishable
    assert len(np.unique(frames[0].reshape(-1, 3), axis=0)) > 3


def test_render_dataset_roundtrip(tmp_path):
    import cv2

    scenes_dir, labels_dir = simulate_dataset(tmp_path, num_videos=2, seed=9,
                                              num_frames=30)
    videos_dir, det_dir, csv_path = render_dataset(
        scenes_dir, labels_dir, tmp_path / "render",
        detection_samples_per_video=3)

    videos = sorted(videos_dir.glob("*.avi"))
    assert len(videos) == 2
    cap = cv2.VideoCapture(str(videos[0]))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 31  # 30 + spare frame
    cap.release()

    ds = DetectionDataset(det_dir, csv_path)
    assert len(ds) == 6
    batch = next(ds.batches(2))
    assert batch["images"].shape == (2, 240, 320, 3)
    assert batch["gt_valid"].any()
