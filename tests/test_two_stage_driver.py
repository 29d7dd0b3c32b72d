"""CPU end-to-end coverage of the scaled two-stage driver
(`scripts/two_stage_run.py`): simulated scenes -> rendered pixels ->
detector train -> od_real detection pickles -> OPNet on REAL detections ->
analysis CSV. Mirrors the reference's primary experiment path
(`/root/reference/baselines/preprocess_perception_main.py:99-114` ->
`training_main.py:120-252`) at toy scale with a reduced detector config.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import two_stage_run as ts
from objectpermanence_tpu.datagen import scene_labels
from objectpermanence_tpu.datagen.perfect_perception import (
    PerfectPerceptionGenerator,
)
from objectpermanence_tpu.datagen.simulator import simulate_dataset
from objectpermanence_tpu.models.detector.detector import DetectorConfig

# 60x80 input, 4-block depth-1 backbone: small enough for CPU, still the
# real Faster R-CNN code path
TINY = DetectorConfig(min_size=60, max_size=80, backbone_layers=(1, 1, 1, 1),
                      backbone_width=16, fpn_channels=32,
                      rpn_pre_nms_top_n=100, rpn_post_nms_top_n=60,
                      detections_per_img=16, backbone_norm="group")


@pytest.fixture(scope="module")
def stage_dirs(tmp_path_factory):
    mp = pytest.MonkeyPatch()
    mp.setattr(ts, "detector_config", lambda: TINY)
    src = tmp_path_factory.mktemp("src")
    root = tmp_path_factory.mktemp("twostage")
    # videos must be the reference's 300 frames — preprocess_main skips
    # any other length (`preprocess_perception_main.py:92-96` parity)
    for i, split in enumerate(ts.SPLITS):
        split_dir = src / split
        scenes_dir, labels_dir = simulate_dataset(
            split_dir, num_videos=2, seed=41 + i, num_frames=300,
            num_objects=4)
        scene_labels.write_annotation_files(scenes_dir,
                                            split_dir / "annotations")
        gen = PerfectPerceptionGenerator(scenes_dir, labels_dir,
                                         split_dir / "od_perception",
                                         visible_ratio=0.99,
                                         mode="visible_only")
        gen.generate()
        gen.generate_snitch_visible_frames()
    yield src, root
    mp.undo()


def test_render_and_dettrain(stage_dirs):
    src, root = stage_dirs
    ts.render(src, root, det_samples=2)
    for split in ts.SPLITS:
        assert len(list((root / split / "videos").glob("*.avi"))) == 2
        assert (root / split / "detection_annotations.csv").exists()
    ts.dettrain(root, epochs=1, batch_size=2, lr=5e-3)
    assert (root / "detector" / ".done").exists()
    report = (root / "detector" / "report.json").read_text()
    assert "best_dev_map" in report


def test_preprocess_worker_real_pickles(stage_dirs):
    src, root = stage_dirs
    for split in ts.SPLITS:
        names = sorted(p.name for p in
                       (root / split / "videos").glob("*.avi"))
        (root / split / "preprocess_todo.txt").write_text(
            "".join(n + "\n" for n in names))
        ts._preprocess_split_worker(root, split, batch_size=16)
        pkls = sorted((root / split / "od_real").glob("*.pkl"))
        assert len(pkls) == 2, f"{split}: expected 2 perception pickles"
    # schema parity: 300 ragged frames of float32 boxes + int64 labels
    import pickle

    with open(pkls[0], "rb") as f:
        data = pickle.load(f)
    assert set(data) == {"bb", "labels"}
    assert len(data["bb"]) == 300 and len(data["labels"]) == 300
    for bb, lab in zip(data["bb"], data["labels"]):
        assert np.asarray(bb).dtype == np.float32
        assert len(bb) == len(lab)


def test_opnet_and_analyze_on_real_detections(stage_dirs):
    src, root = stage_dirs
    ts.opnet(root, src, epochs=2, resume=False)
    ts.analyze(root, src)
    csv = (root / "analysis.csv").read_text()
    header = csv.splitlines()[0]
    # the reference analysis CSV stratifications (`analyze_iou_offline.py`)
    for col in ("overall_iou", "contained_mean_iou",
                "full_occlusion_mean_iou", "overall_map_0.5"):
        assert col in header, f"missing {col} stratification"

pytestmark = pytest.mark.slow  # full-lane: see tests/conftest.py
