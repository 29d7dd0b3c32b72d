"""Detector stack tests: matcher/sampler semantics, detection mAP metric,
tiny end-to-end fine-tune + preprocess driver round trip."""

import csv
import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from objectpermanence_tpu.analysis.detection_eval import evaluate_detections
from objectpermanence_tpu.models.detector import anchors as anchor_lib
from objectpermanence_tpu.models.detector.boxcoder import (
    ROI_WEIGHTS, decode, encode,
)
from objectpermanence_tpu.models.detector.detector import CaterDetector, DetectorConfig, detector_init
from objectpermanence_tpu.models.detector.training import (
    BELOW_LOW, BETWEEN, balanced_sample, match_boxes, make_detector_train_step,
)

TINY = DetectorConfig(image_hw=(120, 160), min_size=128, max_size=256,
                      backbone_layers=(1, 1, 1, 1), backbone_width=16,
                      fpn_channels=32, rpn_pre_nms_top_n=200,
                      rpn_post_nms_top_n=100, detections_per_img=20)


def test_box_coder_roundtrip():
    rng = np.random.RandomState(0)
    proposals = np.zeros((30, 4), np.float32)
    proposals[:, 0] = rng.uniform(0, 100, 30)
    proposals[:, 1] = rng.uniform(0, 100, 30)
    proposals[:, 2] = proposals[:, 0] + rng.uniform(5, 50, 30)
    proposals[:, 3] = proposals[:, 1] + rng.uniform(5, 50, 30)
    targets = proposals + rng.uniform(-3, 3, (30, 4)).astype(np.float32)
    targets[:, 2:] = np.maximum(targets[:, 2:], targets[:, :2] + 1)
    deltas = encode(jnp.asarray(targets), jnp.asarray(proposals), ROI_WEIGHTS)
    back = decode(jnp.asarray(proposals), deltas, ROI_WEIGHTS)
    np.testing.assert_allclose(np.asarray(back), targets, rtol=1e-4, atol=1e-3)


def test_matcher_thresholds():
    gt = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    gt_valid = jnp.asarray([True])
    candidates = jnp.asarray(np.array([
        [0, 0, 10, 10],      # IoU 1.0 -> match 0
        [0, 0, 10, 5],       # IoU 0.5 -> between (0.7/0.3)
        [50, 50, 60, 60],    # IoU 0.0 -> below
    ], np.float32))
    m = match_boxes(gt, gt_valid, candidates, 0.7, 0.3, allow_low_quality=False)
    np.testing.assert_array_equal(np.asarray(m), [0, BETWEEN, BELOW_LOW])


def test_matcher_low_quality_forces_best():
    # no candidate reaches the high threshold, but the best one is forced
    gt = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    gt_valid = jnp.asarray([True])
    candidates = jnp.asarray(np.array([
        [0, 0, 10, 6],       # IoU 0.6: best for this gt
        [50, 50, 60, 60],
    ], np.float32))
    m = match_boxes(gt, gt_valid, candidates, 0.7, 0.3, allow_low_quality=True)
    assert int(m[0]) == 0
    assert int(m[1]) == BELOW_LOW


def test_balanced_sample_counts():
    matches = jnp.asarray(np.array([0] * 10 + [BELOW_LOW] * 90))
    sampled, pos = balanced_sample(jax.random.PRNGKey(0), matches, 32, 0.5)
    # 10 positives available < 16 wanted -> all 10 pos + 22 neg
    assert int(pos.sum()) == 10
    assert int(sampled.sum()) == 32
    assert int(jnp.logical_and(sampled, matches == BELOW_LOW).sum()) == 22


def test_detection_eval_perfect_and_empty():
    gt = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float),
           "labels": np.array([1, 2])}]
    perfect = [{"boxes": gt[0]["boxes"].copy(), "labels": gt[0]["labels"].copy(),
                "scores": np.array([0.9, 0.8])}]
    m = evaluate_detections(perfect, gt)
    assert m["mAP"] == pytest.approx(1.0)
    assert m["AP50"] == pytest.approx(1.0)

    empty = [{"boxes": np.zeros((0, 4)), "labels": np.zeros(0, int),
              "scores": np.zeros(0)}]
    m = evaluate_detections(empty, gt)
    assert m["mAP"] == 0.0


def test_detection_eval_localization_quality():
    gt = [{"boxes": np.array([[0, 0, 100, 100]], float), "labels": np.array([1])}]
    # IoU ~0.6 box: counts at threshold 0.5/0.55/0.6 but not 0.75+
    offset = [{"boxes": np.array([[0, 0, 100, 60]], float),
               "labels": np.array([1]), "scores": np.array([0.9])}]
    m = evaluate_detections(offset, gt)
    assert m["AP50"] == pytest.approx(1.0)
    assert m["AP75"] == 0.0
    assert 0 < m["mAP"] < 1


@pytest.fixture(scope="module")
def tiny_fixture_detection_data(tmp_path_factory):
    """Synthetic shapes dataset in the reference CSV schema: bright
    rectangles of two 'classes' on dark background."""
    from PIL import Image

    root = tmp_path_factory.mktemp("det")
    images_dir = root / "images"
    images_dir.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for i in range(4):
        img = np.zeros((120, 160, 3), np.uint8)
        # class 140 (snitch): yellow square
        x, y = rng.randint(10, 100), rng.randint(10, 70)
        img[y:y + 30, x:x + 30] = [255, 220, 0]
        rows.append([f"img_{i}.png", "small_gold_spl_metal", x, y, 30, 30])
        # class 5: blue rectangle
        x2, y2 = rng.randint(10, 90), rng.randint(10, 60)
        img[y2:y2 + 40, x2:x2 + 50] = [0, 60, 255]
        rows.append([f"img_{i}.png", "large_brown_cube_metal", x2, y2, 50, 40])
        Image.fromarray(img).save(images_dir / f"img_{i}.png")

    csv_path = root / "annotations.csv"
    with open(csv_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["filename", "object_class", "X", "Y", "width", "height"])
        writer.writerows(rows)
    return images_dir, csv_path


def test_detection_dataset_loading(tiny_fixture_detection_data):
    from objectpermanence_tpu.data.detection_dataset import DetectionDataset
    images_dir, csv_path = tiny_fixture_detection_data
    ds = DetectionDataset(images_dir, csv_path)
    assert len(ds) == 4
    batch = next(ds.batches(2))
    assert batch["images"].shape == (2, 120, 160, 3)
    assert batch["gt_boxes"].shape == (2, 20, 4)
    assert batch["gt_valid"][:, :2].all() and not batch["gt_valid"][:, 2:].any()
    assert set(batch["gt_labels"][0][:2]) == {140, 5}


@pytest.mark.slow
def test_detector_train_step_loss_decreases():
    anchors = [jnp.asarray(a) for a in anchor_lib.pyramid_anchors(
        TINY.feature_shapes(), TINY.strides, TINY.anchor_sizes)]
    params = detector_init(jax.random.PRNGKey(0), TINY)
    opt = optax.sgd(0.01, momentum=0.9)
    opt_state = opt.init(params)
    step = make_detector_train_step(TINY, anchors, opt)

    rng = np.random.RandomState(0)
    images = (rng.rand(2, 120, 160, 3) * 255).astype(np.float32)
    gt_boxes = np.zeros((2, 8, 4), np.float32)
    gt_labels = np.zeros((2, 8), np.int32)
    gt_valid = np.zeros((2, 8), bool)
    gt_boxes[0, 0] = [20, 30, 60, 80]; gt_labels[0, 0] = 140; gt_valid[0, 0] = True
    gt_boxes[1, 0] = [40, 40, 100, 100]; gt_labels[1, 0] = 77; gt_valid[1, 0] = True

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        key, sub = jax.random.split(key)
        params, opt_state, parts = step(
            params, opt_state, jnp.asarray(images), jnp.asarray(gt_boxes),
            jnp.asarray(gt_labels), jnp.asarray(gt_valid), sub)
        losses.append(float(parts["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_preprocess_driver_writes_reference_schema(tmp_path, monkeypatch):
    """preprocess_main on a synthetic avi with an untrained tiny detector:
    the pickle must carry the reference {'bb','labels'} schema."""
    cv2 = pytest.importorskip("cv2")
    from objectpermanence_tpu.infer import preprocess

    videos_dir = tmp_path / "videos"
    videos_dir.mkdir()
    # 6 valid frames; VideoHandling drops cv2's "extra" frame so write 7
    writer = cv2.VideoWriter(str(videos_dir / "vid_000001.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 24, (160, 120))
    rng = np.random.RandomState(0)
    for _ in range(7):
        writer.write((rng.rand(120, 160, 3) * 255).astype(np.uint8))
    writer.release()

    monkeypatch.setattr(preprocess, "VIDEO_NUM_FRAMES", 6)
    monkeypatch.setattr(
        CaterDetector, "load",
        classmethod(lambda cls, path, config=None: cls(TINY)))

    written = preprocess.preprocess_main(
        str(tmp_path / "out"), {"videos_dir": str(videos_dir), "batch_size": 4})
    assert written == ["vid_000001"]
    with open(tmp_path / "out" / "vid_000001.pkl", "rb") as f:
        data = pickle.load(f)
    assert set(data) == {"bb", "labels"}
    assert len(data["bb"]) == 6 and len(data["labels"]) == 6
    for bb, labels in zip(data["bb"], data["labels"]):
        assert bb.ndim == 2 and bb.shape[1] == 4
        assert labels.ndim == 1 and len(labels) == len(bb)
