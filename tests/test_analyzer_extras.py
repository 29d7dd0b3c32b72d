"""Analyzer extras: precision sweep, defect skipping, masked-map columns,
detector host tools."""

import numpy as np
import pytest

from objectpermanence_tpu.analysis.analyzer import ResultsAnalyzer


def _analyzer():
    rng = np.random.RandomState(0)
    labels = np.zeros((3, 10, 4))
    labels[..., 2:] = 50
    preds = labels.copy()
    preds[1] += 20          # shifted -> IoU ~ (30/70)^2 area overlap
    preds[2] += 100         # disjoint -> IoU 0
    return ResultsAnalyzer(["a", "b", "c"], preds, labels, [0.5, 0.9])


def test_precision_sweep_columns():
    an = _analyzer()
    an.compute_precision_data(thresholds=[0.25, 0.5])
    df = an.get_analysis_df()
    assert "precision_0.25_iou" in df.columns
    assert "precision_0.5_iou" in df.columns
    # perfect video passes every threshold; disjoint video passes none
    assert df[df.videos_names == "a"]["precision_0.5_iou"].iloc[0] == 1.0
    assert df[df.videos_names == "c"]["precision_0.5_iou"].iloc[0] == 0.0


def test_defected_videos_skipped():
    labels = np.zeros((2, 5, 4))
    labels[..., 2:] = 10
    preds = labels.copy()
    preds[1, 0, 0] = -100   # defect sentinel
    an = ResultsAnalyzer(["good", "bad"], preds, labels)
    assert an.video_names == ["good"]


def test_masked_map_columns():
    an = _analyzer()
    masks = {"a": np.ones(10, bool), "b": np.zeros(10, bool),
             "c": np.ones(10, bool)}
    an.compute_aggregated_metric_masking_frames(
        "contained", lambda x: x.sum() / x.shape[0], masks, metric="map")
    df = an.get_analysis_df()
    assert "contained_mean_map_0.5" in df.columns
    # video b has no masked frames -> NaN
    assert np.isnan(df[df.videos_names == "b"]["contained_mean_map_0.5"].iloc[0])


def test_detector_tools_draw(tmp_path):
    pytest.importorskip("cv2")
    from objectpermanence_tpu.infer.detector_tools import draw_detections, save_detector_output

    image = np.zeros((60, 80, 3), np.uint8)
    boxes = np.array([[5, 5, 30, 30], [40, 10, 70, 50]], np.float64)
    labels = np.array([140, 0])
    out = draw_detections(image, boxes, labels, valid=[True, True])
    assert out.any()            # something was drawn
    assert not image.any()      # input untouched
    save_detector_output(tmp_path / "det.png", image, boxes, labels)
    assert (tmp_path / "det.png").exists()
