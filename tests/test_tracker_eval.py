"""OTB-style tracker benchmark harness tests."""

import numpy as np
import pytest

from objectpermanence_tpu.analysis import tracker_eval


def test_ope_metrics_perfect_and_off():
    gt = np.array([[10, 10, 20, 20]] * 5, float)
    m = tracker_eval.ope_metrics(gt, gt.copy())
    # IoU 1.0 beats thresholds 0..0.95 but not the >1.0 comparison at t=1.0
    assert m["mean_iou"] == 1.0
    assert m["precision_20px"] == 1.0
    assert m["success_auc"] == pytest.approx(20 / 21)

    far = gt.copy()
    far[:, 0] += 100
    m = tracker_eval.ope_metrics(gt, far)
    assert m["mean_iou"] == 0.0 and m["precision_20px"] == 0.0


class _StaticTracker:
    """Stays wherever it was initialized."""

    class State:
        def __init__(self, pos, sz):
            self.pos, self.sz = pos, sz

    def init(self, frame, pos, sz):
        return self.State(pos, sz)

    def track(self, state, frame):
        return state


def test_evaluate_tracker_with_static_tracker():
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (60, 80, 3), np.uint8) for _ in range(6)]
    # target static for 3 frames then moves away
    gt = np.array([[20, 20, 16, 16]] * 3 + [[60, 40, 16, 16]] * 3, float)
    result = tracker_eval.evaluate_tracker(_StaticTracker(),
                                           [{"frames": frames, "gt": gt}])
    assert result["mean_iou"] == pytest.approx(0.5, abs=1e-6)
    assert result["precision_20px"] == pytest.approx(0.5, abs=1e-6)
    assert len(result["per_sequence"]) == 1


def test_siam_tracker_interface_compatible():
    """The SiamRPN tracker plugs into the harness (random weights: just
    interface + finiteness, not accuracy)."""
    pytest.importorskip("cv2")
    import jax
    from objectpermanence_tpu.models.siam import SiamRPNTracker

    tracker = SiamRPNTracker(seed=0)
    rng = np.random.RandomState(1)
    frames = [rng.randint(0, 255, (120, 160, 3), np.uint8) for _ in range(3)]
    gt = np.array([[50, 40, 30, 30]] * 3, float)
    result = tracker_eval.evaluate_tracker(tracker, [{"frames": frames, "gt": gt}])
    assert np.isfinite(result["mean_iou"])
