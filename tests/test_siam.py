"""SiamRPN tracker tests: network shapes, anchor generation vs the
reference formula, crop semantics, tracker-update math, end-to-end
detector_tracker reasoner on synthetic frames."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from objectpermanence_tpu.models import siam


@pytest.fixture(scope="module")
def params():
    return siam.siam_init(jax.random.PRNGKey(0))


def test_network_shapes(params):
    z = jnp.zeros((1, 3, 127, 127))
    kernels = siam.temple(params, z)
    assert kernels[0].shape == (20, 256, 4, 4)
    assert kernels[1].shape == (10, 256, 4, 4)

    x = jnp.zeros((1, 3, 271, 271))
    delta, score = siam.track_forward(params, kernels, x)
    assert delta.shape == (4, 5 * 19 * 19)
    assert score.shape == (5 * 19 * 19,)
    np.testing.assert_allclose(np.asarray(score).max(), np.asarray(score).max())

    x287 = jnp.zeros((1, 3, 287, 287))
    delta, score = siam.track_forward(params, kernels, x287)
    assert delta.shape == (4, 5 * 21 * 21)


def test_generate_anchor_reference_values():
    anchors = siam.generate_anchor(8, (8,), (0.33, 0.5, 1, 2, 3), 19)
    assert anchors.shape == (5 * 19 * 19, 4)
    # first anchor block: ratio 0.33 -> ws=int(sqrt(64/0.33))=13, hs=int(13*0.33)=4
    assert anchors[0, 2] == 13 * 8 and anchors[0, 3] == 4 * 8
    # grid origin: -(19/2)*8 = -76 (float division, so the grid is NOT
    # zero-centered: cell 9 sits at -76 + 9*8 = -4, as in the reference)
    assert anchors[0, 0] == -76.0 and anchors[0, 1] == -76.0
    ratio1 = anchors[2 * 19 * 19:3 * 19 * 19]
    center = ratio1[19 * 9 + 9]
    assert center[0] == -4.0 and center[1] == -4.0
    assert center[2] == 64.0 and center[3] == 64.0


def test_get_subwindow_interior_crop_identity():
    pytest.importorskip("cv2")
    im = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
    # fully interior crop, no resize (model_sz == original_sz)
    patch = siam.get_subwindow(im, (50.0, 50.0), 21, 21, np.zeros(3))
    c = (21 + 1) / 2
    y0 = x0 = round(50 - c)
    np.testing.assert_array_equal(patch, im[y0:y0 + 21, x0:x0 + 21])


def test_get_subwindow_pads_with_avg(pytestconfig):
    pytest.importorskip("cv2")
    im = np.full((50, 50, 3), 200, np.uint8)
    avg = np.array([7.0, 8.0, 9.0])
    patch = siam.get_subwindow(im, (0.0, 0.0), 31, 31, avg)
    # top-left corner is outside the image -> filled with avg_chans
    np.testing.assert_array_equal(patch[0, 0], np.array([7, 8, 9], np.uint8))
    np.testing.assert_array_equal(patch[-1, -1], [200, 200, 200])


def test_tracker_update_peak_moves_to_anchor_offset():
    """A unit-score peak at a known anchor with delta 0 shifts the target by
    exactly that anchor's offset; matching size gives penalty 1 so the
    smoothed size stays put."""
    score_size = 19
    anchors = siam.generate_anchor(8, (8,), (0.33, 0.5, 1, 2, 3), score_size)
    n = len(anchors)
    delta = np.zeros((4, n), np.float32)
    score = np.zeros(n, np.float32)
    peak_idx = 2 * score_size * score_size + 19 * 9 + 9  # ratio-1, offset (-4,-4)
    score[peak_idx] = 1.0
    window = np.zeros(n, np.float32)
    pos = np.array([100.0, 80.0])
    sz_scaled = np.array([64.0, 64.0])

    new_pos, new_sz, best = siam.tracker_update(
        delta, score, anchors, window, pos, sz_scaled, scale_z=1.0,
        penalty_k=0.04, window_influence=0.0, lr_factor=0.45)
    np.testing.assert_allclose(new_pos, pos + [-4.0, -4.0])
    assert best == 1.0
    # penalty==1 at matching size -> lr = 0.45; new = 64*(1-lr) + 64*lr = 64
    np.testing.assert_allclose(new_sz, [64.0, 64.0])


def test_detector_tracker_reasoner_runs(params):
    """detector_tracker path: snaps to detections when the snitch is seen,
    falls back to the (random-weight) tracker when hidden — state machine
    must stay consistent."""
    pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    frames = (rng.rand(4, 120, 160, 3) * 255).astype(np.uint8)
    preds = {
        "bb": [np.array([[40, 40, 60, 60]]), np.zeros((0, 4)),
               np.zeros((0, 4)), np.array([[45, 45, 65, 65]])],
        "labels": [np.array([140]), np.zeros(0, int), np.zeros(0, int),
                   np.array([140])],
    }
    reasoner = siam.ObjectDetectWithSiamTracker(siam.SiamRPNTracker(params))
    boxes = []
    for f in range(4):
        reasoner.track_for_frame(frames[f], f, preds)
        boxes.append((reasoner.snitch_visible, dict(reasoner.state)))
    assert boxes[0][0] is True and boxes[3][0] is True
    assert boxes[1][0] is False and boxes[2][0] is False
    assert boxes[0][1]["snitch_box"] == [40, 40, 60, 60]
    # tracker produced finite positions while the snitch was hidden
    pos = boxes[2][1]["target_pos"]
    assert np.isfinite(pos).all()
