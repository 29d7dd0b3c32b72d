"""NMS / RoIAlign golden tests against straightforward numpy oracles
implementing the torchvision-documented semantics."""

import numpy as np
import jax.numpy as jnp

from objectpermanence_tpu.ops.nms import NEG_INF, batched_class_nms, nms_mask
from objectpermanence_tpu.ops.roi_align import roi_align


# --- numpy oracles -----------------------------------------------------------

def np_nms(boxes, scores, thresh):
    """Classic greedy NMS, zero-area convention (torchvision.ops.nms)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            xa, ya = max(boxes[i][0], boxes[j][0]), max(boxes[i][1], boxes[j][1])
            xb, yb = min(boxes[i][2], boxes[j][2]), min(boxes[i][3], boxes[j][3])
            inter = max(xb - xa, 0) * max(yb - ya, 0)
            area_i = (boxes[i][2] - boxes[i][0]) * (boxes[i][3] - boxes[i][1])
            area_j = (boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1])
            union = area_i + area_j - inter
            if union > 0 and inter / union > thresh:
                if scores[j] <= scores[i]:
                    suppressed[j] = True
    return sorted(keep)


def np_roi_align(feat, rois, scale, pooled=7, s=2):
    """Direct per-point implementation of torchvision roi_align
    (aligned=False, average pooling)."""
    c, h, w = feat.shape
    out = np.zeros((len(rois), c, pooled, pooled), np.float64)

    def sample(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c)
        y = min(max(y, 0), h - 1)
        x = min(max(x, 0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (feat[:, y0, x0] * (1 - ly) * (1 - lx) + feat[:, y0, x1] * (1 - ly) * lx +
                feat[:, y1, x0] * ly * (1 - lx) + feat[:, y1, x1] * ly * lx)

    for n, roi in enumerate(rois):
        x1r, y1r, x2r, y2r = [v * scale for v in roi]
        rw = max(x2r - x1r, 1.0)
        rh = max(y2r - y1r, 1.0)
        bw, bh = rw / pooled, rh / pooled
        for py in range(pooled):
            for px in range(pooled):
                acc = np.zeros(c)
                for iy in range(s):
                    for ix in range(s):
                        y = y1r + (py + (iy + 0.5) / s) * bh
                        x = x1r + (px + (ix + 0.5) / s) * bw
                        acc += sample(y, x)
                out[n, :, py, px] = acc / (s * s)
    return out


# --- tests -------------------------------------------------------------------

def test_nms_matches_oracle():
    rng = np.random.RandomState(0)
    boxes = np.zeros((40, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 200, 40)
    boxes[:, 1] = rng.uniform(0, 150, 40)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(10, 80, 40)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(10, 80, 40)
    scores = rng.rand(40).astype(np.float32)

    for thresh in (0.3, 0.5, 0.7):
        keep = np.flatnonzero(np.asarray(nms_mask(jnp.asarray(boxes),
                                                  jnp.asarray(scores), thresh)))
        expected = np_nms(boxes, scores, thresh)
        np.testing.assert_array_equal(keep, expected)


def test_nms_ignores_padding():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, NEG_INF, 0.8], np.float32)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_batched_class_nms_keeps_across_classes():
    # identical boxes, different classes: both survive
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.array([1, 2])
    keep = np.asarray(batched_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                        jnp.asarray(labels), 0.5))
    np.testing.assert_array_equal(keep, [True, True])
    # same class: lower suppressed
    keep = np.asarray(batched_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                        jnp.asarray(np.array([1, 1])), 0.5))
    np.testing.assert_array_equal(keep, [True, False])


def test_roi_align_matches_oracle():
    rng = np.random.RandomState(1)
    feat = rng.rand(3, 16, 20).astype(np.float32)
    rois = np.array([
        [0.0, 0.0, 40.0, 32.0],
        [10.0, 5.0, 70.0, 60.0],
        [35.5, 20.25, 61.0, 50.5],
        [-5.0, -5.0, 30.0, 30.0],     # partially outside
    ], np.float32)
    scale = 0.25
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), scale,
                               pooled=7, sampling_ratio=2))
    ref = np_roi_align(feat.astype(np.float64), rois, scale)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_roi_align_pooled_shape():
    feat = jnp.zeros((256, 50, 68))
    rois = jnp.asarray(np.array([[0, 0, 100, 100]], np.float32))
    out = roi_align(feat, rois, 0.125, pooled=7, sampling_ratio=2)
    assert out.shape == (1, 256, 7, 7)
