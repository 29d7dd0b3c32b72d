"""Mixed-precision (bf16 compute) detector path: the same parameters must
produce closely-aligned losses and gradients vs the float32 path (params
stay fp32 masters; only backbone/FPN/head compute drops to bf16)."""

import numpy as np
import jax
import jax.numpy as jnp

from objectpermanence_tpu.models.detector import anchors as anchor_lib
from objectpermanence_tpu.models.detector.detector import (
    DetectorConfig, detect_forward, detector_init,
)
from objectpermanence_tpu.models.detector.training import detection_loss

BASE = dict(image_hw=(64, 96), min_size=64, max_size=96,
            backbone_layers=(1, 1, 1, 1), backbone_width=8,
            fpn_channels=16, rpn_pre_nms_top_n=50, rpn_post_nms_top_n=30,
            detections_per_img=10, backbone_norm="group")
FP32 = DetectorConfig(**BASE)
BF16 = DetectorConfig(compute_dtype="bfloat16", **BASE)


def _setup():
    anchors = [jnp.asarray(a) for a in anchor_lib.pyramid_anchors(
        FP32.feature_shapes(), FP32.strides, FP32.anchor_sizes)]
    params = detector_init(jax.random.PRNGKey(0), FP32)
    rng = np.random.RandomState(0)
    images = (rng.rand(2, 64, 96, 3) * 255).astype(np.float32)
    gt_boxes = np.zeros((2, 4, 4), np.float32)
    gt_labels = np.zeros((2, 4), np.int32)
    gt_valid = np.zeros((2, 4), bool)
    for i in range(2):
        gt_boxes[i, 0] = [10, 10, 40, 40]
        gt_labels[i, 0] = 140
        gt_valid[i, 0] = True
    return anchors, params, images, gt_boxes, gt_labels, gt_valid


def test_bf16_loss_and_grads_track_fp32():
    anchors, params, images, gtb, gtl, gtv = _setup()
    key = jax.random.PRNGKey(3)

    def loss_for(config):
        def fn(p):
            loss, _ = detection_loss(p, jnp.asarray(images), jnp.asarray(gtb),
                                     jnp.asarray(gtl), jnp.asarray(gtv), key,
                                     config, anchors)
            return loss
        return jax.value_and_grad(fn)(params)

    loss32, grads32 = loss_for(FP32)
    loss16, grads16 = loss_for(BF16)

    assert np.isfinite(float(loss16))
    assert abs(float(loss16) - float(loss32)) < 0.1 * abs(float(loss32)) + 0.05

    # gradients stay fp32 (master params) and point the same way
    flat32, _ = jax.flatten_util.ravel_pytree(grads32)
    flat16, _ = jax.flatten_util.ravel_pytree(grads16)
    assert flat16.dtype == jnp.float32
    v32, v16 = np.asarray(flat32), np.asarray(flat16)
    assert np.all(np.isfinite(v16))
    cos = float(v32 @ v16 / (np.linalg.norm(v32) * np.linalg.norm(v16) + 1e-12))
    assert cos > 0.98, f"bf16 gradient diverges from fp32 (cos={cos:.4f})"


def test_bf16_inference_detections_track_fp32():
    anchors, params, images, *_ = _setup()
    out32 = detect_forward(params, jnp.asarray(images), FP32, anchors)
    out16 = detect_forward(params, jnp.asarray(images), BF16, anchors)
    boxes32, _, scores32, valid32 = [np.asarray(o) for o in out32]
    boxes16, _, scores16, valid16 = [np.asarray(o) for o in out16]
    assert boxes16.dtype == np.float32
    # random-init detector: just require the score distributions to agree
    # closely where both are valid (decode/NMS math is fp32 in both paths)
    both = valid32 & valid16
    if both.any():
        np.testing.assert_allclose(scores16[both], scores32[both],
                                   rtol=0.1, atol=0.02)

import pytest

pytestmark = pytest.mark.slow  # full-lane: see tests/conftest.py
