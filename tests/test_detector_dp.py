"""Detector training under data parallelism: the jit train step with batch
sharded across the virtual 8-device mesh (XLA derives the gradient
all-reduce from the input shardings)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from objectpermanence_tpu.models.detector import anchors as anchor_lib
from objectpermanence_tpu.models.detector.detector import DetectorConfig, detector_init
from objectpermanence_tpu.models.detector.training import make_detector_train_step
from objectpermanence_tpu.parallel.mesh import batch_sharding, make_mesh, replicate

TINY = DetectorConfig(image_hw=(64, 96), min_size=64, max_size=96,
                      backbone_layers=(1, 1, 1, 1), backbone_width=8,
                      fpn_channels=16, rpn_pre_nms_top_n=50,
                      rpn_post_nms_top_n=30, detections_per_img=10,
                      backbone_norm="group")


def test_detector_train_step_data_parallel():
    mesh = make_mesh(n_data=8, n_model=1)
    anchors = [jnp.asarray(a) for a in anchor_lib.pyramid_anchors(
        TINY.feature_shapes(), TINY.strides, TINY.anchor_sizes)]
    params = jax.device_put(detector_init(jax.random.PRNGKey(0), TINY),
                            replicate(mesh))
    optimizer = optax.sgd(1e-3, momentum=0.9)
    opt_state = optimizer.init(params)
    step = make_detector_train_step(TINY, anchors, optimizer)

    rng = np.random.RandomState(0)
    sharding = batch_sharding(mesh)
    images = jax.device_put((rng.rand(8, 64, 96, 3) * 255).astype(np.float32),
                            sharding)
    gt_boxes = np.zeros((8, 4, 4), np.float32)
    gt_labels = np.zeros((8, 4), np.int32)
    gt_valid = np.zeros((8, 4), bool)
    for i in range(8):
        gt_boxes[i, 0] = [10, 10, 40, 40]
        gt_labels[i, 0] = 140
        gt_valid[i, 0] = True
    gt_boxes = jax.device_put(gt_boxes, sharding)
    gt_labels = jax.device_put(gt_labels, sharding)
    gt_valid = jax.device_put(gt_valid, sharding)

    params, opt_state, parts = step(params, opt_state, images, gt_boxes,
                                    gt_labels, gt_valid, jax.random.PRNGKey(1))
    loss = float(parts["loss"])
    assert np.isfinite(loss)
    # params remain replicated (gradients were all-reduced across the mesh)
    w = params["box_head"]["cls"]["w"]
    assert w.sharding.is_fully_replicated
