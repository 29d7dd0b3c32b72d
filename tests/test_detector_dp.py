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


def _tiny_dataset(tmp_path):
    import csv
    from PIL import Image
    from objectpermanence_tpu.data.detection_dataset import DetectionDataset

    rng = np.random.RandomState(7)
    images_dir = tmp_path / "imgs"
    images_dir.mkdir()
    rows = []
    for i in range(10):
        img = np.zeros((64, 96, 3), np.uint8)
        x, y = rng.randint(5, 60), rng.randint(5, 30)
        img[y:y + 20, x:x + 20] = [255, 220, 0]
        rows.append([f"img_{i}.png", "small_gold_spl_metal", x, y, 20, 20])
        Image.fromarray(img).save(images_dir / f"img_{i}.png")
    csv_path = tmp_path / "ann.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filename", "object_class", "X", "Y", "width", "height"])
        w.writerows(rows)
    return DetectionDataset(images_dir, csv_path)


def test_train_detector_loop_data_parallel(tmp_path):
    """Full driver loop with batches sharded over the virtual 8-device mesh
    (reference recipe is single-GPU, `object_detection/training.py:30`)."""
    from objectpermanence_tpu.train.detector_loop import train_detector

    ds = _tiny_dataset(tmp_path)
    mesh = make_mesh(n_data=8, n_model=1)
    result = train_detector(
        ds, None, TINY, num_epochs=1, batch_size=5,  # rounds up to 8
        learning_rate=1e-3, warmup_iters=2,
        checkpoint_dir=str(tmp_path / "ckpt"), print_step=100, mesh=mesh)
    assert np.isfinite(result["history"][0]["train_loss"])
    w = result["params"]["box_head"]["cls"]["w"]
    assert w.sharding.is_fully_replicated


def test_train_detector_epoch_resume(tmp_path):
    """Epoch-level resume: detector fine-tunes stream fresh host batches
    every step, which leaks tunnel transfer buffers until the OS kills the
    process (twostage dettrain died at epoch 13/16) — a killed run must
    restart from its last finished epoch, not from scratch."""
    from objectpermanence_tpu.train.detector_loop import train_detector

    ds = _tiny_dataset(tmp_path)
    ckpt_dir = tmp_path / "ckpt"
    first = train_detector(ds, None, TINY, num_epochs=1, batch_size=5,
                           learning_rate=1e-3, warmup_iters=2,
                           checkpoint_dir=str(ckpt_dir), print_step=100)
    assert (ckpt_dir / "resume" / "epoch_0001" / "metadata.json").exists()

    # "interrupted after epoch 1 of 2": the resumed call runs ONLY epoch 2
    second = train_detector(ds, None, TINY, num_epochs=2, batch_size=5,
                            learning_rate=1e-3, warmup_iters=2,
                            checkpoint_dir=str(ckpt_dir), print_step=100,
                            resume=True)
    assert [h["epoch"] for h in second["history"]] == [2]
    assert np.isfinite(second["history"][0]["train_loss"])
    # only the newest resume state is kept (detector states are large)
    kept = sorted(p.name for p in (ckpt_dir / "resume").iterdir())
    assert kept == ["epoch_0002"]
    # resumed params actually moved on from the epoch-1 state
    p1 = first["params"]["box_head"]["cls"]["w"]
    p2 = second["params"]["box_head"]["cls"]["w"]
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


import pytest

pytestmark = pytest.mark.slow  # full-lane: see tests/conftest.py
