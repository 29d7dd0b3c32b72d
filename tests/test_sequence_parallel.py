"""Sequence-parallel IoU evaluator vs the single-device computation on the
virtual 8-device mesh."""

import numpy as np
import jax.numpy as jnp

from objectpermanence_tpu.ops.boxes import FRAME_SHAPES, iou_xyxy
from objectpermanence_tpu.parallel.mesh import make_mesh
from objectpermanence_tpu.parallel.sequence import make_sequence_parallel_iou


def test_sp_iou_matches_single_device():
    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.RandomState(0)
    batch, frames = 8, 16  # frames divisible by the model axis
    pred = rng.rand(batch, frames, 4).astype(np.float32)
    labels = rng.rand(batch, frames, 4).astype(np.float32)
    mask = rng.rand(batch, frames, 4) > 0.6

    sp_iou = make_sequence_parallel_iou(mesh)
    got_mean, got_msum, got_mcnt = sp_iou(
        jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(mask))

    pred_px = (pred * np.asarray(FRAME_SHAPES)).astype(np.int32)
    label_px = (labels * np.asarray(FRAME_SHAPES)).astype(np.int32)
    iou = np.asarray(iou_xyxy(pred_px.astype(np.float64), label_px.astype(np.float64)))
    frame_mask = mask.sum(-1).astype(bool)

    np.testing.assert_allclose(np.asarray(got_mean), iou.mean(axis=1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_msum), (iou * frame_mask).sum(axis=1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_mcnt), frame_mask.sum(axis=1))
