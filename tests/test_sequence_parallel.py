"""Sequence-parallel IoU evaluator AND frame-sharded model forwards vs the
single-device computations on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from objectpermanence_tpu.models.registry import get_model_spec
from objectpermanence_tpu.ops.boxes import FRAME_SHAPES, iou_xyxy
from objectpermanence_tpu.parallel.mesh import make_mesh
from objectpermanence_tpu.parallel.sequence import (
    make_sequence_parallel_iou,
    make_sequence_parallel_opnet_forward,
    make_sequence_parallel_transformer_forward,
)


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


def test_sp_opnet_forward_matches_single_device():
    """Frame-sharded OPNet forward (selection einsum + box head sharded
    over the model axis) == plain spec.apply."""
    mesh = make_mesh(n_data=4, n_model=2)
    cfg = {"object_to_track_pred_dim": 15, "object_to_track_hidden_dim": 32,
           "videos_hidden_dim": 48}
    spec = get_model_spec("opnet")
    params = spec.init(jax.random.PRNGKey(0), cfg)
    boxes = np.random.RandomState(1).rand(8, 20, 15, 6).astype(np.float32)

    ref_y, ref_logits = spec.apply(params, jnp.asarray(boxes))
    sp_fwd = make_sequence_parallel_opnet_forward(mesh)
    got_y, got_logits = sp_fwd(params, jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=2e-5, atol=2e-6)


def test_sp_transformer_forward_matches_single_device():
    """Frame-sharded transformer_lstm forward (per-frame encoder sharded
    over the model axis) == plain spec.apply."""
    mesh = make_mesh(n_data=4, n_model=2)
    cfg = {"boxes_features_dim": 32, "num_attention_heads": 2,
           "num_attention_layers": 2, "num_lstm_layers": 2,
           "lstm_hidden_dim": 48}
    spec = get_model_spec("transformer_lstm")
    params = spec.init(jax.random.PRNGKey(0), cfg)
    boxes = np.random.RandomState(2).rand(8, 20, 15, 5).astype(np.float32)

    ref = spec.apply(params, jnp.asarray(boxes))
    sp_fwd = make_sequence_parallel_transformer_forward(mesh)
    got = sp_fwd(params, jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_frame_sharded_generic_stage():
    """The generic facility handles an arbitrary NEW per-frame model stage
    (multi-input, multi-output, mixed ranks) with no bespoke shard_map."""
    from objectpermanence_tpu.parallel.sequence import frame_sharded

    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.RandomState(3)
    params = {"w": jnp.asarray(rng.randn(6, 10).astype(np.float32)),
              "b": jnp.asarray(rng.randn(10).astype(np.float32))}
    boxes = jnp.asarray(rng.rand(8, 16, 15, 6).astype(np.float32))
    gate = jnp.asarray(rng.rand(8, 16, 15).astype(np.float32))

    def stage(p, boxes, gate):
        feats = jnp.einsum("bfod,dh->bfoh", boxes, p["w"]) + p["b"]
        pooled = jnp.einsum("bfoh,bfo->bfh", jax.nn.relu(feats),
                            jax.nn.softmax(gate, axis=-1))
        return pooled, pooled.sum(-1)

    got_pooled, got_sum = frame_sharded(mesh, stage)(params, boxes, gate)
    ref_pooled, ref_sum = stage(params, boxes, gate)
    np.testing.assert_allclose(np.asarray(got_pooled), np.asarray(ref_pooled),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_sum), np.asarray(ref_sum),
                               rtol=2e-5, atol=2e-5)
