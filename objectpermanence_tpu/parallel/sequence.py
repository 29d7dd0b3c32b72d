"""Sequence (frame-axis) parallelism via shard_map.

The reference never scales sequence length (a hardcoded 300 frames through
a single-device LSTM, SURVEY §5 "long-context: absent"). The per-frame
parts of this pipeline — IoU/metric evaluation, per-frame attention — are
embarrassingly parallel over frames, so for long-video headroom this module
shards the FRAME axis over the mesh's model axis while batch stays on the
data axis, with `psum` collectives reducing across frame shards (riding
ICI). Used by the multi-chip dry run; the single-chip eval path keeps the
plain jnp version.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from objectpermanence_tpu.ops.boxes import FRAME_SHAPES, iou_xyxy
from objectpermanence_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def make_sequence_parallel_iou(mesh):
    """Batched per-video IoU stats with (batch, frames) sharded over
    (data, model): returns (video_mean_iou (B,), masked_iou_sum (B,),
    masked_frames (B,)) — identical to the single-device computation in
    `train.loop.make_eval_step`."""

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS, MODEL_AXIS, None),
                       P(DATA_AXIS, MODEL_AXIS, None),
                       P(DATA_AXIS, MODEL_AXIS, None)),
             out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)))
    def sp_iou(pred, labels, mask):
        # local shard: (B/d, T/m, 4)
        pred_px = (pred * FRAME_SHAPES).astype(jnp.int32)
        label_px = (labels * FRAME_SHAPES).astype(jnp.int32)
        iou = iou_xyxy(pred_px.astype(jnp.float32), label_px.astype(jnp.float32))

        local_frames = jnp.full(iou.shape[:1], iou.shape[1], jnp.float32)
        total_frames = jax.lax.psum(local_frames, MODEL_AXIS)
        iou_sum = jax.lax.psum(jnp.sum(iou, axis=1), MODEL_AXIS)

        frame_mask = jnp.sum(mask, axis=-1).astype(bool)
        masked_sum = jax.lax.psum(jnp.sum(iou * frame_mask, axis=1), MODEL_AXIS)
        masked_frames = jax.lax.psum(
            jnp.sum(frame_mask, axis=1).astype(jnp.float32), MODEL_AXIS)
        return iou_sum / total_frames, masked_sum, masked_frames

    return sp_iou
