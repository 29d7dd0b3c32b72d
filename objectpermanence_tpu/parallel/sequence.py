"""Sequence (frame-axis) parallelism via shard_map.

The reference never scales sequence length (a hardcoded 300 frames through
a single-device LSTM, SURVEY §5 "long-context: absent"). The per-frame
parts of this pipeline — metric evaluation, per-frame encoders/attention,
the box-selection einsum, the output heads — are embarrassingly parallel
over frames, so for long-video headroom this module shards the FRAME axis
over the mesh's model axis while batch stays on the data axis, with
collectives riding ICI. Three entry points:

- `frame_sharded`: the generic facility — lift ANY frame-local function
  into a (batch, frames) = (data, model) sharded stage. Model builders
  are thin compositions of it; new models need no bespoke shard_map code.
- `make_sequence_parallel_iou`: frame-sharded eval metrics (psum reduce).
- `make_sequence_parallel_transformer_forward`: transformer_lstm with the
  per-frame 15-token encoder (its dominant compute: 2 attention layers +
  2048-wide FF per frame) sharded over frames; only the temporal LSTM
  recurrence runs on gathered frames.
- `make_sequence_parallel_opnet_forward`: OPNet with the attention head
  projection + softmax + box-selection einsum and the output box head
  sharded over frames; the two LSTM recurrences run on gathered frames.

The recurrences themselves stay sequential by nature — XLA inserts the
frame-axis all_gather at the shard_map boundary. Both forwards are
parity-tested against the single-device `spec.apply`
(tests/test_sequence_parallel.py) and run in `dryrun_multichip`.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from objectpermanence_tpu.ops.attention import encoder_apply, linear_apply
from objectpermanence_tpu.ops.boxes import FRAME_SHAPES, iou_xyxy
from objectpermanence_tpu.ops.lstm import lstm_apply, stacked_lstm_apply
from objectpermanence_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def frame_sharded(mesh, fn):
    """Lift a frame-local function into a sequence-parallel stage.

    `fn(params, *arrays) -> array | tuple[array, ...]` where every array
    argument and result is laid out (batch, frames, ...). The wrapped stage
    runs `fn` with (batch, frames) sharded over the mesh's (data, model)
    axes — each rank sees its local (B/d, T/m, ...) shard, with zero
    communication inside the stage. `fn` must therefore not mix
    information ACROSS frames (per-frame encoders, heads, einsums are
    fine; recurrences and temporal convolutions are not — run those on
    gathered sequences between stages, and XLA inserts the frame-axis
    all_gather at the shard_map boundary automatically).

    Params are replicated (P()); the leading (data, model) spec is a
    prefix, so arguments/results of any rank >= 2 work unchanged.
    Requires batch divisible by the data-axis size and frames by the
    model-axis size."""
    spec = P(DATA_AXIS, MODEL_AXIS)

    def wrapped(params, *arrays):
        staged = shard_map(fn, mesh=mesh,
                           in_specs=(P(),) + (spec,) * len(arrays),
                           out_specs=spec)
        return staged(params, *arrays)

    return wrapped


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


def make_sequence_parallel_transformer_forward(mesh):
    """transformer_lstm forward with the per-frame encoder compute sharded
    over (batch, frames) = (data, model).

    The encoder stage (box_proj + ReLU + N TransformerEncoder layers over
    15 object tokens + snitch-slot extraction) is per-frame — each rank
    runs it on its T/m frame shard with zero communication. Only the
    temporal LSTM recurrence (inherently sequential over frames,
    `models/reasoning.py:transformer_lstm_apply`) consumes gathered frames;
    XLA inserts the frame-axis all_gather at the shard_map boundary. The
    final box head is per-frame again and runs frame-sharded.

    Requires T divisible by the model-axis size. Uses the framework's
    default per-frame attention semantics (the `reference_compat`
    cross-batch mode is inherently unshardable over frames)."""

    def encoder_stage(p, boxes_s):
        b, t, o, _ = boxes_s.shape
        feats = jax.nn.relu(linear_apply(p["box_proj"], boxes_s))
        tokens = feats.reshape(b * t, o, -1)
        attended = encoder_apply(p["encoder"], tokens)
        return attended[:, 0, :].reshape(b, t, -1)    # snitch slot

    encoder_sp = frame_sharded(mesh, encoder_stage)
    head_sp = frame_sharded(mesh, linear_apply)

    @jax.jit
    def forward(params, boxes):
        snitch = encoder_sp(
            {"box_proj": params["box_proj"], "encoder": params["encoder"]},
            boxes)
        hidden = stacked_lstm_apply(params["video_lstm"], snitch)
        return head_sp(params["box_head"], hidden)

    return forward


def make_sequence_parallel_opnet_forward(mesh):
    """OPNet forward with every per-frame stage sharded over
    (batch, frames) = (data, model): the attention-head projection +
    softmax + box-selection einsum (between the two recurrences) and the
    output box head. The two LSTM recurrences (who-to-attend and video,
    `models/reasoning.py:opnet_apply`) are inherently sequential over
    frames and consume gathered sequences; XLA inserts the frame-axis
    all_gathers at the shard_map boundaries.

    Requires T divisible by the model-axis size."""

    def select_stage(att_head, boxes_s, att_h_s):
        logits = linear_apply(att_head, att_h_s)            # (b, t/m, 15)
        probs = jax.nn.softmax(logits, axis=-1)
        selected = jnp.einsum("bfot,bfo->bft", boxes_s, probs)
        return selected, logits

    select_sp = frame_sharded(mesh, select_stage)
    head_sp = frame_sharded(mesh, linear_apply)

    @jax.jit
    def forward(params, boxes):
        batch, frames, objects, feat = boxes.shape
        scene = boxes.reshape(batch, frames, objects * feat)
        att_h = lstm_apply(params["att_lstm"], scene)       # recurrence
        selected, logits = select_sp(params["att_head"], boxes, att_h)
        hidden = lstm_apply(params["video_lstm"], selected)  # recurrence
        y_boxes = head_sp(params["box_head"], hidden)
        return y_boxes, jnp.swapaxes(logits, 1, 2)

    return forward
