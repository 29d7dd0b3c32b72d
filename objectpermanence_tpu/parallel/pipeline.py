"""Pipeline parallelism for OPNet (beyond-reference, like `sequence.py`).

OPNet factors into two sequential stages (reference `learned_models.py:
18-52`): (A) the who-to-attend LSTM + soft box selection and (B) the
temporal video LSTM + box head. This module runs them as a 2-stage GPipe
fill-drain pipeline over a `pipe` mesh axis via `shard_map` + `ppermute`:
rank 0 computes stage A on microbatch m while rank 1 computes stage B on
microbatch m-1, with the selected-box activations (B_mb, T, 6) crossing
the ICI between steps.

Stage parameters are REALLY sharded, not replicated: every leaf is
zero-padded to a common per-stage shape and stacked along a leading
stage axis that is sharded over `pipe`, so each rank stores only its own
stage's weights. Composes with data parallelism (batch axis sharded over
`data` as usual).

For OPNet's actual size pipeline parallelism is not a memory necessity —
this exists to prove the framework's pp path end-to-end (schedule,
collective, sharding) the way `sequence.py` proves sp.
"""

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from objectpermanence_tpu.ops.lstm import lstm_apply
from objectpermanence_tpu.ops.attention import linear_apply

PIPE_AXIS = "pipe"


def _pad_to(a, shape):
    pads = [(0, t - s) for s, t in zip(a.shape, shape)]
    return jnp.pad(a, pads)


def stack_stage_params(params: Dict, mesh) -> Dict:
    """OPNet params -> pipeline-sharded stacked tree.

    Stage 0 holds {att_lstm, att_head}, stage 1 {video_lstm, box_head}.
    Matching roles are padded to a common shape and stacked on a leading
    axis sharded over PIPE_AXIS; each rank materializes only its slice."""
    stage_a = {"lstm": params["att_lstm"], "head": params["att_head"]}
    stage_b = {"lstm": params["video_lstm"], "head": params["box_head"]}

    def stack(a, b):
        shape = tuple(max(s, t) for s, t in zip(a.shape, b.shape))
        return jnp.stack([_pad_to(a, shape), _pad_to(b, shape)])

    stacked = jax.tree.map(stack, stage_a, stage_b)
    sharding = NamedSharding(mesh, P(PIPE_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)


def _unpad_lstm(stacked_lstm, in_dim: int, hidden: int):
    return {
        "w_ih": stacked_lstm["w_ih"][0, :in_dim, :4 * hidden],
        "w_hh": stacked_lstm["w_hh"][0, :hidden, :4 * hidden],
    }


def _unpad_head(stacked_head, in_dim: int, out_dim: int):
    head = {"w": stacked_head["w"][0, :in_dim, :out_dim]}
    if "b" in stacked_head:
        head["b"] = stacked_head["b"][0, :out_dim]
    return head


def _make_per_shard(config: Dict[str, int], num_microbatches: int):
    """The per-shard GPipe fill-drain schedule shared by the forward and
    the train step."""
    att_hidden = config["object_to_track_hidden_dim"]
    att_out = config["object_to_track_pred_dim"]
    vid_hidden = config["videos_hidden_dim"]
    feat = 6
    objects = 15
    m = num_microbatches

    def per_shard(stacked, boxes):
        rank = jax.lax.axis_index(PIPE_AXIS)
        batch, frames = boxes.shape[:2]
        mb = batch // m
        mbs = boxes.reshape(m, mb, frames, objects, feat)

        # both branches run on every rank (SPMD); each rank's stacked
        # slice holds only ITS stage, so the other branch computes on
        # padded garbage and is masked out of the carry below
        def stage_a(x):
            lstm = _unpad_lstm(stacked["lstm"], feat * objects, att_hidden)
            head = _unpad_head(stacked["head"], att_hidden, att_out)
            scene = x.reshape(mb, frames, objects * feat)
            att_h = lstm_apply(lstm, scene)
            probs = jax.nn.softmax(linear_apply(head, att_h), axis=-1)
            return jnp.einsum("bfot,bfo->bft", x, probs)

        def stage_b(sel):
            lstm = _unpad_lstm(stacked["lstm"], feat, vid_hidden)
            head = _unpad_head(stacked["head"], vid_hidden, 4)
            return linear_apply(head, lstm_apply(lstm, sel))

        def step(carry, t):
            in_transit, outs = carry
            # every rank runs both branches (SPMD); only rank 0's stage-A
            # and rank 1's stage-B results are real — the schedule below
            # keeps exactly those
            a_out = stage_a(mbs[jnp.minimum(t, m - 1)])
            b_out = stage_b(in_transit)
            # fill-drain: at step t rank 1 finishes microbatch t-1. The
            # t=0 write puts garbage at index 0 and is overwritten at t=1.
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, b_out, jnp.maximum(t - 1, 0), axis=0)
            # hand stage-A activations to the next rank over ICI
            # (non-receiving ranks get zeros)
            in_transit = jax.lax.ppermute(a_out, PIPE_AXIS, [(0, 1)])
            return (in_transit, outs), None

        init = (jnp.zeros((mb, frames, feat), boxes.dtype),
                jnp.zeros((m, mb, frames, 4), boxes.dtype))
        (_, outs), _ = jax.lax.scan(step, init, jnp.arange(m + 1))
        y = outs.reshape(batch, frames, 4)
        # results live on rank 1; broadcast so every pipe rank returns the
        # same replicated value (psum over a one-hot mask)
        y = jax.lax.psum(jnp.where(rank == 1, y, 0.0), PIPE_AXIS)
        return y

    return per_shard


def make_pipelined_opnet_forward(mesh, config: Dict[str, int],
                                 num_microbatches: int = 4):
    """-> fn(stacked_params, boxes (B, T, 15, F)) -> (B, T, 4) boxes.

    `stacked_params` from `stack_stage_params`. Batch must divide
    data_par * num_microbatches. The forward matches `opnet_apply`'s box
    output exactly (the who-to-attend logits stay internal here)."""
    fn = shard_map(_make_per_shard(config, num_microbatches), mesh=mesh,
                   in_specs=(P(PIPE_AXIS), P("data")),
                   out_specs=P("data"),
                   check_vma=False)
    return jax.jit(fn)


def make_pipelined_opnet_train_step(mesh, config: Dict[str, int], optimizer,
                                    num_microbatches: int = 4):
    """Training-grade pipeline parallelism: one jit step that differentiates
    THROUGH the GPipe schedule (jax.grad over the shard_mapped fill-drain
    forward — ppermute/scan/psum all transpose, so the backward is itself a
    reverse pipeline over the same mesh), computes the reference loss
    (L1 + temporal consistency, `training_main.py:192-210`), and applies
    the optimizer to the stage-sharded stacked params — each pipe rank
    updates only its own stage's weights.

    -> step(stacked_params, opt_state, boxes, labels, mask)
       -> (stacked_params, opt_state, metrics)

    Gradient parity vs the single-device train step is tested in
    tests/test_pipeline_parallel.py."""
    import optax

    from objectpermanence_tpu.train.losses import total_loss

    fwd = shard_map(_make_per_shard(config, num_microbatches), mesh=mesh,
                    in_specs=(P(PIPE_AXIS), P("data")),
                    out_specs=P("data"),
                    check_vma=False)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(stacked_params, opt_state, boxes, labels, mask):
        def loss_fn(p):
            y = fwd(p, boxes)
            return total_loss(y, labels, mask, False)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            stacked_params)
        updates, opt_state = optimizer.update(grads, opt_state, stacked_params)
        stacked_params = optax.apply_updates(stacked_params, updates)
        return stacked_params, opt_state, metrics

    return train_step
