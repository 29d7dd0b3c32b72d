"""Pipeline parallelism: a general N-stage GPipe engine (beyond-reference).

The engine (`make_gpipe_forward` / `make_gpipe_train_step`) runs ANY list of
stage functions as a fill-drain GPipe pipeline over a `pipe` mesh axis via
`shard_map` + `ppermute`: at schedule step t, pipe rank r computes stage r
on microbatch t-r, and activations cross the ICI ring `[(0,1),(1,2),...]`
between steps. `jax.grad` differentiates straight through the schedule
(ppermute/scan/switch/psum all transpose), so the backward is itself a
reverse pipeline over the same mesh.

Stage parameters are REALLY sharded, not replicated: per-stage param trees
are unioned by key path, zero-padded to a common per-path shape, and
stacked along a leading stage axis sharded over `pipe`
(`stack_stage_param_list`) — each rank stores only its own stage's weights.
Composes with data parallelism (batch axis sharded over `data` as usual).

OPNet (reference `learned_models.py:18-52`) is expressed through the engine
at two granularities (`opnet_pipeline_stages`): the classic 2-stage split
(A: who-to-attend LSTM + soft box selection, B: temporal video LSTM + box
head) and a 4-stage split (att LSTM / selection / video LSTM / box head)
that exercises a longer ring. For OPNet's actual size pipeline parallelism
is not a memory necessity — this exists to prove the framework's pp path
end-to-end (schedule, collective, sharding) the way `sequence.py` proves sp.
"""

from functools import partial
from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from objectpermanence_tpu.ops.lstm import lstm_apply
from objectpermanence_tpu.ops.attention import linear_apply

PIPE_AXIS = "pipe"


def _pad_to(a, shape):
    pads = [(0, t - s) for s, t in zip(a.shape, shape)]
    return jnp.pad(a, pads)


# ---------------------------------------------------------------------------
# stage-parameter stacking


def _union_stack(per_stage: Sequence):
    """Union a list of per-stage nested dicts (None = stage lacks the
    subtree) into one stacked tree with a leading stage axis."""
    dicts = [t for t in per_stage if t is not None]
    if all(isinstance(t, dict) for t in dicts):
        keys = sorted(set().union(*[t.keys() for t in dicts]))
        return {k: _union_stack([t.get(k) if t is not None else None
                                 for t in per_stage]) for k in keys}
    if not all(not isinstance(t, dict) for t in dicts):
        raise ValueError("stage param trees disagree on dict-vs-leaf")
    arrs = [jnp.asarray(t) for t in dicts]
    ndim = arrs[0].ndim
    if any(a.ndim != ndim for a in arrs):
        raise ValueError("stage param leaves disagree on rank")
    shape = tuple(max(a.shape[i] for a in arrs) for i in range(ndim))
    dtype = arrs[0].dtype
    rows = [jnp.zeros(shape, dtype) if t is None
            else _pad_to(jnp.asarray(t), shape) for t in per_stage]
    return jnp.stack(rows)


def stack_stage_param_list(stage_params: Sequence[Dict], mesh) -> Dict:
    """List of per-stage param trees -> one pipeline-sharded stacked tree.

    Key paths are unioned across stages (a stage missing a path stores
    zeros there), every leaf is zero-padded to the per-path max shape, and
    the result is stacked on a leading stage axis sharded over PIPE_AXIS —
    each pipe rank materializes only its slice. Zero-padded regions receive
    exactly zero gradient through the schedule (tested)."""
    stacked = _union_stack(list(stage_params))
    sharding = NamedSharding(mesh, P(PIPE_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)


# ---------------------------------------------------------------------------
# the generic N-stage GPipe schedule

# A stage function: fn(local_params, transit_in, microbatch) -> activation.
#   local_params: this rank's (unstacked) slice of the stacked tree —
#     zero-padded union layout; unpad with `_unpad_lstm`/`_unpad_head`-style
#     slicing before use.
#   transit_in (mb, T, transit_dim): previous stage's activation (stage 0
#     receives zeros and should read `microbatch` instead).
#   microbatch: this rank's current microbatch of the raw input (replicated
#     over pipe by the data sharding), for stages that need it (e.g.
#     OPNet's selection einsum).
# The returned activation may have any trailing dim <= transit_dim; the
# engine zero-pads it onto the ring.
StageFn = Callable


def _make_gpipe_per_shard(stage_fns: Sequence[StageFn], num_microbatches: int,
                          transit_dim: int, out_dim: int):
    n_stages = len(stage_fns)
    m = num_microbatches

    def per_shard(stacked, boxes):
        rank = jax.lax.axis_index(PIPE_AXIS)
        batch, frames = boxes.shape[:2]
        mb = batch // m
        mbs = boxes.reshape((m, mb) + boxes.shape[1:])
        # this rank's stage slice (shard_map gives a leading dim of 1)
        local = jax.tree.map(lambda a: a[0], stacked)

        def wrap(fn):
            def branch(op):
                transit_in, x_mb = op
                y = fn(local, transit_in, x_mb)
                return _pad_to(y, y.shape[:-1] + (transit_dim,))
            return branch

        branches = [wrap(fn) for fn in stage_fns]

        def step(carry, t):
            in_transit, outs = carry
            # rank r works on microbatch t - r (clamped: out-of-range steps
            # compute on garbage that the schedule never stores)
            x_mb = mbs[jnp.clip(t - rank, 0, m - 1)]
            act = jax.lax.switch(rank, branches, (in_transit, x_mb))
            # the last rank finishes microbatch t-(N-1); earlier steps
            # write garbage at index 0 and are overwritten at t=N-1
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, act[..., :out_dim],
                jnp.clip(t - (n_stages - 1), 0, m - 1), axis=0)
            # hand activations to the next rank over the ICI ring
            # (non-receiving ranks get zeros)
            in_transit = jax.lax.ppermute(
                act, PIPE_AXIS, [(i, i + 1) for i in range(n_stages - 1)])
            return (in_transit, outs), None

        init = (jnp.zeros((mb, frames, transit_dim), boxes.dtype),
                jnp.zeros((m, mb, frames, out_dim), boxes.dtype))
        (_, outs), _ = jax.lax.scan(step, init,
                                    jnp.arange(m + n_stages - 1))
        y = outs.reshape(batch, frames, out_dim)
        # results live on the last rank; broadcast so every pipe rank
        # returns the same replicated value (psum over a one-hot mask)
        y = jax.lax.psum(jnp.where(rank == n_stages - 1, y, 0.0), PIPE_AXIS)
        return y

    return per_shard


def make_gpipe_forward(mesh, stage_fns: Sequence[StageFn], *,
                       transit_dim: int, out_dim: int,
                       num_microbatches: int = 4):
    """-> fn(stacked_params, x (B, T, ...)) -> (B, T, out_dim).

    `stacked_params` from `stack_stage_param_list` (leading stage axis ==
    len(stage_fns) == mesh pipe size). Batch must divide
    data_par * num_microbatches."""
    if mesh.shape[PIPE_AXIS] != len(stage_fns):
        raise ValueError(
            f"mesh pipe axis is {mesh.shape[PIPE_AXIS]} but "
            f"{len(stage_fns)} stage functions were given")
    fn = shard_map(
        _make_gpipe_per_shard(stage_fns, num_microbatches, transit_dim,
                              out_dim),
        mesh=mesh, in_specs=(P(PIPE_AXIS), P("data")), out_specs=P("data"),
        check_vma=False)
    return jax.jit(fn)


def make_gpipe_train_step(mesh, stage_fns: Sequence[StageFn], optimizer, *,
                          transit_dim: int, out_dim: int,
                          num_microbatches: int = 4, loss_fn=None):
    """Training-grade N-stage pipeline: one jit step that differentiates
    THROUGH the GPipe schedule, computes the reference loss (L1 + temporal
    consistency, `training_main.py:192-210`, or a caller-supplied
    `loss_fn(y, labels, mask) -> (loss, metrics)`), and applies the
    optimizer to the stage-sharded stacked params — each pipe rank updates
    only its own stage's weights.

    -> step(stacked_params, opt_state, x, labels, mask)
       -> (stacked_params, opt_state, metrics)"""
    import optax

    from objectpermanence_tpu.train.losses import total_loss

    if loss_fn is None:
        loss_fn = lambda y, labels, mask: total_loss(y, labels, mask, False)

    if mesh.shape[PIPE_AXIS] != len(stage_fns):
        raise ValueError(
            f"mesh pipe axis is {mesh.shape[PIPE_AXIS]} but "
            f"{len(stage_fns)} stage functions were given")
    fwd = shard_map(
        _make_gpipe_per_shard(stage_fns, num_microbatches, transit_dim,
                              out_dim),
        mesh=mesh, in_specs=(P(PIPE_AXIS), P("data")), out_specs=P("data"),
        check_vma=False)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(stacked_params, opt_state, x, labels, mask):
        def objective(p):
            y = fwd(p, x)
            return loss_fn(y, labels, mask)

        (_, metrics), grads = jax.value_and_grad(objective, has_aux=True)(
            stacked_params)
        updates, opt_state = optimizer.update(grads, opt_state, stacked_params)
        stacked_params = optax.apply_updates(stacked_params, updates)
        return stacked_params, opt_state, metrics

    return train_step


# ---------------------------------------------------------------------------
# OPNet expressed through the engine (2- and 4-stage splits)

_FEAT = 6
_OBJECTS = 15


def _unpad_lstm(padded_lstm, in_dim: int, hidden: int):
    return {
        "w_ih": padded_lstm["w_ih"][:in_dim, :4 * hidden],
        "w_hh": padded_lstm["w_hh"][:hidden, :4 * hidden],
    }


def _unpad_head(padded_head, in_dim: int, out_dim: int):
    head = {"w": padded_head["w"][:in_dim, :out_dim]}
    if "b" in padded_head:
        head["b"] = padded_head["b"][:out_dim]
    return head


def opnet_pipeline_stages(config: Dict[str, int], num_stages: int = 2):
    """-> (stage_fns, transit_dim). Param layout: `stack_stage_params`.

    2-stage: (A) who-to-attend LSTM+head+selection, (B) video LSTM+head —
    the reference factoring. 4-stage: att LSTM / selection / video LSTM /
    box head, a longer ring with the same math."""
    att_hidden = config["object_to_track_hidden_dim"]
    att_out = config["object_to_track_pred_dim"]
    vid_hidden = config["videos_hidden_dim"]

    def att_lstm(local, transit, x_mb):
        lstm = _unpad_lstm(local["lstm"], _FEAT * _OBJECTS, att_hidden)
        scene = x_mb.reshape(x_mb.shape[:2] + (_OBJECTS * _FEAT,))
        return lstm_apply(lstm, scene)                       # (mb, T, att_h)

    def select(local, transit, x_mb):
        head = _unpad_head(local["head"], att_hidden, att_out)
        probs = jax.nn.softmax(
            linear_apply(head, transit[..., :att_hidden]), axis=-1)
        return jnp.einsum("bfot,bfo->bft", x_mb, probs)      # (mb, T, 6)

    def video_lstm(local, transit, x_mb):
        lstm = _unpad_lstm(local["lstm"], _FEAT, vid_hidden)
        return lstm_apply(lstm, transit[..., :_FEAT])        # (mb, T, vid_h)

    def box_head(local, transit, x_mb):
        head = _unpad_head(local["head"], vid_hidden, 4)
        return linear_apply(head, transit[..., :vid_hidden])  # (mb, T, 4)

    def stage_a(local, transit, x_mb):                       # fused A
        h = att_lstm(local, transit, x_mb)
        return select({"head": local["head"]}, h, x_mb)

    def stage_b(local, transit, x_mb):                       # fused B
        h = video_lstm(local, transit, x_mb)
        return box_head(local, h, x_mb)

    if num_stages == 2:
        return [stage_a, stage_b], max(_FEAT, 4)
    if num_stages == 4:
        return ([att_lstm, select, video_lstm, box_head],
                max(att_hidden, vid_hidden, _FEAT, 4))
    raise ValueError(f"unsupported OPNet split: {num_stages} stages")


def stack_stage_params(params: Dict, mesh, num_stages: int = 2) -> Dict:
    """OPNet params -> pipeline-sharded stacked tree for the chosen split."""
    if num_stages == 2:
        trees = [
            {"lstm": params["att_lstm"], "head": params["att_head"]},
            {"lstm": params["video_lstm"], "head": params["box_head"]},
        ]
    elif num_stages == 4:
        trees = [
            {"lstm": params["att_lstm"]},
            {"head": params["att_head"]},
            {"lstm": params["video_lstm"]},
            {"head": params["box_head"]},
        ]
    else:
        raise ValueError(f"unsupported OPNet split: {num_stages} stages")
    return stack_stage_param_list(trees, mesh)


def make_pipelined_opnet_forward(mesh, config: Dict[str, int],
                                 num_microbatches: int = 4,
                                 num_stages: int = 2):
    """-> fn(stacked_params, boxes (B, T, 15, F)) -> (B, T, 4) boxes.

    `stacked_params` from `stack_stage_params` with the same `num_stages`.
    The forward matches `opnet_apply`'s box output exactly (the
    who-to-attend logits stay internal here)."""
    stage_fns, transit = opnet_pipeline_stages(config, num_stages)
    return make_gpipe_forward(mesh, stage_fns, transit_dim=transit,
                              out_dim=4, num_microbatches=num_microbatches)


def make_pipelined_opnet_train_step(mesh, config: Dict[str, int], optimizer,
                                    num_microbatches: int = 4,
                                    num_stages: int = 2):
    """One jit step that differentiates through the N-stage GPipe schedule
    and updates the stage-sharded weights in place. Gradient parity vs the
    single-device train step is tested in tests/test_pipeline_parallel.py."""
    stage_fns, transit = opnet_pipeline_stages(config, num_stages)
    return make_gpipe_train_step(mesh, stage_fns, optimizer,
                                 transit_dim=transit, out_dim=4,
                                 num_microbatches=num_microbatches)
