"""Fully-sharded data parallelism (ZeRO-3 style) for the reasoning models.

The reference scales on a single CUDA device (`training_main.py` has no
distributed path; SURVEY §2.15), so every parameter and both Adam moments
live replicated per device. Here each parameter leaf — and, because optax
Adam moments mirror the param pytree, each optimizer-state leaf — is
sharded over DATA_AXIS: per-device memory for model state drops by ~the
data-parallel degree. XLA's SPMD partitioner derives the runtime pattern
from the sharding annotations alone (scaling-book recipe): an all-gather
of each weight right before use in the forward/backward, and a
reduce-scatter of its gradient before the (sharded) Adam update. All
collectives ride ICI; nothing is hand-scheduled.

For the OPNet-size models this is memory headroom, not a speed play
(weights are ~MBs); the point is the axis itself — the same annotations
scale to any model the framework grows.
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from objectpermanence_tpu.parallel.mesh import DATA_AXIS


def fsdp_param_shardings(params: Any, mesh: Mesh, axis: str = DATA_AXIS,
                         min_size: int = 2 ** 12):
    """Per-leaf NamedShardings sharding the LARGEST divisible dim over
    `axis`. Leaves smaller than `min_size` elements (biases, layernorm
    scales) or with no dim divisible by the axis size stay replicated —
    gathering a 512-float bias costs more in latency than it saves in HBM.
    """
    n = mesh.shape[axis]

    def spec_for(leaf):
        if leaf.ndim == 0 or leaf.size < min_size:
            return NamedSharding(mesh, P())
        dims = sorted(range(leaf.ndim), key=lambda d: leaf.shape[d],
                      reverse=True)
        for d in dims:
            if leaf.shape[d] % n == 0:
                spec = [None] * leaf.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def fsdp_state_shardings(params: Any, opt_state: Any, mesh: Mesh,
                         axis: str = DATA_AXIS):
    """(param shardings, opt-state shardings). Adam's mu/nu mirror the
    param tree leaf-for-leaf, so each moment inherits its parameter's
    sharding; scalar leaves (step count, injected lr) replicate."""
    p_sh = fsdp_param_shardings(params, mesh, axis)
    p_leaves, p_def = jax.tree_util.tree_flatten(params)
    sh_leaves = p_def.flatten_up_to(p_sh)
    by_shape = {}
    for leaf, sh in zip(p_leaves, sh_leaves):
        by_shape.setdefault((leaf.shape, leaf.dtype), sh)

    def opt_spec(leaf):
        # moment tensors match some param's (shape, dtype); anything else
        # (counts, hyperparams) is tiny -> replicate
        return by_shape.get((leaf.shape, leaf.dtype),
                            NamedSharding(mesh, P()))

    return p_sh, jax.tree.map(opt_spec, opt_state)


def shard_train_state(params: Any, opt_state: Any, mesh: Mesh,
                      axis: str = DATA_AXIS):
    """Place params + optimizer state with FSDP shardings (device_put
    scatters each leaf's shards; from then on only the owning shard of
    each leaf occupies HBM per device)."""
    p_sh, o_sh = fsdp_state_shardings(params, opt_state, mesh, axis)
    return (jax.tree.map(jax.device_put, params, p_sh),
            jax.tree.map(jax.device_put, opt_state, o_sh))


def make_fsdp_train_step(spec, optimizer, mesh: Mesh, params: Any,
                         opt_state: Any):
    """jit train step with FSDP in/out shardings: params and opt state
    stay sharded across steps (gather-on-use inside the step), batches
    shard over DATA_AXIS, metrics replicate. Numerics are identical to the
    single-device step — same ops, different layout."""
    import optax

    from objectpermanence_tpu.parallel.mesh import batch_sharding
    from objectpermanence_tpu.train.loop import _forward
    from objectpermanence_tpu.train.losses import total_loss

    p_sh, o_sh = fsdp_state_shardings(params, opt_state, mesh)
    b_sh = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())
    on_tpu = jax.default_backend() == "tpu"

    def step(params, opt_state, boxes, labels, mask, rng):
        def loss_fn(p):
            from objectpermanence_tpu.ops import lstm as lstm_ops
            with lstm_ops.fused_scan(on_tpu):
                out = _forward(spec, p, boxes, False, rng)
            return total_loss(out, labels, mask, spec.no_labels)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    # donate params + opt state: without donation each step holds TWO copies
    # of the model state live (inputs + outputs), halving the very memory
    # headroom the sharding buys
    return jax.jit(step,
                   in_shardings=(p_sh, o_sh, b_sh, b_sh, b_sh, repl),
                   out_shardings=(p_sh, o_sh, repl),
                   donate_argnums=(0, 1))
