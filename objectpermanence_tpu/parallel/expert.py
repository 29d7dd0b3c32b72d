"""Expert parallelism (beyond-reference, like `sequence.py`/`pipeline.py`).

The reference has no mixture-of-experts component (SURVEY §2.15: TP/PP/SP/
EP all absent), so — as with sequence and pipeline parallelism — this
module exists to make the framework's ep path real end-to-end: a
Switch-style top-1-routed MoE box head (`moe_head_*`, usable by the
`opnet_moe` model variant) whose experts are REALLY sharded over an
`expert` mesh axis via `shard_map` (`make_expert_parallel_moe_head`).

Sharding layout: every expert weight carries a leading `num_experts` axis
partitioned over `EXPERT_AXIS`, so each rank stores and computes only its
own experts; the router is replicated. Tokens stay batch-sharded on the
`data` axis (composes with dp). Dispatch is dense-masked: each rank
evaluates its local experts on its local tokens, zeroes tokens routed
elsewhere, and a `psum` over the expert axis (riding ICI) combines the
shards. For CATER-scale experts a masked psum beats an all_to_all
shuffle — there is no capacity/overflow machinery to get wrong, and the
collective payload is one (B, T, out) array.
"""

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from objectpermanence_tpu.parallel.mesh import DATA_AXIS

EXPERT_AXIS = "expert"

Params = Dict[str, Any]


def moe_head_init(key, in_dim: int, out_dim: int, *, num_experts: int = 4,
                  expert_hidden: int = 128, dtype=jnp.float32) -> Params:
    """Switch-style MoE head: router Linear(in->E) + E two-layer MLP
    experts (in -> hidden -> out), all bias-free like the house heads."""
    k_r, k_1, k_2 = jax.random.split(key, 3)
    scale_r = 1.0 / jnp.sqrt(in_dim)
    scale_1 = 1.0 / jnp.sqrt(in_dim)
    scale_2 = 1.0 / jnp.sqrt(expert_hidden)
    return {
        "router": (jax.random.uniform(k_r, (in_dim, num_experts), dtype,
                                      -scale_r, scale_r)),
        "w1": jax.random.uniform(k_1, (num_experts, in_dim, expert_hidden),
                                 dtype, -scale_1, scale_1),
        "w2": jax.random.uniform(k_2, (num_experts, expert_hidden, out_dim),
                                 dtype, -scale_2, scale_2),
    }


def _expert_mlp(w1, w2, h, precision):
    """h (..., in) through one expert's MLP -> (..., out)."""
    hidden = jax.nn.relu(jnp.einsum("...i,ih->...h", h, w1,
                                    precision=precision))
    return jnp.einsum("...h,ho->...o", hidden, w2, precision=precision)


def moe_route(params: Params, h, precision=None):
    """-> (top1 expert index (...,), gate probability (...,),
    router probs (..., E))."""
    logits = jnp.einsum("...i,ie->...e", h, params["router"],
                        precision=precision)
    probs = jax.nn.softmax(logits, axis=-1)
    top1 = jnp.argmax(probs, axis=-1)
    gate = jnp.max(probs, axis=-1)
    return top1, gate, probs


def moe_head_apply(params: Params, h, *, precision=None,
                   return_probs: bool = False):
    """Dense single-device reference: evaluate every expert and combine
    with the one-hot top-1 gate (gradients reach the router through the
    gate probability, as in Switch Transformers). With `return_probs` also
    returns the router probs, so the training loss can derive the balance
    auxiliary from the SAME routing computation."""
    top1, gate, probs = moe_route(params, h, precision)
    num_experts = params["w1"].shape[0]
    outs = jax.vmap(lambda w1, w2: _expert_mlp(w1, w2, h, precision)
                    )(params["w1"], params["w2"])            # (E, ..., out)
    onehot = jax.nn.one_hot(top1, num_experts, dtype=h.dtype)  # (..., E)
    combined = jnp.einsum("e...o,...e->...o", outs, onehot)
    out = combined * gate[..., None]
    return (out, probs) if return_probs else out


def moe_balance_loss(probs, token_weight=None):
    """Switch-Transformers load-balance auxiliary (Fedus et al. 2021,
    eq. 4-6) from router probs (..., E): `E * sum_e f_e * P_e`, where `f_e`
    is the fraction of tokens whose top-1 expert is `e` and `P_e` the mean
    router probability mass on `e`. Equals 1 at perfectly uniform routing
    and grows as routing collapses; gradients reach the router through
    `P_e` (the `f_e` argmax is non-differentiable, as in the paper).
    Without this term the top-1 router collapses in practice — the first
    trained opnet_moe sweep put 98.8% of tokens on one expert.

    `token_weight` (broadcastable to probs' token dims) turns f_e/P_e into
    weighted means — used by the train step to zero the repeated-row
    padding of a ragged final batch, which would otherwise push duplicate
    samples' gradient into the router through this term."""
    num_experts = probs.shape[-1]
    token_axes = tuple(range(probs.ndim - 1))
    top1 = jnp.argmax(probs, axis=-1)
    onehot = jax.nn.one_hot(top1, num_experts, dtype=probs.dtype)
    if token_weight is None:
        f = jnp.mean(onehot, axis=token_axes)
        p = jnp.mean(probs, axis=token_axes)
    else:
        w = jnp.asarray(token_weight, probs.dtype)
        w = w.reshape(w.shape + (1,) * (probs.ndim - w.ndim))
        w = jnp.broadcast_to(w, probs.shape)
        denom = jnp.maximum(jnp.sum(w, axis=token_axes), 1e-6)
        f = jnp.sum(onehot * w, axis=token_axes) / denom
        p = jnp.sum(probs * w, axis=token_axes) / denom
    return num_experts * jnp.sum(f * p)


def expert_param_shardings(mesh) -> Params:
    """Sharding tree for `moe_head_init` output: experts split over
    EXPERT_AXIS, router replicated."""
    return {
        "router": NamedSharding(mesh, P()),
        "w1": NamedSharding(mesh, P(EXPERT_AXIS)),
        "w2": NamedSharding(mesh, P(EXPERT_AXIS)),
    }


def shard_expert_params(params: Params, mesh) -> Params:
    shardings = expert_param_shardings(mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def make_expert_parallel_layer(mesh, expert_fn, precision=None):
    """Generic Switch-style top-1 expert-parallel layer over ANY expert
    computation — the reusable facility the MoE box head instantiates.

    `expert_fn(expert_params, h) -> (..., out)` evaluates ONE expert given
    that expert's parameter slice (leaves WITHOUT the leading num_experts
    axis); it may be any jax-traceable function (MLPs, gated blocks,
    low-rank adapters, ...). Call-time params are
    `{"router": (in, E), "experts": <pytree, every leaf (E, ...)>}`;
    shard with `P(EXPERT_AXIS)` on the expert leaves (prefix spec) and the
    router replicated. Each rank evaluates only its local experts on its
    batch shard (dense-masked dispatch), and a psum over EXPERT_AXIS
    combines — same layout story as the module docstring."""

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=({"router": P(), "experts": P(EXPERT_AXIS)},
                       P(DATA_AXIS)),
             out_specs=P(DATA_AXIS))
    def ep_layer(params, h):
        local_e = jax.tree.leaves(params["experts"])[0].shape[0]
        first = jax.lax.axis_index(EXPERT_AXIS) * local_e
        top1, gate, _ = moe_route(params, h, precision)
        local = top1 - first                                  # (B, T)
        outs = jax.vmap(lambda ep: expert_fn(ep, h)
                        )(params["experts"])                  # (Eloc,B,T,out)
        onehot = jax.nn.one_hot(local, local_e, dtype=h.dtype)
        combined = jnp.einsum("e...o,...e->...o", outs, onehot)
        combined = combined * gate[..., None]
        return jax.lax.psum(combined, EXPERT_AXIS)

    return ep_layer


def make_expert_parallel_moe_head(mesh, precision=None):
    """-> fn(sharded_params, h (B, T, in)) -> (B, T, out), numerically
    identical to `moe_head_apply` but with each rank computing only its
    local experts; an instantiation of `make_expert_parallel_layer` with
    the house two-layer-MLP expert over the flat moe_head param layout."""
    layer = make_expert_parallel_layer(
        mesh, lambda ep, h: _expert_mlp(ep["w1"], ep["w2"], h, precision),
        precision=precision)

    def ep_head(params, h):
        return layer({"router": params["router"],
                      "experts": {"w1": params["w1"], "w2": params["w2"]}}, h)

    return ep_head
