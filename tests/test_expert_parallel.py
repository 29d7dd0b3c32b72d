"""Expert parallelism (parallel/expert.py): dp+ep MoE head parity against
the dense single-device apply on the virtual 8-device CPU mesh, sharding
checks, and the opnet_moe model variant."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from objectpermanence_tpu.models.registry import get_model_spec
from objectpermanence_tpu.parallel.expert import (
    make_expert_parallel_moe_head, moe_head_apply, moe_head_init,
    moe_route, shard_expert_params,
)
from objectpermanence_tpu.parallel.mesh import make_expert_mesh


def test_ep_head_matches_dense():
    params = moe_head_init(jax.random.PRNGKey(0), 24, 4, num_experts=4,
                           expert_hidden=16)
    h = jnp.asarray(np.random.RandomState(0).randn(8, 10, 24), jnp.float32)
    ref = moe_head_apply(params, h)

    mesh = make_expert_mesh(n_data=4, n_expert=2)
    sharded = shard_expert_params(params, mesh)
    ep = make_expert_parallel_moe_head(mesh)
    got = ep(sharded, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_ep_expert_params_really_sharded():
    """Each expert rank must hold only its slice of the expert weights."""
    params = moe_head_init(jax.random.PRNGKey(1), 24, 4, num_experts=4,
                           expert_hidden=16)
    mesh = make_expert_mesh(n_data=4, n_expert=2)
    sharded = shard_expert_params(params, mesh)
    w1 = sharded["w1"]
    shard_shapes = {s.data.shape for s in w1.addressable_shards}
    assert shard_shapes == {(2,) + w1.shape[1:]}, shard_shapes
    # router replicated
    router_shapes = {s.data.shape for s in sharded["router"].addressable_shards}
    assert router_shapes == {sharded["router"].shape}


def test_routing_uses_multiple_experts():
    """Random init must not route every token to one expert (the parity
    test would be vacuous if the off-rank mask never fired)."""
    params = moe_head_init(jax.random.PRNGKey(2), 24, 4, num_experts=4,
                           expert_hidden=16)
    h = jnp.asarray(np.random.RandomState(1).randn(16, 10, 24), jnp.float32)
    top1, gate = moe_route(params, h)
    assert len(np.unique(np.asarray(top1))) >= 2
    assert np.all(np.asarray(gate) >= 1.0 / 4 - 1e-6)


@pytest.mark.slow
def test_opnet_moe_forward_and_grad():
    """The registered opnet_moe variant: double-output forward with the
    standard opnet config (MoE keys defaulted) and finite grads."""
    spec = get_model_spec("opnet_moe")
    assert spec.feature_width == 6 and spec.double_output
    config = {"object_to_track_pred_dim": 15,
              "object_to_track_hidden_dim": 32, "videos_hidden_dim": 48}
    params = spec.init(jax.random.PRNGKey(0), config)
    boxes = jnp.asarray(np.random.RandomState(0).rand(4, 12, 15, 6),
                        jnp.float32)
    y, logits = spec.apply(params, boxes)
    assert y.shape == (4, 12, 4)
    assert logits.shape == (4, 15, 12)

    def loss(p):
        out, _ = spec.apply(p, boxes)
        return jnp.mean(jnp.abs(out))

    grads = jax.grad(loss)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # the router must receive gradient through the top-1 gate
    assert float(jnp.max(jnp.abs(grads["box_head"]["router"]))) > 0
