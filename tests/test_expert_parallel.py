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


def test_ep_head_grad_parity():
    """jax.grad through the shard_mapped ep head must match the dense
    head's grads (psum/ppermute transposes) with expert grads staying
    sharded — the property that makes ep TRAINING-grade, not
    inference-only."""
    params = moe_head_init(jax.random.PRNGKey(4), 24, 4, num_experts=4,
                           expert_hidden=16)
    h = jnp.asarray(np.random.RandomState(3).randn(8, 10, 24), jnp.float32)
    tgt = jnp.asarray(np.random.RandomState(4).randn(8, 10, 4), jnp.float32)

    ref = jax.grad(lambda p: jnp.mean((moe_head_apply(p, h) - tgt) ** 2))(
        params)

    mesh = make_expert_mesh(n_data=4, n_expert=2)
    sharded = shard_expert_params(params, mesh)
    ep = make_expert_parallel_moe_head(mesh)
    got = jax.grad(lambda p: jnp.mean((ep(p, h) - tgt) ** 2))(sharded)
    shard_shapes = {s.data.shape for s in got["w1"].addressable_shards}
    assert shard_shapes == {(2,) + got["w1"].shape[1:]}, shard_shapes
    for k in ("router", "w1", "w2"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def test_ep_head_trains():
    """A few adam steps through the sharded ep head must reduce the loss
    and keep the expert weights sharded through the update."""
    import optax
    params = moe_head_init(jax.random.PRNGKey(5), 16, 4, num_experts=4,
                           expert_hidden=8)
    mesh = make_expert_mesh(n_data=4, n_expert=2)
    params = shard_expert_params(params, mesh)
    ep = make_expert_parallel_moe_head(mesh)
    rs = np.random.RandomState(6)
    h = jnp.asarray(rs.randn(8, 10, 16), jnp.float32)
    # realizable target: a teacher head's output, so the loss can fall
    teacher = moe_head_init(jax.random.PRNGKey(7), 16, 4, num_experts=4,
                            expert_hidden=8)
    tgt = moe_head_apply(teacher, h)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def loss_fn(p):
        return jnp.mean((ep(p, h) - tgt) ** 2)

    losses = []
    for _ in range(12):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses
    shard_shapes = {s.data.shape for s in params["w1"].addressable_shards}
    assert shard_shapes == {(2,) + params["w1"].shape[1:]}, shard_shapes


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
    top1, gate, probs = moe_route(params, h)
    assert len(np.unique(np.asarray(top1))) >= 2
    assert np.all(np.asarray(gate) >= 1.0 / 4 - 1e-6)
    assert probs.shape == h.shape[:-1] + (4,)


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


def test_fused_kernel_dispatch_excludes_moe_and_mlp():
    """opnet_moe's box head has expert weights, not the dense {"w","b"} the
    fused Pallas kernel reads — routing it there crashed inference after
    the first trained moe sweep (KeyError: 'w'). The eligibility predicate
    must admit only the dense-OPNet family."""
    from objectpermanence_tpu.infer.reasoning import fused_opnet_eligible
    assert fused_opnet_eligible("opnet")
    assert fused_opnet_eligible("opnet_no_labels")
    assert not fused_opnet_eligible("opnet_moe")
    assert not fused_opnet_eligible("opnet_lstm_mlp")
    assert not fused_opnet_eligible("baseline_lstm")
    assert not fused_opnet_eligible("transformer_lstm")


def test_moe_balance_loss_detects_collapse():
    """Switch aux (Fedus et al. eq. 4-6): 1.0 at uniform routing, -> E as
    routing collapses onto one expert."""
    from objectpermanence_tpu.parallel.expert import (
        moe_balance_loss, moe_head_init, moe_route,
    )
    moe = moe_head_init(jax.random.PRNGKey(0), 16, 4, num_experts=4,
                        expert_hidden=8)
    h = jnp.asarray(np.abs(np.random.RandomState(0).randn(64, 16)) + 0.1,
                    jnp.float32)
    # near-uniform: zero router -> all probs 1/E, f_e sums to 1
    uniform = dict(moe, router=jnp.zeros_like(moe["router"]))
    _, _, probs = moe_route(uniform, h)
    assert np.isclose(float(moe_balance_loss(probs)), 1.0, atol=1e-5)
    # collapsed: all-positive features + a +100 column drive every token's
    # top-1 (and ~all probability mass) onto expert 2
    collapsed = dict(moe, router=jnp.zeros_like(moe["router"])
                     .at[:, 2].set(100.0))
    _, _, probs = moe_route(collapsed, h)
    val = float(moe_balance_loss(probs))
    assert val > 3.5, f"collapse should push aux toward E=4, got {val}"


def test_moe_train_step_applies_balance_loss():
    """The train step must add alpha*aux for opnet_moe (metrics carry
    balance_loss) and push gradient into the router THROUGH the aux, not
    only through the gate."""
    import optax
    from objectpermanence_tpu.models.registry import get_model_spec
    from objectpermanence_tpu.train.loop import make_train_step

    spec = get_model_spec("opnet_moe")
    assert spec.aux_loss_weight == 0.01
    config = {"object_to_track_pred_dim": 15,
              "object_to_track_hidden_dim": 32, "videos_hidden_dim": 48}
    params = spec.init(jax.random.PRNGKey(0), config)
    rs = np.random.RandomState(1)
    boxes = jnp.asarray(rs.rand(4, 12, 15, 6), jnp.float32)
    labels = jnp.asarray(rs.rand(4, 12, 4), jnp.float32)
    mask = jnp.ones((4, 12, 4), jnp.float32)
    opt = optax.adam(1e-3)
    step = make_train_step(spec, opt)
    _, _, metrics = step(params, opt.init(params), boxes, labels, mask,
                         jax.random.PRNGKey(2))
    assert "balance_loss" in metrics
    bal = float(metrics["balance_loss"])
    assert np.isfinite(bal) and bal >= 1.0 - 1e-4
    # loss includes the weighted aux exactly
    assert np.isclose(float(metrics["loss"]),
                      float(metrics["pred_loss"]) + 0.01 * bal, atol=1e-5)


def test_moe_balance_loss_token_weight_ignores_padding():
    """ADVICE r4: the ragged-batch padding rows must not shift the balance
    statistics — weighted f_e/P_e over real rows only."""
    import numpy as np
    from objectpermanence_tpu.parallel.expert import moe_balance_loss

    rng = np.random.default_rng(0)
    real = jax.nn.softmax(jnp.asarray(rng.normal(size=(3, 7, 4))), axis=-1)
    # padding rows route everything onto expert 0 — unweighted loss moves
    pad = jnp.zeros((2, 7, 4)).at[..., 0].set(1.0)
    probs = jnp.concatenate([real, pad], axis=0)
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])

    weighted = float(moe_balance_loss(probs, token_weight=w))
    real_only = float(moe_balance_loss(real))
    assert np.isclose(weighted, real_only, atol=1e-5)
    assert not np.isclose(float(moe_balance_loss(probs)), real_only, atol=1e-3)


def test_ep_generic_layer_custom_expert():
    """`make_expert_parallel_layer` handles an ARBITRARY expert computation
    (here a gated 3-matrix expert, a different shape family than the house
    MLP) with no bespoke shard_map code — parity vs the dense evaluation
    with identical top-1 routing."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from objectpermanence_tpu.parallel.expert import (
        EXPERT_AXIS, make_expert_parallel_layer,
    )

    rng = np.random.RandomState(7)
    E, IN, HID, OUT = 4, 24, 12, 5
    params = {
        "router": jnp.asarray(rng.randn(IN, E).astype(np.float32)) * 0.2,
        "experts": {
            "wg": jnp.asarray(rng.randn(E, IN, HID).astype(np.float32)) * 0.2,
            "wu": jnp.asarray(rng.randn(E, IN, HID).astype(np.float32)) * 0.2,
            "wo": jnp.asarray(rng.randn(E, HID, OUT).astype(np.float32)) * 0.2,
        },
    }
    h = jnp.asarray(rng.randn(8, 10, IN), jnp.float32)

    def expert_fn(ep, x):
        gated = jax.nn.sigmoid(x @ ep["wg"]) * (x @ ep["wu"])
        return gated @ ep["wo"]

    # dense reference with the same routing math
    top1, gate, _ = moe_route(params, h)
    outs = jax.vmap(lambda wg, wu, wo: expert_fn(
        {"wg": wg, "wu": wu, "wo": wo}, h))(
        params["experts"]["wg"], params["experts"]["wu"],
        params["experts"]["wo"])
    onehot = jax.nn.one_hot(top1, E, dtype=h.dtype)
    ref = jnp.einsum("e...o,...e->...o", outs, onehot) * gate[..., None]

    mesh = make_expert_mesh(n_data=4, n_expert=2)
    sharded = {
        "router": jax.device_put(params["router"], NamedSharding(mesh, P())),
        "experts": jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P(EXPERT_AXIS))), params["experts"]),
    }
    layer = make_expert_parallel_layer(mesh, expert_fn)
    got = layer(sharded, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
