"""FSDP (parallel/fsdp.py): ZeRO-style param + optimizer-state sharding on
the virtual 8-device CPU mesh. Checks (1) large leaves are REALLY sharded
(each device holds 1/n of the leaf), (2) a sharded train step matches the
single-device train step numerically, (3) shardings survive the update."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from objectpermanence_tpu.models.registry import init_model
from objectpermanence_tpu.parallel.fsdp import (
    fsdp_param_shardings, make_fsdp_train_step, shard_train_state,
)
from objectpermanence_tpu.parallel.mesh import DATA_AXIS, make_mesh
from objectpermanence_tpu.train.loop import make_optimizer, make_train_step

MODEL_CFG = {"object_to_track_pred_dim": 15, "object_to_track_hidden_dim": 64,
             "videos_hidden_dim": 128}
B, T, W = 8, 12, 6


def _batch(seed):
    rng = np.random.RandomState(seed)
    boxes = jnp.asarray(rng.rand(B, T, 15, W).astype(np.float32))
    labels = jnp.asarray(rng.rand(B, T, 4).astype(np.float32))
    mask = jnp.asarray((rng.rand(B, T, 4) > 0.3).astype(np.float32))
    return boxes, labels, mask


def test_fsdp_large_leaves_really_sharded():
    spec, params = init_model("opnet", MODEL_CFG, seed=0)
    mesh = make_mesh(n_data=8)
    shardings = fsdp_param_shardings(params, mesh)
    placed = jax.tree.map(jax.device_put, params, shardings)

    n_sharded = 0
    for leaf in jax.tree_util.tree_leaves(placed):
        if leaf.size >= 2 ** 12:
            shapes = {s.data.shape for s in leaf.addressable_shards}
            assert len(shapes) == 1
            shard_shape = next(iter(shapes))
            assert np.prod(shard_shape) * 8 == leaf.size, (
                leaf.shape, shard_shape)
            n_sharded += 1
    assert n_sharded >= 3  # the LSTM gate matrices at least


@pytest.mark.slow
def test_fsdp_step_matches_single_device():
    spec, params = init_model("opnet", MODEL_CFG, seed=1)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(0)
    boxes, labels, mask = _batch(3)

    # single-device reference trajectory (copy params: train_step donates)
    ref_step = make_train_step(spec, optimizer)
    ref_p = jax.tree.map(jnp.copy, params)
    ref_o = jax.tree.map(jnp.copy, opt_state)
    for seed in (3, 4):
        b, l, m = _batch(seed)
        ref_p, ref_o, ref_metrics = ref_step(ref_p, ref_o, b, l, m, rng)

    mesh = make_mesh(n_data=8)
    fsdp_p, fsdp_o = shard_train_state(params, opt_state, mesh)
    step = make_fsdp_train_step(spec, optimizer, mesh, params, opt_state)
    for seed in (3, 4):
        b, l, m = _batch(seed)
        fsdp_p, fsdp_o, metrics = step(fsdp_p, fsdp_o, b, l, m, rng)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(ref_p),
                     jax.tree_util.tree_leaves(fsdp_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)

    # updated params keep their FSDP placement (out_shardings contract)
    for leaf in jax.tree_util.tree_leaves(fsdp_p):
        if leaf.size >= 2 ** 12:
            spec_ = leaf.sharding.spec
            assert DATA_AXIS in spec_, (leaf.shape, spec_)
