"""Pipeline parallelism (parallel/pipeline.py): N-stage GPipe engine parity
against the plain single-device apply, on the virtual 8-device CPU mesh."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from objectpermanence_tpu.models.registry import get_model_spec
from objectpermanence_tpu.parallel.mesh import make_pipe_mesh
from objectpermanence_tpu.parallel.pipeline import (
    make_pipelined_opnet_forward, stack_stage_params,
)

CONFIG = {"object_to_track_pred_dim": 15, "object_to_track_hidden_dim": 32,
          "videos_hidden_dim": 48}


@pytest.mark.parametrize("n_data,n_pipe", [(4, 2), (2, 4)])
def test_pipelined_opnet_matches_plain(n_data, n_pipe):
    """Both the reference 2-stage split and the 4-stage ring must match the
    plain apply exactly (same math, different schedule length)."""
    spec = get_model_spec("opnet")
    params = spec.init(jax.random.PRNGKey(0), CONFIG)
    boxes = np.random.RandomState(0).rand(16, 20, 15, 6).astype(np.float32)

    ref, _ = spec.apply(params, jnp.asarray(boxes))

    mesh = make_pipe_mesh(n_data=n_data, n_pipe=n_pipe)
    stacked = stack_stage_params(params, mesh, num_stages=n_pipe)
    fwd = make_pipelined_opnet_forward(mesh, CONFIG, num_microbatches=2,
                                       num_stages=n_pipe)
    got = fwd(stacked, jnp.asarray(boxes))

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def _pp_grads(n_pipe, num_microbatches, params, boxes, labels, mask):
    """Gradients of the reference loss through the GPipe schedule."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from objectpermanence_tpu.parallel.pipeline import (
        _make_gpipe_per_shard, opnet_pipeline_stages,
    )
    from objectpermanence_tpu.train.losses import total_loss

    mesh = make_pipe_mesh(n_data=8 // n_pipe, n_pipe=n_pipe)
    stacked = stack_stage_params(params, mesh, num_stages=n_pipe)
    stage_fns, transit = opnet_pipeline_stages(CONFIG, n_pipe)
    fwd = jax.jit(shard_map(
        _make_gpipe_per_shard(stage_fns, num_microbatches, transit, 4),
        mesh=mesh, in_specs=(P("pipe"), P("data")), out_specs=P("data"),
        check_vma=False))

    def pp_loss(p):
        y = fwd(p, jnp.asarray(boxes))
        return total_loss(y, jnp.asarray(labels), jnp.asarray(mask), False)[0]

    return jax.device_get(jax.grad(pp_loss)(stacked)), mesh, stacked


@pytest.mark.slow
@pytest.mark.parametrize("n_pipe", [2, 4])
def test_pipelined_train_step_grad_parity(n_pipe):
    """Training-grade pp: one optimizer step through the GPipe schedule must
    produce, for every stage's REAL weight region, exactly the update the
    single-device train step produces — i.e. the gradients that flow
    backward through ppermute/scan/switch/psum match plain autodiff. Padded
    stacking regions must receive zero gradient."""
    import optax

    from objectpermanence_tpu.parallel.pipeline import (
        make_pipelined_opnet_train_step,
    )
    from objectpermanence_tpu.train.losses import total_loss

    spec = get_model_spec("opnet")
    params = spec.init(jax.random.PRNGKey(2), CONFIG)
    rng = np.random.RandomState(3)
    boxes = rng.rand(16, 20, 15, 6).astype(np.float32)
    labels = rng.rand(16, 20, 4).astype(np.float32)
    mask = rng.rand(16, 20, 4) > 0.5

    def ref_loss(p):
        y, _ = spec.apply(p, jnp.asarray(boxes))
        return total_loss(y, jnp.asarray(labels), jnp.asarray(mask), False)[0]

    ref_grads = jax.grad(ref_loss)(params)

    pp_grads, mesh, stacked = _pp_grads(n_pipe, 2, params, boxes, labels, mask)

    att_h, vid_h = (CONFIG["object_to_track_hidden_dim"],
                    CONFIG["videos_hidden_dim"])
    if n_pipe == 2:
        checks = [
            (pp_grads["lstm"]["w_ih"][0, :90, :4 * att_h],
             ref_grads["att_lstm"]["w_ih"]),
            (pp_grads["lstm"]["w_hh"][0, :att_h, :4 * att_h],
             ref_grads["att_lstm"]["w_hh"]),
            (pp_grads["head"]["w"][0, :att_h, :15], ref_grads["att_head"]["w"]),
            (pp_grads["lstm"]["w_ih"][1, :6, :4 * vid_h],
             ref_grads["video_lstm"]["w_ih"]),
            (pp_grads["lstm"]["w_hh"][1, :vid_h, :4 * vid_h],
             ref_grads["video_lstm"]["w_hh"]),
            (pp_grads["head"]["w"][1, :vid_h, :4], ref_grads["box_head"]["w"]),
        ]
        zero_checks = [pp_grads["lstm"]["w_ih"][1, 6:, :],
                       pp_grads["head"]["w"][1, :, 4:]]
    else:
        checks = [
            (pp_grads["lstm"]["w_ih"][0, :90, :4 * att_h],
             ref_grads["att_lstm"]["w_ih"]),
            (pp_grads["lstm"]["w_hh"][0, :att_h, :4 * att_h],
             ref_grads["att_lstm"]["w_hh"]),
            (pp_grads["head"]["w"][1, :att_h, :15], ref_grads["att_head"]["w"]),
            (pp_grads["lstm"]["w_ih"][2, :6, :4 * vid_h],
             ref_grads["video_lstm"]["w_ih"]),
            (pp_grads["lstm"]["w_hh"][2, :vid_h, :4 * vid_h],
             ref_grads["video_lstm"]["w_hh"]),
            (pp_grads["head"]["w"][3, :vid_h, :4], ref_grads["box_head"]["w"]),
        ]
        # head-only stages carry no lstm weights (and vice versa): those
        # union-padding slices must be exactly zero-gradient
        zero_checks = [pp_grads["lstm"]["w_ih"][1], pp_grads["lstm"]["w_ih"][3],
                       pp_grads["head"]["w"][0], pp_grads["head"]["w"][2],
                       pp_grads["lstm"]["w_ih"][2, 6:, :],
                       pp_grads["head"]["w"][3, :, 4:]]
    for got, want in checks:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=1e-6)
    for z in zero_checks:
        assert np.all(np.asarray(z) == 0.0)

    # the jit step runs, returns finite loss, and keeps the stage sharding
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(stacked)
    step = make_pipelined_opnet_train_step(mesh, CONFIG, optimizer,
                                           num_microbatches=2,
                                           num_stages=n_pipe)
    new_stacked, opt_state, metrics = step(stacked, opt_state,
                                           jnp.asarray(boxes),
                                           jnp.asarray(labels),
                                           jnp.asarray(mask))
    assert np.isfinite(float(metrics["loss"]))
    leaf = new_stacked["lstm"]["w_ih"]
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert shard_shapes == {(1,) + leaf.shape[1:]}, "pp sharding lost in step"


def test_pipelined_opnet_stage_params_sharded():
    """Each pipe rank must hold only its stage slice (leading stage axis
    sharded over PIPE_AXIS, i.e. real pipeline weight sharding)."""
    spec = get_model_spec("opnet")
    params = spec.init(jax.random.PRNGKey(1), CONFIG)
    mesh = make_pipe_mesh(n_data=4, n_pipe=2)
    stacked = stack_stage_params(params, mesh)
    leaf = stacked["lstm"]["w_ih"]
    assert leaf.shape[0] == 2
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert shard_shapes == {(1,) + leaf.shape[1:]}


def test_gpipe_engine_rejects_mesh_stage_mismatch():
    import optax

    from objectpermanence_tpu.parallel.pipeline import (
        make_gpipe_forward, make_gpipe_train_step,
    )

    mesh = make_pipe_mesh(n_data=4, n_pipe=2)
    three = [lambda l, t, x: t] * 3
    with pytest.raises(ValueError, match="3 stage functions"):
        make_gpipe_forward(mesh, three, transit_dim=4, out_dim=4)
    with pytest.raises(ValueError, match="3 stage functions"):
        make_gpipe_train_step(mesh, three, optax.adam(1e-3),
                              transit_dim=4, out_dim=4)


def test_stack_stage_param_list_union_layout():
    """Union stacking: missing subtrees become zeros, leaves pad to the
    per-path max shape, stage axis is sharded over pipe."""
    from objectpermanence_tpu.parallel.pipeline import stack_stage_param_list

    mesh = make_pipe_mesh(n_data=4, n_pipe=2)
    a = {"lstm": {"w": np.ones((3, 8), np.float32)}}
    b = {"head": {"w": np.full((5, 2), 2.0, np.float32)}}
    stacked = stack_stage_param_list([a, b], mesh)
    assert stacked["lstm"]["w"].shape == (2, 3, 8)
    assert stacked["head"]["w"].shape == (2, 5, 2)
    np.testing.assert_array_equal(np.asarray(stacked["lstm"]["w"][1]), 0.0)
    np.testing.assert_array_equal(np.asarray(stacked["head"]["w"][0]), 0.0)
    np.testing.assert_array_equal(np.asarray(stacked["head"]["w"][1]), 2.0)


def test_gpipe_engine_is_model_agnostic():
    """The engine runs ANY stage-function list — here a 4-stage MLP with
    heterogeneous widths (nothing OPNet-shaped): parity vs the plain chain
    and grads through the schedule match plain autodiff."""
    from objectpermanence_tpu.parallel.pipeline import (
        _make_gpipe_per_shard, make_gpipe_forward, stack_stage_param_list,
    )

    widths = [6, 24, 16, 12, 4]            # in, h1, h2, h3, out
    rng = np.random.RandomState(0)
    ws = [rng.randn(widths[i], widths[i + 1]).astype(np.float32) * 0.3
          for i in range(4)]

    def stage(i):
        def fn(local, transit, x_mb):
            src = x_mb if i == 0 else transit[..., :widths[i]]
            return jnp.tanh(src @ local["w"][:widths[i], :widths[i + 1]])
        return fn

    stage_fns = [stage(i) for i in range(4)]
    mesh = make_pipe_mesh(n_data=2, n_pipe=4)
    stacked = stack_stage_param_list([{"w": w} for w in ws], mesh)

    x = rng.randn(8, 5, widths[0]).astype(np.float32)
    ref = x
    for w in ws:
        ref = np.tanh(ref @ w)

    fwd = make_gpipe_forward(mesh, stage_fns, transit_dim=max(widths),
                             out_dim=widths[-1], num_microbatches=2)
    got = fwd(stacked, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-6)

    # grads through the schedule == plain autodiff on the chain
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    raw = jax.jit(shard_map(
        _make_gpipe_per_shard(stage_fns, 2, max(widths), widths[-1]),
        mesh=mesh, in_specs=(P("pipe"), P("data")), out_specs=P("data"),
        check_vma=False))

    def pp_loss(p):
        return jnp.mean(raw(p, jnp.asarray(x)) ** 2)

    def ref_loss(ws_list):
        h = jnp.asarray(x)
        for w in ws_list:
            h = jnp.tanh(h @ w)
        return jnp.mean(h ** 2)

    pp_g = jax.device_get(jax.grad(pp_loss)(stacked))
    ref_g = jax.grad(ref_loss)([jnp.asarray(w) for w in ws])
    for i in range(4):
        got_i = pp_g["w"][i, :widths[i], :widths[i + 1]]
        np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_g[i]),
                                   rtol=2e-4, atol=1e-6)
