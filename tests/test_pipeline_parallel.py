"""Pipeline parallelism (parallel/pipeline.py): dp+pp OPNet forward parity
against the plain single-device apply, on the virtual 8-device CPU mesh."""

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


def test_pipelined_opnet_matches_plain():
    spec = get_model_spec("opnet")
    params = spec.init(jax.random.PRNGKey(0), CONFIG)
    boxes = np.random.RandomState(0).rand(16, 20, 15, 6).astype(np.float32)

    ref, _ = spec.apply(params, jnp.asarray(boxes))

    mesh = make_pipe_mesh(n_data=4, n_pipe=2)
    stacked = stack_stage_params(params, mesh)
    fwd = make_pipelined_opnet_forward(mesh, CONFIG, num_microbatches=2)
    got = fwd(stacked, jnp.asarray(boxes))

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


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
