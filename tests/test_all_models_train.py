"""Every learned variant must run a full jit train step (grad through its
parameter pytree) — regression for the int-leaf-in-params bug that broke
transformer_lstm training."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from objectpermanence_tpu.models.registry import (
    TRAINING_SUPPORTED_MODELS, get_model_spec,
)
from objectpermanence_tpu.train.loop import make_optimizer, make_train_step

SMALL_CFGS = {
    "baseline_lstm": {"videos_hidden_dim": 32},
    "non_linear_lstm": {"boxes_features_dim": 16, "videos_hidden_dim": 32},
    "transformer_lstm": {"boxes_features_dim": 32, "num_attention_heads": 2,
                         "num_attention_layers": 1, "num_lstm_layers": 1,
                         "lstm_hidden_dim": 32},
    "opnet": {"object_to_track_pred_dim": 15, "object_to_track_hidden_dim": 16,
              "videos_hidden_dim": 32},
    "opnet_lstm_mlp": {"object_to_track_pred_dim": 15,
                       "object_to_track_hidden_dim": 16, "videos_hidden_dim": 32},
    "opnet_moe": {"object_to_track_pred_dim": 15,
                  "object_to_track_hidden_dim": 16, "videos_hidden_dim": 32,
                  "num_experts": 4, "expert_hidden": 16},
}


def _cfg(name):
    base = name[:-len("_no_labels")] if name.endswith("_no_labels") else name
    return SMALL_CFGS["opnet" if base == "opnet_att_ce" else base]


@pytest.mark.parametrize("name", TRAINING_SUPPORTED_MODELS)
def test_train_step_runs(name):
    spec = get_model_spec(name)
    params = spec.init(jax.random.PRNGKey(0), _cfg(name))
    # params must be all-float (grad-compatible)
    for leaf in jax.tree.leaves(params):
        assert jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating), leaf

    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(spec, optimizer)
    boxes = jnp.asarray(np.random.RandomState(0).rand(2, 6, 15, spec.feature_width),
                        jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).rand(2, 6, 4), jnp.float32)
    mask = jnp.asarray(np.random.RandomState(2).rand(2, 6, 4) > 0.5)
    params, opt_state, metrics = step(params, opt_state, boxes, labels, mask,
                                      jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))

pytestmark = pytest.mark.slow  # full-lane: see tests/conftest.py
