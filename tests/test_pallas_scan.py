"""Pallas fused kernels vs the XLA scan path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectpermanence_tpu.models.registry import get_model_spec
from objectpermanence_tpu.ops.lstm import lstm_init, lstm_apply
from objectpermanence_tpu.ops.pallas_scan import lstm_scan_pallas, opnet_fused_forward

OPNET_CFG = {"object_to_track_pred_dim": 15, "object_to_track_hidden_dim": 256,
             "videos_hidden_dim": 512}


def test_lstm_scan_pallas_matches_xla():
    params = lstm_init(jax.random.PRNGKey(0), 90, 256)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 12, 90), jnp.float32)
    ref = lstm_apply(params, x)
    got = lstm_scan_pallas(params, x, block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_lstm_scan_pallas_batch_padding():
    # batch not a multiple of the tile: padding must not leak
    params = lstm_init(jax.random.PRNGKey(1), 30, 128)
    x = jnp.asarray(np.random.RandomState(1).rand(5, 7, 30), jnp.float32)
    ref = lstm_apply(params, x)
    got = lstm_scan_pallas(params, x, block_b=8, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_opnet_fused_matches_reference_apply():
    spec = get_model_spec("opnet")
    params = spec.init(jax.random.PRNGKey(2), OPNET_CFG)
    boxes = jnp.asarray(np.random.RandomState(2).rand(4, 10, 15, 6), jnp.float32)
    ref_y, ref_logits = spec.apply(params, boxes)
    got_y, got_logits = opnet_fused_forward(params, boxes, block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("time_chunk", [2, 5, 10])
def test_opnet_fused_time_chunk_matches_reference(time_chunk):
    # TC consecutive recurrence steps per grid invocation must be
    # numerically identical work, just re-blocked along time
    spec = get_model_spec("opnet")
    params = spec.init(jax.random.PRNGKey(5), OPNET_CFG)
    boxes = jnp.asarray(np.random.RandomState(5).rand(4, 10, 15, 6), jnp.float32)
    ref_y, ref_logits = spec.apply(params, boxes)
    got_y, got_logits = opnet_fused_forward(params, boxes, block_b=8,
                                            interpret=True,
                                            time_chunk=time_chunk)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)


def test_opnet_fused_time_chunk_clamps_to_divisor():
    # T=9: requested chunk 6 is not a divisor -> clamped to 3; result exact
    spec = get_model_spec("opnet")
    params = spec.init(jax.random.PRNGKey(6), OPNET_CFG)
    boxes = jnp.asarray(np.random.RandomState(6).rand(3, 9, 15, 6), jnp.float32)
    ref_y, _ = spec.apply(params, boxes)
    got_y, _ = opnet_fused_forward(params, boxes, block_b=8, interpret=True,
                                   time_chunk=6)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               rtol=1e-4, atol=1e-5)


def test_opnet_fused_bf16_time_chunk_combined():
    spec = get_model_spec("opnet")
    params = spec.init(jax.random.PRNGKey(7), OPNET_CFG)
    boxes = jnp.asarray(np.random.RandomState(7).rand(4, 10, 15, 6), jnp.float32)
    y32, _ = opnet_fused_forward(params, boxes, block_b=8, interpret=True)
    y16, _ = opnet_fused_forward(params, boxes, block_b=8, interpret=True,
                                 compute_dtype=jnp.bfloat16, time_chunk=5)
    rel = float(jnp.max(jnp.abs(y16 - y32)) / (jnp.max(jnp.abs(y32)) + 1e-9))
    assert rel < 0.05


def test_opnet_fused_bf16_close_to_f32():
    spec = get_model_spec("opnet")
    params = spec.init(jax.random.PRNGKey(3), OPNET_CFG)
    boxes = jnp.asarray(np.random.RandomState(4).rand(4, 10, 15, 6), jnp.float32)
    y32, _ = opnet_fused_forward(params, boxes, block_b=8, interpret=True)
    y16, _ = opnet_fused_forward(params, boxes, block_b=8, interpret=True,
                                 compute_dtype=jnp.bfloat16)
    rel = float(jnp.max(jnp.abs(y16 - y32)) / (jnp.max(jnp.abs(y32)) + 1e-9))
    assert rel < 0.05
    assert y16.dtype == jnp.float32  # outputs stay f32

pytestmark = pytest.mark.slow  # full-lane: see tests/conftest.py
