"""Custom-VJP fused LSTM: value and gradient parity vs lax.scan autodiff
(interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import objectpermanence_tpu.ops.pallas_scan as ps
from objectpermanence_tpu.ops.lstm import lstm_apply, lstm_init


@pytest.fixture(autouse=True)
def interpret_mode():
    ps._INTERPRET_VJP = True
    yield
    ps._INTERPRET_VJP = False


def test_fused_forward_matches_scan():
    params = lstm_init(jax.random.PRNGKey(0), 24, 32)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 10, 24), jnp.float32)
    ref = lstm_apply(params, x)
    got = ps.lstm_scan_fused(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_gradients_match_autodiff():
    params = lstm_init(jax.random.PRNGKey(1), 16, 32)
    x = jnp.asarray(np.random.RandomState(1).rand(3, 8, 16), jnp.float32)
    target = jnp.asarray(np.random.RandomState(2).rand(3, 8, 32), jnp.float32)

    def loss_ref(p, xx):
        out = lstm_apply(p, xx)
        return jnp.mean((out - target) ** 2) + jnp.mean(jnp.abs(out[:, -1]))

    def loss_fused(p, xx):
        out = ps.lstm_scan_fused(p, xx)
        return jnp.mean((out - target) ** 2) + jnp.mean(jnp.abs(out[:, -1]))

    ref_grads = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    got_grads = jax.grad(loss_fused, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(got_grads[0]["w_ih"]),
                               np.asarray(ref_grads[0]["w_ih"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_grads[0]["w_hh"]),
                               np.asarray(ref_grads[0]["w_hh"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_grads[1]),
                               np.asarray(ref_grads[1]),
                               rtol=1e-4, atol=1e-6)


def test_fused_gradients_batch_not_multiple_of_bwd_block():
    # ADVICE r1 (high): forward pads batch 100 -> 100 (block 100 <= 256), but
    # the backward tiles with BWD_BLOCK_B=64; a floor'd grid left rows >= 64
    # unwritten and dropped their dW contributions. Exercise batch in
    # (BWD_BLOCK_B, DEFAULT_BLOCK_B) not divisible by 64.
    params = lstm_init(jax.random.PRNGKey(4), 12, 16)
    x = jnp.asarray(np.random.RandomState(5).rand(100, 6, 12), jnp.float32)

    def loss(fn):
        return lambda p, xx: jnp.sum(fn(p, xx) ** 2)

    ref = jax.grad(loss(lstm_apply), argnums=(0, 1))(params, x)
    got = jax.grad(loss(ps.lstm_scan_fused), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(got[0]["w_hh"]),
                               np.asarray(ref[0]["w_hh"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[0]["w_ih"]),
                               np.asarray(ref[0]["w_ih"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("fwd_tc,bwd_tc", [(4, 1), (1, 4), (4, 4), (5, 3)])
def test_fused_time_chunked_value_and_grads_match(fwd_tc, bwd_tc):
    # chunked kernels re-block the time axis only: values stay bit-exact
    # vs the unchunked kernels and grads match lax.scan autodiff. T=8 with
    # chunk 5/3 also exercises the clamp-to-divisor path (5 -> 4, 3 -> 2).
    params = lstm_init(jax.random.PRNGKey(6), 16, 32)
    x = jnp.asarray(np.random.RandomState(7).rand(3, 8, 16), jnp.float32)
    ref_val = ps.lstm_scan_fused(params, x)

    def loss(fn):
        return lambda p, xx: jnp.sum(fn(p, xx) ** 2)

    ref = jax.grad(loss(lstm_apply), argnums=(0, 1))(params, x)
    old = ps.FWD_TIME_CHUNK, ps.BWD_TIME_CHUNK
    try:
        ps.FWD_TIME_CHUNK, ps.BWD_TIME_CHUNK = fwd_tc, bwd_tc
        got_val = ps.lstm_scan_fused(params, x)
        got = jax.grad(loss(ps.lstm_scan_fused), argnums=(0, 1))(params, x)
    finally:
        ps.FWD_TIME_CHUNK, ps.BWD_TIME_CHUNK = old
    np.testing.assert_array_equal(np.asarray(got_val), np.asarray(ref_val))
    np.testing.assert_allclose(np.asarray(got[0]["w_hh"]),
                               np.asarray(ref[0]["w_hh"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[0]["w_ih"]),
                               np.asarray(ref[0]["w_ih"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-4, atol=1e-6)


def test_fused_gradients_with_batch_padding():
    # batch 5 pads to the block size internally; grads must not leak padding
    params = lstm_init(jax.random.PRNGKey(2), 12, 16)
    x = jnp.asarray(np.random.RandomState(3).rand(5, 6, 12), jnp.float32)

    def loss(fn):
        return lambda p, xx: jnp.sum(fn(p, xx) ** 2)

    ref = jax.grad(loss(lstm_apply), argnums=(0, 1))(params, x)
    got = jax.grad(loss(ps.lstm_scan_fused), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(got[0]["w_hh"]),
                               np.asarray(ref[0]["w_hh"]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-4, atol=1e-6)

pytestmark = pytest.mark.slow  # full-lane: see tests/conftest.py
