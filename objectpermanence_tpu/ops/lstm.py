"""Bias-free LSTM as a `lax.scan` over time, PyTorch-gate-compatible.

The reference's sequence models are cuDNN `nn.LSTM(bias=False)` layers
(`baselines/learned_models.py:29,32,100,131,170`). The TPU-native design
splits the computation into:

1. one large input projection `x @ W_ih` over the whole `(B, T)` sequence —
   a single MXU-friendly matmul, and
2. a scanned recurrence that only carries `h @ W_hh` per step.

Weight layout: `w_ih: (input_dim, 4H)`, `w_hh: (H, 4H)`, gate order
`[i, f, g, o]` along the 4H axis — identical to `torch.nn.LSTM`'s
`weight_ih_l0.T` / `weight_hh_l0.T`, so parameters round-trip exactly for
float-tolerance parity tests.

A fused Pallas variant for the recurrence lives in `ops/pallas_scan.py`;
this module is the reference/compilation-friendly XLA path.
"""

import contextlib
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# When True (see `fused_scan()`), `lstm_apply` dispatches the recurrence to
# the Pallas kernel in `ops.pallas_scan`. Inference drivers enable it on TPU
# backends; training keeps the differentiable `lax.scan` path.
_USE_FUSED_SCAN = False


@contextlib.contextmanager
def fused_scan(enabled: bool = True):
    global _USE_FUSED_SCAN
    previous = _USE_FUSED_SCAN
    _USE_FUSED_SCAN = enabled
    try:
        yield
    finally:
        _USE_FUSED_SCAN = previous


def lstm_init(key, input_dim: int, hidden_dim: int, dtype=jnp.float32) -> Dict[str, jax.Array]:
    """U(-k, k) init with k = 1/sqrt(hidden_dim), matching torch.nn.LSTM."""
    k = 1.0 / np.sqrt(hidden_dim)
    k_ih, k_hh = jax.random.split(key)
    return {
        "w_ih": jax.random.uniform(k_ih, (input_dim, 4 * hidden_dim), dtype, -k, k),
        "w_hh": jax.random.uniform(k_hh, (hidden_dim, 4 * hidden_dim), dtype, -k, k),
    }


def stacked_lstm_init(key, input_dim: int, hidden_dim: int, num_layers: int,
                      dtype=jnp.float32) -> List[Dict[str, jax.Array]]:
    keys = jax.random.split(key, num_layers)
    dims = [input_dim] + [hidden_dim] * (num_layers - 1)
    return [lstm_init(k, d, hidden_dim, dtype) for k, d in zip(keys, dims)]


def _lstm_cell(h, c, gates):
    """Single LSTM step from pre-activation gates (B, 4H)."""
    hidden = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., 0 * hidden:1 * hidden])
    f = jax.nn.sigmoid(gates[..., 1 * hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden:4 * hidden])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def lstm_apply(params: Dict[str, jax.Array], x: jax.Array, *,
               precision=None, unroll: int = 8) -> jax.Array:
    """Run a single bias-free LSTM layer over `x: (B, T, D)` -> `(B, T, H)`.

    Input projections for the full sequence are computed as one matmul so the
    MXU sees a (B*T, D) x (D, 4H) contraction; the scan carries only the
    (B, H) recurrence.
    """
    if _USE_FUSED_SCAN:
        # custom-VJP Pallas kernels: differentiable, so training can use it too
        from objectpermanence_tpu.ops.pallas_scan import lstm_scan_fused
        return lstm_scan_fused(params, x)

    w_ih, w_hh = params["w_ih"], params["w_hh"]
    batch, seq_len, _ = x.shape
    hidden = w_hh.shape[0]

    xproj = jnp.einsum("btd,dh->bth", x, w_ih, precision=precision)
    xproj = jnp.moveaxis(xproj, 1, 0)  # (T, B, 4H) — scan over leading axis

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + jnp.dot(h, w_hh, precision=precision)
        h, c = _lstm_cell(h, c, gates)
        return (h, c), h

    h0 = jnp.zeros((batch, hidden), x.dtype)
    c0 = jnp.zeros((batch, hidden), x.dtype)
    (_, _), hs = jax.lax.scan(step, (h0, c0), xproj, unroll=unroll)
    return jnp.moveaxis(hs, 0, 1)  # (B, T, H)


def stacked_lstm_apply(params: List[Dict[str, jax.Array]], x: jax.Array, *,
                       precision=None, unroll: int = 8) -> jax.Array:
    """Multi-layer LSTM (torch `num_layers=k`, dropout 0 between layers)."""
    for layer in params:
        x = lstm_apply(layer, x, precision=precision, unroll=unroll)
    return x
