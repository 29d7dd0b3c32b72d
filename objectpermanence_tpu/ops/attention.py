"""Intra-frame object self-attention (15-token sequences).

The reference's `TransformerLstm` runs a `torch.nn.TransformerEncoder`
(post-LN, ReLU, ff=2048, dropout 0.1) over the 15 objects of each frame
(`baselines/learned_models.py:154-197`). On TPU this is a tiny batched
attention: sequences of 15 tokens, batched over batch*300 frames, so the
whole thing is a handful of MXU matmuls — no flash/blockwise machinery
needed. The implementation below is parameter-compatible with
`torch.nn.TransformerEncoderLayer` for float-tolerance parity tests.

NOTE (deliberate deviation): the reference's code actually feeds
`(batch*frames, objects, dim)` into a batch_first=False encoder, so its
attention runs across the batch*frames axis per object slot — a reference
bug making outputs depend on batch composition. We implement the
per-frame attention its comments describe; see
`models/reasoning.py:transformer_lstm_apply`.
"""

import jax
import jax.numpy as jnp
import numpy as np


def linear_init(key, in_dim: int, out_dim: int, *, bias: bool = True, dtype=jnp.float32):
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(-k, k)
    with k = 1/sqrt(in_dim) for the weight, and U(-k, k) for the bias."""
    k = 1.0 / np.sqrt(in_dim)
    wk, bk = jax.random.split(key)
    params = {"w": jax.random.uniform(wk, (in_dim, out_dim), dtype, -k, k)}
    if bias:
        params["b"] = jax.random.uniform(bk, (out_dim,), dtype, -k, k)
    return params


def linear_apply(params, x, *, precision=None):
    y = jnp.einsum("...d,dh->...h", x, params["w"], precision=precision)
    if "b" in params:
        y = y + params["b"]
    return y


def layernorm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm_apply(params, x, *, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


def mha_init(key, dim: int, num_heads: int, dtype=jnp.float32):
    """torch.nn.MultiheadAttention layout: fused in-projection (xavier_uniform
    over the stacked (3D, D) weight, zero bias) + out-projection.

    The head count is encoded STRUCTURALLY — `w_in` is stored as
    (D, 3, num_heads, head_dim) — so the parameter pytree holds only float
    arrays (an int leaf would break `jax.grad` over the params)."""
    assert dim % num_heads == 0
    head_dim = dim // num_heads
    k_in, k_out = jax.random.split(key)
    # xavier_uniform on torch's (3D, D) in_proj_weight: gain * sqrt(6/(3D+D))
    bound = np.sqrt(6.0 / (3 * dim + dim))
    w_in = jax.random.uniform(k_in, (dim, 3, num_heads, head_dim), dtype,
                              -bound, bound)
    out = linear_init(k_out, dim, dim, dtype=dtype)
    out["b"] = jnp.zeros_like(out["b"])  # torch zeroes the out_proj bias
    return {
        "w_in": w_in,
        "b_in": jnp.zeros((3, num_heads, head_dim), dtype),
        "out": out,
    }


def mha_apply(params, x, *, precision=None):
    """Self-attention over `x: (N, L, D)`; head count from w_in's shape."""
    num_heads = params["w_in"].shape[2]
    n, length, dim = x.shape
    head_dim = dim // num_heads

    w_in = params["w_in"].reshape(dim, 3 * dim)
    b_in = params["b_in"].reshape(3 * dim)
    qkv = jnp.einsum("nld,de->nle", x, w_in, precision=precision) + b_in
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(n, length, num_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k, precision=precision) / np.sqrt(head_dim)
    probs = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("nhqk,nhkd->nhqd", probs, v, precision=precision)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(n, length, dim)
    return linear_apply(params["out"], ctx, precision=precision)


def encoder_layer_init(key, dim: int, num_heads: int, ff_dim: int = 2048, dtype=jnp.float32):
    """Parameter tree mirroring torch.nn.TransformerEncoderLayer
    (post-norm, ReLU activation, ff_dim defaults to 2048)."""
    k_attn, k_ff1, k_ff2 = jax.random.split(key, 3)
    return {
        "attn": mha_init(k_attn, dim, num_heads, dtype),
        "ff1": linear_init(k_ff1, dim, ff_dim, dtype=dtype),
        "ff2": linear_init(k_ff2, ff_dim, dim, dtype=dtype),
        "norm1": layernorm_init(dim, dtype),
        "norm2": layernorm_init(dim, dtype),
    }


def _dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def encoder_layer_apply(params, x, *, dropout_rate: float = 0.1,
                        deterministic: bool = True, rng=None, precision=None):
    """Post-LN transformer encoder layer (torch semantics: dropout on the
    attention output, inside the FF block, and on the FF output)."""
    if not deterministic:
        r1, r2, r3 = jax.random.split(rng, 3)
    else:
        r1 = r2 = r3 = None
    attn = mha_apply(params["attn"], x, precision=precision)
    x = layernorm_apply(params["norm1"], x + _dropout(attn, dropout_rate, r1, deterministic))
    ff = jax.nn.relu(linear_apply(params["ff1"], x, precision=precision))
    ff = _dropout(ff, dropout_rate, r2, deterministic)
    ff = linear_apply(params["ff2"], ff, precision=precision)
    x = layernorm_apply(params["norm2"], x + _dropout(ff, dropout_rate, r3, deterministic))
    return x


def encoder_init(key, num_layers: int, dim: int, num_heads: int,
                 ff_dim: int = 2048, dtype=jnp.float32):
    keys = jax.random.split(key, num_layers)
    return [encoder_layer_init(k, dim, num_heads, ff_dim, dtype) for k in keys]


def encoder_apply(layers, x, *, dropout_rate: float = 0.1,
                  deterministic: bool = True, rng=None, precision=None):
    for i, layer in enumerate(layers):
        layer_rng = None if deterministic else jax.random.fold_in(rng, i)
        x = encoder_layer_apply(layer, x, dropout_rate=dropout_rate,
                                deterministic=deterministic, rng=layer_rng,
                                precision=precision)
    return x
