"""Learned reasoning models for CATER snitch localization.

Functionally equivalent to `baselines/learned_models.py` in the reference,
re-designed as pure-functional JAX: every model is `(init, apply)` over an
explicit parameter pytree, so the whole forward is a single jit/pjit region
— LSTMs as `lax.scan`, the OPNet soft-attention selection as an einsum, the
per-frame object transformer as batched 15-token attention.

Input: `boxes (B, 300, 15, F)` — F=5 `[x1,y1,x2,y2,visible]` or F=6 adding
`is_cone`, all normalized by `[320,240,320,240,1(,1)]`.
Output: `(B, 300, 4)` normalized snitch boxes; OPNet-family models also
return `(B, 15, 300)` who-to-attend logits (reference
`learned_models.py:50-52`).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp

from objectpermanence_tpu.ops.lstm import lstm_init, lstm_apply, stacked_lstm_init, stacked_lstm_apply
from objectpermanence_tpu.ops.attention import (
    linear_init, linear_apply, encoder_init, encoder_apply,
)

MAX_OBJECTS_IN_FRAME = 15
BB_OUT_DIM = 4

Params = Dict[str, Any]


def _bias_free_linear_init(key, in_dim, out_dim, dtype):
    p = linear_init(key, in_dim, out_dim, bias=False, dtype=dtype)
    return p


# ---------------------------------------------------------------------------
# OPNet family (F=6, double output)
# ---------------------------------------------------------------------------

def opnet_init(key, config: Dict[str, int], dtype=jnp.float32) -> Params:
    """OPNet (reference `learned_models.py:18-52`): a "who to attend" LSTM
    producing per-frame attention over the 15 object slots, a soft box
    selection, and a temporal LSTM box head. All layers bias-free."""
    feat = 6
    att_hidden = config["object_to_track_hidden_dim"]
    att_out = config["object_to_track_pred_dim"]
    vid_hidden = config["videos_hidden_dim"]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "att_lstm": lstm_init(k1, feat * MAX_OBJECTS_IN_FRAME, att_hidden, dtype),
        "att_head": _bias_free_linear_init(k2, att_hidden, att_out, dtype),
        "video_lstm": lstm_init(k3, feat, vid_hidden, dtype),
        "box_head": _bias_free_linear_init(k4, vid_hidden, BB_OUT_DIM, dtype),
    }


def _who_to_attend(params, boxes, precision):
    """Shared OPNet attention stage: flatten the scene, run the attention
    LSTM, and soft-select one box per frame via einsum."""
    batch, frames, objects, feat = boxes.shape
    scene = boxes.reshape(batch, frames, objects * feat)
    att_h = lstm_apply(params["att_lstm"], scene, precision=precision)
    logits = linear_apply(params["att_head"], att_h, precision=precision)  # (B,T,15)
    probs = jax.nn.softmax(logits, axis=-1)
    selected = jnp.einsum("bfot,bfo->bft", boxes, probs, precision=precision)
    return selected, logits


def opnet_apply(params: Params, boxes: jax.Array, *, precision=None, **_) -> tuple:
    selected, logits = _who_to_attend(params, boxes, precision)
    hidden = lstm_apply(params["video_lstm"], selected, precision=precision)
    y_boxes = linear_apply(params["box_head"], hidden, precision=precision)
    # (B, 15, 300) layout for CE-style supervision, as in the reference.
    return y_boxes, jnp.swapaxes(logits, 1, 2)


def opnet_lstm_mlp_init(key, config: Dict[str, int], dtype=jnp.float32) -> Params:
    """OPNetLstmMlp (reference `learned_models.py:55-89`): OPNet with the
    temporal LSTM replaced by a per-frame Linear+ReLU+Linear MLP."""
    feat = 6
    att_hidden = config["object_to_track_hidden_dim"]
    att_out = config["object_to_track_pred_dim"]
    vid_hidden = config["videos_hidden_dim"]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "att_lstm": lstm_init(k1, feat * MAX_OBJECTS_IN_FRAME, att_hidden, dtype),
        "att_head": _bias_free_linear_init(k2, att_hidden, att_out, dtype),
        "hidden": _bias_free_linear_init(k3, feat, vid_hidden, dtype),
        "box_head": _bias_free_linear_init(k4, vid_hidden, BB_OUT_DIM, dtype),
    }


def opnet_lstm_mlp_apply(params: Params, boxes: jax.Array, *, precision=None, **_) -> tuple:
    selected, logits = _who_to_attend(params, boxes, precision)
    hidden = jax.nn.relu(linear_apply(params["hidden"], selected, precision=precision))
    y_boxes = linear_apply(params["box_head"], hidden, precision=precision)
    return y_boxes, jnp.swapaxes(logits, 1, 2)


def opnet_moe_init(key, config: Dict[str, int], dtype=jnp.float32) -> Params:
    """OPNet with the linear box head replaced by a Switch-style top-1 MoE
    head (beyond-reference variant; the experts shard over an `expert` mesh
    axis — `parallel/expert.py`). Config keys `num_experts`/`expert_hidden`
    are optional (default 4/128) so the standard opnet config works."""
    from objectpermanence_tpu.parallel.expert import moe_head_init

    feat = 6
    att_hidden = config["object_to_track_hidden_dim"]
    att_out = config["object_to_track_pred_dim"]
    vid_hidden = config["videos_hidden_dim"]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "att_lstm": lstm_init(k1, feat * MAX_OBJECTS_IN_FRAME, att_hidden, dtype),
        "att_head": _bias_free_linear_init(k2, att_hidden, att_out, dtype),
        "video_lstm": lstm_init(k3, feat, vid_hidden, dtype),
        "box_head": moe_head_init(
            k4, vid_hidden, BB_OUT_DIM,
            num_experts=config.get("num_experts", 4),
            expert_hidden=config.get("expert_hidden", 128), dtype=dtype),
    }


def opnet_moe_apply(params: Params, boxes: jax.Array, *, precision=None,
                    return_aux: bool = False, aux_token_weight=None,
                    **_) -> tuple:
    """With `return_aux=True` additionally returns the Switch
    load-balance auxiliary (`parallel/expert.py:moe_balance_loss`) computed
    on the same hidden features, for the training loss — top-1 routing
    collapses onto one expert without it. `aux_token_weight` (B,) zeroes
    padded samples out of the balance statistics (ragged final batch)."""
    from objectpermanence_tpu.parallel.expert import (
        moe_balance_loss, moe_head_apply,
    )

    selected, logits = _who_to_attend(params, boxes, precision)
    hidden = lstm_apply(params["video_lstm"], selected, precision=precision)
    if return_aux:
        y_boxes, probs = moe_head_apply(params["box_head"], hidden,
                                        precision=precision,
                                        return_probs=True)
        aux = moe_balance_loss(probs, token_weight=aux_token_weight)
        return y_boxes, jnp.swapaxes(logits, 1, 2), aux
    y_boxes = moe_head_apply(params["box_head"], hidden, precision=precision)
    return y_boxes, jnp.swapaxes(logits, 1, 2)


# ---------------------------------------------------------------------------
# Baselines (F=5, single output)
# ---------------------------------------------------------------------------

def baseline_lstm_init(key, config: Dict[str, int], dtype=jnp.float32) -> Params:
    """BaselineLstm (reference `learned_models.py:92-118`): flatten the 15x5
    scene and run one LSTM + linear box head."""
    feat = 5
    hidden = config["videos_hidden_dim"]
    k1, k2 = jax.random.split(key)
    return {
        "video_lstm": lstm_init(k1, MAX_OBJECTS_IN_FRAME * feat, hidden, dtype),
        "box_head": _bias_free_linear_init(k2, hidden, BB_OUT_DIM, dtype),
    }


def baseline_lstm_apply(params: Params, boxes: jax.Array, *, precision=None, **_) -> jax.Array:
    batch, frames, objects, feat = boxes.shape
    scene = boxes.reshape(batch, frames, objects * feat)
    hidden = lstm_apply(params["video_lstm"], scene, precision=precision)
    return linear_apply(params["box_head"], hidden, precision=precision)


def non_linear_lstm_init(key, config: Dict[str, int], dtype=jnp.float32) -> Params:
    """NonLinearLstm (reference `learned_models.py:121-151`): per-object
    Linear+ReLU features, 2-layer LSTM, linear box head."""
    feat = 5
    box_feat = config["boxes_features_dim"]
    hidden = config["videos_hidden_dim"]
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "box_proj": _bias_free_linear_init(k1, feat, box_feat, dtype),
        "video_lstm": stacked_lstm_init(k2, MAX_OBJECTS_IN_FRAME * box_feat, hidden, 2, dtype),
        "box_head": _bias_free_linear_init(k3, hidden, BB_OUT_DIM, dtype),
    }


def non_linear_lstm_apply(params: Params, boxes: jax.Array, *, precision=None, **_) -> jax.Array:
    batch, frames, objects, feat = boxes.shape
    feats = jax.nn.relu(linear_apply(params["box_proj"], boxes, precision=precision))
    scene = feats.reshape(batch, frames, -1)
    hidden = stacked_lstm_apply(params["video_lstm"], scene, precision=precision)
    return linear_apply(params["box_head"], hidden, precision=precision)


def transformer_lstm_init(key, config: Dict[str, int], dtype=jnp.float32) -> Params:
    """TransformerLstm (reference `learned_models.py:154-197`): per-object
    features, intra-frame object<->object self-attention (15 tokens), take
    the snitch slot, temporal LSTM, linear box head."""
    feat = 5
    box_feat = config["boxes_features_dim"]
    heads = config["num_attention_heads"]
    layers = config["num_attention_layers"]
    lstm_layers = config["num_lstm_layers"]
    hidden = config["lstm_hidden_dim"]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "box_proj": _bias_free_linear_init(k1, feat, box_feat, dtype),
        "encoder": encoder_init(k2, layers, box_feat, heads, dtype=dtype),
        "video_lstm": stacked_lstm_init(k3, box_feat, hidden, lstm_layers, dtype),
        "box_head": _bias_free_linear_init(k4, hidden, BB_OUT_DIM, dtype),
    }


def transformer_lstm_apply(params: Params, boxes: jax.Array, *, precision=None,
                           deterministic: bool = True, rng=None,
                           reference_compat: bool = False) -> jax.Array:
    """DELIBERATE DEVIATION from the reference: we run per-frame 15-token
    self-attention (objects attend to objects within their frame), which is
    what the reference's comments describe (`learned_models.py:181-184`).
    The reference's code, however, feeds `(batch*frames, objects, dim)`
    into a default (batch_first=False) `nn.TransformerEncoder`
    (`learned_models.py:167,185`), so its attention actually runs ACROSS
    the batch*frames axis per object slot — outputs depend on which other
    videos share the batch. We treat that as a reference bug (like the
    `opent_no_labels` typo) and implement the intended semantics;
    consequence: reference-trained transformer_lstm checkpoints will not
    reproduce bit-for-bit under the default semantics. Parity is tested
    against a torch model with batch_first=True (tests/test_model_parity.py).

    `reference_compat=True` (model-config key of the same name, threaded by
    `registry.init_model`) reproduces the reference's ACTUAL semantics —
    per object slot, attention over all batch*frames tokens — so
    reference-trained checkpoints converted via
    `models/convert_reasoning.py` validate bit-for-bit
    (tests/test_pth_converter.py). Costs O((B*T)^2) attention, inherited
    from the reference; keep eval batches small in this mode."""
    batch, frames, objects, feat = boxes.shape
    feats = jax.nn.relu(linear_apply(params["box_proj"], boxes, precision=precision))
    if reference_compat:
        # torch reads (B*T, O, D) as (seq=B*T, batch=O, D): each of the 15
        # object slots is one attention "sequence" of B*T tokens
        tokens = feats.reshape(batch * frames, objects, -1).transpose(1, 0, 2)
        attended = encoder_apply(params["encoder"], tokens,
                                 deterministic=deterministic, rng=rng,
                                 precision=precision)
        # reference `attended_objects[:, 0, :]`: slot-0 (snitch) sequence
        snitch = attended[0].reshape(batch, frames, -1)
    else:
        tokens = feats.reshape(batch * frames, objects, -1)
        attended = encoder_apply(params["encoder"], tokens,
                                 deterministic=deterministic, rng=rng,
                                 precision=precision)
        # the snitch is always encoded as slot 0 of the frame
        snitch = attended[:, 0, :].reshape(batch, frames, -1)
    hidden = stacked_lstm_apply(params["video_lstm"], snitch, precision=precision)
    return linear_apply(params["box_head"], hidden, precision=precision)
