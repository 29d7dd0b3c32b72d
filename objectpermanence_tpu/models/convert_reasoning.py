"""Reference-trained reasoning checkpoint (.pth) converter.

The reference consumes a torch ``state_dict`` at inference time
(``torch.load(model_path)`` + ``load_state_dict`` —
`/root/reference/baselines/models_factory.py:76-78`), saved by its training
loop as the bare ``model.state_dict()``
(`/root/reference/baselines/training_main.py:19-29`). Anyone holding the
paper's released OPNet weights (or their own reference-trained runs) can
load them through this module: `convert_reference_state_dict` maps each
reference tensor into this framework's parameter pytree, and
`models/registry.py:init_model` calls it automatically when ``model_path``
ends in ``.pth``.

Layer-name sources (reference `baselines/learned_models.py`):
  OPNet / OPNetLstmMlp (`:18-89`): object_to_track_LSTM,
    object_to_track_prediction, video_LSTM / hidden_layer, prediction_layer
  BaselineLstm (`:92-118`): video_LSTM, predictions_layer
  NonLinearLstm (`:121-151`): boxes_linear, video_LSTM (2 layers),
    predictions_layer
  TransformerLstm (`:154-197`): boxes_linear, attention_encoder.layers.N
    (torch TransformerEncoderLayer), video_LSTM (N layers),
    predictions_layer

Layout conventions: torch Linear stores ``(out, in)`` and torch LSTM stores
``(4H, D)`` — both transpose into this framework's ``(in, out)`` /
``(D, 4H)`` right-multiplication layout (gate order i,f,g,o is shared).
Conversion is STRICT: every reference tensor must be consumed and every
converted leaf must match the template's shape, so a config/architecture
mismatch fails loudly instead of silently mis-loading.

For `transformer_lstm`, converted weights only reproduce reference outputs
bit-for-bit under the `reference_compat` model-config flag (the reference's
encoder attends across the batch*frames axis — see
`models/reasoning.py:transformer_lstm_apply`).
"""

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _np(x) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy (torch optional)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


class _StateDict:
    """Strict one-shot consumer over a reference state_dict."""

    def __init__(self, state_dict: Dict[str, Any]):
        # training-main saves the bare state_dict; tolerate the detection-
        # style {"model_state_dict": ...} wrapper too (engine.py:57-64)
        if "model_state_dict" in state_dict and isinstance(
                state_dict["model_state_dict"], dict):
            state_dict = state_dict["model_state_dict"]
        self._sd = dict(state_dict)

    def take(self, key: str) -> np.ndarray:
        if key not in self._sd:
            raise KeyError(
                f"reference checkpoint is missing {key!r}; has "
                f"{sorted(self._sd)}")
        return _np(self._sd.pop(key))

    def linear_w(self, key: str) -> np.ndarray:
        return self.take(f"{key}.weight").T          # (out,in) -> (in,out)

    def lstm(self, prefix: str, layer: int = 0) -> Dict[str, np.ndarray]:
        return {"w_ih": self.take(f"{prefix}.weight_ih_l{layer}").T,
                "w_hh": self.take(f"{prefix}.weight_hh_l{layer}").T}

    def finish(self) -> None:
        if self._sd:
            raise ValueError(
                f"unconsumed reference tensors: {sorted(self._sd)} — "
                f"checkpoint/model-name mismatch?")


def _encoder_layer(sd: _StateDict, prefix: str, template: Params) -> Params:
    """One torch.nn.TransformerEncoderLayer -> ops/attention.py layout."""
    d, _, heads, head_dim = template["attn"]["w_in"].shape
    return {
        "attn": {
            # torch fuses qkv as (3D, D); ours is (D, 3, H, head_dim)
            "w_in": sd.take(f"{prefix}.self_attn.in_proj_weight").T.reshape(
                d, 3, heads, head_dim),
            "b_in": sd.take(f"{prefix}.self_attn.in_proj_bias").reshape(
                3, heads, head_dim),
            "out": {"w": sd.linear_w(f"{prefix}.self_attn.out_proj"),
                    "b": sd.take(f"{prefix}.self_attn.out_proj.bias")},
        },
        "ff1": {"w": sd.linear_w(f"{prefix}.linear1"),
                "b": sd.take(f"{prefix}.linear1.bias")},
        "ff2": {"w": sd.linear_w(f"{prefix}.linear2"),
                "b": sd.take(f"{prefix}.linear2.bias")},
        "norm1": {"scale": sd.take(f"{prefix}.norm1.weight"),
                  "bias": sd.take(f"{prefix}.norm1.bias")},
        "norm2": {"scale": sd.take(f"{prefix}.norm2.weight"),
                  "bias": sd.take(f"{prefix}.norm2.bias")},
    }


def convert_reference_state_dict(model_name: str, state_dict: Dict[str, Any],
                                 params_template: Params) -> Params:
    """Reference ``state_dict`` -> this framework's parameter pytree.

    ``params_template`` (from ``spec.init`` with the matching model config)
    supplies the expected tree structure and shapes; conversion fails on any
    missing/extra/mis-shaped tensor.
    """
    base = (model_name[:-len("_no_labels")]
            if model_name.endswith("_no_labels") else model_name)
    sd = _StateDict(state_dict)

    if base in ("opnet", "opnet_lstm_mlp"):
        out: Params = {
            "att_lstm": sd.lstm("object_to_track_LSTM"),
            "att_head": {"w": sd.linear_w("object_to_track_prediction")},
            "box_head": {"w": sd.linear_w("prediction_layer")},
        }
        if base == "opnet":
            out["video_lstm"] = sd.lstm("video_LSTM")
        else:
            out["hidden"] = {"w": sd.linear_w("hidden_layer")}
    elif base == "baseline_lstm":
        out = {"video_lstm": sd.lstm("video_LSTM"),
               "box_head": {"w": sd.linear_w("predictions_layer")}}
    elif base == "non_linear_lstm":
        out = {"box_proj": {"w": sd.linear_w("boxes_linear")},
               "video_lstm": [sd.lstm("video_LSTM", i)
                              for i in range(len(params_template["video_lstm"]))],
               "box_head": {"w": sd.linear_w("predictions_layer")}}
    elif base == "transformer_lstm":
        out = {
            "box_proj": {"w": sd.linear_w("boxes_linear")},
            "encoder": [_encoder_layer(sd, f"attention_encoder.layers.{i}", t)
                        for i, t in enumerate(params_template["encoder"])],
            "video_lstm": [sd.lstm("video_LSTM", i)
                           for i in range(len(params_template["video_lstm"]))],
            "box_head": {"w": sd.linear_w("predictions_layer")},
        }
    else:
        raise ValueError(
            f"no reference checkpoint format exists for {model_name!r} "
            f"(beyond-reference variant?)")
    sd.finish()

    import jax
    def _check(path_leaf, template_leaf):
        got, want = np.shape(path_leaf), np.shape(template_leaf)
        if got != want:
            raise ValueError(
                f"converted tensor shape {got} != expected {want} — "
                f"model config mismatch with the checkpoint")
        return jnp.asarray(path_leaf)
    return jax.tree.map(_check, out, params_template)


def load_reference_checkpoint(model_name: str, path, params_template: Params
                              ) -> Params:
    """torch.load a reference ``.pth`` and convert (CPU-only torch use)."""
    import torch
    state_dict = torch.load(path, map_location="cpu")
    return convert_reference_state_dict(model_name, state_dict,
                                        params_template)
