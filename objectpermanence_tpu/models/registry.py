"""Model registry: supported-model name lists and the factory.

Mirrors `baselines/supported_models.py` + `baselines/models_factory.py`,
fixing the reference's `"opent_no_labels"` typo (`models_factory.py:64`)
that made `opnet_no_labels` inference unreachable.
"""

from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax

from objectpermanence_tpu.models import reasoning

PROGRAMMED_MODELS = ["detector_tracker", "detector_heuristic"]

TRAINING_SUPPORTED_MODELS_5_TRACKS = [
    "baseline_lstm", "baseline_lstm_no_labels",
    "non_linear_lstm", "non_linear_lstm_no_labels",
    "transformer_lstm", "transformer_lstm_no_labels",
]

TRAINING_SUPPORTED_MODELS_6_TRACKS = [
    "opnet", "opnet_no_labels",
    "opnet_lstm_mlp", "opnet_lstm_mlp_no_labels",
    "opnet_moe",  # beyond-reference: MoE box head (parallel/expert.py)
    # beyond-reference: OPNet whose who-to-attend logits are additionally
    # supervised with cross-entropy against the datasets' containment-oracle
    # index_to_track — the supervision signal the reference computes
    # (`datasets.py:199-257`) and returns from the model
    # (`learned_models.py:50-52`) but never adds to the loss
    # (`training_main.py:185-186` unpacks and drops it)
    "opnet_att_ce",
]

TRAINING_SUPPORTED_MODELS = TRAINING_SUPPORTED_MODELS_5_TRACKS + TRAINING_SUPPORTED_MODELS_6_TRACKS

INFERENCE_SUPPORTED_MODELS = PROGRAMMED_MODELS + TRAINING_SUPPORTED_MODELS

# OPNet family returns (boxes, who_to_attend_logits)
DOUBLE_OUTPUT_MODELS = TRAINING_SUPPORTED_MODELS_6_TRACKS

# "learn from visible frames only" variants: masked L1 + consistency loss
NO_LABELS_MODELS = [m for m in TRAINING_SUPPORTED_MODELS if m.endswith("_no_labels")]


@dataclass(frozen=True)
class ModelSpec:
    name: str
    init: Callable
    apply: Callable
    feature_width: int          # 5 or 6 input features per object slot
    double_output: bool         # returns (boxes, attention logits)
    no_labels: bool             # masked-loss training variant
    # weight of the model's auxiliary training loss; non-zero only for
    # opnet_moe (Switch load-balance term, alpha=0.01 per Fedus et al.),
    # whose apply(..., return_aux=True) returns it as a third output
    aux_loss_weight: float = 0.0
    # weight of the attention cross-entropy vs the containment oracle's
    # index_to_track; non-zero only for opnet_att_ce
    att_ce_weight: float = 0.0


def _base_name(name: str) -> str:
    if name.endswith("_no_labels"):
        return name[: -len("_no_labels")]
    if name == "opnet_att_ce":
        return "opnet"
    return name


_ARCHS: Dict[str, tuple] = {
    "baseline_lstm": (reasoning.baseline_lstm_init, reasoning.baseline_lstm_apply, 5, False),
    "non_linear_lstm": (reasoning.non_linear_lstm_init, reasoning.non_linear_lstm_apply, 5, False),
    "transformer_lstm": (reasoning.transformer_lstm_init, reasoning.transformer_lstm_apply, 5, False),
    "opnet": (reasoning.opnet_init, reasoning.opnet_apply, 6, True),
    "opnet_lstm_mlp": (reasoning.opnet_lstm_mlp_init, reasoning.opnet_lstm_mlp_apply, 6, True),
    "opnet_moe": (reasoning.opnet_moe_init, reasoning.opnet_moe_apply, 6, True),
}


def get_model_spec(name: str, config: Optional[Dict] = None) -> ModelSpec:
    base = _base_name(name)
    if base not in _ARCHS:
        raise ValueError(f"Unknown model name: {name!r}; supported: {TRAINING_SUPPORTED_MODELS}")
    init, apply, width, double = _ARCHS[base]
    if base == "transformer_lstm" and config and config.get("reference_compat"):
        # reproduce the reference's actual cross-batch attention semantics
        # so reference-trained checkpoints validate bit-for-bit — see
        # reasoning.transformer_lstm_apply
        from functools import partial
        apply = partial(apply, reference_compat=True)
    aux_weight = 0.0
    if base == "opnet_moe":
        aux_weight = float((config or {}).get("moe_balance_weight", 0.01))
    att_ce = 0.0
    if name == "opnet_att_ce":
        att_ce = float((config or {}).get("att_ce_weight", 1.0))
    return ModelSpec(
        name=name, init=init, apply=apply, feature_width=width,
        double_output=double, no_labels=name in NO_LABELS_MODELS,
        aux_loss_weight=aux_weight, att_ce_weight=att_ce,
    )


def init_model(name: str, config: Dict[str, int], seed: int = 0,
               checkpoint_path: Optional[str] = None):
    """Build (spec, params); optionally restore params from a checkpoint
    (reference `models_factory.py:42-80` with `.pth` loading).

    `checkpoint_path` accepts this framework's orbax checkpoints (a leaf
    checkpoint or a training-loop tree resolved to its best-dev leaf) AND
    reference-trained torch `.pth` state_dicts
    (`/root/reference/models_factory.py:76-78`), converted through
    `models/convert_reasoning.py`."""
    spec = get_model_spec(name, config)
    params = spec.init(jax.random.PRNGKey(seed), config)
    if checkpoint_path is not None:
        if str(checkpoint_path).endswith(".pth"):
            from objectpermanence_tpu.models.convert_reasoning import (
                load_reference_checkpoint,
            )
            params = jax.device_put(
                load_reference_checkpoint(name, checkpoint_path, params))
            print(f"Converted reference checkpoint {checkpoint_path}")
            return spec, params
        from objectpermanence_tpu.utils.checkpoint import (
            best_params_checkpoint, restore_params,
        )
        # the reference's model_path is a single .pth file; the natural
        # analogue here is a checkpoint TREE (`<ckpt_root>/<model>/` with
        # `<stamp>_<dev_miou>` leaves from the training loop) — resolve a
        # non-leaf directory to its best-dev params checkpoint so
        # `inference_config.json: model_path` can point at either.
        resolved = best_params_checkpoint(checkpoint_path)
        if resolved is not None:
            checkpoint_path = resolved
        # device_put once: orbax restores HOST numpy arrays, and feeding
        # those to a jit re-uploads every parameter on EVERY dispatch (~10 MB
        # per step — catastrophic over a low-bandwidth host link)
        params = jax.device_put(restore_params(checkpoint_path, params))
        print(f"Loaded model parameters from {checkpoint_path}")
    return spec, params
