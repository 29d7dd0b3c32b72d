"""The shipped configs/ (same filenames/keys as the reference's
`configs/*.json`) must parse through the typed config system and through
each model's init — a user switching from the reference edits only the
data paths."""

import json
from pathlib import Path

import jax
import pytest

from objectpermanence_tpu.config import (
    inference_config_from, preprocess_config_from, training_config_from,
)

CONFIGS = Path(__file__).resolve().parents[1] / "configs"

MODEL_CONFIGS = {
    "opnet": "opnet_model_config.json",
    "opnet_lstm_mlp": "opnet_lstm_mlp_model_config.json",
    "baseline_lstm": "baseline_lstm_model_config.json",
    "non_linear_lstm": "non_linear_lstm_model_config.json",
    "transformer_lstm": "transformer_lstm_model_config.json",
}


def _load(name):
    with open(CONFIGS / name) as f:
        return json.load(f)


def test_training_and_inference_configs_parse():
    training_config_from(_load("training_config.json"))
    inference_config_from(_load("inference_config.json"))


def test_preprocess_config_keys_are_detector_fields():
    # preprocess_main forwards any DetectorConfig field name; every shipped
    # key must be either a PreprocessConfig field or a DetectorConfig field
    import dataclasses

    from objectpermanence_tpu.config import PreprocessConfig
    from objectpermanence_tpu.models.detector.detector import DetectorConfig

    known = ({f.name for f in dataclasses.fields(PreprocessConfig)}
             | {f.name for f in dataclasses.fields(DetectorConfig)})
    unknown = set(_load("preprocess_config.json")) - known
    assert not unknown, unknown


@pytest.mark.parametrize("model,fname", sorted(MODEL_CONFIGS.items()))
def test_model_configs_init(model, fname):
    from objectpermanence_tpu.models.registry import get_model_spec

    spec = get_model_spec(model)
    params = spec.init(jax.random.PRNGKey(0), _load(fname))
    assert jax.tree_util.tree_leaves(params)


def test_load_model_config_variant_aliases():
    # registry variants without their own configs/ file resolve to the base
    # architecture's hyperparameters (two_stage_run --model relies on this)
    from objectpermanence_tpu.config import load_model_config

    assert load_model_config("opnet_moe") == load_model_config("opnet")
    assert (load_model_config("baseline_lstm_no_labels")
            == load_model_config("baseline_lstm"))
