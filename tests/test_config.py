"""Typed config parsing/validation tests."""

import pytest

from objectpermanence_tpu.config import (
    ConfigError, InferenceConfig, TrainingConfig, inference_config_from,
    training_config_from,
)

REQUIRED = {
    "train_sample_dir": "a", "train_labels_dir": "b",
    "train_containment_file": "c", "dev_sample_dir": "d",
    "dev_labels_dir": "e", "dev_containment_file": "f",
}


def test_training_config_defaults():
    cfg = training_config_from(REQUIRED)
    assert cfg.batch_size == 16 and cfg.num_epochs == 160
    assert cfg.learning_rate == 1e-3


def test_training_config_unknown_key_fails():
    with pytest.raises(ConfigError, match="unknown config keys"):
        training_config_from({**REQUIRED, "typo_key": 1})


def test_training_config_missing_key_fails():
    with pytest.raises(ConfigError, match="missing required"):
        training_config_from({"train_sample_dir": "a"})


def test_training_config_validation():
    with pytest.raises(ConfigError, match="batch_size"):
        training_config_from({**REQUIRED, "batch_size": 0})


def test_inference_config():
    cfg = inference_config_from({"sample_dir": "s", "labels_dir": "l",
                                 "batch_size": 8})
    assert isinstance(cfg, InferenceConfig)
    assert cfg.model_path is None
    # passthrough of already-typed configs
    assert inference_config_from(cfg) is cfg


def test_reference_training_config_keys_accepted():
    """The reference's configs/training_config.json keys must all parse."""
    ref_keys = {
        "batch_size": 16, "inference_batch_size": 400, "num_workers": 12,
        "num_epochs": 160, "print_step": 100, "learning_rate": 0.001,
        "lr_scheduler_patience": 2, "lr_scheduler_factor": 0.8,
        "device": "cuda:0", "checkpoints_path": "./",
    }
    cfg = training_config_from({**REQUIRED, **ref_keys})
    assert isinstance(cfg, TrainingConfig)
