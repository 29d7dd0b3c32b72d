"""Resume semantics: a run interrupted after epoch 1 continues to epoch 3
with scheduler/best-iou state intact, and a completed run resumes as a
no-op."""

import numpy as np

from objectpermanence_tpu.data.fixtures import write_fixture_dataset
from objectpermanence_tpu.data.ingest import ingest_directory
from objectpermanence_tpu.models.registry import get_model_spec
from objectpermanence_tpu.train.loop import training_main

MODEL_CFG = {"object_to_track_pred_dim": 15, "object_to_track_hidden_dim": 16,
             "videos_hidden_dim": 24}


def _cfg(tmp_path, epochs):
    return {
        "batch_size": 4, "inference_batch_size": 4, "num_epochs": epochs,
        "print_step": 100, "learning_rate": 1e-3,
        "checkpoints_path": str(tmp_path / "ckpt"),
        "train_sample_dir": "x", "train_labels_dir": "x",
        "train_containment_file": "x", "dev_sample_dir": "x",
        "dev_labels_dir": "x", "dev_containment_file": "x",
    }


def test_resume_continues_and_completes(tmp_path):
    pred_dir, labels_dir, containment = write_fixture_dataset(
        tmp_path / "data", num_videos=4, seed=2, num_frames=20)
    ds = ingest_directory(pred_dir, labels_dir, 6, containment_file=containment)
    spec = get_model_spec("opnet")

    r1 = training_main(spec, ds, ds, _cfg(tmp_path, 1), MODEL_CFG)
    assert len(r1.history) == 1

    # resume with a higher target: continues from epoch 2
    r2 = training_main(spec, ds, ds, _cfg(tmp_path, 3), MODEL_CFG, resume=True)
    assert [h["epoch"] for h in r2.history] == [2, 3]
    assert np.isfinite(r2.history[-1]["train"]["loss"])
    # best-dev carries across the restart
    assert r2.best_dev_iou >= r1.best_dev_iou

    # fully-completed run resumes as a no-op
    r3 = training_main(spec, ds, ds, _cfg(tmp_path, 3), MODEL_CFG, resume=True)
    assert r3.history == []

import pytest

pytestmark = pytest.mark.slow  # full-lane: see tests/conftest.py
