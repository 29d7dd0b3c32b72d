"""End-to-end CLI slice on perfect-perception fixtures: training ->
checkpoint -> inference -> analysis -> cater grid CSV, plus the programmed
heuristic baseline — every CLI mode except `preprocess` (which needs the
detector stack), mirroring SURVEY §7's minimum slice."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import main as cli
from objectpermanence_tpu.data.fixtures import write_fixture_dataset

NUM_FRAMES = 40
MODEL_CFG = {"object_to_track_pred_dim": 15, "object_to_track_hidden_dim": 32,
             "videos_hidden_dim": 48}


@pytest.fixture(scope="module")
def fixture_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("cater")
    pred_dir, labels_dir, containment = write_fixture_dataset(
        root, num_videos=6, seed=3, num_frames=NUM_FRAMES)
    return root, pred_dir, labels_dir, containment


@pytest.fixture(scope="module")
def trained_checkpoint(fixture_data, tmp_path_factory):
    root, pred_dir, labels_dir, containment = fixture_data
    work = tmp_path_factory.mktemp("train")

    train_cfg = {
        "batch_size": 4, "inference_batch_size": 8, "num_workers": 0,
        "num_epochs": 2, "print_step": 1, "learning_rate": 1e-3,
        "lr_scheduler_patience": 2, "lr_scheduler_factor": 0.8,
        "checkpoints_path": str(work / "checkpoints"),
        "cache_dir": str(work / "cache"),
        "train_sample_dir": str(pred_dir), "train_labels_dir": str(labels_dir),
        "train_containment_file": str(containment),
        "dev_sample_dir": str(pred_dir), "dev_labels_dir": str(labels_dir),
        "dev_containment_file": str(containment),
    }
    model_cfg_path = work / "model.json"
    train_cfg_path = work / "train.json"
    model_cfg_path.write_text(json.dumps(MODEL_CFG))
    train_cfg_path.write_text(json.dumps(train_cfg))

    cli.main(["training", "--model_type", "opnet",
              "--model_config", str(model_cfg_path),
              "--training_config", str(train_cfg_path)])

    ckpt_root = work / "checkpoints" / "opnet"
    best = [p for p in ckpt_root.iterdir() if p.name != "resume"]
    assert best, "no best-dev checkpoint written"
    return work, max(best, key=lambda p: p.stat().st_mtime)


def test_training_writes_resumable_state(trained_checkpoint):
    work, _ = trained_checkpoint
    resume_dir = work / "checkpoints" / "opnet" / "resume"
    epochs = sorted(p.name for p in resume_dir.iterdir())
    assert epochs == ["epoch_0001", "epoch_0002"]
    meta = json.loads((resume_dir / "epoch_0002" / "metadata.json").read_text())
    assert meta["epoch"] == 2
    assert "scheduler" in meta


def test_inference_and_analysis_cli(fixture_data, trained_checkpoint, tmp_path):
    root, pred_dir, labels_dir, containment = fixture_data
    work, best_ckpt = trained_checkpoint
    results_dir = tmp_path / "results"

    inference_cfg = {
        "batch_size": 4, "num_workers": 0,
        "model_path": str(best_ckpt),
        "sample_dir": str(pred_dir), "labels_dir": str(labels_dir),
        "cache_dir": str(work / "cache"),
    }
    inf_cfg_path = tmp_path / "inference.json"
    inf_cfg_path.write_text(json.dumps(inference_cfg))
    model_cfg_path = tmp_path / "model.json"
    model_cfg_path.write_text(json.dumps(MODEL_CFG))

    cli.main(["inference", "--model_type", "opnet",
              "--results_dir", str(results_dir),
              "--inference_config", str(inf_cfg_path),
              "--model_config", str(model_cfg_path)])

    pred_files = sorted(results_dir.glob("*_bb.json"))
    assert len(pred_files) == 6
    boxes = json.loads(pred_files[0].read_text())
    assert len(boxes) == NUM_FRAMES and len(boxes[0]) == 4
    assert all(isinstance(v, int) for v in boxes[0])

    # --- analysis over the produced predictions ---
    out_csv = tmp_path / "analysis.csv"
    cli.main(["analysis",
              "--predictions_dir", str(results_dir),
              "--labels_dir", str(labels_dir),
              "--containment_annotations", str(containment),
              "--containment_only_static_annotations", str(root / "containment_only_static.txt"),
              "--containment_with_movements_annotations", str(root / "containment_with_move.txt"),
              "--visibility_ratio_gt_0", str(root / "visibility_rate_gt_0.txt"),
              "--visibility_ratio_gt_30", str(root / "visibility_rate_gt_30.txt"),
              "--visibility_ratio_gt_99", str(root / "visibility_rate_gt_99.txt"),
              "--iou_thresholds", "0.5,0.9",
              "--output_file", str(out_csv)])

    df = pd.read_csv(out_csv)
    assert len(df) == 6
    for col in ["videos_names", "overall_iou", "overall_map_0.5", "overall_map_0.9",
                "contained_mean_iou", "contained_ratio", "full_occlusion_mean_iou",
                "visibility_gt_0_mean_iou", "contained_mean_map_0.5"]:
        assert col in df.columns, col
    assert df["overall_iou"].between(0, 1).all()


def test_cater_inference_cli(fixture_data, trained_checkpoint, tmp_path):
    root, pred_dir, labels_dir, _ = fixture_data
    work, best_ckpt = trained_checkpoint
    results_dir = tmp_path / "cater_results"

    inference_cfg = {
        "batch_size": 4, "num_workers": 0,
        "model_path": str(best_ckpt),
        "sample_dir": str(pred_dir), "labels_dir": str(labels_dir),
        "cache_dir": str(work / "cache"),
    }
    inf_cfg_path = tmp_path / "inference.json"
    inf_cfg_path.write_text(json.dumps(inference_cfg))
    model_cfg_path = tmp_path / "model.json"
    model_cfg_path.write_text(json.dumps(MODEL_CFG))

    cli.main(["cater_inference", "--results_dir", str(results_dir),
              "--inference_config", str(inf_cfg_path),
              "--model_config", str(model_cfg_path)])

    df = pd.read_csv(results_dir / "class_pred_results.csv")
    assert list(df.columns) == ["video_names", "class_predictions"]
    assert len(df) == 6
    assert df["class_predictions"].between(0, 35).all()


def test_heuristic_tracker_cli(fixture_data, tmp_path):
    root, pred_dir, labels_dir, _ = fixture_data
    results_dir = tmp_path / "heuristic_results"
    cfg_path = tmp_path / "inference.json"
    cfg_path.write_text(json.dumps({
        "sample_dir": str(pred_dir), "labels_dir": str(labels_dir),
    }))

    cli.main(["inference", "--model_type", "detector_heuristic",
              "--results_dir", str(results_dir),
              "--inference_config", str(cfg_path)])

    pred_files = sorted(results_dir.glob("*_bb.json"))
    assert len(pred_files) == 6
    # while the snitch is visible the heuristic must localize it exactly:
    # compare against GT on the first frame (snitch visible by construction)
    preds = json.loads(pred_files[0].read_text())
    gt = json.loads((labels_dir / pred_files[0].name).read_text())
    snitch_gt = gt["small_gold_spl_metal_Spl_0"][0]
    x, y, w, h = snitch_gt
    np.testing.assert_allclose(preds[0], [x, y, x + w, y + h], atol=1.0)


@pytest.mark.slow
def test_no_labels_variant_trains(fixture_data, tmp_path):
    """Masked-loss (no_labels) path: one epoch of opnet_no_labels."""
    root, pred_dir, labels_dir, containment = fixture_data
    train_cfg = {
        "batch_size": 4, "inference_batch_size": 8, "num_epochs": 1,
        "print_step": 10, "learning_rate": 1e-3,
        "checkpoints_path": str(tmp_path / "ckpt"),
        "cache_dir": str(tmp_path / "cache"),
        "train_sample_dir": str(pred_dir), "train_labels_dir": str(labels_dir),
        "train_containment_file": str(containment),
        "dev_sample_dir": str(pred_dir), "dev_labels_dir": str(labels_dir),
        "dev_containment_file": str(containment),
    }
    model_cfg_path = tmp_path / "model.json"
    train_cfg_path = tmp_path / "train.json"
    model_cfg_path.write_text(json.dumps(MODEL_CFG))
    train_cfg_path.write_text(json.dumps(train_cfg))
    cli.main(["training", "--model_type", "opnet_no_labels",
              "--model_config", str(model_cfg_path),
              "--training_config", str(train_cfg_path)])
    assert (tmp_path / "ckpt" / "opnet_no_labels" / "resume" / "epoch_0001").exists()


def test_tracker_inference_skip_existing(fixture_data, tmp_path):
    """`skip_existing` reuses finished `<name>_bb.json` files (per-video
    resume after a crashed/wedged run) and re-tracks only missing ones."""
    from objectpermanence_tpu.infer.trackers import trackers_inference_main

    root, pred_dir, labels_dir, _ = fixture_data
    results_dir = tmp_path / "resume_results"
    cfg = {"sample_dir": str(pred_dir), "labels_dir": str(labels_dir)}

    full = trackers_inference_main("detector_heuristic", str(results_dir), cfg)
    names = sorted(full)
    # poison one finished prediction; delete another -> only the deleted
    # video may be re-tracked
    poisoned = results_dir / f"{names[0]}_bb.json"
    poisoned.write_text(json.dumps([[1, 2, 3, 4]] * len(full[names[0]])))
    (results_dir / f"{names[1]}_bb.json").unlink()

    resumed = trackers_inference_main("detector_heuristic", str(results_dir),
                                      {**cfg, "skip_existing": True})
    assert resumed[names[0]][0] == [1, 2, 3, 4]          # reused, not re-run
    assert resumed[names[1]] == full[names[1]]           # re-tracked
