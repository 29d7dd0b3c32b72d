"""Full no-Blender pipeline integration: simulator -> label tooling ->
perfect perception -> ingest -> one training epoch. Exercises every
offline stage on the real CATER schemas."""

import numpy as np
import pytest

from objectpermanence_tpu.data.ingest import ingest_directory
from objectpermanence_tpu.datagen import scene_labels
from objectpermanence_tpu.datagen.cater_tasks import localization_class, write_task_labels
from objectpermanence_tpu.datagen.perfect_perception import PerfectPerceptionGenerator
from objectpermanence_tpu.datagen.simulator import simulate_dataset
from objectpermanence_tpu.models.registry import get_model_spec
from objectpermanence_tpu.train.loop import training_main

NUM_FRAMES = 60


@pytest.fixture(scope="module")
def simulated(tmp_path_factory):
    root = tmp_path_factory.mktemp("sim")
    scenes_dir, labels_dir = simulate_dataset(root, num_videos=4, seed=11,
                                              num_frames=NUM_FRAMES)
    return root, scenes_dir, labels_dir


def test_simulator_schema(simulated):
    import json
    root, scenes_dir, labels_dir = simulated
    scenes = sorted(scenes_dir.glob("*.json"))
    assert len(scenes) == 4
    scene = json.loads(scenes[0].read_text())
    assert {"objects", "movements"} <= set(scene)
    snitch = next(o for o in scene["objects"] if o["shape"] == "spl")
    assert snitch["instance"] == "Spl_0"
    assert len(snitch["locations"]) == NUM_FRAMES
    # a cone containment exists with the (_contain, Spl_0) tuple shape
    # (simulate_dataset re-rolls until the random plan contains the snitch)
    all_moves = [m for mv in scene["movements"].values() for m in mv]
    assert any(m[0] == "_contain" and m[1] == "Spl_0" for m in all_moves)

    gt = json.loads((labels_dir / (scenes[0].stem + "_bb.json")).read_text())
    assert "small_gold_spl_metal_Spl_0" in gt
    boxes = np.asarray(gt["small_gold_spl_metal_Spl_0"])
    assert boxes.shape == (NUM_FRAMES, 4)
    assert (boxes[:, 2] > 0).all() and (boxes[:, 3] > 0).all()


def test_scene_labels_and_tasks_on_simulated(simulated, tmp_path):
    import json
    root, scenes_dir, labels_dir = simulated
    paths = scene_labels.write_annotation_files(scenes_dir, tmp_path / "ann")
    lines = paths["containment"].read_text().splitlines()
    assert len(lines) == 4
    # the scripted containment must be present in every scene
    for line in lines:
        _, frames = line.split("\t")
        assert frames, "expected containment frames"

    scene = json.loads(next(iter(sorted(scenes_dir.glob("*.json")))).read_text())
    assert 0 <= localization_class(scene) < 36
    task_paths = write_task_labels(scenes_dir, tmp_path / "lists")
    assert len(task_paths["localize"].read_text().splitlines()) == 4


def test_full_pipeline_to_training(simulated, tmp_path):
    root, scenes_dir, labels_dir = simulated
    # GT geometry -> perception pickles
    gen = PerfectPerceptionGenerator(scenes_dir, labels_dir,
                                     tmp_path / "perception",
                                     visible_ratio=0.99, mode="visible_only")
    written = gen.generate()
    assert len(written) == 4

    ann = scene_labels.write_annotation_files(scenes_dir, tmp_path / "ann")

    dataset = ingest_directory(tmp_path / "perception", labels_dir, 6,
                               containment_file=ann["containment"])
    assert dataset.boxes.shape == (4, NUM_FRAMES, 15, 6)
    # snitch slot loses visibility during the scripted containment
    assert (dataset.boxes[:, :, 0, 4] == 0).any()

    spec = get_model_spec("opnet")
    cfg = {
        "batch_size": 4, "inference_batch_size": 4, "num_epochs": 1,
        "print_step": 10, "learning_rate": 1e-3,
        "checkpoints_path": str(tmp_path / "ckpt"),
        "train_sample_dir": "x", "train_labels_dir": "x",
        "train_containment_file": "x", "dev_sample_dir": "x",
        "dev_labels_dir": "x", "dev_containment_file": "x",
    }
    model_cfg = {"object_to_track_pred_dim": 15,
                 "object_to_track_hidden_dim": 32, "videos_hidden_dim": 48}
    result = training_main(spec, dataset, dataset, cfg, model_cfg)
    assert np.isfinite(result.history[0]["train"]["loss"])

pytestmark = pytest.mark.slow  # full-lane: see tests/conftest.py
