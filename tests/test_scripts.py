"""Scaled-run driver scripts (scripts/): tiny CPU end-to-end coverage."""

import pytest
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.mark.slow
def test_containment_run_stages(tmp_path):
    import containment_run

    root = tmp_path / "run"
    root.mkdir()
    containment_run.gen_split(root, "train", 3, 1, 40, 6)
    containment_run.gen_split(root, "dev", 2, 2, 40, 6)
    containment_run.gen_split(root, "test", 2, 3, 40, 6)
    # marker-file resume: second call is a no-op
    containment_run.gen_split(root, "train", 3, 1, 40, 6)
    for split in ("train", "dev", "test"):
        d = root / split
        assert len(list((d / "od_perception").glob("*.pkl"))) > 0
        assert (d / "annotations" / "containment_annotations.txt").exists()
        assert (d / "od_perception" / "visibility_rate_gt_0.99.txt").exists()

    containment_run.train(root, epochs=1, resume=False)
    assert (root / "metrics.jsonl").exists()
    containment_run.analyze(root)
    csv = (root / "analysis.csv").read_text()
    assert "overall_iou" in csv and "contained_mean_iou" in csv


def test_split_seeds_disjoint(tmp_path):
    """Different split seeds must never reproduce the same scene (the
    round-1 seed scheme made dev scenes byte-identical to train)."""
    from objectpermanence_tpu.datagen.simulator import simulate_dataset

    s1, _ = simulate_dataset(tmp_path / "a", num_videos=3, seed=1,
                             num_frames=30)
    s2, _ = simulate_dataset(tmp_path / "b", num_videos=3, seed=2,
                             num_frames=30)
    for p1 in sorted(s1.glob("*.json")):
        a = json.loads(p1.read_text())
        for p2 in sorted(s2.glob("*.json")):
            b = json.loads(p2.read_text())
            assert a["objects"][0]["locations"] != b["objects"][0]["locations"]


def test_variant_sweep_subset():
    from objectpermanence_tpu.data.ingest import IngestedDataset
    from variant_sweep import subset

    ds = IngestedDataset(
        [f"v{i}" for i in range(6)],
        np.zeros((6, 10, 15, 6), np.float32),
        np.zeros((6, 10), np.int32),
        np.zeros((6, 10, 4), np.float32),
        np.zeros((6, 10, 4), bool))
    small = subset(ds, 4)
    assert len(small) == 4 and small.boxes.shape[0] == 4
    assert subset(ds, None) is ds


def test_no_labels_training_mask_is_visible_frames(tmp_path):
    # `*_no_labels` supervision must mask the loss to VISIBLE frames
    # (reference training_main.py:199-201 "mask contains only visible
    # objects"); the containment file would supervise exactly the hidden
    # frames and collapse training.
    from objectpermanence_tpu.models.registry import get_model_spec
    from variant_sweep import training_mask_file

    d = tmp_path / "train"
    assert training_mask_file(get_model_spec("opnet_no_labels"), d) == \
        d / "od_perception" / "visibility_rate_gt_0.99.txt"
    assert training_mask_file(get_model_spec("opnet"), d) == \
        d / "annotations" / "containment_annotations.txt"


def test_twostage_summary_reduction(tmp_path):
    """twostage_summary reduces per-video analysis CSVs with NaN-skipping
    column means (blank = mask never fired, like the reference analyzer)."""
    import twostage_summary

    csv_text = (
        "videos_names,overall_iou,contained_mean_iou,full_occlusion_mean_iou,"
        "visibility_gt_0_mean_iou,overall_map_0.5\n"
        "v0,0.8,0.4,,0.9,0.7\n"
        "v1,0.6,,0.5,0.7,0.5\n")
    (tmp_path / "analysis.csv").write_text(csv_text)
    row = twostage_summary.summarize_csv(tmp_path / "analysis.csv")
    assert row["videos"] == 2
    assert row["overall_iou"] == 0.7
    assert row["contained_iou"] == 0.4      # one blank skipped
    assert row["full_occlusion_iou"] == 0.5
    assert row["map_0.5"] == 0.6


def test_collect_results_provenance_checks(tmp_path):
    """The round-4 regression: 800-run artifacts frozen under the 1,600-run
    destination. Every checker must refuse a contradicting source."""
    import collect_results as cr

    # perception_stats: self-describing video count
    p = tmp_path / "perception_stats.json"
    p.write_text(json.dumps({"train": {"videos": 800}}))
    with pytest.raises(cr.ProvenanceError):
        cr.perception_stats(1600)(p)
    p.write_text(json.dumps({"train": {"videos": 1600}}))
    assert b"1600" in cr.perception_stats(1600)(p)

    # grid rows: accumulating table is filtered to the run's tag
    g = tmp_path / "grid_results.json"
    g.write_text(json.dumps([
        {"model": "opnet_two_stage800", "grid_top1_acc": 0.52},
        {"model": "opnet_two_stage_1600", "grid_top1_acc": 0.53}]))
    rows = json.loads(cr.grid_rows("_two_stage_1600")(g))
    assert [r["model"] for r in rows] == ["opnet_two_stage_1600"]
    with pytest.raises(cr.ProvenanceError):
        cr.grid_rows("_two_stage_3200")(g)

    # models table: every row must carry the matching train_videos stamp
    m = tmp_path / "results_models.json"
    m.write_text(json.dumps([{"model": "opnet", "train_videos": 1600}]))
    assert cr.models_table(1600)(m)
    m.write_text(json.dumps([{"model": "opnet"}]))  # unstamped = refused
    with pytest.raises(cr.ProvenanceError):
        cr.models_table(1600)(m)

    # stamped: CSVs/metrics have no count; the sibling train_meta decides
    a = tmp_path / "analysis.csv"
    a.write_text("videos_names,overall_iou\nv0,0.5\n")
    meta = tmp_path / "train_meta.json"
    with pytest.raises(cr.ProvenanceError):     # stamp absent
        cr.stamped(str(meta), 1600)(a)
    meta.write_text(json.dumps({"train_videos": 800}))
    with pytest.raises(cr.ProvenanceError):     # stamp contradicts
        cr.stamped(str(meta), 1600)(a)
    meta.write_text(json.dumps({"train_videos": 1600}))
    assert cr.stamped(str(meta), 1600)(a) == a.read_bytes()


def test_twostage_summary_merges_train_meta(tmp_path):
    """Rows self-describe their run budget via the train_meta stamp."""
    import subprocess

    csv_text = (
        "videos_names,overall_iou,contained_mean_iou,full_occlusion_mean_iou,"
        "visibility_gt_0_mean_iou,overall_map_0.5\n"
        "v0,0.8,0.4,0.6,0.9,0.7\n")
    (tmp_path / "analysis.csv").write_text(csv_text)
    (tmp_path / "train_meta.json").write_text(json.dumps(
        {"model": "opnet", "train_videos": 1600, "epochs": 160,
         "best_dev_iou": 0.66}))
    script = Path(__file__).resolve().parent.parent / "scripts" / \
        "twostage_summary.py"
    subprocess.run([sys.executable, str(script), "--root", str(tmp_path),
                    "--models", "opnet"], check=True, capture_output=True)
    rows = json.loads((tmp_path / "results_models.json").read_text())
    assert rows[0]["train_videos"] == 1600 and rows[0]["epochs"] == 160


def test_collect_results_alias_vs_fatal(tmp_path):
    """A live source mapped to several run-named destinations: one
    accepting = healthy (rc 0, refusal downgraded to aliased_skip); a
    source EVERY destination refuses = the round-4 mislabel (fatal)."""
    import collect_results as cr

    src = tmp_path / "perception_stats.json"
    src.write_text(json.dumps({"train": {"videos": 1600}}))
    artifacts = [
        (str(src), "run1600/perception_stats.json", cr.perception_stats(1600)),
        (str(src), "run3200/perception_stats.json", cr.perception_stats(3200)),
    ]
    out = tmp_path / "results"
    summary = cr.collect(artifacts, out)
    assert summary["copied"] == ["run1600/perception_stats.json"]
    assert summary["aliased_skips"] == ["run3200/perception_stats.json"]
    assert summary["provenance_refused"] == []
    assert (out / "run1600" / "perception_stats.json").exists()

    src.write_text(json.dumps({"train": {"videos": 800}}))  # mislabeled
    summary = cr.collect(artifacts, out)
    assert sorted(summary["provenance_refused"]) == [
        "run1600/perception_stats.json", "run3200/perception_stats.json"]
