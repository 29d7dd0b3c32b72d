"""Padding/alignment + containment-oracle semantics tests, including a
cross-check against the reference implementation loaded from
/root/reference (run, never copied)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

from objectpermanence_tpu.data import ingest
from objectpermanence_tpu.data.fixtures import make_scene, write_fixture_dataset
from objectpermanence_tpu.vocab import SNITCH_CLASS_INDEX


def _scene_to_raw(scene):
    """Scene -> reference-schema per-frame detection lists."""
    boxes, classes, visible = scene["boxes"], scene["classes"], scene["visible"]
    frame_bbs, frame_labels = [], []
    for f in range(len(boxes)):
        mask = visible[f]
        frame_bbs.append(boxes[f, mask].astype(np.float32))
        frame_labels.append(classes[mask].astype(np.int64))
    return frame_bbs, frame_labels


def test_slot_order_snitch_first():
    order = ingest.slot_order([5, 190, SNITCH_CLASS_INDEX, 3])
    assert order == [SNITCH_CLASS_INDEX, 3, 5, 190]


def test_pad_shapes_and_visibility():
    scene = make_scene(seed=0, num_frames=40, num_objects=5)
    bbs, labels = _scene_to_raw(scene)
    padded = ingest.pad_video_detections(bbs, labels, feature_width=6)
    assert padded.shape == (40, 15, 6)
    # snitch slot visibility mirrors the scene's visibility
    np.testing.assert_array_equal(padded[:, 0, 4].astype(bool), scene["visible"][:, 0])
    # all normalized coords within [0, 1]
    assert padded[..., :4].min() >= 0.0 and padded[..., :4].max() <= 1.0
    # padding rows (slots beyond the objects present) are all-zero
    assert np.all(padded[:, len(scene["classes"]):, :5] == 0)


def test_pad_duplicate_detection_keeps_first():
    # two detections of the same class in one frame: first one wins
    bbs = [np.array([[10, 10, 20, 20], [100, 100, 120, 120]], dtype=np.float32)]
    labels = [np.array([7, 7])]
    padded = ingest.pad_video_detections(bbs, labels, feature_width=5)
    np.testing.assert_allclose(padded[0, 0, :4] * [320, 240, 320, 240], [10, 10, 20, 20])
    assert padded[0, 1, 4] == 0  # no second slot for the duplicate


def test_pad_missing_cone_keeps_cone_bit():
    # slot 0 = cone (class 0), slot 1 = cube (class 1).
    # frame 0: both visible; frame 1: only the cube -> the missing cone slot
    # keeps is_cone=1 with visible=0 (it precedes the last detected slot);
    # frame 2: nothing detected -> all-zero rows (reference's generic
    # padding loop drops the cone bit once the merge walk has no detections)
    bbs = [np.array([[10, 10, 20, 20], [30, 30, 40, 40]], dtype=np.float32),
           np.array([[30, 30, 40, 40]], dtype=np.float32),
           np.zeros((0, 4), np.float32)]
    labels = [np.array([0, 1]), np.array([1]), np.array([], dtype=np.int64)]
    padded = ingest.pad_video_detections(bbs, labels, feature_width=6)
    assert padded[0, 0, 5] == 1 and padded[0, 0, 4] == 1
    assert padded[1, 0, 5] == 1 and padded[1, 0, 4] == 0
    assert np.all(padded[2] == 0)
    # pure padding slots (no object assigned) have cone bit 0
    assert np.all(padded[:, 2:, 5] == 0)


def _simple_containment_video(feature_width):
    """3 frames x 3 slots: snitch visible; snitch hidden under the nearby
    cone; snitch reappears."""
    t, o, f = 4, 15, feature_width
    padded = np.zeros((t, o, f), dtype=np.float32)
    # slot 0 snitch at (.1,.1)-(.2,.2); slot 1 cone near it; slot 2 far away
    snitch = [0.1, 0.1, 0.2, 0.2, 1.0]
    cone = [0.12, 0.12, 0.3, 0.3, 1.0]
    far = [0.8, 0.8, 0.9, 0.9, 1.0]
    padded[0, 0, :5], padded[0, 1, :5], padded[0, 2, :5] = snitch, cone, far
    padded[1, 1, :5], padded[1, 2, :5] = cone, far          # snitch hidden
    padded[2, 1, :5], padded[2, 2, :5] = cone, far          # still hidden
    padded[3, 0, :5], padded[3, 1, :5], padded[3, 2, :5] = snitch, cone, far
    if feature_width == 6:
        padded[:, 1, 5] = 1.0  # slot 1 is a cone
    return padded


def test_oracle5_containment_cycle():
    padded = _simple_containment_video(5)
    track = ingest.containment_oracle_5(padded)
    np.testing.assert_array_equal(track, [0, 1, 1, 0])


def test_oracle6_containment_cycle():
    padded = _simple_containment_video(6)
    track = ingest.containment_oracle_6(padded)
    np.testing.assert_array_equal(track, [0, 1, 1, 0])


def test_oracle6_occlusion_keeps_snitch():
    # 6-track: nearest visible object is NOT a cone -> occlusion; keep slot 0
    padded = _simple_containment_video(6)
    padded[:, 1, 5] = 0.0  # slot 1 no longer a cone
    track = ingest.containment_oracle_6(padded)
    np.testing.assert_array_equal(track, [0, 0, 0, 0])


def test_oracle5_occlusion_transfers_anyway():
    # 5-track has no cone information: transfer even on occlusion
    padded = _simple_containment_video(5)
    track = ingest.containment_oracle_5(padded)
    assert track[1] == 1


# --- cross-check against the actual reference implementation -----------------

def _load_reference_datasets_module():
    ref_root = Path("/root/reference")
    if not ref_root.exists():
        pytest.skip("reference repo not mounted")
    # the reference targets numpy<1.20 (np.bool / np.int aliases)
    if not hasattr(np, "bool"):
        np.bool = bool
        np.int = int
    sys.path.insert(0, str(ref_root))
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_datasets", ref_root / "baselines" / "datasets.py")
        mod = importlib.util.module_from_spec(spec)
        # satisfy `from object_indices import is_cone_object`
        spec2 = importlib.util.spec_from_file_location(
            "object_indices", ref_root / "object_indices.py")
        oi = importlib.util.module_from_spec(spec2)
        spec2.loader.exec_module(oi)
        sys.modules["object_indices"] = oi
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(str(ref_root))


@pytest.mark.parametrize("feature_width", [5, 6])
def test_pad_and_oracle_match_reference(feature_width):
    """Golden test: run the reference's own padding + oracle state machines
    on fixture scenes and require bit-exact agreement."""
    ref = _load_reference_datasets_module()
    if feature_width == 5:
        ref_ds = ref.CaterAbstract5TracksForObjectsDataset("/tmp", "/tmp")
    else:
        ref_ds = ref.CaterAbstract6TracksForObjectsDataset("/tmp", "/tmp")

    for seed in range(5):
        scene = make_scene(seed=seed, num_frames=60, num_objects=7)
        bbs, labels = _scene_to_raw(scene)

        ref_padded = np.array(ref_ds._normalize_and_pad_predictions(bbs, labels))
        ref_track = np.array(ref_ds._get_closest_object_to_track_vector(
            list(ref_padded)))

        got_padded = ingest.pad_video_detections(bbs, labels, feature_width)
        got_track = ingest.containment_oracle(got_padded, feature_width)

        np.testing.assert_allclose(got_padded, ref_padded, rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(got_track, ref_track)


def test_ingest_directory_roundtrip(tmp_path):
    pred_dir, labels_dir, containment = write_fixture_dataset(
        tmp_path, num_videos=3, seed=1, num_frames=50)
    ds = ingest.ingest_directory(pred_dir, labels_dir, 6,
                                 containment_file=containment,
                                 cache_dir=tmp_path / "cache")
    assert len(ds) == 3
    assert ds.boxes.shape == (3, 50, 15, 6)
    assert ds.index_to_track.shape == (3, 50)
    assert ds.labels.shape == (3, 50, 4)
    assert ds.containment_mask.shape == (3, 50, 4)
    # cache hit gives identical arrays
    ds2 = ingest.ingest_directory(pred_dir, labels_dir, 6,
                                  containment_file=containment,
                                  cache_dir=tmp_path / "cache")
    np.testing.assert_array_equal(ds.boxes, ds2.boxes)
    np.testing.assert_array_equal(ds.index_to_track, ds2.index_to_track)

    # batching covers the dataset deterministically
    names = []
    for batch in ingest.batches(ds, 2, shuffle=True, seed=0):
        assert batch["boxes"].ndim == 4
        names.extend(batch["names"])
    assert sorted(names) == ds.names
