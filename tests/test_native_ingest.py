"""Native C++ ingest kernels: bit-exact parity with the Python path."""

import numpy as np
import pytest

from objectpermanence_tpu.data import ingest
from objectpermanence_tpu.data.fixtures import make_scene
from objectpermanence_tpu.native.build import (
    load_ingest_library, native_containment_oracle, native_pad_video,
)
from objectpermanence_tpu.vocab import IS_CONE

pytestmark = pytest.mark.skipif(load_ingest_library() is None,
                                reason="native toolchain unavailable")


def _scene_to_raw(scene):
    boxes, classes, visible = scene["boxes"], scene["classes"], scene["visible"]
    frame_bbs, frame_labels = [], []
    for f in range(len(boxes)):
        mask = visible[f]
        frame_bbs.append(boxes[f, mask].astype(np.float32))
        frame_labels.append(classes[mask].astype(np.int64))
    return frame_bbs, frame_labels


@pytest.mark.parametrize("feature_width", [5, 6])
def test_native_matches_python(feature_width):
    for seed in range(4):
        scene = make_scene(seed=seed, num_frames=80, num_objects=7)
        bbs, labels = _scene_to_raw(scene)

        py_padded = ingest.pad_video_detections(bbs, labels, feature_width)
        c_padded = native_pad_video(bbs, labels, feature_width, IS_CONE)
        np.testing.assert_allclose(c_padded, py_padded, rtol=1e-6, atol=1e-7)

        py_track = ingest.containment_oracle(py_padded, feature_width)
        c_track = native_containment_oracle(py_padded, feature_width)
        np.testing.assert_array_equal(c_track, py_track)


def test_native_empty_frames_and_duplicates():
    bbs = [np.array([[10, 10, 20, 20], [11, 11, 21, 21]], np.float32),
           np.zeros((0, 4), np.float32),
           np.array([[30, 30, 40, 40]], np.float32)]
    labels = [np.array([7, 7]), np.zeros(0, np.int64), np.array([0])]
    for fw in (5, 6):
        py = ingest.pad_video_detections(bbs, labels, fw)
        cc = native_pad_video(bbs, labels, fw, IS_CONE)
        np.testing.assert_allclose(cc, py, rtol=1e-6, atol=1e-7)
