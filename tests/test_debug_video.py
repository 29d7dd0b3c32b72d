"""Debug-video writer: prediction/GT boxes rendered onto a real video file
(reference `inference_main.py:227-254` semantics incl. the cv2 extra-frame
drop)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from objectpermanence_tpu.infer.reasoning import write_debug_video
from objectpermanence_tpu.infer.preprocess import read_video_frames


def test_write_debug_video_roundtrip(tmp_path):
    src = tmp_path / "in.avi"
    writer = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"MJPG"), 24,
                             (160, 120))
    for _ in range(11):  # 10 frames + the spare frame convention
        writer.write(np.zeros((120, 160, 3), np.uint8))
    writer.release()

    preds = np.tile(np.array([[10, 10, 60, 60]]), (10, 1))
    gts = np.tile(np.array([[80, 40, 140, 100]]), (10, 1))
    out = tmp_path / "out.avi"
    write_debug_video(src, out, preds, gts)

    frames = read_video_frames(out)
    assert len(frames) == 9  # 10 written - 1 dropped by the reader convention
    frame = frames[0].astype(int)
    # colors survive lossy codec round-trip approximately:
    # prediction box yellow (BGR 0,255,255 -> RGB 255,255,0)
    np.testing.assert_allclose(frame[10, 30], [255, 255, 0], atol=20)
    # GT box blue (BGR 255,0,0 -> RGB 0,0,255)
    np.testing.assert_allclose(frame[40, 110], [0, 0, 255], atol=20)
