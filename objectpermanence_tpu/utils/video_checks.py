"""Data validation utilities: broken/corrupt video detection.

Port of `generate/gen_utils.py:24-47` + the ffmpeg frame-count check in
`gen_train_test.py:209-228`, using cv2 instead of shelling out."""

from pathlib import Path
from typing import Dict


def video_frame_count(video_path) -> int:
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        return -1
    count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return count


def find_broken_videos(videos_dir, expected_frames: int = 301) -> Dict[str, int]:
    """{video_name: frame_count} for videos that fail to open or don't have
    the expected frame count (301 = 300 + cv2's spurious extra frame)."""
    broken = {}
    for path in sorted(Path(videos_dir).glob("*.avi")):
        count = video_frame_count(path)
        if count != expected_frames:
            broken[path.stem] = count
    return broken
