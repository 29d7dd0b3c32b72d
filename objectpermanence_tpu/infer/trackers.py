"""Programmed-model (frame-sequential) inference driver.

Reference `baselines/inference_main.py:44-159`: per video, walk the 300
frames, call the stateful reasoner, render debug boxes, and write the
`<name>_bb.json` predictions. The heuristic reasoner needs no pixels, so
videos are optional for it; the SiamRPN tracker path reads frames.
"""

import pickle
from pathlib import Path
from typing import Dict, List

from objectpermanence_tpu import VIDEO_NUM_FRAMES
from objectpermanence_tpu.analysis.analyzer import write_bb_predictions
from objectpermanence_tpu.models.heuristic import AbstractReasoner, HeuristicReasoner
from objectpermanence_tpu.vocab import large_cone_indices

LARGE_CONE_IDS = set(large_cone_indices())


def get_tracker_model(model_type: str, model_weights: str = "",
                      device=None) -> AbstractReasoner:
    """Factory (reference `models_factory.py:16-33`)."""
    if model_type == "detector_heuristic":
        return HeuristicReasoner()
    if model_type == "detector_tracker":
        from objectpermanence_tpu.models.siam import build_siam_reasoner
        return build_siam_reasoner(model_weights)
    raise AttributeError(f"Tracking model name is incorrect: {model_type!r}")


def _reasoner_box(reasoner: AbstractReasoner) -> List[int]:
    """Current prediction box per the reference's selection rules
    (`inference_main.py:82-122`): visible snitch -> detector box;
    hidden + known snitch size -> snitch-sized box at the carrier's
    position (shifted for large cones); else the carrier's box."""
    state = reasoner.state
    if reasoner.snitch_visible:
        return [int(v) for v in state["snitch_box"]]
    cx, cy = state["target_pos"]
    if "object_sz" in state:
        w, h = state["object_sz"]
        if state.get("object_label") in LARGE_CONE_IDS:
            cy = cy + 15
    else:
        w, h = state["target_sz"]
    return [int(cx - w / 2), int(cy - h / 2), int(cx + w / 2), int(cy + h / 2)]


def track_video(reasoner: AbstractReasoner, prediction_data: Dict,
                num_frames: int = VIDEO_NUM_FRAMES,
                frames_reader=None) -> List[List[int]]:
    """Run the stateful reasoner over one video's detections."""
    predictions = []
    for frame_idx in range(num_frames):
        frame = frames_reader(frame_idx) if frames_reader is not None else None
        reasoner.track_for_frame(frame, frame_idx, prediction_data)
        predictions.append(_reasoner_box(reasoner))
    return predictions


def trackers_inference_main(model_type: str, results_dir: str,
                            config: Dict) -> Dict[str, List[List[int]]]:
    samples_dir = Path(config["sample_dir"])
    results_dir = Path(results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    model_weights = config.get("model_path", "")

    videos_dir = config.get("videos_dir")
    sample_file = config.get("sample_file")
    names = sorted(p.stem for p in samples_dir.glob("*.pkl"))
    if sample_file:
        with open(sample_file) as f:
            wanted = {Path(line.strip()).stem for line in f if line.strip()}
        names = [n for n in names if n in wanted]

    all_predictions = {}
    for name in names:
        with open(samples_dir / f"{name}.pkl", "rb") as f:
            prediction_data = pickle.load(f)
        num_frames = len(prediction_data["bb"])

        frames_reader = None
        cap = None
        if model_type == "detector_tracker":
            import cv2
            video_path = Path(videos_dir) / f"{name}.avi"
            cap = cv2.VideoCapture(str(video_path))

            def frames_reader(_idx, _cap=cap):
                ok, frame = _cap.read()
                return frame if ok else None

        reasoner = get_tracker_model(model_type, model_weights)
        predictions = track_video(reasoner, prediction_data, num_frames, frames_reader)
        if cap is not None:
            cap.release()
        write_bb_predictions(name, results_dir, predictions)
        all_predictions[name] = predictions
    return all_predictions
