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
                frames_reader=None, debug_writer=None,
                gt_boxes=None) -> List[List[int]]:
    """Run the stateful reasoner over one video's detections; optionally
    render the reference's debug overlay (tracked box yellow, GT blue,
    carried-object box red — `inference_main.py:82-114`)."""
    import numpy as _np

    predictions = []
    for frame_idx in range(num_frames):
        frame = frames_reader(frame_idx) if frames_reader is not None else None
        reasoner.track_for_frame(frame, frame_idx, prediction_data)
        box = _reasoner_box(reasoner)
        predictions.append(box)

        if debug_writer is not None and frame is not None:
            import cv2
            state = reasoner.state
            if reasoner.snitch_visible:
                tracked = [int(v) for v in state["snitch_box"]]
            else:
                cx, cy = state["target_pos"]
                w, h = state["target_sz"]
                tracked = [int(cx - w / 2), int(cy - h / 2),
                           int(cx + w / 2), int(cy + h / 2)]
            canvas = _np.ascontiguousarray(frame)
            cv2.rectangle(canvas, (tracked[0], tracked[1]),
                          (tracked[2], tracked[3]), (0, 255, 255), 3)
            if gt_boxes is not None:
                g = [int(v) for v in gt_boxes[frame_idx]]
                cv2.rectangle(canvas, (g[0], g[1]), (g[2], g[3]), (255, 0, 0), 3)
            if "object_sz" in state and not reasoner.snitch_visible:
                cv2.rectangle(canvas, (box[0], box[1]), (box[2], box[3]),
                              (0, 0, 255), 3)
            debug_writer.write(canvas)
    return predictions


def trackers_inference_main(model_type: str, results_dir: str,
                            config: Dict) -> Dict[str, List[List[int]]]:
    """Optional config key `skip_existing` (default false): reuse
    `<name>_bb.json` predictions already in `results_dir` instead of
    re-tracking — per-video failure recovery for long runs over a flaky
    device link (same policy as the preprocess driver's per-video skip)."""
    samples_dir = Path(config["sample_dir"])
    results_dir = Path(results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    model_weights = config.get("model_path", "")
    skip_existing = bool(config.get("skip_existing", False))

    videos_dir = config.get("videos_dir")
    sample_file = config.get("sample_file")
    names = sorted(p.stem for p in samples_dir.glob("*.pkl"))
    if sample_file:
        with open(sample_file) as f:
            wanted = {Path(line.strip()).stem for line in f if line.strip()}
        names = [n for n in names if n in wanted]

    labels_dir = config.get("labels_dir")

    all_predictions = {}
    for name in names:
        with open(samples_dir / f"{name}.pkl", "rb") as f:
            prediction_data = pickle.load(f)
        num_frames = len(prediction_data["bb"])

        done_path = results_dir / f"{name}_bb.json"
        if skip_existing and done_path.exists():
            # validate before reuse: a corrupt, short, or foreign file
            # (crashed writer predating the atomic-write fix, stale results
            # from a different fixture set) re-tracks instead
            import json
            try:
                with open(done_path) as f:
                    prev = json.load(f)
            except (json.JSONDecodeError, OSError):
                prev = None
            if (isinstance(prev, list) and len(prev) == num_frames
                    and all(isinstance(b, list) and len(b) == 4
                            for b in prev)):
                all_predictions[name] = prev
                continue

        frames_reader = None
        cap = None
        debug_writer = None
        gt_boxes = None
        video_path = Path(videos_dir) / f"{name}.avi" if videos_dir else None
        if video_path is not None and video_path.exists():
            import cv2
            cap = cv2.VideoCapture(str(video_path))
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            debug_writer = cv2.VideoWriter(
                str(results_dir / f"{name}_results.avi"),
                cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))

            def frames_reader(_idx, _cap=cap):
                ok, frame = _cap.read()
                return frame if ok else None

            if labels_dir:
                from objectpermanence_tpu.analysis.analyzer import parse_gt_bb_json
                gt_path = Path(labels_dir) / f"{name}_bb.json"
                if gt_path.exists():
                    gt_boxes = parse_gt_bb_json(gt_path)
        elif model_type == "detector_tracker":
            raise FileNotFoundError(
                f"detector_tracker needs raw video pixels; missing {video_path}")

        reasoner = get_tracker_model(model_type, model_weights)
        predictions = track_video(reasoner, prediction_data, num_frames,
                                  frames_reader, debug_writer, gt_boxes)
        if cap is not None:
            cap.release()
        if debug_writer is not None:
            debug_writer.release()
        write_bb_predictions(name, results_dir, predictions)
        all_predictions[name] = predictions
    return all_predictions
