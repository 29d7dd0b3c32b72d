"""OTB-style programmed-baseline benchmark on rendered fixtures.

Produces the comparison the reference's DaSiamRPN results culture implies
(`baselines/DaSiamRPN/README.md`): OPE success AUC / precision@20px for
the two programmed reasoners (`detector_heuristic`, `detector_tracker`)
driven through the real inference CLI path over rendered pixel videos +
perfect-perception detections, plus the raw SiamRPN tracker scored by the
OTB harness (`analysis/tracker_eval.py`) on the same sequences.

    python scripts/tracker_benchmark.py [--videos 12] [--weights w.pth]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_fixture_set(root: Path, num_videos: int, frames: int) -> dict:
    from objectpermanence_tpu.datagen.perfect_perception import (
        PerfectPerceptionGenerator,
    )
    from objectpermanence_tpu.datagen.renderer import render_dataset
    from objectpermanence_tpu.datagen.simulator import simulate_dataset

    scenes_dir, labels_dir = simulate_dataset(
        root, num_videos=num_videos, seed=77, num_frames=frames,
        num_objects=6, snitch_bias=0.5)
    videos_dir, _, _ = render_dataset(scenes_dir, labels_dir, root,
                                      detection_samples_per_video=1)
    gen = PerfectPerceptionGenerator(scenes_dir, labels_dir,
                                     root / "od_perception",
                                     visible_ratio=0.99, mode="visible_only")
    gen.generate()
    return {"scenes": scenes_dir, "labels": labels_dir, "videos": videos_dir,
            "perception": root / "od_perception"}


def reasoner_ope(root: Path, dirs: dict, model_type: str,
                 weights: str, resume: bool = False) -> dict:
    """Drive the real inference path for one programmed reasoner and score
    its snitch predictions with the OTB OPE metrics."""
    from objectpermanence_tpu.analysis.analyzer import parse_gt_bb_json
    from objectpermanence_tpu.analysis.tracker_eval import ope_metrics
    from objectpermanence_tpu.infer.trackers import trackers_inference_main

    config = {"sample_dir": str(dirs["perception"]),
              "labels_dir": str(dirs["labels"]),
              "videos_dir": str(dirs["videos"]),
              "model_path": weights,
              # --resume ONLY: reusing results produced with different
              # weights would silently score the old model's predictions
              "skip_existing": resume}
    t0 = time.time()
    predictions = trackers_inference_main(model_type,
                                          str(root / f"results_{model_type}"),
                                          config)
    elapsed = time.time() - t0
    per_video = []
    for name, pred in predictions.items():
        gt = parse_gt_bb_json(dirs["labels"] / f"{name}_bb.json")
        pred = np.asarray(pred, np.float64)
        gt = np.asarray(gt, np.float64)[:len(pred)]
        # xyxy -> xywh for the OTB metrics
        pred_xywh = np.stack([pred[:, 0], pred[:, 1], pred[:, 2] - pred[:, 0],
                              pred[:, 3] - pred[:, 1]], axis=1)
        gt_xywh = np.stack([gt[:, 0], gt[:, 1], gt[:, 2] - gt[:, 0],
                            gt[:, 3] - gt[:, 1]], axis=1)
        per_video.append(ope_metrics(gt_xywh, pred_xywh))
    out = {k: float(np.mean([m[k] for m in per_video])) for k in per_video[0]}
    out["seconds"] = round(elapsed, 1)
    return out


def raw_siam_ope(dirs: dict, weights: str) -> dict:
    """Score the bare SiamRPN tracker (no detector assist) with the OTB
    harness: init on the snitch's frame-0 GT box, track through the video."""
    import cv2

    from objectpermanence_tpu.analysis.analyzer import parse_gt_bb_json
    from objectpermanence_tpu.analysis.tracker_eval import evaluate_tracker
    from objectpermanence_tpu.models.siam import build_siam_reasoner

    sequences = []
    for video_path in sorted(dirs["videos"].glob("*.avi")):
        cap = cv2.VideoCapture(str(video_path))
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame)
        cap.release()
        gt = np.asarray(parse_gt_bb_json(
            dirs["labels"] / f"{video_path.stem}_bb.json"), np.float64)
        frames = frames[:len(gt)]  # drop the renderer's spare trailing frame
        gt = gt[:len(frames)]
        gt_xywh = np.stack([gt[:, 0], gt[:, 1], gt[:, 2] - gt[:, 0],
                            gt[:, 3] - gt[:, 1]], axis=1)
        sequences.append({"frames": frames, "gt": gt_xywh})

    # torch blob, orbax dir (train/siam_loop.py), or random init
    tracker = build_siam_reasoner(weights).tracker
    result = evaluate_tracker(tracker, sequences)
    result.pop("per_sequence", None)
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, default=Path("/root/data/trackbench"))
    ap.add_argument("--videos", type=int, default=12)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--weights", type=str, default="",
                    help="SiamRPN weights: torch .pth or an orbax dir from "
                         "train/siam_loop.py; random init if empty")
    ap.add_argument("--existing-src", type=Path, default=None,
                    help="reuse an existing split dir (scenes/ labels/ "
                         "od_perception/) instead of building a fixture set")
    ap.add_argument("--existing-videos", type=Path, default=None,
                    help="rendered videos dir matching --existing-src")
    ap.add_argument("--limit", type=int, default=None,
                    help="with --existing-src: use only the first N videos")
    ap.add_argument("--resume", action="store_true",
                    help="reuse finished <name>_bb.json results in --root (ONLY valid when re-running with the SAME weights)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the chip alone)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    args.root.mkdir(parents=True, exist_ok=True)
    if args.existing_src is not None:
        src, videos = args.existing_src, args.existing_videos
        if args.limit:
            # restrict via symlink farms so every driver sees the same subset
            names = sorted(p.stem for p in videos.glob("*.avi"))[:args.limit]
            sub = args.root / "subset"
            for tag, src_dir, patterns in (
                    ("videos", videos, ["{}.avi"]),
                    ("labels", src / "labels", ["{}_bb.json"]),
                    ("od_perception", src / "od_perception",
                     ["{}.pkl"]),
                    ("scenes", src / "scenes", ["{}.json"])):
                d = sub / tag
                d.mkdir(parents=True, exist_ok=True)
                for n in names:
                    for pat in patterns:
                        f = pat.format(n)
                        link = d / f
                        if not link.exists() and (src_dir / f).exists():
                            link.symlink_to(src_dir / f)
            dirs = {"scenes": sub / "scenes", "labels": sub / "labels",
                    "videos": sub / "videos",
                    "perception": sub / "od_perception"}
        else:
            dirs = {"scenes": src / "scenes", "labels": src / "labels",
                    "videos": videos, "perception": src / "od_perception"}
        print(f"[bench] using existing set: {len(list(dirs['videos'].glob('*.avi')))} "
              f"videos", flush=True)
    else:
        print("[bench] building rendered fixture set...", flush=True)
        dirs = build_fixture_set(args.root, args.videos, args.frames)

    results = {}
    for model_type in ("detector_heuristic", "detector_tracker"):
        print(f"[bench] {model_type}...", flush=True)
        results[model_type] = reasoner_ope(args.root, dirs, model_type,
                                           args.weights, resume=args.resume)
    print("[bench] raw siamrpn (OTB harness)...", flush=True)
    results["siamrpn_raw"] = raw_siam_ope(dirs, args.weights)

    print(f"{'model':24s} {'success AUC':>12s} {'prec@20px':>10s} "
          f"{'mean IoU':>9s}")
    for name, m in results.items():
        print(f"{name:24s} {m['success_auc']:12.3f} "
              f"{m['precision_20px']:10.3f} {m['mean_iou']:9.3f}")
    (args.root / "results.json").write_text(json.dumps(results, indent=2))
    print(f"[bench] wrote {args.root / 'results.json'}")


if __name__ == "__main__":
    main()
