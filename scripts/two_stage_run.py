"""Scaled REAL two-stage pipeline: pixels -> Faster R-CNN -> OPNet.

The reference's primary experiment path feeds OPNet with Faster R-CNN
detections, not ground truth (`/root/reference/baselines/
preprocess_perception_main.py:99-114` -> `baselines/datasets.py:125-196`).
This script runs that full path at scale on the SAME scenes as the
perfect-perception flagship run (`scripts/containment_run.py`, sim4k:
3,200 train / 300 dev / 300 test):

    render      render every sim4k scene to 320x240 MJPG video (CPU only)
                + sampled PNG frames with the reference detection CSV schema
    dettrain    train the Faster R-CNN (GroupNorm backbone, from scratch)
                on rendered frames; eval mAP on dev/test frames
    preprocess  run the trained detector over every video -> od_real/*.pkl
                (the reference's score>=0.8 perception pickles)
    opnet       ingest REAL detections, train a reasoning model with the
                reference recipe (Adam 1e-3, bs 16, 160 epochs, plateau
                0.8/2); --model picks the architecture (default opnet)
    analyze     held-out test inference + the reference's analysis CSV
                (stratification files = scene GT, as in the reference)

Every stage is resumable; each finished stage leaves a marker/artifact the
next run skips. Compare the final containment/overall IoU against the
perfect-perception run's 0.426/0.518 (STATUS.md).

    python scripts/two_stage_run.py all
"""

import argparse
import json
import pickle
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

SPLITS = ("train", "dev", "test")

# the shipped reference-format config is the single source of truth
from objectpermanence_tpu.config import load_model_config


def detector_config():
    from objectpermanence_tpu.models.detector.detector import DetectorConfig
    return DetectorConfig(min_size=240, max_size=320, backbone_norm="group",
                          rpn_pre_nms_top_n=500, rpn_post_nms_top_n=300)


def render(src: Path, root: Path, det_samples: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")  # render is CPU-only; leave the chip free
    from objectpermanence_tpu.datagen.renderer import render_dataset

    for i, split in enumerate(SPLITS):
        t0 = time.time()
        render_dataset(src / split / "scenes", src / split / "labels",
                       root / split, detection_samples_per_video=det_samples,
                       seed=1000 + i, progress_every=200)
        n = len(list((root / split / "videos").glob("*.avi")))
        print(f"[render] {split}: {n} videos ({time.time()-t0:.0f}s)", flush=True)


def dettrain(root: Path, epochs: int, batch_size: int, lr: float,
             resume: bool = False) -> None:
    from objectpermanence_tpu.data.detection_dataset import DetectionDataset
    from objectpermanence_tpu.train.detector_loop import (
        evaluate_detector, train_detector,
    )
    from objectpermanence_tpu.models.detector.detector import CaterDetector

    done = root / "detector" / ".done"
    if done.exists():
        print("[dettrain] already complete", flush=True)
        return
    datasets = {s: DetectionDataset(root / s / "det_images",
                                    root / s / "detection_annotations.csv")
                for s in SPLITS}
    for s in SPLITS:
        print(f"[dettrain] {s}: {len(datasets[s])} frames", flush=True)
    config = detector_config()
    t0 = time.time()
    run = train_detector(datasets["train"], datasets["dev"], config,
                         num_epochs=epochs, batch_size=batch_size,
                         learning_rate=lr,
                         checkpoint_dir=str(root / "detector"),
                         print_step=200, resume=resume)
    print(f"[dettrain] {time.time()-t0:.0f}s best dev mAP {run['best_map']:.4f}",
          flush=True)
    best = _best_detector_ckpt(root)
    detector = CaterDetector.load(str(best), config)
    test_metrics = evaluate_detector(detector, datasets["test"])
    report = {"best_dev_map": run["best_map"], "test": test_metrics,
              "history": run["history"], "checkpoint": str(best)}
    (root / "detector" / "report.json").write_text(json.dumps(report, indent=2))
    print(f"[dettrain] test: {test_metrics}", flush=True)
    done.touch()


def _best_detector_ckpt(root: Path) -> Path:
    from objectpermanence_tpu.utils.checkpoint import best_params_checkpoint
    return best_params_checkpoint(root / "detector")


def _preprocess_split_worker(root: Path, split: str, batch_size: int) -> None:
    """One bounded worker: run the detector over the videos listed in the
    split's todo file, then EXIT. The axon tunnel client retains a host
    buffer for every H2D transfer (~60 MB/video; 3,200 videos OOM-killed
    the round-3 run at 99 GB RSS), so the parent recycles workers instead
    of looping in-process — the leak is bounded per worker."""
    from objectpermanence_tpu.infer.preprocess import preprocess_main

    best = _best_detector_ckpt(root)
    cfg = detector_config()
    t0 = time.time()
    import dataclasses

    written = preprocess_main(str(root / split / "od_real"), {
        "videos_dir": str(root / split / "videos"),
        "od_model_weights": str(best),
        "sample_file": str(root / split / "preprocess_todo.txt"),
        "batch_size": batch_size,
        # full architecture config: the checkpoint must be restored with
        # the SAME DetectorConfig it was trained with
        **dataclasses.asdict(cfg),
    })
    print(f"[preprocess-worker] {split}: {len(written)} videos "
          f"({time.time()-t0:.0f}s)", flush=True)


def preprocess(root: Path, batch_size: int,
               videos_per_proc: int = 400, limit: int = 0) -> None:
    import os
    import subprocess

    from objectpermanence_tpu.vocab import SNITCH_CLASS_INDEX

    best = _best_detector_ckpt(root)
    print(f"[preprocess] detector checkpoint: {best}", flush=True)
    env = dict(os.environ)
    # persistent compilation cache so recycled workers skip the 3-5 min jit
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(root / "jaxcache"))
    for split in SPLITS:
        videos_dir = root / split / "videos"
        out_dir = root / split / "od_real"
        out_dir.mkdir(parents=True, exist_ok=True)
        while True:
            names = sorted(p.stem for p in videos_dir.glob("*.avi"))
            if limit:
                # bounded run (e.g. the 800-video fair-budget regime): take
                # the first N by name so reruns and the opnet/analyze stages
                # see a deterministic prefix
                names = names[:limit]
            missing = [n for n in names
                       if not (out_dir / f"{n}.pkl").exists()]
            if not missing:
                print(f"[preprocess] {split}: complete", flush=True)
                break
            todo = missing[:videos_per_proc]
            (root / split / "preprocess_todo.txt").write_text(
                "".join(f"{n}.avi\n" for n in todo))
            proc = subprocess.run(
                [sys.executable, __file__, "preprocess-worker",
                 "--root", str(root), "--split", split,
                 "--preprocess-batch", str(batch_size)],
                env=env, cwd=str(Path(__file__).resolve().parent.parent))
            done_now = sum((out_dir / f"{n}.pkl").exists() for n in todo)
            print(f"[preprocess] {split}: {done_now}/{len(todo)} of slice, "
                  f"{len(missing) - done_now} to go (worker rc="
                  f"{proc.returncode})", flush=True)
            if done_now == 0:
                raise RuntimeError(
                    f"preprocess worker made no progress on {split} "
                    f"(rc={proc.returncode})")

    # perception quality stats: how often is the snitch actually detected?
    stats = {}
    for split in SPLITS:
        counts = []
        for pkl_path in sorted((root / split / "od_real").glob("*.pkl")):
            with open(pkl_path, "rb") as f:
                data = pickle.load(f)
            det = sum(SNITCH_CLASS_INDEX in frame for frame in data["labels"])
            counts.append(det / max(len(data["labels"]), 1))
        stats[split] = {"videos": len(counts),
                        "snitch_detection_rate": float(np.mean(counts)),
                        "snitch_rate_p10": float(np.percentile(counts, 10))}
        print(f"[preprocess] {split}: snitch detected in "
              f"{stats[split]['snitch_detection_rate']:.1%} of frames", flush=True)
    (root / "perception_stats.json").write_text(json.dumps(stats, indent=2))


def ingest_split(root: Path, src: Path, split: str, spec):
    """Ingest a split's REAL detections; the loss-mask file selection is
    the shared `data/ingest.py::training_mask_file` (visible-frames file
    for `*_no_labels` models, containment file otherwise)."""
    from objectpermanence_tpu.data.ingest import (
        ingest_directory, training_mask_file,
    )
    return ingest_directory(
        root / split / "od_real", src / split / "labels",
        spec.feature_width, training_mask_file(spec, src / split),
        str(root / "cache"))


def opnet(root: Path, src: Path, epochs: int, resume: bool,
          model: str = "opnet") -> None:
    from objectpermanence_tpu.models.registry import get_model_spec
    from objectpermanence_tpu.train.loop import training_main

    # pass the model config so variant knobs resolved by load_model_config
    # (e.g. opnet_att_ce's tuned att_ce_weight=0.1 default) reach the spec
    spec = get_model_spec(model, load_model_config(model))
    datasets = {}
    for split in ("train", "dev"):
        datasets[split] = ingest_split(root, src, split, spec)
        print(f"[{model}] ingested {split}: {len(datasets[split])} videos",
              flush=True)
    train_config = {
        "batch_size": 16, "inference_batch_size": 400,
        "num_epochs": epochs, "print_step": 100, "learning_rate": 1e-3,
        "lr_scheduler_patience": 2, "lr_scheduler_factor": 0.8,
        "checkpoints_path": str(root / "checkpoints"),
        "metrics_file": str(root / ("metrics.jsonl" if model == "opnet"
                                    else f"metrics_{model}.jsonl")),
        "train_sample_dir": "x", "train_labels_dir": "x",
        "train_containment_file": "x", "dev_sample_dir": "x",
        "dev_labels_dir": "x", "dev_containment_file": "x",
    }
    result = training_main(spec, datasets["train"], datasets["dev"],
                           train_config, load_model_config(model),
                           resume=resume)
    print(f"[{model}] best dev mIoU: {result.best_dev_iou:.4f}", flush=True)
    # provenance stamp: records WHICH run produced the live metrics/
    # checkpoints so downstream mirrors (scripts/collect_results.py) can
    # refuse artifacts whose video count contradicts the destination name
    suffix = "" if model == "opnet" else f"_{model}"
    (root / f"train_meta{suffix}.json").write_text(json.dumps({
        "model": model,
        "train_videos": len(datasets["train"]),
        "dev_videos": len(datasets["dev"]),
        "epochs": epochs,
        "best_dev_iou": round(float(result.best_dev_iou), 4),
        "completed_unix": time.time(),
    }, indent=2))


def analyze(root: Path, src: Path, model: str = "opnet") -> None:
    from objectpermanence_tpu.analysis.offline import analyze_results
    from objectpermanence_tpu.infer.reasoning import reasoning_inference_main
    from objectpermanence_tpu.utils.checkpoint import best_params_checkpoint

    test_src = src / "test"
    suffix = "" if model == "opnet" else f"_{model}"
    results_dir = root / ("results" + suffix)
    best = best_params_checkpoint(root / "checkpoints" / model)
    if best is None:
        raise FileNotFoundError(
            f"no trained {model} checkpoint under {root / 'checkpoints'} — "
            f"run the train stage first")
    print(f"[analyze] using checkpoint {best}", flush=True)
    inference_config = {
        "batch_size": 200,
        "sample_dir": str(root / "test" / "od_real"),
        "labels_dir": str(test_src / "labels"),
        "model_path": str(best),
        "cache_dir": str(root / "cache"),
    }
    reasoning_inference_main(model, str(results_dir), inference_config,
                             load_model_config(model))
    ann = test_src / "annotations"
    # stratification (containment spans, GT snitch visibility) is scene
    # ground truth — shared with the perfect-perception run by design
    analyze_results(
        str(results_dir), str(test_src / "labels"),
        str(root / f"analysis{suffix}.csv"),
        str(ann / "containment_annotations.txt"),
        str(ann / "containment_only_static_annotations.txt"),
        str(ann / "containment_with_move_annotations.txt"),
        str(test_src / "od_perception" / "visibility_rate_gt_0.99.txt"),
        None, None, [0.5, 0.9])
    print((root / f"analysis{suffix}.csv").read_text(), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["render", "dettrain", "preprocess",
                                      "preprocess-worker", "opnet", "analyze",
                                      "all"])
    ap.add_argument("--split", choices=SPLITS, default=None,
                    help="(preprocess-worker) which split's todo to run")
    ap.add_argument("--root", type=Path, default=Path("/root/data/twostage"))
    ap.add_argument("--src", type=Path, default=Path("/root/data/sim4k"))
    ap.add_argument("--det-samples", type=int, default=2)
    ap.add_argument("--det-epochs", type=int, default=16)
    ap.add_argument("--det-batch", type=int, default=8)
    ap.add_argument("--det-lr", type=float, default=5e-3)
    ap.add_argument("--preprocess-batch", type=int, default=32)
    ap.add_argument("--limit", type=int, default=0,
                    help="(preprocess) cap each split at its first N videos "
                         "(0 = all); dev/test are smaller than typical caps "
                         "so this effectively bounds the train split")
    ap.add_argument("--epochs", type=int, default=160)
    ap.add_argument("--model", default="opnet",
                    help="(opnet/analyze) reasoning architecture to train on "
                         "the real detections")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    args.root.mkdir(parents=True, exist_ok=True)
    if args.stage in ("render",):
        render(args.src, args.root, args.det_samples)
    if args.stage in ("dettrain", "all"):
        dettrain(args.root, args.det_epochs, args.det_batch, args.det_lr,
                 resume=args.resume)
    if args.stage == "preprocess-worker":
        _preprocess_split_worker(args.root, args.split, args.preprocess_batch)
    if args.stage in ("preprocess", "all"):
        preprocess(args.root, args.preprocess_batch, limit=args.limit)
    if args.stage in ("opnet", "all"):
        opnet(args.root, args.src, args.epochs, args.resume, args.model)
    if args.stage in ("analyze", "all"):
        analyze(args.root, args.src, args.model)


if __name__ == "__main__":
    main()
