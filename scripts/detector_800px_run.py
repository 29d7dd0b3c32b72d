"""Reference-geometry (800px) detector ACCURACY run — VERDICT r3 #5.

The reference fine-tunes Faster R-CNN at torchvision's min_size=800
geometry (`/root/reference/object_detection/training.py:14-77`); the
round-3 mAP-0.449 run used the native 320x240 CATER resolution. This
script trains at BOTH geometries on the SAME rendered frame set —
`roi_backend="windowed"` gives the 800px recipe a trainable Pallas RoI
path (`ops/pallas_roi_align.py::roi_align_windowed_trainable`) — and
reports held-out mAP, train-step latency, and the windowed kernel's
out-of-contract roi rate (the counter added this round) for real training
proposals.

Stages (resumable):
    python scripts/detector_800px_run.py render     # CPU, frames-only
    python scripts/detector_800px_run.py steptime   # chip: step-ms table
    python scripts/detector_800px_run.py train800   # chip: 800px windowed
    python scripts/detector_800px_run.py native     # chip: native control
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

SPLIT_SCENES = {"train": 1600, "dev": 150, "test": 300}


def _config(geometry: str, roi_backend: str, compute_dtype: str = "float32"):
    from objectpermanence_tpu.models.detector.detector import DetectorConfig
    if geometry == "800":
        # the reference's torchvision geometry; proposal counts stay at the
        # round-3 recipe (500/300) so geometry is the only variable
        return DetectorConfig(min_size=800, max_size=1333,
                              backbone_norm="group", rpn_pre_nms_top_n=500,
                              rpn_post_nms_top_n=300, roi_backend=roi_backend,
                              compute_dtype=compute_dtype)
    return DetectorConfig(min_size=240, max_size=320, backbone_norm="group",
                          rpn_pre_nms_top_n=500, rpn_post_nms_top_n=300,
                          roi_backend=roi_backend,
                          compute_dtype=compute_dtype)


def render(src: Path, root: Path, det_samples: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")   # leave the chip free
    from objectpermanence_tpu.datagen.renderer import render_dataset

    for i, (split, n) in enumerate(SPLIT_SCENES.items()):
        scenes_src = src / split / "scenes"
        subset = root / split / "scenes_subset"
        subset.mkdir(parents=True, exist_ok=True)
        for p in sorted(scenes_src.glob("*.json"))[:n]:
            link = subset / p.name
            if not link.exists():
                link.symlink_to(p)
        t0 = time.time()
        render_dataset(subset, src / split / "labels", root / split,
                       detection_samples_per_video=det_samples,
                       seed=2000 + i, progress_every=400, frames_only=True)
        k = len(list((root / split / "det_images").glob("*.png")))
        print(f"[render] {split}: {k} frames ({time.time()-t0:.0f}s)",
              flush=True)


def _datasets(root: Path):
    from objectpermanence_tpu.data.detection_dataset import DetectionDataset
    return {s: DetectionDataset(root / s / "det_images",
                                root / s / "detection_annotations.csv")
            for s in SPLIT_SCENES}


def steptime(root: Path, steps: int) -> None:
    """Train-step latency at both geometries (and both 800px RoI backends),
    measured over `steps` chained post-warmup steps (the tunnel's ~0.3-1 ms
    dispatch floor amortizes; sync via a tiny loss fetch)."""
    import jax
    import jax.numpy as jnp
    import optax

    from objectpermanence_tpu.models.detector import anchors as anchor_lib
    from objectpermanence_tpu.models.detector.detector import detector_init
    from objectpermanence_tpu.models.detector.training import (
        make_detector_train_step,
    )

    from objectpermanence_tpu.data.detection_dataset import DetectionDataset
    ds = DetectionDataset(root / "train" / "det_images",
                          root / "train" / "detection_annotations.csv")
    rows = {}
    for name, geometry, backend, batch in (
            ("800px_windowed", "800", "windowed", 4),
            ("800px_gather", "800", "gather", 4),
            ("native_pallas", "native", "auto", 8)):
        config = _config(geometry, backend)
        params = detector_init(jax.random.PRNGKey(0), config)
        anchors = [jnp.asarray(a) for a in anchor_lib.pyramid_anchors(
            config.feature_shapes(), config.strides, config.anchor_sizes)]
        optimizer = optax.sgd(5e-3, momentum=0.9)
        opt_state = optimizer.init(params)
        step = make_detector_train_step(config, anchors, optimizer)
        batch_data = next(ds.batches(batch, shuffle=True, seed=0))
        args = tuple(jnp.asarray(batch_data[k]) for k in
                     ("images", "gt_boxes", "gt_labels", "gt_valid"))
        rng = jax.random.PRNGKey(1)
        for _ in range(3):  # compile + warmup
            params, opt_state, parts = step(params, opt_state, *args, rng)
        float(parts["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt_state, parts = step(params, opt_state, *args, rng)
        float(parts["loss"])
        ms = (time.perf_counter() - t0) / steps * 1000
        rows[name] = {"step_ms": round(ms, 1), "batch": batch,
                      "imgs_per_s": round(batch / ms * 1000, 1)}
        print(f"[steptime] {name}: {rows[name]}", flush=True)
        del params, opt_state, step
    (root / "steptime.json").write_text(json.dumps(rows, indent=2))


def train(root: Path, geometry: str, epochs: int, batch: int, lr: float,
          tag: str, compute_dtype: str = "float32") -> None:
    from objectpermanence_tpu.models.detector.detector import CaterDetector
    from objectpermanence_tpu.ops import pallas_roi_align as pra
    from objectpermanence_tpu.train.detector_loop import (
        evaluate_detector, train_detector,
    )
    from objectpermanence_tpu.utils.checkpoint import best_params_checkpoint

    out = root / tag
    if (out / "report.json").exists():
        print(f"[{tag}] already complete", flush=True)
        return
    datasets = _datasets(root)
    config = _config(geometry, "windowed" if geometry == "800" else "auto",
                     compute_dtype)
    pra.reset_contract_stats()
    t0 = time.time()
    run = train_detector(datasets["train"], datasets["dev"], config,
                         num_epochs=epochs, batch_size=batch,
                         learning_rate=lr, checkpoint_dir=str(out),
                         print_step=200, resume=True)
    train_s = time.time() - t0
    train_contract = pra.contract_stats()

    pra.reset_contract_stats()
    best = best_params_checkpoint(out)
    detector = CaterDetector.load(str(best), config)
    test_metrics = evaluate_detector(detector, datasets["test"])
    eval_contract = pra.contract_stats()

    def rate(c):
        return round(c["out_of_contract"] / c["rois"], 5) if c["rois"] else None

    report = {"geometry": geometry, "epochs": epochs, "batch": batch,
              "compute_dtype": compute_dtype,
              "best_dev_map": run["best_map"], "test": test_metrics,
              "train_seconds": round(train_s),
              "train_contract": {**train_contract,
                                 "rate": rate(train_contract)},
              "eval_contract": {**eval_contract, "rate": rate(eval_contract)},
              "history": run["history"], "checkpoint": str(best)}
    (out / "report.json").write_text(json.dumps(report, indent=2))
    print(f"[{tag}] test {test_metrics} train_contract_rate "
          f"{rate(train_contract)} eval_contract_rate {rate(eval_contract)}",
          flush=True)


def contract(root: Path, tag: str, batches: int, batch: int) -> None:
    """Post-hoc out-of-contract roi measurement, on CPU: the axon PjRt
    client cannot execute the in-dispatch host-callback counter (see
    ops/pallas_roi_align), so windowed 800px chip runs report rate=None.
    Proposals precede pooling and are therefore roi-backend-independent,
    so this re-derives the rois BOTH windowed dispatch points see with the
    TRAINED checkpoint — training: RPN proposals + gt
    (models/detector/training.py:145-166); inference: proposals
    (models/detector/detector.py:214-219) — and applies the kernel's exact
    contract mask (`windowed_out_of_contract_mask`, shared `_window_quant`
    geometry). Merges the rates into <tag>/report.json."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from objectpermanence_tpu.models.detector import anchors as anchor_lib
    from objectpermanence_tpu.models.detector import roi_heads, rpn
    from objectpermanence_tpu.models.detector.detector import (
        CaterDetector, forward_features, preprocess_images, propose,
    )
    from objectpermanence_tpu.ops.pallas_roi_align import (
        windowed_out_of_contract_mask,
    )
    from objectpermanence_tpu.utils.checkpoint import best_params_checkpoint

    out = root / tag
    report_path = out / "report.json"
    # gather backend: proposals are identical, and the windowed kernel
    # itself need not (and cannot) run on CPU
    config = _config("800", "gather")
    best = best_params_checkpoint(out)
    if best is None:
        print(f"[contract] no checkpoint under {out}", flush=True)
        return
    params = CaterDetector.load(str(best), config).params
    anchor_arrays = [jnp.asarray(a) for a in anchor_lib.pyramid_anchors(
        config.feature_shapes(), config.strides, config.anchor_sizes)]
    h, w = config.padded_hw
    level_shapes = [(-(-h // s), -(-w // s), float(s))
                    for s in roi_heads.ROI_STRIDES]

    from objectpermanence_tpu.ops.nms import NEG_INF

    def _mask_counts(rois, valid, pyramid):
        """(dispatched oow, dispatched total, valid oow, valid total):
        dispatched = every roi slot the windowed kernel would see (matches
        the in-dispatch counter); valid = only rois that influence the
        model output (NMS-survivor proposals / real gt rows) — the rate
        that matters for accuracy."""
        levels = jax.vmap(roi_heads.assign_levels)(rois)
        m = windowed_out_of_contract_mask(
            rois, levels, level_shapes, channels=config.fpn_channels,
            itemsize=pyramid[0].dtype.itemsize)
        return (m.sum(), m.size,
                jnp.where(valid, m, False).sum(), valid.sum())

    @jax.jit
    def train_counts(p, images, gt_boxes, gt_valid):
        prepped = preprocess_images(images, config)
        pyramid = forward_features(p, prepped, config)
        objectness, deltas = rpn.rpn_head_apply(p["rpn"], pyramid)
        proposals, prop_scores = rpn.generate_proposals(
            [jax.nn.sigmoid(o) for o in objectness], deltas, anchor_arrays,
            config.padded_hw, config.rpn_pre_nms_top_n,
            config.rpn_post_nms_top_n, config.rpn_nms_thresh)
        all_props = jnp.concatenate([proposals, gt_boxes * config.scale],
                                    axis=1)
        valid = jnp.concatenate([prop_scores > NEG_INF / 10, gt_valid],
                                axis=1)
        return _mask_counts(all_props, valid, pyramid)

    @jax.jit
    def eval_counts(p, images):
        prepped = preprocess_images(images, config)
        pyramid = forward_features(p, prepped, config)
        proposals, prop_scores = propose(p, pyramid, config, anchor_arrays)
        return _mask_counts(proposals, prop_scores > NEG_INF / 10, pyramid)

    ds = _datasets(root)
    stats = {}
    for name, split, fn in (("train_contract_cpu", "train",
                             lambda b: train_counts(
                                 params, jnp.asarray(b["images"]),
                                 jnp.asarray(b["gt_boxes"]),
                                 jnp.asarray(b["gt_valid"]))),
                            ("eval_contract_cpu", "test",
                             lambda b: eval_counts(
                                 params, jnp.asarray(b["images"])))):
        oow = tot = voow = vtot = 0
        it = ds[split].batches(batch, shuffle=True, seed=3)
        for _ in range(batches):
            o, t, vo, vt = fn(next(it))
            oow += int(o)
            tot += int(t)
            voow += int(vo)
            vtot += int(vt)
        stats[name] = {"rois": tot, "out_of_contract": oow,
                       "rate": round(oow / tot, 5),
                       "valid_rois": vtot, "valid_out_of_contract": voow,
                       "valid_rate": round(voow / max(vtot, 1), 5)}
        print(f"[contract] {name}: {stats[name]}", flush=True)

    if report_path.exists():
        report = json.loads(report_path.read_text())
        report.update(stats)
        report_path.write_text(json.dumps(report, indent=2))
    else:
        out.mkdir(parents=True, exist_ok=True)
        (out / "contract.json").write_text(json.dumps(stats, indent=2))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["render", "steptime", "train800",
                                      "native", "contract"])
    ap.add_argument("--root", type=Path, default=Path("/root/data/det800"))
    ap.add_argument("--src", type=Path, default=Path("/root/data/sim4k"))
    ap.add_argument("--det-samples", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--compute-dtype", default="float32",
                    help="bfloat16 = TPU mixed-precision training (fp32 "
                         "masters; decode/NMS/loss stay fp32)")
    args = ap.parse_args()

    args.root.mkdir(parents=True, exist_ok=True)
    if args.stage == "render":
        render(args.src, args.root, args.det_samples)
    elif args.stage == "steptime":
        steptime(args.root, args.steps)
    elif args.stage == "train800":
        train(args.root, "800", args.epochs, 4, args.lr, "det800",
              args.compute_dtype)
    elif args.stage == "native":
        train(args.root, "native", args.epochs, 8, args.lr, "detnative",
              args.compute_dtype)
    elif args.stage == "contract":
        contract(args.root, "det800", batches=4, batch=4)


if __name__ == "__main__":
    main()
