"""Detector train-step throughput: pallas RoIAlign (custom VJP) vs gather.

    python scripts/bench_detector_train.py [--batch 8] [--iters 20]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--min-size", type=int, default=240)
    ap.add_argument("--max-size", type=int, default=320)
    ap.add_argument("--backends", nargs="+", default=["gather", "pallas"],
                    help="any of: gather pallas windowed (windowed = "
                         "windowed-DMA fwd + gather-transpose bwd, for "
                         "pyramids too large for VMEM, e.g. --min-size 800)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the chip alone)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from objectpermanence_tpu.models.detector import anchors as anchor_lib
    from objectpermanence_tpu.models.detector.detector import (
        DetectorConfig, detector_init,
    )
    from objectpermanence_tpu.models.detector.training import (
        make_detector_train_step,
    )

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (args.batch, 240, 320, 3),
                                     dtype=np.uint8))
    gt_boxes = np.zeros((args.batch, 20, 4), np.float32)
    gt_labels = np.zeros((args.batch, 20), np.int32)
    gt_valid = np.zeros((args.batch, 20), bool)
    for i in range(args.batch):
        for g in range(6):
            x, y = rng.randint(5, 260), rng.randint(5, 190)
            gt_boxes[i, g] = [x, y, x + 40, y + 40]
            gt_labels[i, g] = rng.randint(1, 193)
            gt_valid[i, g] = True
    gt_boxes, gt_labels, gt_valid = map(jnp.asarray,
                                        (gt_boxes, gt_labels, gt_valid))

    def sync(tree):
        leaf = jax.tree.leaves(tree)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    for backend in args.backends:
        if backend != "gather" and jax.default_backend() != "tpu":
            # forced roi_backend bypasses _use_pallas_roi's TPU check; the
            # Mosaic kernels don't lower on CPU
            print(f"{backend}: skipped (needs the TPU backend)")
            continue
        config = DetectorConfig(min_size=args.min_size, max_size=args.max_size,
                                rpn_pre_nms_top_n=500, rpn_post_nms_top_n=300,
                                roi_backend=backend)
        anchors = [jnp.asarray(a) for a in anchor_lib.pyramid_anchors(
            config.feature_shapes(), config.strides, config.anchor_sizes)]
        params = detector_init(jax.random.PRNGKey(0), config)
        # the real loop's stabilizers (clip + tiny warmup lr): repeated steps
        # on one batch with random-init frozen-BN otherwise blow up to NaN
        optimizer = optax.chain(optax.clip_by_global_norm(10.0),
                                optax.sgd(5e-6, momentum=0.9))
        opt_state = optimizer.init(params)
        step = make_detector_train_step(config, anchors, optimizer)
        key = jax.random.PRNGKey(1)

        params, opt_state, parts = step(params, opt_state, images, gt_boxes,
                                        gt_labels, gt_valid, key)
        sync(parts)
        for _ in range(3):
            params, opt_state, parts = step(params, opt_state, images,
                                            gt_boxes, gt_labels, gt_valid, key)
        sync(parts)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                params, opt_state, parts = step(params, opt_state, images,
                                                gt_boxes, gt_labels, gt_valid,
                                                key)
            sync(parts)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"{backend}: {best*1000:.1f} ms/step "
              f"({args.batch / best:.1f} imgs/s), loss={float(parts['loss']):.4f}")


if __name__ == "__main__":
    main()
