"""Stage-by-stage detector latency breakdown on the real chip.

Times cumulative jitted prefixes of `detect_forward` (preprocess ->
backbone+FPN -> RPN propose -> RoIAlign -> box head -> postprocess/NMS) so
stage cost = difference of adjacent prefixes; every timing syncs through a
tiny device fetch (axon's block_until_ready does not block).

    python scripts/profile_detector.py [--batch 32] [--dtype float32|bfloat16]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def bench(fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--pre-top", type=int, default=500)
    ap.add_argument("--post-top", type=int, default=300)
    ap.add_argument("--min-size", type=int, default=240)
    ap.add_argument("--max-size", type=int, default=320)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--roi", default="auto",
                    choices=["auto", "gather", "pallas", "windowed"])
    args = ap.parse_args()

    from objectpermanence_tpu.models.detector import anchors as anchor_lib
    from objectpermanence_tpu.models.detector import roi_heads, rpn
    from objectpermanence_tpu.models.detector.detector import (
        DetectorConfig, detect_forward, detector_init, forward_features,
        preprocess_images, propose,
    )
    from objectpermanence_tpu.ops.nms import NEG_INF

    config = DetectorConfig(min_size=args.min_size, max_size=args.max_size,
                            rpn_pre_nms_top_n=args.pre_top,
                            rpn_post_nms_top_n=args.post_top,
                            compute_dtype=args.dtype, roi_backend=args.roi)
    anchors = [jnp.asarray(a) for a in anchor_lib.pyramid_anchors(
        config.feature_shapes(), config.strides, config.anchor_sizes)]
    params = detector_init(jax.random.PRNGKey(0), config)
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 255,
                                         (args.batch, *config.image_hw, 3),
                                         dtype=np.uint8))

    f_prep = jax.jit(lambda p, x: preprocess_images(x, config))
    f_feat = jax.jit(lambda p, x: forward_features(
        p, preprocess_images(x, config), config))

    def to_propose(p, x):
        pyr = forward_features(p, preprocess_images(x, config), config)
        return propose(p, pyr, config, anchors)

    f_prop = jax.jit(to_propose)

    def to_roi(p, x):
        pyr = forward_features(p, preprocess_images(x, config), config)
        props, scores = propose(p, pyr, config, anchors)
        feats = [jnp.moveaxis(f, -1, 1) for f in pyr[:4]]
        from objectpermanence_tpu.models.detector.detector import batched_roi_align
        return batched_roi_align(feats, props, config)

    f_roi = jax.jit(to_roi)

    def to_head(p, x):
        pyr = forward_features(p, preprocess_images(x, config), config)
        props, scores = propose(p, pyr, config, anchors)
        feats = [jnp.moveaxis(f, -1, 1) for f in pyr[:4]]

        from objectpermanence_tpu.models.detector.detector import batched_roi_align
        pooled = batched_roi_align(feats, props, config)
        return jax.vmap(lambda pi: roi_heads.box_head_apply(p["box_head"], pi))(pooled)

    f_head = jax.jit(to_head)
    f_full = jax.jit(lambda p, x: detect_forward(p, x, config, anchors))

    stages = [("preprocess", f_prep), ("backbone+fpn", f_feat),
              ("+rpn propose", f_prop), ("+roi align", f_roi),
              ("+box head", f_head), ("full(+nms post)", f_full)]
    prev = 0.0
    print(f"batch={args.batch} padded_hw={config.padded_hw} "
          f"post_nms={config.rpn_post_nms_top_n}")
    for name, fn in stages:
        t = bench(fn, params, frames)
        print(f"{name:18s} cum {t:8.2f} ms   stage {t - prev:8.2f} ms")
        prev = t
    fps = args.batch / (prev / 1000)
    print(f"end-to-end: {prev:.1f} ms / {args.batch} frames = {fps:.0f} fps")


if __name__ == "__main__":
    main()
