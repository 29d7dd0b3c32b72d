"""Region Proposal Network: shared conv head over the pyramid + padded
static-shape proposal selection (per-level top-k -> decode -> clip ->
per-level NMS -> global top-k), replacing torchvision's dynamic-shape
C++ proposal machinery with fixed-size XLA.
"""

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from objectpermanence_tpu.models.detector.boxcoder import RPN_WEIGHTS, clip_to_image, decode
from objectpermanence_tpu.models.detector.resnet import conv2d
from objectpermanence_tpu.ops.nms import NEG_INF, nms_mask, top_k_by_score


def rpn_head_init(key, in_channels: int = 256, num_anchors: int = 3,
                  dtype=jnp.float32) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    # torchvision RPNHead init: normal(std=0.01), zero bias
    def normal(k, shape):
        return jax.random.normal(k, shape, dtype) * 0.01
    return {
        "conv": normal(k1, (3, 3, in_channels, in_channels)),
        "conv_b": jnp.zeros((in_channels,), dtype),
        "cls": normal(k2, (1, 1, in_channels, num_anchors)),
        "cls_b": jnp.zeros((num_anchors,), dtype),
        "reg": normal(k3, (1, 1, in_channels, num_anchors * 4)),
        "reg_b": jnp.zeros((num_anchors * 4,), dtype),
    }


def rpn_head_apply(params, features: List[jax.Array]) -> Tuple[List[jax.Array], List[jax.Array]]:
    """Per level: objectness (B, H*W*A) and deltas (B, H*W*A, 4).
    Runs in the features' dtype (bf16 under mixed precision) but emits
    float32 predictions — box decode / score math stays full precision."""
    from objectpermanence_tpu.models.detector.detector import cast_floating
    params = cast_floating(params, features[0].dtype)
    objectness, deltas = [], []
    for feat in features:
        t = jax.nn.relu(conv2d(feat, params["conv"]) + params["conv_b"])
        cls = conv2d(t, params["cls"]) + params["cls_b"]        # (B, H, W, A)
        reg = conv2d(t, params["reg"]) + params["reg_b"]        # (B, H, W, A*4)
        b, h, w, a = cls.shape
        objectness.append(cls.reshape(b, h * w * a).astype(jnp.float32))
        deltas.append(reg.reshape(b, h * w * a, 4).astype(jnp.float32))
    return objectness, deltas


def generate_proposals(objectness: List[jax.Array], deltas: List[jax.Array],
                       anchors: List[jax.Array], image_hw: Tuple[int, int],
                       pre_nms_top_n: int, post_nms_top_n: int,
                       nms_thresh: float = 0.7,
                       min_size: float = 1e-3) -> Tuple[jax.Array, jax.Array]:
    """-> (proposals (B, post_nms_top_n, 4), scores (B, post_nms_top_n));
    padding entries carry NEG_INF scores."""
    height, width = image_hw

    def per_image(level_scores, level_deltas):
        boxes_all, scores_all = [], []
        for scores, dts, anch in zip(level_scores, level_deltas, anchors):
            k = min(pre_nms_top_n, scores.shape[0])
            top_scores, top_idx = jax.lax.top_k(scores, k)
            boxes = decode(anch[top_idx], dts[top_idx], RPN_WEIGHTS)
            boxes = clip_to_image(boxes, height, width)
            # drop degenerate boxes
            ws = boxes[:, 2] - boxes[:, 0]
            hs = boxes[:, 3] - boxes[:, 1]
            valid = jnp.logical_and(ws >= min_size, hs >= min_size)
            top_scores = jnp.where(valid, top_scores, NEG_INF)
            keep = nms_mask(boxes, top_scores, nms_thresh)
            scores_kept = jnp.where(keep, top_scores, NEG_INF)
            boxes_all.append(boxes)
            scores_all.append(scores_kept)
        boxes_cat = jnp.concatenate(boxes_all)
        scores_cat = jnp.concatenate(scores_all)
        return top_k_by_score(boxes_cat, scores_cat, post_nms_top_n)

    batched = jax.vmap(per_image)
    proposals, scores = batched(objectness, deltas)
    return proposals, scores
