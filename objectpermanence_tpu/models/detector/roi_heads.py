"""RoI heads: multi-scale RoIAlign over the FPN + two-MLP box head +
per-class postprocessing with padded static shapes."""

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from objectpermanence_tpu.models.detector.boxcoder import ROI_WEIGHTS, clip_to_image, decode
from objectpermanence_tpu.ops.nms import NEG_INF, batched_class_nms, top_k_by_score
from objectpermanence_tpu.ops.roi_align import multilevel_roi_align

# FPN levels P2..P5 used for RoI pooling, with strides 4..32
ROI_STRIDES = (4, 8, 16, 32)


def assign_levels(rois: jax.Array, k_min: int = 2, k_max: int = 5) -> jax.Array:
    """FPN paper heuristic: k = floor(4 + log2(sqrt(area)/224)),
    clamped to [k_min, k_max]; returns 0-based level index into P2..P5."""
    area = jnp.maximum((rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 1e-6)
    k = jnp.floor(4 + jnp.log2(jnp.sqrt(area) / 224.0 + 1e-6))
    return (jnp.clip(k, k_min, k_max) - k_min).astype(jnp.int32)


def multiscale_roi_align(features: List[jax.Array], rois: jax.Array,
                         pooled: int = 7, sampling_ratio: int = 2) -> jax.Array:
    """features: [P2..P5] each (C, H_l, W_l); rois (N, 4) image coords.
    Each roi is pooled from its assigned level only, via a single gather
    from the concatenated level table (`ops.roi_align.multilevel_roi_align`)."""
    levels = assign_levels(rois)
    pooled_feats = multilevel_roi_align(features, rois, levels, ROI_STRIDES,
                                        pooled, sampling_ratio)
    # interpolation weights are fp32 (promoting the output); return to the
    # pyramid's compute dtype so the box-head matmuls stay on the bf16 MXU
    # path under mixed precision
    return pooled_feats.astype(features[0].dtype)


def box_head_init(key, in_channels: int = 256, pooled: int = 7,
                  representation: int = 1024, num_classes: int = 193,
                  dtype=jnp.float32) -> Dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    in_dim = in_channels * pooled * pooled

    def linear(k, din, dout, std):
        kw, kb = jax.random.split(k)
        return {"w": jax.random.normal(kw, (din, dout), dtype) * std,
                "b": jnp.zeros((dout,), dtype)}

    # TwoMLPHead uses kaiming-ish defaults; predictor heads use
    # normal(0.01) / normal(0.001) like torchvision FastRCNNPredictor
    limit6 = float(np.sqrt(1.0 / in_dim))
    limit7 = float(np.sqrt(1.0 / representation))
    return {
        "fc6": {"w": jax.random.uniform(k1, (in_dim, representation), dtype,
                                        -limit6, limit6),
                "b": jnp.zeros((representation,), dtype)},
        "fc7": {"w": jax.random.uniform(k2, (representation, representation), dtype,
                                        -limit7, limit7),
                "b": jnp.zeros((representation,), dtype)},
        "cls": linear(k3, representation, num_classes, 0.01),
        "reg": linear(k4, representation, num_classes * 4, 0.001),
    }


def box_head_apply(params, roi_features: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """roi_features (N, C, p, p) -> (cls_logits (N, K), box_deltas (N, K, 4)).
    Runs in the features' dtype (bf16 under mixed precision) but emits
    float32 logits/deltas for decode and loss math."""
    from objectpermanence_tpu.models.detector.detector import cast_floating
    params = cast_floating(params, roi_features.dtype)
    n = roi_features.shape[0]
    x = roi_features.reshape(n, -1)
    x = jax.nn.relu(x @ params["fc6"]["w"] + params["fc6"]["b"])
    x = jax.nn.relu(x @ params["fc7"]["w"] + params["fc7"]["b"])
    cls_logits = (x @ params["cls"]["w"] + params["cls"]["b"]).astype(jnp.float32)
    box_deltas = (x @ params["reg"]["w"] + params["reg"]["b"]).astype(jnp.float32)
    return cls_logits, box_deltas.reshape(n, -1, 4)


def postprocess_detections(cls_logits: jax.Array, box_deltas: jax.Array,
                           proposals: jax.Array, proposal_scores: jax.Array,
                           image_hw: Tuple[int, int], score_thresh: float = 0.05,
                           nms_thresh: float = 0.5, detections_per_img: int = 100,
                           pre_nms_candidates: int = 1000):
    """-> (boxes (D, 4), labels (D,), scores (D,)) with NEG_INF score padding.
    Class 0 is background (torchvision convention — note the reference uses
    193 classes TOTAL, so vocab class 0 doubles as background and is never
    predicted; we preserve that behavior for parity)."""
    height, width = image_hw
    num_classes = cls_logits.shape[1]
    probs = jax.nn.softmax(cls_logits, axis=-1)            # (N, K)

    boxes = decode(proposals[:, None, :], box_deltas, ROI_WEIGHTS)  # (N, K, 4)
    boxes = clip_to_image(boxes, height, width)

    # drop background column; flatten (N, K-1)
    probs = probs[:, 1:]
    boxes = boxes[:, 1:, :]
    labels = jnp.broadcast_to(jnp.arange(1, num_classes)[None, :], probs.shape)

    # mask invalid proposals (padding) and low scores
    valid_prop = proposal_scores > NEG_INF / 10
    flat_scores = jnp.where(valid_prop[:, None], probs, NEG_INF).reshape(-1)
    flat_scores = jnp.where(flat_scores >= score_thresh, flat_scores, NEG_INF)
    flat_boxes = boxes.reshape(-1, 4)
    flat_labels = labels.reshape(-1)

    # remove tiny boxes (torchvision min_size 1e-2)
    ws = flat_boxes[:, 2] - flat_boxes[:, 0]
    hs = flat_boxes[:, 3] - flat_boxes[:, 1]
    flat_scores = jnp.where(jnp.logical_and(ws >= 1e-2, hs >= 1e-2),
                            flat_scores, NEG_INF)

    cand_boxes, cand_scores, cand_labels = top_k_by_score(
        flat_boxes, flat_scores, pre_nms_candidates, flat_labels)
    keep = batched_class_nms(cand_boxes, cand_scores, cand_labels, nms_thresh)
    cand_scores = jnp.where(keep, cand_scores, NEG_INF)
    det_boxes, det_scores, det_labels = top_k_by_score(
        cand_boxes, cand_scores, detections_per_img, cand_labels)
    return det_boxes, det_labels, det_scores
