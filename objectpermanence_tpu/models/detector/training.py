"""Faster R-CNN training: IoU matching, balanced sampling, RPN + RoI losses,
and the fused jit train step.

Semantics follow the standard torchvision recipe the reference fine-tunes
with (`object_detection/training.py` + torchvision GeneralizedRCNN):
- RPN matcher 0.7/0.3 with low-quality matches allowed; 256 sampled anchors
  at 0.5 positive fraction; BCE objectness + smooth-L1(beta=1/9) box loss
- RoI matcher 0.5/0.5; 512 sampled proposals at 0.25 positive fraction
  (gt boxes appended to proposals); CE cls + smooth-L1 box loss on positives
Ground truth is padded to a fixed max count with a validity mask, keeping
every shape static. Sampling uses jax PRNG (deterministic per step).
"""

from functools import partial
import jax
import jax.numpy as jnp
import optax

from objectpermanence_tpu.models.detector import roi_heads, rpn
from objectpermanence_tpu.models.detector.boxcoder import (
    ROI_WEIGHTS, RPN_WEIGHTS, encode,
)
from objectpermanence_tpu.models.detector.detector import (
    DetectorConfig, forward_features, preprocess_images,
)
from objectpermanence_tpu.ops.boxes import pairwise_iou_xyxy
from objectpermanence_tpu.ops.nms import NEG_INF

BELOW_LOW = -1
BETWEEN = -2


def match_boxes(gt_boxes, gt_valid, candidates, high: float, low: float,
                allow_low_quality: bool):
    """-> matched gt index per candidate, or BELOW_LOW / BETWEEN."""
    iou = pairwise_iou_xyxy(gt_boxes, candidates)                  # (G, N)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=0)                              # (N,)
    best_iou = jnp.max(iou, axis=0)

    matches = jnp.where(best_iou >= high, best_gt, BETWEEN)
    matches = jnp.where(best_iou < low, BELOW_LOW, matches)

    if allow_low_quality:
        # every gt's best candidate(s) become positive regardless of IoU
        best_per_gt = jnp.max(iou, axis=1, keepdims=True)          # (G, 1)
        is_best = jnp.logical_and(iou == best_per_gt, gt_valid[:, None])
        force = jnp.any(is_best, axis=0)
        matches = jnp.where(force, best_gt, matches)
    return matches


def balanced_sample(rng, matches, num_samples: int, positive_fraction: float):
    """Random balanced subset: returns (sampled_mask, positive_mask).
    Implemented with randomized top-k so shapes stay static."""
    positive = matches >= 0
    negative = matches == BELOW_LOW

    num_pos_wanted = int(num_samples * positive_fraction)
    r1, r2 = jax.random.split(rng)
    pos_priority = jnp.where(positive, jax.random.uniform(r1, matches.shape), -1.0)
    _, pos_idx = jax.lax.top_k(pos_priority, min(num_pos_wanted, matches.shape[0]))
    pos_mask = jnp.zeros_like(positive).at[pos_idx].set(True)
    pos_mask = jnp.logical_and(pos_mask, positive)
    num_pos = jnp.sum(pos_mask)

    num_neg_wanted = num_samples - jnp.minimum(num_pos, num_pos_wanted)
    neg_priority = jnp.where(negative, jax.random.uniform(r2, matches.shape), -1.0)
    neg_sorted = jnp.argsort(-neg_priority)
    neg_rank = jnp.zeros_like(matches).at[neg_sorted].set(jnp.arange(matches.shape[0]))
    neg_mask = jnp.logical_and(negative, neg_rank < num_neg_wanted)
    return jnp.logical_or(pos_mask, neg_mask), pos_mask


def smooth_l1(x, beta: float):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * x * x / beta, ax - 0.5 * beta)


def rpn_loss(rng, objectness, deltas, anchors_cat, gt_boxes, gt_valid,
             batch_per_image: int = 256, positive_fraction: float = 0.5):
    """objectness (N,), deltas (N, 4), anchors_cat (N, 4) for ONE image."""
    matches = match_boxes(gt_boxes, gt_valid, anchors_cat, 0.7, 0.3,
                          allow_low_quality=True)
    sampled, pos = balanced_sample(rng, matches, batch_per_image,
                                   positive_fraction)
    num_sampled = jnp.maximum(jnp.sum(sampled), 1)

    labels = (matches >= 0).astype(jnp.float32)
    cls_loss = optax.sigmoid_binary_cross_entropy(objectness, labels)
    cls_loss = jnp.sum(jnp.where(sampled, cls_loss, 0.0)) / num_sampled

    matched_gt = gt_boxes[jnp.maximum(matches, 0)]
    target_deltas = encode(matched_gt, anchors_cat, RPN_WEIGHTS)
    reg = smooth_l1(deltas - target_deltas, beta=1.0 / 9)
    reg_loss = jnp.sum(jnp.where(pos[:, None], reg, 0.0)) / num_sampled
    return cls_loss, reg_loss


def roi_loss(rng, params, pooled, all_props, all_scores, gt_boxes,
             gt_labels, gt_valid, batch_per_image: int = 512,
             positive_fraction: float = 0.25):
    """Sample proposals (+appended gt, already pooled by the caller's
    batched RoIAlign) and compute head losses for ONE image.
    Returns (cls_loss, reg_loss)."""
    valid_prop = all_scores > NEG_INF / 10

    matches = match_boxes(gt_boxes, gt_valid, all_props, 0.5, 0.5,
                          allow_low_quality=False)
    matches = jnp.where(valid_prop, matches, BELOW_LOW)
    sampled, pos = balanced_sample(rng, matches, batch_per_image,
                                   positive_fraction)
    sampled = jnp.logical_and(sampled, valid_prop)
    num_sampled = jnp.maximum(jnp.sum(sampled), 1)

    cls_logits, box_deltas = roi_heads.box_head_apply(params["box_head"], pooled)

    matched_idx = jnp.maximum(matches, 0)
    target_labels = jnp.where(pos, gt_labels[matched_idx], 0)       # 0 = bg
    cls_loss = optax.softmax_cross_entropy_with_integer_labels(
        cls_logits, target_labels)
    cls_loss = jnp.sum(jnp.where(sampled, cls_loss, 0.0)) / num_sampled

    target_deltas = encode(gt_boxes[matched_idx], all_props, ROI_WEIGHTS)
    # gather the deltas for each sample's target class
    per_class = jnp.take_along_axis(
        box_deltas, target_labels[:, None, None].repeat(4, -1), axis=1)[:, 0]
    reg = smooth_l1(per_class - target_deltas, beta=1.0)
    reg_loss = jnp.sum(jnp.where(pos[:, None], reg, 0.0)) / num_sampled
    return cls_loss, reg_loss


def detection_loss(params, images, gt_boxes, gt_labels, gt_valid, rng,
                   config: DetectorConfig, anchor_arrays,
                   under_mesh: bool = False):
    """Total Faster R-CNN loss for a batch (loss-dict sum, as in the
    reference's `train_one_epoch`, `object_detection/engine.py:20-45`)."""
    prepped = preprocess_images(images, config)
    pyramid = forward_features(params, prepped, config)
    objectness, deltas = rpn.rpn_head_apply(params["rpn"], pyramid)
    obj_cat = jnp.concatenate(objectness, axis=1)           # (B, N)
    deltas_cat = jnp.concatenate(deltas, axis=1)            # (B, N, 4)
    anchors_cat = jnp.concatenate(anchor_arrays)            # (N, 4)

    proposals, prop_scores = rpn.generate_proposals(
        [jax.nn.sigmoid(o) for o in objectness], deltas, anchor_arrays,
        config.padded_hw, config.rpn_pre_nms_top_n, config.rpn_post_nms_top_n,
        config.rpn_nms_thresh)
    proposals = jax.lax.stop_gradient(proposals)
    prop_scores = jax.lax.stop_gradient(prop_scores)

    batch = images.shape[0]
    rngs = jax.random.split(rng, batch * 2).reshape(batch, 2, -1)
    # gt boxes arrive in original image coords; scale to the padded pyramid
    gt_scaled = gt_boxes * config.scale

    # append gt boxes to the proposal set (torchvision add_gt_proposals)
    # and pool the whole batch at once (the batched pallas kernel when
    # available; its custom VJP carries dFeatures, proposals are constant)
    from objectpermanence_tpu.models.detector.detector import batched_roi_align
    all_props = jnp.concatenate([proposals, gt_scaled], axis=1)   # (B,P+G,4)
    all_scores = jnp.concatenate([
        prop_scores, jnp.where(gt_valid, 1.0, NEG_INF)], axis=1)
    pooled = batched_roi_align(
        pyramid[:4], jax.lax.stop_gradient(all_props), config, layout="nhwc",
        under_mesh=under_mesh, needs_grad=True)

    def per_image(args):
        obj, dts, pooled_i, props, pscores, gtb, gtl, gtv, r = args
        rpn_cls, rpn_reg = rpn_loss(r[0], obj, dts, anchors_cat, gtb, gtv)
        roi_cls, roi_reg = roi_loss(r[1], params, pooled_i, props, pscores,
                                    gtb, gtl, gtv)
        return rpn_cls, rpn_reg, roi_cls, roi_reg

    losses = jax.vmap(per_image)((
        obj_cat, deltas_cat, pooled, all_props, all_scores,
        gt_scaled, gt_labels, gt_valid, rngs))
    parts = {name: jnp.mean(v) for name, v in
             zip(["loss_objectness", "loss_rpn_box_reg",
                  "loss_classifier", "loss_box_reg"], losses)}
    total = sum(parts.values())
    return total, parts


def make_detector_train_step(config: DetectorConfig, anchor_arrays, optimizer,
                             under_mesh: bool = False):
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, images, gt_boxes, gt_labels, gt_valid, rng):
        def loss_fn(p):
            return detection_loss(p, images, gt_boxes, gt_labels, gt_valid,
                                  rng, config, anchor_arrays,
                                  under_mesh=under_mesh)

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        parts["loss"] = loss
        return params, opt_state, parts

    return train_step
