"""Static-shape NMS for TPU.

Replaces torchvision's C++/CUDA `nms` (used by the reference's Faster R-CNN,
SURVEY §2.14) with a padded XLA formulation: scores are top-k'd to a fixed
N, the pairwise IoU matrix is computed once on the MXU/VPU, and a
`fori_loop` walks the score order suppressing overlaps — identical keep
semantics to torchvision (strictly-greater threshold comparison), but with
static shapes so it compiles once.
"""

import functools

import jax
import jax.numpy as jnp

from objectpermanence_tpu.ops.boxes import pairwise_iou_xyxy

NEG_INF = -1e10


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms_mask(boxes: jax.Array, scores: jax.Array, iou_threshold: float) -> jax.Array:
    """Suppression over score-sorted candidates.

    boxes: (N, 4) xyxy, scores: (N,) — entries with score <= NEG_INF/10 are
    treated as padding. Returns a boolean keep mask aligned with the INPUT
    order. Boxes are processed highest-score first; a box is suppressed if
    it overlaps an already-kept box with IoU > iou_threshold.

    Implementation: greedy NMS is the unique fixed point of
        keep[i] = valid[i] and not any(j < i and overlap[j, i] and keep[j]),
    computed by fixed-point iteration — each round is one dense
    matrix-vector step on the VPU and rounds needed = the suppression-chain
    depth (a handful in practice), instead of N sequential scalar steps.
    Exactness is guarded by iterating until convergence (bounded by N).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    valid = scores[order] > NEG_INF / 10

    iou = pairwise_iou_xyxy(sorted_boxes, sorted_boxes)
    idx = jnp.arange(n)
    # overlap[j, i]: j precedes i in score order and suppresses it
    overlap = jnp.logical_and(iou > iou_threshold, idx[:, None] < idx[None, :])
    overlap_f = overlap.astype(jnp.float32)

    def cond(state):
        keep, prev, rounds = state
        return jnp.logical_and(jnp.any(keep != prev), rounds < n)

    def body(state):
        keep, _, rounds = state
        suppressed = (keep.astype(jnp.float32) @ overlap_f) > 0
        new_keep = jnp.logical_and(valid, ~suppressed)
        return new_keep, keep, rounds + 1

    keep0 = valid
    keep_sorted, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), 0))
    # scatter back to input order
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


def batched_class_nms(boxes: jax.Array, scores: jax.Array, labels: jax.Array,
                      iou_threshold: float) -> jax.Array:
    """Per-class NMS via the coordinate-offset trick (torchvision
    `batched_nms`): boxes of different classes are shifted far apart so one
    NMS pass never crosses classes. Returns keep mask in input order."""
    max_coord = jnp.max(jnp.where(scores > NEG_INF / 10, jnp.max(boxes, axis=-1), 0.0))
    offsets = labels.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold)


def top_k_by_score(boxes, scores, k: int, *extras):
    """Fixed-size top-k: returns (boxes (k,4), scores (k,), *extras[k])
    padded with NEG_INF scores when fewer than k valid entries exist."""
    k = min(k, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    out = [boxes[top_idx], top_scores]
    for extra in extras:
        out.append(extra[top_idx])
    return tuple(out)
