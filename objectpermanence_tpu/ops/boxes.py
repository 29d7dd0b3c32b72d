"""Box geometry: format conversion, normalization, vectorized IoU.

Conventions match the reference pipeline:
- boxes are `[x1, y1, x2, y2]` (xyxy) in pixels or normalized by
  `[320, 240, 320, 240]` (`baselines/datasets.py:30`)
- IoU uses the reference's +1 pixel-area convention
  (`baselines/tracking_utils.py:108-159`)

All functions are duck-typed over numpy / jax.numpy so they can run inside
jit on device (training eval) or on host numpy (offline analysis).
"""

import numpy as np
import jax.numpy as jnp

# width, height, width, height — the CATER frame shape used for normalization.
FRAME_SHAPES = np.array([320.0, 240.0, 320.0, 240.0])


def _xp(x):
    return jnp if isinstance(x, jnp.ndarray) else np


def xywh_to_xyxy(boxes):
    """`[x, y, w, h]` -> `[x1, y1, x2, y2]`; boxes is (..., 4)."""
    xp = _xp(boxes)
    x, y, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return xp.stack([x, y, x + w, y + h], axis=-1)


def xyxy_to_cxcywh(boxes):
    """`[x1, y1, x2, y2]` -> `[cx, cy, w, h]`."""
    xp = _xp(boxes)
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return xp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_centers(boxes):
    """Centers (..., 2) of xyxy boxes (reference `datasets.py:110-115`)."""
    xp = _xp(boxes)
    return xp.stack(
        [(boxes[..., 0] + boxes[..., 2]) / 2, (boxes[..., 1] + boxes[..., 3]) / 2],
        axis=-1,
    )


def normalize_boxes(boxes):
    return boxes / FRAME_SHAPES


def denormalize_boxes(boxes):
    """Back to int32 pixels, as the reference drivers do before IoU
    (`baselines/training_main.py:97-100`)."""
    xp = _xp(boxes)
    return (boxes * FRAME_SHAPES).astype(xp.int32)


def iou_xyxy(boxes_a, boxes_b):
    """Elementwise IoU of two (..., 4) xyxy box arrays with the reference's
    +1 area convention (`tracking_utils.py:137-159`). Returns (...,) float."""
    xp = _xp(boxes_a)
    xa = xp.maximum(boxes_a[..., 0], boxes_b[..., 0])
    ya = xp.maximum(boxes_a[..., 1], boxes_b[..., 1])
    xb = xp.minimum(boxes_a[..., 2], boxes_b[..., 2])
    yb = xp.minimum(boxes_a[..., 3], boxes_b[..., 3])

    inter = xp.maximum(xb - xa + 1, 0) * xp.maximum(yb - ya + 1, 0)
    area_a = (boxes_a[..., 2] - boxes_a[..., 0] + 1) * (boxes_a[..., 3] - boxes_a[..., 1] + 1)
    area_b = (boxes_b[..., 2] - boxes_b[..., 0] + 1) * (boxes_b[..., 3] - boxes_b[..., 1] + 1)
    return inter / (area_a + area_b - inter)


def pairwise_iou_xyxy(boxes_a, boxes_b):
    """All-pairs IoU: (N, 4) x (M, 4) -> (N, M). Zero-area convention (no +1)
    suitable for detection NMS / matching (torchvision-style)."""
    xp = _xp(boxes_a)
    a = boxes_a[:, None, :]
    b = boxes_b[None, :, :]
    xa = xp.maximum(a[..., 0], b[..., 0])
    ya = xp.maximum(a[..., 1], b[..., 1])
    xb = xp.minimum(a[..., 2], b[..., 2])
    yb = xp.minimum(a[..., 3], b[..., 3])
    inter = xp.maximum(xb - xa, 0) * xp.maximum(yb - ya, 0)
    area_a = xp.maximum(a[..., 2] - a[..., 0], 0) * xp.maximum(a[..., 3] - a[..., 1], 0)
    area_b = xp.maximum(b[..., 2] - b[..., 0], 0) * xp.maximum(b[..., 3] - b[..., 1], 0)
    union = area_a + area_b - inter
    return xp.where(union > 0, inter / union, 0.0)
