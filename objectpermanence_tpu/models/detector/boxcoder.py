"""Box delta encode/decode (Faster R-CNN parameterization with per-stage
weights and the log(1000/16) clamp)."""

import math

import jax.numpy as jnp

BBOX_XFORM_CLIP = math.log(1000.0 / 16)

RPN_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
ROI_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def encode(reference: jnp.ndarray, proposals: jnp.ndarray, weights,
           eps: float = 1e-3) -> jnp.ndarray:
    """deltas such that decode(proposals, deltas) == reference.

    Sizes are eps-clamped: padded/degenerate boxes (zero rows from the
    fixed-shape batching) would otherwise produce inf/nan that poison
    gradients straight through the loss masks (NaN-through-where)."""
    wx, wy, ww, wh = weights
    px = (proposals[..., 0] + proposals[..., 2]) / 2
    py = (proposals[..., 1] + proposals[..., 3]) / 2
    pw = jnp.maximum(proposals[..., 2] - proposals[..., 0], eps)
    ph = jnp.maximum(proposals[..., 3] - proposals[..., 1], eps)

    gx = (reference[..., 0] + reference[..., 2]) / 2
    gy = (reference[..., 1] + reference[..., 3]) / 2
    gw = jnp.maximum(reference[..., 2] - reference[..., 0], eps)
    gh = jnp.maximum(reference[..., 3] - reference[..., 1], eps)

    dx = wx * (gx - px) / pw
    dy = wy * (gy - py) / ph
    dw = ww * jnp.log(gw / pw)
    dh = wh * jnp.log(gh / ph)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode(proposals: jnp.ndarray, deltas: jnp.ndarray, weights) -> jnp.ndarray:
    wx, wy, ww, wh = weights
    px = (proposals[..., 0] + proposals[..., 2]) / 2
    py = (proposals[..., 1] + proposals[..., 3]) / 2
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)

    cx = dx * pw + px
    cy = dy * ph + py
    w = jnp.exp(dw) * pw
    h = jnp.exp(dh) * ph
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def clip_to_image(boxes: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, width),
        jnp.clip(boxes[..., 1], 0, height),
        jnp.clip(boxes[..., 2], 0, width),
        jnp.clip(boxes[..., 3], 0, height),
    ], axis=-1)
