"""RoIAlign as vectorized XLA gathers (torchvision-compatible semantics).

Replaces torchvision's C++/CUDA `roi_align` (SURVEY §2.14): for each RoI,
a `pooled x pooled` bin grid with `sampling_ratio^2` bilinear sample points
per bin, averaged. `aligned=False` (the torchvision 0.5-era default used by
the reference's Faster R-CNN). Everything is dense and statically shaped:
(N rois, C, pooled, pooled) comes from one fused gather over the feature
map, so XLA lowers it to efficient dynamic-slices on TPU.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("pooled", "sampling_ratio"))
def roi_align(features: jax.Array, rois: jax.Array, spatial_scale: float,
              pooled: int = 7, sampling_ratio: int = 2) -> jax.Array:
    """features: (C, H, W); rois: (N, 4) xyxy in image coords.
    Returns (N, C, pooled, pooled)."""
    c, h, w = features.shape
    rois = rois.astype(features.dtype) * spatial_scale

    x1, y1 = rois[:, 0], rois[:, 1]
    roi_w = jnp.maximum(rois[:, 2] - rois[:, 0], 1.0)
    roi_h = jnp.maximum(rois[:, 3] - rois[:, 1], 1.0)

    bin_w = roi_w / pooled   # (N,)
    bin_h = roi_h / pooled

    s = sampling_ratio
    # sample point offsets within a bin: (i + 0.5)/s for i in [0, s)
    offs = (jnp.arange(s) + 0.5) / s                       # (s,)
    bins = jnp.arange(pooled)                              # (p,)
    # per-roi sample coordinates along each axis: (N, p, s)
    ys = y1[:, None, None] + (bins[None, :, None] + offs[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (bins[None, :, None] + offs[None, None, :]) * bin_w[:, None, None]
    ys = ys.reshape(ys.shape[0], -1)                       # (N, p*s)
    xs = xs.reshape(xs.shape[0], -1)

    # row-major gather layout: contiguous C-wide rows from (H*W, C) are
    # far cheaper on TPU than gathering along a minor axis
    flat = jnp.moveaxis(features, 0, -1).reshape(h * w, c)  # (H*W, C)

    def bilinear(points_y, points_x):
        """Sample features at (N, K) fractional coords -> (N, K, C)."""
        # torchvision clamps coords to [0, size-1] and zeroes samples that
        # fall outside [-1, H] entirely
        inside = (points_y >= -1.0) & (points_y <= h) & \
                 (points_x >= -1.0) & (points_x <= w)
        y = jnp.clip(points_y, 0.0, h - 1)
        x = jnp.clip(points_x, 0.0, w - 1)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        y1c = jnp.minimum(y0 + 1, h - 1)
        x1c = jnp.minimum(x0 + 1, w - 1)
        ly = y - y0
        lx = x - x0
        hy = 1.0 - ly
        hx = 1.0 - lx

        def take(yi, xi):
            return flat[yi * w + xi]                       # (N, K, C)

        val = (take(y0, x0) * (hy * hx)[..., None] +
               take(y0, x1c) * (hy * lx)[..., None] +
               take(y1c, x0) * (ly * hx)[..., None] +
               take(y1c, x1c) * (ly * lx)[..., None])
        return jnp.where(inside[..., None], val, 0.0)      # (N, K, C)

    # full 2D sample grid = outer product of the per-axis sample coords
    n = rois.shape[0]
    k = pooled * s
    yy = jnp.broadcast_to(ys[:, :, None], (n, k, k)).reshape(n, k * k)
    xx = jnp.broadcast_to(xs[:, None, :], (n, k, k)).reshape(n, k * k)
    samples = bilinear(yy, xx)                             # (N, k*k, C)

    # average the s x s sample points per bin
    samples = samples.reshape(n, pooled, s, pooled, s, c).mean(axis=(2, 4))
    return samples.transpose(0, 3, 1, 2)                   # (N, C, p, p)


@functools.partial(jax.jit, static_argnames=("strides", "pooled",
                                             "sampling_ratio"))
def multilevel_roi_align(features, rois: jax.Array, levels: jax.Array,
                         strides, pooled: int = 7,
                         sampling_ratio: int = 2) -> jax.Array:
    """Multi-level RoIAlign with ONE gather from a concatenated feature
    table: each roi samples only its assigned pyramid level (per-roi scale,
    dims and row offset are gathered from tiny per-level arrays), instead
    of pooling every roi from every level and masking — 4x less gather
    traffic than the select-after-pool formulation.

    features: list of (C, H_l, W_l); rois: (N, 4) xyxy image coords;
    levels: (N,) int level index into `features`. -> (N, C, pooled, pooled).
    """
    c = features[0].shape[0]
    flats, offsets, hs, ws = [], [], [], []
    offset = 0
    for feat in features:
        _, h, w = feat.shape
        flats.append(jnp.moveaxis(feat, 0, -1).reshape(h * w, c))
        offsets.append(offset)
        hs.append(h)
        ws.append(w)
        offset += h * w
    table = jnp.concatenate(flats)                         # (S, C)

    lvl_offset = jnp.asarray(offsets)[levels]              # (N,)
    lvl_h = jnp.asarray(hs)[levels]
    lvl_w = jnp.asarray(ws)[levels]
    scale = (1.0 / jnp.asarray(strides, jnp.float32))[levels]

    r = rois.astype(jnp.float32) * scale[:, None]
    x1, y1 = r[:, 0], r[:, 1]
    roi_w = jnp.maximum(r[:, 2] - r[:, 0], 1.0)
    roi_h = jnp.maximum(r[:, 3] - r[:, 1], 1.0)
    bin_w = roi_w / pooled
    bin_h = roi_h / pooled

    s = sampling_ratio
    offs = (jnp.arange(s) + 0.5) / s
    bins = jnp.arange(pooled)
    grid = (bins[:, None] + offs[None, :]).reshape(-1)     # (k,)
    ys = y1[:, None] + grid[None, :] * bin_h[:, None]      # (N, k)
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]

    n = rois.shape[0]
    k = pooled * s
    yy = jnp.broadcast_to(ys[:, :, None], (n, k, k)).reshape(n, k * k)
    xx = jnp.broadcast_to(xs[:, None, :], (n, k, k)).reshape(n, k * k)

    fh = lvl_h.astype(jnp.float32)[:, None]
    fw = lvl_w.astype(jnp.float32)[:, None]
    inside = (yy >= -1.0) & (yy <= fh) & (xx >= -1.0) & (xx <= fw)
    y = jnp.clip(yy, 0.0, fh - 1)
    x = jnp.clip(xx, 0.0, fw - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1c = jnp.minimum(y0 + 1, lvl_h[:, None] - 1)
    x1c = jnp.minimum(x0 + 1, lvl_w[:, None] - 1)
    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    base = lvl_offset[:, None]
    w_row = lvl_w[:, None]

    def take(yi, xi):
        return table[base + yi * w_row + xi]               # (N, k*k, C)

    val = (take(y0, x0) * (hy * hx)[..., None] +
           take(y0, x1c) * (hy * lx)[..., None] +
           take(y1c, x0) * (ly * hx)[..., None] +
           take(y1c, x1c) * (ly * lx)[..., None])
    val = jnp.where(inside[..., None], val, 0.0)

    val = val.reshape(n, pooled, s, pooled, s, c).mean(axis=(2, 4))
    return val.transpose(0, 3, 1, 2)                       # (N, C, p, p)
