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

        flat = features.reshape(c, -1)                     # (C, H*W)

        def take(yi, xi):
            return flat[:, yi * w + xi]                    # (C, N, K)

        val = (take(y0, x0) * (hy * hx) + take(y0, x1c) * (hy * lx) +
               take(y1c, x0) * (ly * hx) + take(y1c, x1c) * (ly * lx))
        return jnp.where(inside, val, 0.0)                 # (C, N, K)

    # full 2D sample grid = outer product of the per-axis sample coords
    n = rois.shape[0]
    k = pooled * s
    yy = jnp.broadcast_to(ys[:, :, None], (n, k, k)).reshape(n, k * k)
    xx = jnp.broadcast_to(xs[:, None, :], (n, k, k)).reshape(n, k * k)
    samples = bilinear(yy, xx)                             # (C, N, k*k)

    samples = samples.reshape(c, n, k, k)
    # average the s x s sample points per bin
    samples = samples.reshape(c, n, pooled, s, pooled, s).mean(axis=(3, 5))
    return samples.transpose(1, 0, 2, 3)                   # (N, C, p, p)
