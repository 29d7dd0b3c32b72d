"""Pallas TPU RoIAlign: bilinear sampling as two MXU matmuls per RoI.

XLA lowers the gather formulation of RoIAlign (`ops/roi_align.py`) to
row-gathers that run at ~20 GB/s effective — the detector's bottleneck.
This kernel instead expresses bilinear interpolation separably:

    out = BinAvg( Wy @ F @ Wx^T )

where `Wy (k, H)` / `Wx (k, W)` are per-roi interpolation matrices (two
non-zeros per row: the bilinear taps) built in-kernel from iota compares,
and `F (H, W*C)` is the roi's pyramid level, VMEM-resident for the whole
launch. Each grid step handles one roi: one (k, H) @ (H, W*C) matmul, a
sublane transpose, one (k, W) @ (W, k*C) matmul, and a 2x2 bin average.

Constraint: all pyramid levels must fit VMEM together (true for the
native-resolution CATER config: ~7 MB; the 800px COCO-recipe config falls
back to the XLA gather path).

Semantics match `ops.roi_align.roi_align` (aligned=False, sample points
outside [-1, size] zeroed, coordinate clamping) to float tolerance.
"""

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp_weights(coords, size: int):
    """coords: (k, 1) sample positions in level pixel space.
    Returns (k, size) bilinear weight matrix with out-of-range samples
    zeroed (reference torchvision semantics)."""
    k = coords.shape[0]
    inside = jnp.logical_and(coords >= -1.0, coords <= size)
    c = jnp.clip(coords, 0.0, size - 1.0)
    c0 = jnp.floor(c)
    frac = c - c0
    c0i = c0.astype(jnp.int32)
    c1i = jnp.minimum(c0i + 1, size - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, size), 1)
    w = (jnp.where(cols == c0i, 1.0 - frac, 0.0) +
         jnp.where(cols == c1i, frac, 0.0))
    # both taps on the same column (edge clamp) must sum, which the adds
    # above already do; zero fully-outside samples
    return jnp.where(inside, w, 0.0)


def _make_kernel(level_shapes, channels: int, pooled: int, s: int):
    k = pooled * s

    def kernel(rois_smem, levels_smem, *refs):
        feat_refs = refs[0]
        out_ref = refs[1]
        i = pl.program_id(0)
        level = levels_smem[i]

        x1 = rois_smem[i, 0]
        y1 = rois_smem[i, 1]
        x2 = rois_smem[i, 2]
        y2 = rois_smem[i, 3]

        def level_branch(lvl):
            h, w, stride = level_shapes[lvl]
            ref = feat_refs[lvl]

            def body():
                scale = 1.0 / stride
                lx1, ly1 = x1 * scale, y1 * scale
                roi_w = jnp.maximum(x2 * scale - lx1, 1.0)
                roi_h = jnp.maximum(y2 * scale - ly1, 1.0)
                idx = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
                grid = ((idx // s).astype(jnp.float32) +
                        ((idx % s).astype(jnp.float32) + 0.5) / s)
                ys = ly1 + grid * (roi_h / pooled)           # (k, 1)
                xs = lx1 + grid * (roi_w / pooled)
                wy = _interp_weights(ys, h)                  # (k, H)
                wx = _interp_weights(xs, w)                  # (k, W)

                feat = ref[:]                                # (H, W*C)
                stage1 = jnp.dot(wy, feat,
                                 preferred_element_type=jnp.float32)  # (k, W*C)
                # (k, W, C) -> (W, k, C) -> (W, k*C)
                stage1 = stage1.reshape(k, w, channels)
                stage1 = jnp.swapaxes(stage1, 0, 1).reshape(w, k * channels)
                samples = jnp.dot(wx, stage1,
                                  preferred_element_type=jnp.float32)  # (k, k*C)
                return samples

            return body

        samples = jax.lax.switch(level, [level_branch(l)
                                         for l in range(len(level_shapes))])
        # samples[m, j*C + c] = value at (y sample j, x sample m)
        samples = samples.reshape(k, k, channels)            # (x, y, C)
        binned = samples.reshape(pooled, s, pooled, s, channels).mean(axis=(1, 3))
        out_ref[0] = binned                                  # (p, p, C) [x, y]

    return kernel


@functools.partial(jax.jit, static_argnames=("level_shapes", "pooled",
                                             "sampling_ratio"))
def _pallas_roi_align(features_2d, rois, levels, level_shapes, pooled, sampling_ratio):
    n = rois.shape[0]
    channels = features_2d[0].shape[1] // level_shapes[0][1]
    k = pooled * sampling_ratio

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,              # rois + levels in SMEM
        grid=(n,),
        in_specs=[
            pl.BlockSpec(shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
            for shape in [(h, f.shape[1]) for (h, _, _), f in
                          zip(level_shapes, features_2d)]
        ],
        out_specs=pl.BlockSpec((1, pooled, pooled, channels),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    # pallas passes (scalar refs..., in refs..., out ref); adapt signature
    def kernel_entry(rois_s, levels_s, *refs):
        *feat_refs, out_ref = refs
        k_fn = _make_kernel(level_shapes, channels, pooled, sampling_ratio)
        return k_fn(rois_s, levels_s, tuple(feat_refs), out_ref)

    out = pl.pallas_call(
        kernel_entry,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, pooled, pooled, channels),
                                       jnp.float32),
    )(rois, levels, *features_2d)
    return out


def roi_align_pallas(features: List[jax.Array], rois: jax.Array,
                     levels: jax.Array, strides: Sequence[int],
                     pooled: int = 7, sampling_ratio: int = 2) -> jax.Array:
    """Multi-level RoIAlign via the Pallas kernel.
    features: [ (C, H_l, W_l) ]; rois (N, 4); levels (N,).
    Returns (N, C, pooled, pooled) matching `multilevel_roi_align`."""
    level_shapes = tuple(
        (int(f.shape[1]), int(f.shape[2]), float(stride))
        for f, stride in zip(features, strides))
    features_2d = [
        jnp.moveaxis(f, 0, -1).reshape(f.shape[1], f.shape[2] * f.shape[0])
        for f in features
    ]
    out = _pallas_roi_align(features_2d, rois.astype(jnp.float32),
                            levels.astype(jnp.int32), level_shapes, pooled,
                            sampling_ratio)
    # kernel emits (N, p_x, p_y, C); match (N, C, p_y, p_x)
    return jnp.transpose(out, (0, 3, 2, 1))


def levels_fit_vmem(features: List[jax.Array], budget_bytes: int = 12 * 2**20) -> bool:
    total = sum(int(np.prod(f.shape)) * 4 for f in features)
    return total <= budget_bytes
