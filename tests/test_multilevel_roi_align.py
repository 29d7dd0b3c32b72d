"""Fused multilevel RoIAlign must match per-level roi_align + selection."""

import numpy as np
import jax.numpy as jnp

from objectpermanence_tpu.models.detector.roi_heads import ROI_STRIDES, assign_levels
from objectpermanence_tpu.ops.roi_align import multilevel_roi_align, roi_align


def test_multilevel_matches_per_level():
    rng = np.random.RandomState(0)
    shapes = [(40, 56), (20, 28), (10, 14), (5, 7)]
    feats = [jnp.asarray(rng.rand(32, h, w).astype(np.float32)) for h, w in shapes]

    # roi sizes spanning all pyramid levels
    rois = []
    for size in (20, 80, 200, 500):
        for _ in range(4):
            x1 = rng.uniform(0, 120)
            y1 = rng.uniform(0, 80)
            rois.append([x1, y1, x1 + size * rng.uniform(0.5, 1.5),
                         y1 + size * rng.uniform(0.5, 1.5)])
    rois = jnp.asarray(np.array(rois, np.float32))

    levels = assign_levels(rois)
    assert len(set(np.asarray(levels).tolist())) > 1  # multiple levels hit

    fused = multilevel_roi_align(feats, rois, levels, ROI_STRIDES)

    per_level = jnp.stack([
        roi_align(f, rois, 1.0 / s) for f, s in zip(feats, ROI_STRIDES)
    ])
    expected = per_level[np.asarray(levels), np.arange(len(rois))]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)
