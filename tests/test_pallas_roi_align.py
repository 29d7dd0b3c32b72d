"""Pallas RoIAlign (matmul formulation) vs the gather path, interpret mode."""

import functools

import numpy as np
import jax.numpy as jnp

import objectpermanence_tpu.ops.pallas_roi_align as pra
from objectpermanence_tpu.models.detector.roi_heads import ROI_STRIDES, assign_levels
from objectpermanence_tpu.ops.roi_align import multilevel_roi_align


def test_pallas_roi_align_matches_gather():
    rng = np.random.RandomState(0)
    shapes = [(16, 20), (8, 10), (4, 5), (2, 3)]
    feats = [jnp.asarray(rng.rand(8, h, w).astype(np.float32)) for h, w in shapes]
    rois = []
    for size in (20, 80, 200, 500):
        for _ in range(3):
            x1, y1 = rng.uniform(0, 40), rng.uniform(0, 30)
            rois.append([x1, y1, x1 + size, y1 + size])
    rois = jnp.asarray(np.array(rois, np.float32))
    levels = assign_levels(rois)

    ref = multilevel_roi_align(feats, rois, levels, ROI_STRIDES)

    orig = pra.pl.pallas_call
    pra.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        got = pra.roi_align_pallas(feats, rois, levels, ROI_STRIDES)
    finally:
        pra.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_levels_fit_vmem():
    small = [jnp.zeros((256, 64, 80)), jnp.zeros((256, 32, 40))]
    big = [jnp.zeros((256, 200, 272))]
    assert pra.levels_fit_vmem(small)
    assert not pra.levels_fit_vmem(big)


def _random_rois(rng, n):
    rois = []
    for _ in range(n):
        size = rng.choice([20, 80, 200, 500])
        x1, y1 = rng.uniform(0, 40), rng.uniform(0, 30)
        rois.append([x1, y1, x1 + size, y1 + size])
    return np.array(rois, np.float32)


def test_tiled_roi_align_matches_gather():
    rng = np.random.RandomState(1)
    shapes = [(16, 20), (8, 10), (4, 5), (2, 3)]
    feats = [jnp.asarray(rng.rand(8, h, w).astype(np.float32)) for h, w in shapes]
    rois = jnp.asarray(_random_rois(rng, 21))  # not a multiple of r_blk
    levels = assign_levels(rois)
    ref = multilevel_roi_align(feats, rois, levels, ROI_STRIDES)
    orig = pra.pl.pallas_call
    pra.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        got = pra.roi_align_pallas_tiled(feats, rois, levels, ROI_STRIDES,
                                         channel_chunk=4)
    finally:
        pra.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_batched_tiled_roi_align_matches_vmapped_gather():
    import jax
    rng = np.random.RandomState(2)
    B = 3
    shapes = [(16, 20), (8, 10), (4, 5), (2, 3)]
    feats = [jnp.asarray(rng.rand(B, 8, h, w).astype(np.float32))
             for h, w in shapes]
    rois = jnp.asarray(np.stack([_random_rois(rng, 17) for _ in range(B)]))
    levels = jax.vmap(assign_levels)(rois)
    ref = jax.vmap(lambda *a: multilevel_roi_align(list(a[:4]), a[4], a[5],
                                                   ROI_STRIDES))(
        *feats, rois, levels)
    orig = pra.pl.pallas_call
    pra.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        got = pra.roi_align_pallas_batched(feats, rois, levels, ROI_STRIDES,
                                           channel_chunk=4)
    finally:
        pra.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_batched_roi_align_vjp_matches_gather():
    """Feature gradients through the custom-VJP batched kernel == the
    differentiable gather path (training-step usage)."""
    import jax
    rng = np.random.RandomState(3)
    B = 2
    shapes = [(16, 20), (8, 10), (4, 5), (2, 3)]
    feats = [jnp.asarray(rng.rand(B, 8, h, w).astype(np.float32))
             for h, w in shapes]
    rois = jnp.asarray(np.stack([_random_rois(rng, 12) for _ in range(B)]))
    levels = jax.vmap(assign_levels)(rois)
    cot = jnp.asarray(rng.rand(B, 12, 8, 7, 7).astype(np.float32))

    def loss_gather(feats):
        out = jax.vmap(lambda *a: multilevel_roi_align(
            list(a[:4]), a[4], a[5], ROI_STRIDES))(*feats, rois, levels)
        return jnp.sum(out * cot)

    def loss_pallas(feats):
        out = pra.roi_align_pallas_batched(feats, rois, levels, ROI_STRIDES,
                                           channel_chunk=4)
        return jnp.sum(out * cot)

    g_ref = jax.grad(loss_gather)(feats)
    orig = pra.pl.pallas_call
    pra.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        g_got = jax.grad(loss_pallas)(feats)
    finally:
        pra.pl.pallas_call = orig
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_windowed_roi_align_matches_gather():
    """Windowed-DMA kernel (large-pyramid path) == gather path for
    canonically-assigned rois, both layouts."""
    import jax
    rng = np.random.RandomState(7)
    B = 2
    shapes = [(60, 68), (30, 34), (15, 17), (8, 9)]
    feats = [jnp.asarray(rng.rand(B, 8, h, w).astype(np.float32))
             for h, w in shapes]
    rois = []
    for _ in range(B):
        img_rois = []
        for size in (20, 80, 200, 420):
            for _ in range(3):
                x1, y1 = rng.uniform(0, 100), rng.uniform(0, 80)
                img_rois.append([x1, y1, x1 + size, y1 + size])
        rois.append(img_rois)
    rois = jnp.asarray(np.array(rois, np.float32))
    levels = jax.vmap(assign_levels)(rois)

    ref = jax.vmap(lambda *a: multilevel_roi_align(
        list(a[:4]), a[4], a[5], ROI_STRIDES))(*feats, rois, levels)

    orig = pra.pl.pallas_call
    pra.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        got = pra.roi_align_pallas_windowed(feats, rois, levels, ROI_STRIDES,
                                            channel_chunk=4, r_blk=4, win=32)
        feats_nhwc = [jnp.moveaxis(f, 1, -1) for f in feats]
        got_nhwc = pra.roi_align_pallas_windowed(
            feats_nhwc, rois, levels, ROI_STRIDES, channel_chunk=4,
            r_blk=4, win=32, layout="nhwc")
    finally:
        pra.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_nhwc), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_windowed_roi_align_800px_shapes():
    """The actual large-pyramid use case: 800px-recipe level shapes (P2
    alone would be ~28 MB/chunk on-chip), small channel count for the
    interpret-mode oracle."""
    import jax
    rng = np.random.RandomState(8)
    B = 1
    shapes = [(200, 272), (100, 136), (50, 68), (25, 34)]
    feats = [jnp.asarray(rng.rand(B, 4, h, w).astype(np.float32))
             for h, w in shapes]
    rois = []
    for size in (30, 100, 300, 700):
        for _ in range(4):
            x1, y1 = rng.uniform(0, 380), rng.uniform(0, 280)
            rois.append([x1, y1, x1 + size, y1 + size])
    rois = jnp.asarray(np.array(rois, np.float32))[None]
    levels = jax.vmap(assign_levels)(rois)

    ref = jax.vmap(lambda *a: multilevel_roi_align(
        list(a[:4]), a[4], a[5], ROI_STRIDES))(*feats, rois, levels)

    orig = pra.pl.pallas_call
    pra.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        got = pra.roi_align_pallas_windowed(feats, rois, levels, ROI_STRIDES,
                                            channel_chunk=4, r_blk=8, win=48)
    finally:
        pra.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_batched_and_windowed_roi_align_bf16():
    """bf16 feature path: kernels must pick DEFAULT MXU precision (Mosaic
    rejects bf16 matmuls at fp32 contract precision) and stay within bf16
    tolerance of the fp32 gather oracle."""
    import jax
    rng = np.random.RandomState(11)
    B = 2
    shapes = [(16, 20), (8, 10), (4, 5), (2, 3)]
    feats32 = [jnp.asarray(rng.rand(B, 8, h, w).astype(np.float32))
               for h, w in shapes]
    feats16 = [f.astype(jnp.bfloat16) for f in feats32]
    rois = jnp.asarray(np.stack([_random_rois(rng, 16) for _ in range(B)]))
    levels = jax.vmap(assign_levels)(rois)
    ref = jax.vmap(lambda *a: multilevel_roi_align(list(a[:4]), a[4], a[5],
                                                   ROI_STRIDES))(
        *feats32, rois, levels)
    orig = pra.pl.pallas_call
    pra.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        got_b = pra.roi_align_pallas_batched(feats16, rois, levels,
                                             ROI_STRIDES, channel_chunk=4)
        got_w = pra.roi_align_pallas_windowed(feats16, rois, levels,
                                              ROI_STRIDES, channel_chunk=4,
                                              r_blk=4, win=32)
    finally:
        pra.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(got_b, np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_w, np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_windowed_trainable_grads_match_gather_autodiff():
    """roi_align_windowed_trainable: windowed forward at float parity with
    the gather path, and d_features EXACTLY equal to the gather path's
    autodiff (RoIAlign is linear in features; the custom VJP is the exact
    transpose of the sampling map)."""
    import jax
    rng = np.random.RandomState(11)
    B, C = 2, 8
    shapes = [(32, 40), (16, 20), (8, 10), (4, 5)]
    feats = [jnp.asarray(rng.rand(B, C, h, w).astype(np.float32))
             for h, w in shapes]
    rois = jnp.asarray(rng.uniform(10, 100, size=(B, 6, 4)).astype(np.float32))
    rois = rois.at[..., 2:].set(rois[..., :2] + rng.uniform(
        8, 60, size=(B, 6, 2)).astype(np.float32))
    levels = jax.vmap(lambda r: jnp.zeros(r.shape[0], jnp.int32) +
                      (jnp.arange(r.shape[0]) % 4))(rois)

    def gather_fn(fs):
        return jax.vmap(lambda *a: multilevel_roi_align(
            list(a[:4]), a[4], a[5], ROI_STRIDES))(*fs, rois, levels)

    cotangent = jnp.asarray(rng.rand(B, 6, C, 7, 7).astype(np.float32))

    def loss_gather(fs):
        return jnp.sum(gather_fn(fs) * cotangent)

    ref_out = gather_fn(feats)
    ref_grads = jax.grad(loss_gather)(feats)

    orig = pra.pl.pallas_call
    pra.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        def loss_win(fs):
            out = pra.roi_align_windowed_trainable(
                fs, rois, levels, ROI_STRIDES, channel_chunk=8, r_blk=4,
                win=24)
            return jnp.sum(out * cotangent), out

        (_, got_out), got_grads = jax.value_and_grad(
            loss_win, has_aux=True)(feats)
    finally:
        pra.pl.pallas_call = orig

    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-6)
    for g, r in zip(got_grads, ref_grads):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_windowed_trainable_bf16_features_grad():
    """Regression (round 5): under bf16 compute the backward's gather
    formulation upcasts to fp32, so its vjp expects an fp32 cotangent —
    casting the cotangent to the FEATURE dtype raised a JAX type error and
    broke the bf16 800px windowed training path. d_features must come back
    in the feature dtype and match the gather autodiff."""
    import jax
    rng = np.random.RandomState(3)
    B, C = 1, 8
    shapes = [(16, 20), (8, 10), (4, 5), (2, 3)]
    feats = [jnp.asarray(rng.rand(B, C, h, w).astype(np.float32),
                         jnp.bfloat16) for h, w in shapes]
    rois = jnp.asarray([[[8.0, 8.0, 40.0, 36.0], [20.0, 4.0, 52.0, 30.0]]],
                       jnp.float32)
    levels = jnp.zeros((B, 2), jnp.int32)
    cotangent = jnp.asarray(rng.rand(B, 2, C, 7, 7).astype(np.float32))

    def loss_gather(fs):
        out = jax.vmap(lambda *a: multilevel_roi_align(
            list(a[:4]), a[4], a[5], ROI_STRIDES))(*fs, rois, levels)
        return jnp.sum(out * cotangent)

    ref_grads = jax.grad(loss_gather)(feats)

    orig = pra.pl.pallas_call
    pra.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        def loss_win(fs):
            out = pra.roi_align_windowed_trainable(
                fs, rois, levels, ROI_STRIDES, channel_chunk=8, r_blk=2,
                win=24)
            return jnp.sum(out.astype(jnp.float32) * cotangent)

        got_grads = jax.grad(loss_win)(feats)
    finally:
        pra.pl.pallas_call = orig

    for g, r in zip(got_grads, ref_grads):
        assert g.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            rtol=1e-2, atol=1e-2)


def test_windowed_roi_align_right_edge_small_cc():
    """Regression: with cc not a multiple of 8 (x_quant > y_quant), a roi
    near the RIGHT level edge must still be exact — the window size must be
    a multiple of both alignment quanta, else the clip bound wps-win falls
    off the x grid and flooring shifts the window left past the taps."""
    import jax
    rng = np.random.RandomState(5)
    B, C = 1, 4                       # cc=4 -> x_quant = 32
    shapes = [(64, 128), (32, 64), (16, 32), (8, 16)]
    feats = [jnp.asarray(rng.rand(B, C, h, w).astype(np.float32))
             for h, w in shapes]
    # rois hugging the right/bottom edges of level 0 (stride 4 -> image
    # coords), plus an interior control
    rois_img = np.array([[480.0, 240.0, 505.0, 262.0],      # right edge
                         [495.0, 20.0, 510.0, 40.0],        # far right
                         [40.0, 220.0, 70.0, 254.0],        # bottom
                         [100.0, 100.0, 130.0, 130.0]], np.float32)
    rois = jnp.asarray(rois_img)[None]
    levels = jnp.zeros((B, 4), jnp.int32)
    ref = jax.vmap(lambda *a: multilevel_roi_align(list(a[:4]), a[4], a[5],
                                                   ROI_STRIDES))(
        *feats, rois, levels)
    orig = pra.pl.pallas_call
    pra.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        got = pra.roi_align_pallas_windowed(feats, rois, levels, ROI_STRIDES,
                                            channel_chunk=4, r_blk=4, win=48)
    finally:
        pra.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_windowed_contract_stats():
    """The out-of-contract counter (Weak #5): every roi NOT flagged must be
    float-exact vs the gather oracle, extreme-aspect rois must be flagged,
    and the process-wide counters must add up."""
    import jax
    rng = np.random.RandomState(9)
    B, C = 1, 4
    shapes = [(64, 128), (32, 64), (16, 32), (8, 16)]
    feats = [jnp.asarray(rng.rand(B, C, h, w).astype(np.float32))
             for h, w in shapes]
    rois_img = []
    for size in (24, 90, 220):                 # canonical squares: in contract
        for _ in range(3):
            x1, y1 = rng.uniform(0, 40), rng.uniform(0, 30)
            rois_img.append([x1, y1, x1 + size, y1 + size])
    n_square = len(rois_img)
    # ~80:1 aspect: 500px wide = 125 level-0 pixels, far beyond the 64-px
    # effective window (win=32 widened by the cc=4 alignment quantum)
    for _ in range(3):
        x1, y1 = rng.uniform(0, 8), rng.uniform(0, 200)
        rois_img.append([x1, y1, x1 + 500.0, y1 + 6.0])
    rois = jnp.asarray(np.array(rois_img, np.float32))[None]
    levels = jax.vmap(assign_levels)(rois)

    ref = jax.vmap(lambda *a: multilevel_roi_align(
        list(a[:4]), a[4], a[5], ROI_STRIDES))(*feats, rois, levels)

    pra.reset_contract_stats()
    orig = pra.pl.pallas_call
    pra.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        got = pra.roi_align_pallas_windowed(
            feats, rois, levels, ROI_STRIDES, channel_chunk=4,
            r_blk=4, win=32)
        got = np.asarray(got)
        jax.effects_barrier()
    finally:
        pra.pl.pallas_call = orig

    stats = pra.contract_stats()
    assert stats["rois"] == rois.shape[1]
    assert stats["out_of_contract"] == 3
    assert pra._CONTRACT_STATS["warned"]
    # the public post-hoc helper (CPU contract measurement on callback-less
    # backends) must agree exactly with the in-dispatch mask
    level_shapes = [(h, w, float(s)) for (h, w), s in zip(shapes, ROI_STRIDES)]
    m = np.asarray(pra.windowed_out_of_contract_mask(
        rois, levels, level_shapes, channels=C, channel_chunk=4, win=32))
    assert m.sum() == 3 and m[0, n_square:].all() and not m[0, :n_square].any()
    # the guarantee the counter exists to protect: unflagged rois are exact
    np.testing.assert_allclose(got[0, :n_square], np.asarray(ref)[0, :n_square],
                               rtol=1e-5, atol=1e-6)
    # and the flagged ones really do deviate (the approximation is real)
    assert not np.allclose(got[0, n_square:], np.asarray(ref)[0, n_square:],
                           rtol=1e-5, atol=1e-6)
    pra.reset_contract_stats()

import pytest

pytestmark = pytest.mark.slow  # full-lane: see tests/conftest.py
