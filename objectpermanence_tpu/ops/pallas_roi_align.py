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
import math
import os
import warnings
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# --- windowed-kernel contract accounting -------------------------------------
# The windowed kernel drops taps outside its per-roi (win, win) window (the
# documented >~5:1-aspect approximation). These process-wide counters make a
# distribution shift VISIBLE instead of silently degrading accuracy: every
# windowed dispatch accumulates (rois seen, rois out of contract) via a host
# callback, and the first violation emits a warning. Disable with
# OP_TPU_ROI_CONTRACT_STATS=0 (stats are trace-time gated, so a jit compiled
# while disabled never pays the callback).
#
# Measured default-on cost (the advisor asked): the in-graph mask is O(B*N)
# vectorized elementwise work — 1.6 ms/dispatch on the CPU backend at
# detection scale (B=8 imgs x N=300 rois, 4-level FPN), of which most is the
# callback's host plumbing; on TPU the mask itself is device-side and far
# smaller, and jax.debug.callback is asynchronous (it does not stall the
# accelerator stream), so the steady-state overhead is bounded by the tiny
# (2 ints) D2H per dispatch — noise next to the windowed RoI stage's ~19.6 ms.
# Production runs that want the last millisecond set the env var to 0.
#
# Platforms whose PjRt client cannot execute host send/recv callbacks: a
# jax.debug.callback dispatched there raises UNIMPLEMENTED at RUN time (after
# a full compile), so the stats must be trace-time disabled on them. The
# tunnel's axon client is one (observed: "axon_pjrt does not support host
# send/recv callbacks"). Its devices register as platform "tpu", so
# jax.default_backend() cannot identify it — the jax_platforms config string
# can ("axon,cpu" under the tunnel; "cpu" when tests force CPU via
# jax.config.update). OP_TPU_ROI_CONTRACT_STATS=force overrides the probe.
_CALLBACK_UNSUPPORTED_PLATFORMS = ("axon",)


def _contract_stats_active() -> bool:
    env = os.environ.get("OP_TPU_ROI_CONTRACT_STATS", "1")
    if env == "0":
        return False
    if env == "force":
        return True
    try:
        platforms = str(jax.config.jax_platforms or "").split(",")
        return not any(p in platforms
                       for p in _CALLBACK_UNSUPPORTED_PLATFORMS)
    except Exception:  # config probe failure: never break the compute path
        return False
_CONTRACT_STATS = {"rois": 0, "out_of_contract": 0, "warned": False}


def contract_stats() -> dict:
    """Snapshot of {rois, out_of_contract} seen by windowed dispatches.
    Counts every DISPATCHED roi slot — including NMS-suppressed /
    score-masked proposals and padded gt rows that never influence the
    model output (the dispatch has no validity information). For a rate
    over rois that matter, use `scripts/detector_800px_run.py contract`'s
    valid_rate, which masks by proposal score / gt validity."""
    return {k: _CONTRACT_STATS[k] for k in ("rois", "out_of_contract")}


def reset_contract_stats() -> None:
    _CONTRACT_STATS.update(rois=0, out_of_contract=0, warned=False)


def _accumulate_contract_stats(violations, total) -> None:
    _CONTRACT_STATS["rois"] += int(total)
    _CONTRACT_STATS["out_of_contract"] += int(violations)
    if violations and not _CONTRACT_STATS["warned"]:
        _CONTRACT_STATS["warned"] = True
        warnings.warn(
            f"windowed RoIAlign: {int(violations)}/{int(total)} rois in this "
            f"batch exceed the window contract (>~5:1 aspect at their FPN "
            f"level) and get the documented window approximation; see "
            f"ops.pallas_roi_align.contract_stats() for running totals",
            RuntimeWarning, stacklevel=2)


def _window_quant(itemsize: int, cc: int, win: int):
    """The windowed kernel's alignment quanta and widened window size for a
    feature dtype of `itemsize` bytes and channel chunk `cc` (see the long
    comment in `roi_align_pallas_windowed` for the derivation)."""
    y_quant = 8 * (4 // itemsize)          # f32: 8, bf16: 16
    x_quant = 128 // math.gcd(cc, 128)     # x0 alignment so x0*cc % 128 == 0
    quant = max(y_quant, x_quant)
    win = -(-(win + quant) // quant) * quant
    return win, y_quant, x_quant


def windowed_out_of_contract_mask(rois, levels, level_shapes, *, channels,
                                  itemsize: int = 4, pooled: int = 7,
                                  sampling_ratio: int = 2,
                                  channel_chunk: int = 128, win: int = 48):
    """(B, N) bool — exactly the out-of-contract mask
    `roi_align_pallas_windowed` at the same settings would count, WITHOUT
    running the kernel. For post-hoc contract measurement on backends where
    the in-dispatch host-callback counter is unavailable (the axon tunnel).
    `level_shapes`: [(H_l, W_l, stride_l)] of the raw (unpadded) pyramid."""
    cc = channel_chunk if channels % channel_chunk == 0 else channels
    win, y_quant, x_quant = _window_quant(itemsize, cc, win)
    hps = [-(-max(h, win) // y_quant) * y_quant for h, _, _ in level_shapes]
    wps = [-(-max(w, win) // x_quant) * x_quant for _, w, _ in level_shapes]
    return _out_of_window_mask(rois, levels.astype(jnp.int32),
                               tuple(level_shapes), hps, wps, win, y_quant,
                               x_quant, pooled, sampling_ratio)


def _out_of_window_mask(rois, levels, level_shapes, hps_per_level,
                        wps_per_level, win: int, y_quant: int, x_quant: int,
                        pooled: int, s: int):
    """(B, N) bool: True where the windowed kernel would drop a
    nonzero-weight tap of this roi — the exact same origin/tap math as the
    kernel (`_window_interp_weights` drop criterion), on the raw rois."""
    b, n = rois.shape[:2]
    flat = rois.reshape(b * n, 4)
    lv = levels.reshape(b * n)
    hs = jnp.asarray([h for h, _, _ in level_shapes])[lv]
    ws = jnp.asarray([w for _, w, _ in level_shapes])[lv]
    hps = jnp.asarray(hps_per_level)[lv]
    wps = jnp.asarray(wps_per_level)[lv]
    scale = (1.0 / jnp.asarray([st for _, _, st in level_shapes],
                               jnp.float32))[lv]
    r = flat * scale[:, None]
    x1, y1 = r[:, 0], r[:, 1]
    roi_w = jnp.maximum(r[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(r[:, 3] - y1, 1.0)
    k = pooled * s
    idx = jnp.arange(k, dtype=jnp.float32)
    grid = jnp.floor(idx / s) + ((idx % s) + 0.5) / s
    ys = y1[:, None] + grid[None, :] * (roi_h / pooled)[:, None]
    xs = x1[:, None] + grid[None, :] * (roi_w / pooled)[:, None]
    y0 = jnp.clip(jnp.floor(y1).astype(jnp.int32) - 1, 0,
                  jnp.maximum(hps - win, 0))
    y0 = (y0 // y_quant) * y_quant
    x0 = jnp.clip(jnp.floor(x1).astype(jnp.int32) - 1, 0,
                  jnp.maximum(wps - win, 0))
    x0 = (x0 // x_quant) * x_quant

    def axis_bad(coords, size, origin):
        szf = size[:, None].astype(jnp.float32)
        inside = jnp.logical_and(coords >= -1.0, coords <= szf)
        c = jnp.clip(coords, 0.0, szf - 1.0)
        c0 = jnp.floor(c)
        frac = c - c0
        rel0 = c0.astype(jnp.int32) - origin[:, None]
        rel1 = (jnp.minimum(c0.astype(jnp.int32) + 1, size[:, None] - 1)
                - origin[:, None])
        bad = (rel0 < 0) | (rel0 > win - 1) | ((frac > 0) & (rel1 > win - 1))
        return jnp.logical_and(inside, bad).any(axis=1)

    oow = axis_bad(ys, hs, y0) | axis_bad(xs, ws, x0)
    return oow.reshape(b, n)


def _mxu_precision(*dtypes):
    """HIGHEST (full fp32 MXU passes) only when EVERY operand is fp32;
    DEFAULT otherwise — a bf16 operand is one exact native pass, and Mosaic
    rejects the fp32 contract-precision attribute on any matmul with a bf16
    side (pass both operand dtypes, not just one: a mixed f32xbf16 pair must
    also take DEFAULT)."""
    return (jax.lax.Precision.HIGHEST
            if all(d == jnp.float32 for d in dtypes)
            else jax.lax.Precision.DEFAULT)


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


# ---------------------------------------------------------------------------
# RoI-tiled kernel: R rois per grid step, level-sorted, channel-chunked.
#
# The per-roi kernel above feeds the MXU k=pooled*sampling_ratio (=14) rows
# per matmul -- ~11% of the systolic array. This variant makes three changes:
#   1. Bin-averaging is folded INTO the interpolation weights (averaging a
#      linear map == mapping with averaged weights), so each roi contributes
#      `pooled` (=7) rows instead of k=14 -- 4x fewer FLOPs in both passes
#      and no post-matmul reshuffle.
#   2. Rois are sorted by FPN level and packed R=8 same-level rois per grid
#      step (56 MXU rows; VMEM bounds R at Cc=128 -- the lane dim must be a
#      128-multiple for Mosaic's minor-dim reshape), batching both passes:
#        stage1: stacked Wy (R*p, H) @ F_chunk (H, W*Cc)   -- F shared
#        stage2: block-diag Wx (R*p, R*W) @ S^T (R*W, p*Cc) -- one matmul for
#                all R x-passes (structural zeros off the diagonal; still
#                far faster than R separate 7-row matmuls)
#   3. Channels are processed in Cc-wide chunks (grid dim 0, outer) so each
#      chunk of every pyramid level stays VMEM-resident across roi blocks.
# ---------------------------------------------------------------------------


def _make_tiled_kernel(level_shapes, cc: int, pooled: int, r_blk: int,
                       h_max: int, w_max: int):

    def kernel(blklv_smem, *refs):
        *feat_refs, wy_ref, wx_ref, out_ref = refs
        b = pl.program_id(1)
        lv = blklv_smem[b]

        rp = r_blk * pooled
        wy_blk = wy_ref[...]                                 # (R*p, Hmax)
        wx_blk = wx_ref[...]                                 # (R*p, Wmax)

        def level_branch(lvl):
            h, w, _ = level_shapes[lvl]
            ref = feat_refs[lvl]

            def body():
                feat = ref[0]                                # (H, W*Cc)
                stage1 = jnp.dot(wy_blk[:, :h], feat,
                                 preferred_element_type=jnp.float32)
                # (R*p, W*Cc) -> (R*W, p*Cc), one roi at a time (Mosaic
                # supports the 2D<->3D split + major-dim swap, with the
                # minor dim a 128-multiple; not the fused 4D reshape)
                rows = []
                for r in range(r_blk):
                    s_r = stage1[r * pooled:(r + 1) * pooled, :]
                    s_r = s_r.reshape(pooled, w, cc)
                    rows.append(jnp.swapaxes(s_r, 0, 1).reshape(w, pooled * cc))
                stage1_t = jnp.concatenate(rows)             # (R*W, p*Cc)

                # block-diagonal Wx: tile the dense (R*p, W) weights R times
                # along columns, mask to col//W == row//p
                wxs = wx_blk[:, :w]
                tiled = jnp.concatenate([wxs] * r_blk, axis=1)   # (R*p, R*W)
                qi = jax.lax.broadcasted_iota(jnp.int32, (rp, r_blk * w), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (rp, r_blk * w), 1)
                wx_bd = jnp.where(ci // w == qi // pooled, tiled, 0.0)
                return jnp.dot(wx_bd, stage1_t,
                               preferred_element_type=jnp.float32)

            return body

        # (R*p, p*Cc): rows r*p + x_bin, cols y_bin*Cc + channel
        out_ref[0] = jax.lax.switch(lv, [level_branch(l)
                                         for l in range(len(level_shapes))])

    return kernel


def _binned_interp_weights(coords, sizes, size_max: int, pooled: int, s: int):
    """Vectorized bin-averaged bilinear weight rows, built OUTSIDE the
    kernel (XLA): coords (NP, k) sample positions in level pixel space,
    sizes (NP,) per-roi level extent. -> (NP, pooled, size_max), zero
    beyond each roi's level extent."""
    k = pooled * s
    np_rois = coords.shape[0]
    sz = sizes[:, None].astype(jnp.float32)                     # (NP, 1)
    inside = jnp.logical_and(coords >= -1.0, coords <= sz)
    c = jnp.clip(coords, 0.0, sz - 1.0)
    c0 = jnp.floor(c)
    frac = c - c0
    c0i = c0.astype(jnp.int32)
    c1i = jnp.minimum(c0i + 1, sizes[:, None] - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (np_rois, k, size_max), 2)
    w = (jnp.where(cols == c0i[:, :, None], (1.0 - frac)[:, :, None], 0.0) +
         jnp.where(cols == c1i[:, :, None], frac[:, :, None], 0.0))
    w = jnp.where(inside[:, :, None], w, 0.0)                   # (NP, k, M)
    # fold the s-sample bin average into the weights (linear op)
    return w.reshape(np_rois, pooled, s, size_max).mean(axis=2)


@functools.partial(jax.jit, static_argnames=("level_shapes", "pooled",
                                             "sampling_ratio", "r_blk", "cc"))
def _pallas_roi_align_tiled(features_ch, padded_rois, slot_levels,
                            block_levels, level_shapes, pooled,
                            sampling_ratio, r_blk, cc):
    np_rois = padded_rois.shape[0]
    nblocks = np_rois // r_blk
    nc = features_ch[0].shape[0]
    s = sampling_ratio
    k = pooled * s
    h_max = max(h for h, _, _ in level_shapes)
    w_max = max(w for _, w, _ in level_shapes)

    # per-roi sample coordinates + bin-averaged weight rows, vectorized
    hs = jnp.asarray([h for h, _, _ in level_shapes])[slot_levels]
    ws = jnp.asarray([w for _, w, _ in level_shapes])[slot_levels]
    scale = (1.0 / jnp.asarray([st for _, _, st in level_shapes],
                               jnp.float32))[slot_levels]       # (NP,)
    r = padded_rois * scale[:, None]
    x1, y1 = r[:, 0], r[:, 1]
    roi_w = jnp.maximum(r[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(r[:, 3] - y1, 1.0)
    idx = jnp.arange(k, dtype=jnp.float32)
    grid = jnp.floor(idx / s) + ((idx % s) + 0.5) / s           # (k,)
    ys = y1[:, None] + grid[None, :] * (roi_h / pooled)[:, None]
    xs = x1[:, None] + grid[None, :] * (roi_w / pooled)[:, None]
    wy = _binned_interp_weights(ys, hs, h_max, pooled, s)       # (NP, p, Hm)
    wx = _binned_interp_weights(xs, ws, w_max, pooled, s)
    wy2 = wy.reshape(np_rois * pooled, h_max)
    wx2 = wx.reshape(np_rois * pooled, w_max)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                    # block levels
        grid=(nc, nblocks),                       # chunks outer, blocks inner
        in_specs=[
            pl.BlockSpec((1, h, w * cc), lambda c, b, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM)
            for (h, w, _) in level_shapes
        ] + [
            pl.BlockSpec((r_blk * pooled, h_max), lambda c, b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk * pooled, w_max), lambda c, b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        # (nc, NP*p, p*cc): block second-minor r_blk*p is 8-divisible
        # (r_blk=8), block minor equals the full array dim -- satisfying
        # the TPU (8, 128)-divisible-or-full block constraint
        out_specs=pl.BlockSpec((1, r_blk * pooled, pooled * cc),
                               lambda c, b, *_: (c, b, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = _make_tiled_kernel(level_shapes, cc, pooled, r_blk, h_max, w_max)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nc, np_rois * pooled, pooled * cc),
                                       jnp.float32),
    )(block_levels, *features_ch, wy2, wx2)
    # (nc, NP*p, p*cc) -> (NP, p_x, p_y, C)  (host-side XLA reshape, free of
    # Mosaic layout constraints)
    out = out.reshape(nc, np_rois, pooled, pooled, cc)
    out = jnp.transpose(out, (1, 2, 3, 0, 4))
    return out.reshape(np_rois, pooled, pooled, nc * cc)


def roi_align_pallas_tiled(features: List[jax.Array], rois: jax.Array,
                           levels: jax.Array, strides: Sequence[int],
                           pooled: int = 7, sampling_ratio: int = 2,
                           channel_chunk: int = 128, r_blk: int = 8) -> jax.Array:
    """Roi-tiled multi-level RoIAlign. Same API/semantics as
    `roi_align_pallas` / `multilevel_roi_align`:
    features [ (C, H_l, W_l) ], rois (N, 4), levels (N,)
    -> (N, C, pooled, pooled)."""
    n = rois.shape[0]
    c = int(features[0].shape[0])
    num_levels = len(features)
    cc = channel_chunk if c % channel_chunk == 0 else c
    nc = c // cc

    level_shapes = tuple(
        (int(f.shape[1]), int(f.shape[2]), float(stride))
        for f, stride in zip(features, strides))
    # (C, H, W) -> (nc, H, W*Cc), channel-minor within a chunk
    features_ch = [
        jnp.moveaxis(f, 0, -1).reshape(f.shape[1], f.shape[2], nc, cc)
           .transpose(2, 0, 1, 3).reshape(nc, f.shape[1], f.shape[2] * cc)
        for f in features
    ]

    levels = levels.astype(jnp.int32)
    nblocks = -(-n // r_blk) + num_levels     # worst-case per-level padding
    np_rois = nblocks * r_blk

    # sort rois by level and scatter into per-level R-aligned slots
    perm = jnp.argsort(levels)                             # stable
    sorted_rois = rois.astype(jnp.float32)[perm]
    sorted_lv = levels[perm]
    counts = jnp.bincount(levels, length=num_levels)
    padded_counts = -(-counts // r_blk) * r_blk
    pad_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(padded_counts)[:-1].astype(jnp.int32)])
    level_start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    rank = jnp.arange(n, dtype=jnp.int32) - level_start[sorted_lv]
    dst = pad_off[sorted_lv] + rank                        # (N,) slot index

    padded_rois = jnp.zeros((np_rois, 4), jnp.float32).at[dst].set(sorted_rois)
    slot_lv = jnp.zeros((np_rois,), jnp.int32).at[dst].set(sorted_lv)
    slot_lv_min1 = jnp.full((np_rois,), -1, jnp.int32).at[dst].set(sorted_lv)
    block_levels = jnp.maximum(
        slot_lv_min1.reshape(nblocks, r_blk).max(axis=1), 0)

    out_p = _pallas_roi_align_tiled(features_ch, padded_rois, slot_lv,
                                    block_levels, level_shapes, pooled,
                                    sampling_ratio, r_blk, cc)  # (NP, p, p, C)
    # slot of ORIGINAL roi j, then one gather back to input order
    dst_of_orig = jnp.zeros((n,), jnp.int32).at[perm].set(dst)
    out = out_p[dst_of_orig]                                 # (N, p_x, p_y, C)
    return jnp.transpose(out, (0, 3, 2, 1))                  # (N, C, p_y, p_x)


# ---------------------------------------------------------------------------
# Batched tiled kernel: the whole detector batch in ONE pallas launch.
#
# Per-step overhead (~7us: semaphores + block bookkeeping) dominates the
# per-image kernel, so a (B, nc, nblocks) grid amortizes it across the whole
# frame batch instead of vmapping B separate launches. Per-image roi->slot
# packing is vmapped XLA; the kernel body is identical.
# ---------------------------------------------------------------------------


def _pack_rois_by_level(rois, levels, num_levels: int, r_blk: int,
                        np_rois: int):
    """Per-image roi packing: sort by level, scatter into r_blk-aligned
    per-level slots. -> (padded_rois (NP,4), slot_lv (NP,), block_levels
    (NP/r_blk,), dst_of_orig (N,))."""
    n = rois.shape[0]
    nblocks = np_rois // r_blk
    perm = jnp.argsort(levels)
    sorted_rois = rois.astype(jnp.float32)[perm]
    sorted_lv = levels[perm]
    counts = jnp.bincount(levels, length=num_levels)
    padded_counts = -(-counts // r_blk) * r_blk
    pad_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(padded_counts)[:-1].astype(jnp.int32)])
    level_start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    rank = jnp.arange(n, dtype=jnp.int32) - level_start[sorted_lv]
    dst = pad_off[sorted_lv] + rank
    padded_rois = jnp.zeros((np_rois, 4), jnp.float32).at[dst].set(sorted_rois)
    slot_lv = jnp.zeros((np_rois,), jnp.int32).at[dst].set(sorted_lv)
    slot_lv_min1 = jnp.full((np_rois,), -1, jnp.int32).at[dst].set(sorted_lv)
    block_levels = jnp.maximum(
        slot_lv_min1.reshape(nblocks, r_blk).max(axis=1), 0)
    dst_of_orig = jnp.zeros((n,), jnp.int32).at[perm].set(dst)
    return padded_rois, slot_lv, block_levels, dst_of_orig


@functools.partial(jax.jit, static_argnames=("level_shapes", "pooled",
                                             "sampling_ratio", "r_blk", "cc"))
def _pallas_roi_align_tiled_batched(features_ch, padded_rois, slot_levels,
                                    block_levels, level_shapes, pooled,
                                    sampling_ratio, r_blk, cc):
    """features_ch: [ (B, nc, H, W*cc) ]; padded_rois (B, NP, 4);
    slot_levels (B, NP); block_levels (B*nblocks,).
    -> (B, NP, pooled, pooled, C)."""
    batch, np_rois = padded_rois.shape[:2]
    nblocks = np_rois // r_blk
    nc = features_ch[0].shape[1]
    s = sampling_ratio
    k = pooled * s
    h_max = max(h for h, _, _ in level_shapes)
    w_max = max(w for _, w, _ in level_shapes)

    flat_rois = padded_rois.reshape(batch * np_rois, 4)
    flat_lv = slot_levels.reshape(batch * np_rois)
    hs = jnp.asarray([h for h, _, _ in level_shapes])[flat_lv]
    ws = jnp.asarray([w for _, w, _ in level_shapes])[flat_lv]
    scale = (1.0 / jnp.asarray([st for _, _, st in level_shapes],
                               jnp.float32))[flat_lv]
    r = flat_rois * scale[:, None]
    x1, y1 = r[:, 0], r[:, 1]
    roi_w = jnp.maximum(r[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(r[:, 3] - y1, 1.0)
    idx = jnp.arange(k, dtype=jnp.float32)
    grid = jnp.floor(idx / s) + ((idx % s) + 0.5) / s
    ys = y1[:, None] + grid[None, :] * (roi_h / pooled)[:, None]
    xs = x1[:, None] + grid[None, :] * (roi_w / pooled)[:, None]
    wy = _binned_interp_weights(ys, hs, h_max, pooled, s)
    wx = _binned_interp_weights(xs, ws, w_max, pooled, s)
    # match the features' compute dtype (bf16 under mixed precision);
    # the kernel's dots accumulate in fp32 either way
    fdt = features_ch[0].dtype
    wy2 = wy.reshape(batch * np_rois * pooled, h_max).astype(fdt)
    wx2 = wx.reshape(batch * np_rois * pooled, w_max).astype(fdt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, nc, nblocks),
        in_specs=[
            pl.BlockSpec((1, 1, h, w * cc), lambda i, c, b, *_: (i, c, 0, 0),
                         memory_space=pltpu.VMEM)
            for (h, w, _) in level_shapes
        ] + [
            pl.BlockSpec((r_blk * pooled, h_max),
                         lambda i, c, b, *_, nb=nblocks: (i * nb + b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk * pooled, w_max),
                         lambda i, c, b, *_, nb=nblocks: (i * nb + b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r_blk * pooled, pooled * cc),
                               lambda i, c, b, *_, nb=nblocks:
                               (c, i * nb + b, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(blklv_smem, *refs):
        *feat_refs, wy_ref, wx_ref, out_ref = refs
        i = pl.program_id(0)
        b = pl.program_id(2)
        lv = blklv_smem[i * nblocks + b]
        rp = r_blk * pooled
        wy_blk = wy_ref[...]
        wx_blk = wx_ref[...]

        def level_branch(lvl):
            h, w, _ = level_shapes[lvl]
            ref = feat_refs[lvl]

            def body():
                feat = ref[0, 0]
                # HIGHEST: full fp32 MXU passes -- keeps the kernel within
                # float tolerance of the exact gather path (near-threshold
                # NMS decisions downstream are sensitive to pass truncation).
                # bf16 operands are one exact MXU pass natively, and Mosaic
                # refuses bf16 matmuls at fp32 contract precision -- HIGHEST
                # only for fp32 inputs.
                stage1 = jnp.dot(wy_blk[:, :h], feat,
                                 preferred_element_type=jnp.float32,
                                 precision=_mxu_precision(wy_blk.dtype, feat.dtype))
                # transpose + second pass in the compute dtype (fp32 or bf16)
                stage1 = stage1.astype(wy_blk.dtype)
                rows = []
                for rr in range(r_blk):
                    s_r = stage1[rr * pooled:(rr + 1) * pooled, :]
                    s_r = s_r.reshape(pooled, w, cc)
                    rows.append(jnp.swapaxes(s_r, 0, 1).reshape(w, pooled * cc))
                stage1_t = jnp.concatenate(rows)
                wxs = wx_blk[:, :w]
                tiled = jnp.concatenate([wxs] * r_blk, axis=1)
                qi = jax.lax.broadcasted_iota(jnp.int32, (rp, r_blk * w), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (rp, r_blk * w), 1)
                wx_bd = jnp.where(ci // w == qi // pooled, tiled, 0.0)
                return jnp.dot(wx_bd, stage1_t,
                               preferred_element_type=jnp.float32,
                               precision=_mxu_precision(wx_bd.dtype, stage1_t.dtype))

            return body

        out_ref[0] = jax.lax.switch(lv, [level_branch(l)
                                         for l in range(len(level_shapes))])

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (nc, batch * np_rois * pooled, pooled * cc), jnp.float32),
    )(block_levels, *features_ch, wy2, wx2)
    out = out.reshape(nc, batch, np_rois, pooled, pooled, cc)
    out = jnp.transpose(out, (1, 2, 3, 4, 0, 5))
    return out.reshape(batch, np_rois, pooled, pooled, nc * cc)


def roi_align_pallas_batched(features: List[jax.Array], rois: jax.Array,
                             levels: jax.Array, strides: Sequence[int],
                             pooled: int = 7, sampling_ratio: int = 2,
                             channel_chunk: int = 128,
                             r_blk: int = 8, layout: str = "nchw") -> jax.Array:
    """Whole-batch roi-tiled RoIAlign.
    features: [ (B, C, H_l, W_l) ] (layout="nchw") or [ (B, H_l, W_l, C) ]
    (layout="nhwc" -- the backbone's native layout, one fewer relayout);
    rois (B, N, 4); levels (B, N).
    -> (B, N, C, pooled, pooled), matching vmap(multilevel_roi_align)."""
    batch, n = rois.shape[:2]
    c = int(features[0].shape[1] if layout == "nchw" else features[0].shape[3])
    num_levels = len(features)
    cc = channel_chunk if c % channel_chunk == 0 else c
    nc = c // cc

    if layout == "nchw":
        level_shapes = tuple(
            (int(f.shape[2]), int(f.shape[3]), float(stride))
            for f, stride in zip(features, strides))
        features = [jnp.moveaxis(f, 1, -1) for f in features]
    else:
        level_shapes = tuple(
            (int(f.shape[1]), int(f.shape[2]), float(stride))
            for f, stride in zip(features, strides))
    # (B, H, W, C) -> (B, nc, H, W*cc)
    features_ch = [
        f.reshape(f.shape[0], f.shape[1], f.shape[2], nc, cc)
         .transpose(0, 3, 1, 2, 4)
         .reshape(f.shape[0], nc, f.shape[1], f.shape[2] * cc)
        for f in features
    ]

    levels = levels.astype(jnp.int32)
    nblocks = -(-n // r_blk) + num_levels
    np_rois = nblocks * r_blk

    pack = jax.vmap(functools.partial(
        _pack_rois_by_level, num_levels=num_levels, r_blk=r_blk,
        np_rois=np_rois))
    padded_rois, slot_lv, block_levels, dst_of_orig = pack(rois, levels)

    # custom-VJP wrapper: differentiable wrt features (rois/levels are
    # stop_gradient'ed by callers), so the training step can use this path
    out_p = _tiled_batched_diff(
        features_ch, jax.lax.stop_gradient(padded_rois),
        jax.lax.stop_gradient(slot_lv),
        jax.lax.stop_gradient(block_levels.reshape(-1)),
        level_shapes, pooled, sampling_ratio, r_blk, cc)
    out = jnp.take_along_axis(
        out_p, dst_of_orig[:, :, None, None, None], axis=1)  # (B,N,p,p,C)
    return jnp.transpose(out, (0, 1, 4, 3, 2))               # (B,N,C,p_y,p_x)


# ---------------------------------------------------------------------------
# Custom VJP: feature gradients through the batched tiled kernel, enabling
# pallas RoIAlign in the detector TRAINING step (proposals are
# stop_gradient'ed there, so only dFeatures is needed). The backward is the
# forward transposed:
#     d stage1_t = Wx_bd^T @ dOut ;  dF += Wy_blk^T @ untranspose(d stage1_t)
# with dF accumulated across the roi blocks of each (image, chunk) in VMEM
# (output blocks are zeroed at b==0 and revisited while b sweeps).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("level_shapes", "pooled",
                                             "sampling_ratio", "r_blk", "cc",
                                             "fdt"))
def _pallas_roi_align_tiled_batched_bwd(dout_packed, padded_rois, slot_levels,
                                        block_levels, level_shapes, pooled,
                                        sampling_ratio, r_blk, cc, fdt):
    """dout_packed (nc, B*NP*p, p*cc) -> [ dF (B, nc, H_l, W_l*cc) ]."""
    nc = dout_packed.shape[0]
    batch, np_rois = padded_rois.shape[:2]
    nblocks = np_rois // r_blk
    s = sampling_ratio
    k = pooled * s
    h_max = max(h for h, _, _ in level_shapes)
    w_max = max(w for _, w, _ in level_shapes)

    flat_rois = padded_rois.reshape(batch * np_rois, 4)
    flat_lv = slot_levels.reshape(batch * np_rois)
    hs = jnp.asarray([h for h, _, _ in level_shapes])[flat_lv]
    ws = jnp.asarray([w for _, w, _ in level_shapes])[flat_lv]
    scale = (1.0 / jnp.asarray([st for _, _, st in level_shapes],
                               jnp.float32))[flat_lv]
    r = flat_rois * scale[:, None]
    x1, y1 = r[:, 0], r[:, 1]
    roi_w = jnp.maximum(r[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(r[:, 3] - y1, 1.0)
    idx = jnp.arange(k, dtype=jnp.float32)
    grid = jnp.floor(idx / s) + ((idx % s) + 0.5) / s
    ys = y1[:, None] + grid[None, :] * (roi_h / pooled)[:, None]
    xs = x1[:, None] + grid[None, :] * (roi_w / pooled)[:, None]
    wy2 = _binned_interp_weights(ys, hs, h_max, pooled, s).reshape(
        batch * np_rois * pooled, h_max).astype(jnp.dtype(fdt))
    wx2 = _binned_interp_weights(xs, ws, w_max, pooled, s).reshape(
        batch * np_rois * pooled, w_max).astype(jnp.dtype(fdt))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, nc, nblocks),
        in_specs=[
            pl.BlockSpec((r_blk * pooled, h_max),
                         lambda i, c, b, *_, nb=nblocks: (i * nb + b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk * pooled, w_max),
                         lambda i, c, b, *_, nb=nblocks: (i * nb + b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_blk * pooled, pooled * cc),
                         lambda i, c, b, *_, nb=nblocks: (c, i * nb + b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, h, w * cc), lambda i, c, b, *_: (i, c, 0, 0),
                         memory_space=pltpu.VMEM)
            for (h, w, _) in level_shapes
        ],
    )

    def kernel(blklv_smem, wy_ref, wx_ref, dout_ref, *dfeat_refs):
        i = pl.program_id(0)
        b = pl.program_id(2)
        lv = blklv_smem[i * nblocks + b]
        rp = r_blk * pooled

        @pl.when(b == 0)
        def _zero():
            for ref, (h, w, _) in zip(dfeat_refs, level_shapes):
                ref[...] = jnp.zeros((1, 1, h, w * cc), jnp.float32)

        wy_blk = wy_ref[...]
        wx_blk = wx_ref[...]
        dout_blk = dout_ref[0]                               # (rp, p*cc)

        def level_branch(lvl):
            h, w, _ = level_shapes[lvl]
            ref = dfeat_refs[lvl]

            def body():
                wxs = wx_blk[:, :w]
                tiled = jnp.concatenate([wxs] * r_blk, axis=1)
                qi = jax.lax.broadcasted_iota(jnp.int32, (rp, r_blk * w), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (rp, r_blk * w), 1)
                wx_bd = jnp.where(ci // w == qi // pooled, tiled, 0.0)
                # d stage1_t (R*W, p*cc) = Wx_bd^T @ dOut
                dst1_t = jnp.dot(wx_bd.T, dout_blk,
                                 preferred_element_type=jnp.float32,
                                 precision=_mxu_precision(wx_bd.dtype, dout_blk.dtype))
                dst1_t = dst1_t.astype(wy_blk.dtype)
                # untranspose: rows r*W.. (w, p*cc) -> (p, w*cc)
                rows = []
                for rr in range(r_blk):
                    d_r = dst1_t[rr * w:(rr + 1) * w, :]
                    d_r = d_r.reshape(w, pooled, cc)
                    rows.append(jnp.swapaxes(d_r, 0, 1).reshape(
                        pooled, w * cc))
                dstage1 = jnp.concatenate(rows)              # (rp, W*cc)
                contrib = jnp.dot(wy_blk[:, :h].T, dstage1,
                                  preferred_element_type=jnp.float32,
                                  precision=_mxu_precision(wy_blk.dtype, dstage1.dtype))
                ref[0, 0] += contrib                         # (H, W*cc)

            return body

        jax.lax.switch(lv, [level_branch(l)
                            for l in range(len(level_shapes))])

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, nc, h, w * cc), jnp.float32)
            for (h, w, _) in level_shapes
        ],
    )(block_levels, wy2, wx2, dout_packed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _tiled_batched_diff(features_ch, padded_rois, slot_lv, block_levels,
                        level_shapes, pooled, sampling_ratio, r_blk, cc):
    return _pallas_roi_align_tiled_batched(
        tuple(features_ch), padded_rois, slot_lv, block_levels, level_shapes,
        pooled, sampling_ratio, r_blk, cc)


def _tiled_batched_diff_fwd(features_ch, padded_rois, slot_lv, block_levels,
                            level_shapes, pooled, sampling_ratio, r_blk, cc):
    out = _tiled_batched_diff(features_ch, padded_rois, slot_lv, block_levels,
                              level_shapes, pooled, sampling_ratio, r_blk, cc)
    # zero-size marker array carries the features' dtype into the backward
    dtype_marker = jnp.zeros((0,), features_ch[0].dtype)
    return out, (padded_rois, slot_lv, block_levels, dtype_marker)


def _tiled_batched_diff_bwd(level_shapes, pooled, sampling_ratio, r_blk, cc,
                            residuals, g):
    padded_rois, slot_lv, block_levels, dtype_marker = residuals
    fdt = dtype_marker.dtype
    batch, np_rois = padded_rois.shape[:2]
    nc = g.shape[-1] // cc
    # (B, NP, p, p, C) -> (nc, B*NP*p, p*cc): inverse of the fwd unpack
    gp = g.reshape(batch, np_rois, pooled, pooled, nc, cc)
    gp = jnp.transpose(gp, (4, 0, 1, 2, 3, 5))
    gp = gp.reshape(nc, batch * np_rois * pooled, pooled * cc)
    dfeats = _pallas_roi_align_tiled_batched_bwd(
        gp, padded_rois, slot_lv, block_levels, level_shapes, pooled,
        sampling_ratio, r_blk, cc, str(jnp.dtype(fdt)))
    dfeats = [df.astype(fdt) for df in dfeats]
    return (dfeats, None, None, None)


_tiled_batched_diff.defvjp(_tiled_batched_diff_fwd, _tiled_batched_diff_bwd)


# ---------------------------------------------------------------------------
# Windowed-DMA kernel: RoIAlign for pyramids too large for VMEM residency
# (the reference's 800px COCO recipe -- SURVEY §2.14; at min_size=800 the
# P2 level alone is ~28 MB/chunk, far over the ~16 MB VMEM).
#
# Key observation: an FPN-assigned roi only ever samples a small window of
# its level (torchvision's canonical assignment puts sqrt-area in
# [stride*28, stride*56), i.e. a <=30-row/col span at that level, + P5
# spans up to ~44 at 1333px). So instead of keeping levels resident, each
# roi DMAs its own (win, win) feature window HBM->VMEM, double-buffered
# across the rois of a block, and runs the same separable two-matmul
# interpolation as the resident kernels:
#
#     out_r = Wx_r @ T( Wy_r @ F[y0:y0+win, x0:x0+win] )
#
# with the (p, win) weight rows built OUTSIDE the kernel relative to each
# roi's window origin. Levels are zero-padded up to (win, win) so the DMA
# shape is static. Bandwidth = rois * win^2 * C, independent of image size.
#
# Approximation note: a roi whose level-space span exceeds win-2 px (only
# possible for aspect ratios ~>5:1 under the canonical assignment) has its
# out-of-window taps dropped (weights are zero there). The resident kernels
# and the gather path have no such limit -- auto dispatch uses this kernel
# only when the pyramid cannot be VMEM-resident.
# ---------------------------------------------------------------------------


def _window_interp_weights(coords, sizes, origins, win: int, pooled: int,
                           s: int):
    """Window-relative bin-averaged bilinear rows: coords (NP, k) absolute
    level positions, sizes (NP,) level extent, origins (NP,) window start.
    -> (NP, pooled, win). Taps landing outside [origin, origin+win) drop."""
    np_rois = coords.shape[0]
    k = pooled * s
    sz = sizes[:, None].astype(jnp.float32)
    inside = jnp.logical_and(coords >= -1.0, coords <= sz)
    c = jnp.clip(coords, 0.0, sz - 1.0)
    c0 = jnp.floor(c)
    frac = c - c0
    c0i = c0.astype(jnp.int32) - origins[:, None]
    c1i = jnp.minimum(c0.astype(jnp.int32) + 1, sizes[:, None] - 1) - origins[:, None]
    cols = jax.lax.broadcasted_iota(jnp.int32, (np_rois, k, win), 2)
    w = (jnp.where(cols == c0i[:, :, None], (1.0 - frac)[:, :, None], 0.0) +
         jnp.where(cols == c1i[:, :, None], frac[:, :, None], 0.0))
    w = jnp.where(inside[:, :, None], w, 0.0)
    return w.reshape(np_rois, pooled, s, win).mean(axis=2)


def _make_windowed_kernel(num_levels: int, cc: int, pooled: int, r_blk: int,
                          win: int, y_quant: int):
    def kernel(img_smem, lv_smem, y0_smem, x0_smem, *refs):
        # roi info arrives as four 1-D scalar-prefetch arrays: a single
        # (NP, 4) SMEM table would be lane-padded to (NP, 128) and overflow
        # the 1 MB SMEM at detection scale (2,944 rois -> 1.5 MB)
        feat_refs = refs[:num_levels]
        wy_ref, wx_ref, out_ref, buf, sems = refs[num_levels:]
        c = pl.program_id(0)
        b = pl.program_id(1)
        base = b * r_blk

        def transfer(r, slot):
            """(Re)create the async copy handle for roi slot r."""
            img = img_smem[base + r]
            lv = lv_smem[base + r]
            # dynamic offsets into the tiled (sublane, lane) dims of an HBM
            # memref must be tile-aligned for Mosaic to lower the DMA slice
            # (v5e f32 tile (8, 128)); the host aligns the window origins
            # and the multiple_of hints make that visible to the compiler
            y0 = pl.multiple_of(y0_smem[base + r], y_quant)
            x0c = pl.multiple_of(x0_smem[base + r] * cc, 128)
            copies = [
                pltpu.make_async_copy(
                    ref.at[img, c, pl.ds(y0, win), pl.ds(x0c, win * cc)],
                    buf.at[slot], sems.at[slot])
                for ref in feat_refs
            ]
            return lv, copies

        def start(r, slot):
            lv, copies = transfer(r, slot)
            for lvl, copy in enumerate(copies):
                @pl.when(lv == lvl)
                def _():
                    copy.start()

        def wait(r, slot):
            lv, copies = transfer(r, slot)
            for lvl, copy in enumerate(copies):
                @pl.when(lv == lvl)
                def _():
                    copy.wait()

        start(0, 0)
        for r in range(r_blk):
            if r + 1 < r_blk:
                start(r + 1, (r + 1) % 2)
            wait(r, r % 2)
            feat = buf[r % 2]                                 # (win, win*cc)
            wy_r = wy_ref[r * pooled:(r + 1) * pooled, :]     # (p, win)
            wx_r = wx_ref[r * pooled:(r + 1) * pooled, :]
            # HIGHEST: full fp32 MXU passes, matching the resident kernel;
            # the windowed path is DMA-bound so the extra passes are free
            s1 = jnp.dot(wy_r, feat, preferred_element_type=jnp.float32,
                         precision=_mxu_precision(wy_r.dtype, feat.dtype))
            s1 = s1.reshape(pooled, win, cc)
            s1t = jnp.swapaxes(s1, 0, 1).reshape(win, pooled * cc)
            out_ref[0, r * pooled:(r + 1) * pooled, :] = jnp.dot(
                wx_r.astype(jnp.float32), s1t,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_levels", "pooled", "cc",
                                             "r_blk", "win", "y_quant"))
def _pallas_roi_align_windowed(features_ch, info, wy2, wx2, num_levels,
                               pooled, cc, r_blk, win, y_quant):
    """features_ch: [ (B, nc, Hp_l, Wp_l*cc) ] (padded to >= win);
    info (NPtot, 4) int32 [img, level, y0, x0]; wy2/wx2 (NPtot*p, win).
    -> (nc, NPtot*p, p*cc)."""
    np_tot = info.shape[0]
    nblocks = np_tot // r_blk
    nc = features_ch[0].shape[1]
    fdt = features_ch[0].dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,                     # img, level, y0, x0
        grid=(nc, nblocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY)      # stays in HBM; manual DMA
            for _ in range(num_levels)
        ] + [
            pl.BlockSpec((r_blk * pooled, win), lambda c, b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk * pooled, win), lambda c, b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r_blk * pooled, pooled * cc),
                               lambda c, b, *_: (c, b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, win, win * cc), fdt),   # double-buffered windows
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = _make_windowed_kernel(num_levels, cc, pooled, r_blk, win, y_quant)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nc, np_tot * pooled, pooled * cc),
                                       jnp.float32),
    )(info[:, 0], info[:, 1], info[:, 2], info[:, 3],
      *features_ch, wy2.astype(fdt), wx2.astype(fdt))


def roi_align_pallas_windowed(features: List[jax.Array], rois: jax.Array,
                              levels: jax.Array, strides: Sequence[int],
                              pooled: int = 7, sampling_ratio: int = 2,
                              channel_chunk: int = 128, r_blk: int = 16,
                              win: int = 48, layout: str = "nchw") -> jax.Array:
    """Whole-batch windowed-DMA RoIAlign for arbitrarily large pyramids.
    Same API/semantics as `roi_align_pallas_batched` (see the
    approximation note above for >~5:1 aspect rois).
    features: [ (B, C, H_l, W_l) ] or [ (B, H_l, W_l, C) ] (layout="nhwc");
    rois (B, N, 4); levels (B, N) -> (B, N, C, pooled, pooled)."""
    batch, n = rois.shape[:2]
    c = int(features[0].shape[1] if layout == "nchw" else features[0].shape[3])
    num_levels = len(features)
    cc = channel_chunk if c % channel_chunk == 0 else c
    nc = c // cc
    s = sampling_ratio
    k = pooled * s

    if layout == "nchw":
        level_shapes = tuple(
            (int(f.shape[2]), int(f.shape[3]), float(stride))
            for f, stride in zip(features, strides))
        features = [jnp.moveaxis(f, 1, -1) for f in features]
    else:
        level_shapes = tuple(
            (int(f.shape[1]), int(f.shape[2]), float(stride))
            for f, stride in zip(features, strides))
    # (B, H, W, C) -> (B, nc, Hp, Wp*cc), zero-padded up to the window size
    # and to the v5e f32 tile grid: Hp a multiple of 8 (sublane) and Wp*cc a
    # multiple of 128 (lane), so the in-kernel DMA slices are tile-aligned
    # (Mosaic cannot lower dynamic slices of tiled HBM dims otherwise)
    # widen the window by the alignment margin (origin flooring moves the
    # window back by < one quantum) and round to a multiple of BOTH quanta
    # (powers of two, so lcm == max), so the tile-aligned window covers
    # every tap the requested one would have. Rounding to y_quant alone is
    # not enough: at the right level edge the clip bound is wps - win, and
    # if win is not an x_quant multiple that bound falls off the x grid —
    # flooring then shifts the window left past the rightmost taps.
    # (`_window_quant` is shared with `windowed_out_of_contract_mask` so the
    # post-hoc contract measurement can never drift from the kernel.)
    win, y_quant, x_quant = _window_quant(features[0].dtype.itemsize, cc, win)
    def _pad_h(h):
        return -(-max(h, win) // y_quant) * y_quant
    def _pad_w(w):
        return -(-max(w, win) // x_quant) * x_quant
    features_ch = []
    for f in features:
        hp = _pad_h(int(f.shape[1]))
        wp = _pad_w(int(f.shape[2]))
        f = jnp.pad(f, ((0, 0), (0, hp - f.shape[1]), (0, wp - f.shape[2]),
                        (0, 0)))
        features_ch.append(
            f.reshape(batch, hp, wp, nc, cc).transpose(0, 3, 1, 2, 4)
             .reshape(batch, nc, hp, wp * cc))

    levels = levels.astype(jnp.int32)
    if _contract_stats_active():
        oow = _out_of_window_mask(
            rois, levels, level_shapes,
            [_pad_h(h) for h, _, _ in level_shapes],
            [_pad_w(w) for _, w, _ in level_shapes],
            win, y_quant, x_quant, pooled, s)
        jax.debug.callback(_accumulate_contract_stats, oow.sum(), oow.size)
    nblocks = -(-n // r_blk) + num_levels
    np_rois = nblocks * r_blk

    pack = jax.vmap(functools.partial(
        _pack_rois_by_level, num_levels=num_levels, r_blk=r_blk,
        np_rois=np_rois))
    padded_rois, slot_lv, _block_levels, dst_of_orig = pack(rois, levels)

    flat_rois = padded_rois.reshape(batch * np_rois, 4)
    flat_lv = slot_lv.reshape(batch * np_rois)
    hs = jnp.asarray([h for h, _, _ in level_shapes])[flat_lv]
    ws = jnp.asarray([w for _, w, _ in level_shapes])[flat_lv]
    hps = jnp.asarray([_pad_h(h) for h, _, _ in level_shapes])[flat_lv]
    wps = jnp.asarray([_pad_w(w) for _, w, _ in level_shapes])[flat_lv]
    scale = (1.0 / jnp.asarray([st for _, _, st in level_shapes],
                               jnp.float32))[flat_lv]
    r = flat_rois * scale[:, None]
    x1, y1 = r[:, 0], r[:, 1]
    roi_w = jnp.maximum(r[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(r[:, 3] - y1, 1.0)
    idx = jnp.arange(k, dtype=jnp.float32)
    grid = jnp.floor(idx / s) + ((idx % s) + 0.5) / s
    ys = y1[:, None] + grid[None, :] * (roi_h / pooled)[:, None]
    xs = x1[:, None] + grid[None, :] * (roi_w / pooled)[:, None]

    # window origins: start one tap before the first sample, clamped so the
    # static-shape window stays inside the (padded) level, then floored to
    # the DMA alignment grid (y: sublane 8; x: so that x0*cc is lane-aligned
    # — a no-op when cc is a multiple of 128). Alignment can shave up to
    # 7 rows / (x_quant-1) cols off the window's far margin; weights are
    # window-relative so results stay exact for taps inside the window.
    y0 = jnp.clip(jnp.floor(y1).astype(jnp.int32) - 1, 0,
                  jnp.maximum(hps - win, 0))
    y0 = (y0 // y_quant) * y_quant
    x0 = jnp.clip(jnp.floor(x1).astype(jnp.int32) - 1, 0,
                  jnp.maximum(wps - win, 0))
    x0 = (x0 // x_quant) * x_quant

    wy = _window_interp_weights(ys, hs, y0, win, pooled, s)
    wx = _window_interp_weights(xs, ws, x0, win, pooled, s)
    wy2 = wy.reshape(batch * np_rois * pooled, win)
    wx2 = wx.reshape(batch * np_rois * pooled, win)

    img = jnp.repeat(jnp.arange(batch, dtype=jnp.int32), np_rois)
    info = jnp.stack([img, flat_lv, y0, x0], axis=-1)

    out = _pallas_roi_align_windowed(
        features_ch, jax.lax.stop_gradient(info),
        jax.lax.stop_gradient(wy2), jax.lax.stop_gradient(wx2),
        num_levels, pooled, cc, r_blk, win, y_quant)

    # (nc, B*NP*p, p*cc) -> (B, NP, p_x, p_y, C), then unpack roi slots
    out = out.reshape(nc, batch, np_rois, pooled, pooled, cc)
    out = jnp.transpose(out, (1, 2, 3, 4, 0, 5))
    out = out.reshape(batch, np_rois, pooled, pooled, nc * cc)
    out = jnp.take_along_axis(
        out, dst_of_orig[:, :, None, None, None], axis=1)
    return jnp.transpose(out, (0, 1, 4, 3, 2))


# ---------------------------------------------------------------------------
# Trainable windowed RoIAlign: windowed-DMA forward + exact gather-transpose
# backward. RoIAlign is LINEAR in the feature maps (the interpolation
# weights depend only on rois/levels), so the exact d_features is the
# transpose of the sampling map — computed as the VJP of the XLA gather
# formulation (`ops/roi_align.multilevel_roi_align`), independent of the
# forward kernel's internals. This gives the 800px COCO-recipe TRAINING
# path the fast forward; the backward is the same scatter-add the pure
# gather path's autodiff produces.
#
# Caveat: for the rare out-of-window-contract rois (>~5:1 aspect — see the
# windowed kernel's note) the forward drops out-of-window taps while the
# backward includes them, so fwd/bwd are inconsistent for those rois only.
# In-contract rois (all of them under the canonical FPN assignment at
# detection aspect ratios) get exact forward AND exact gradient.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _windowed_diff(features, rois, levels, strides, pooled, sampling_ratio,
                   channel_chunk, r_blk, win, layout, feat_meta):
    return roi_align_pallas_windowed(list(features), rois, levels, strides,
                                     pooled, sampling_ratio, channel_chunk,
                                     r_blk, win, layout)


def _windowed_diff_fwd(features, rois, levels, strides, pooled,
                       sampling_ratio, channel_chunk, r_blk, win, layout,
                       feat_meta):
    out = _windowed_diff(features, rois, levels, strides, pooled,
                         sampling_ratio, channel_chunk, r_blk, win, layout,
                         feat_meta)
    return out, (rois, levels)


def _windowed_diff_bwd(strides, pooled, sampling_ratio, channel_chunk, r_blk,
                       win, layout, feat_meta, residuals, g):
    from objectpermanence_tpu.ops.roi_align import multilevel_roi_align
    rois, levels = residuals

    def lin(feats):
        if layout == "nhwc":
            feats = tuple(jnp.moveaxis(f, -1, 1) for f in feats)
        return jax.vmap(lambda fl, r, l: multilevel_roi_align(
            list(fl), r, l, strides, pooled, sampling_ratio))(
            feats, rois, levels)

    zeros = tuple(jnp.zeros(shape, dtype) for shape, dtype in feat_meta)
    primal, vjp = jax.vjp(lin, zeros)
    # cast the cotangent to the gather formulation's OUTPUT dtype, not the
    # feature dtype: under bf16 compute the gather path upcasts (fp32
    # interpolation weights), so its vjp expects an fp32 cotangent even for
    # bf16 features (d_features still comes back in the feature dtype)
    (dfeats,) = vjp(g.astype(primal.dtype))
    return (dfeats, None, None)


_windowed_diff.defvjp(_windowed_diff_fwd, _windowed_diff_bwd)


def roi_align_windowed_trainable(features: List[jax.Array], rois: jax.Array,
                                 levels: jax.Array, strides: Sequence[int],
                                 pooled: int = 7, sampling_ratio: int = 2,
                                 channel_chunk: int = 128, r_blk: int = 16,
                                 win: int = 48,
                                 layout: str = "nchw") -> jax.Array:
    """`roi_align_pallas_windowed` with a custom VJP (see the note above):
    fast windowed-DMA forward, exact gather-transpose backward."""
    feat_meta = tuple((tuple(int(d) for d in f.shape), jnp.dtype(f.dtype).name)
                      for f in features)
    return _windowed_diff(tuple(features), rois, levels, tuple(strides),
                          pooled, sampling_ratio, channel_chunk, r_blk, win,
                          layout, feat_meta)
