"""Pallas TPU kernels for the 300-step recurrences — the hot compute path.

Two kernels:

1. `lstm_scan_pallas` — drop-in replacement for `ops.lstm.lstm_apply`'s
   recurrence: input projections are one bulk MXU matmul (XLA), the
   recurrence runs as a Pallas grid over (batch tiles, time) with the
   (h, c) carry and `w_hh` resident in VMEM for the whole sequence — no
   per-step HBM round trips for the carry or weights.

2. `opnet_fused_forward` — the WHOLE OPNet forward (reference
   `learned_models.py:18-52`; both LSTMs + who-to-attend softmax + soft box
   selection + box head) as ONE kernel over time. Intermediates
   (attention hidden states, probs, selected boxes) never touch HBM; per
   step the kernel reads one time-slice of the precomputed attention input
   projection + the raw boxes, and writes 4 box coords (+15 logits).

Grid iteration on TPU is sequential with the last grid axis fastest, so
scratch carries persist across the time axis within each batch tile and are
re-zeroed at t == 0.

Used for inference (`infer/reasoning.py` picks it on TPU backends); training
uses the XLA `lax.scan` path, which JAX differentiates. Numerics match the
XLA path to float tolerance (see tests/test_pallas_scan.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 256

# v5e-tuned (block_b, time_chunk) for the fused OPNet kernel at the reference
# dims (att 256 / video 512 hidden), keyed by compute dtype. From the on-chip
# sweep (scripts/profile_opnet_fused.py, 2026-08-18): f32 (128, 5) 27.1 Mfps
# with BIT-EXACT output vs the old (256, 1)'s 26.5; bf16 (128, 10) 30.3 Mfps.
# Fatter blocks ((256, >=5) f32, (512, *), (128, 25) bf16) exceed the ~16 MB
# scoped-VMEM limit: the chunked xproj1 stream is time_chunk*block_b*4*H1*
# itemsize, double-buffered.
TUNED_OPNET_BLOCKS = {
    jnp.dtype(jnp.float32): (128, 5),
    jnp.dtype(jnp.bfloat16): (128, 10),
}


def _clamp_time_chunk(time_chunk: int, seq_len: int) -> int:
    """Largest divisor of seq_len that is <= the requested chunk."""
    time_chunk = max(1, min(time_chunk, seq_len))
    while seq_len % time_chunk:
        time_chunk -= 1
    return time_chunk


def _sigmoid(x):
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# Fused single-layer LSTM recurrence
# ---------------------------------------------------------------------------

def _lstm_kernel(xproj_ref, w_hh_ref, out_ref, h_ref, c_ref):
    hidden = w_hh_ref.shape[0]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    gates = xproj_ref[0] + jnp.dot(h_ref[:], w_hh_ref[:],
                                   preferred_element_type=jnp.float32)
    i = _sigmoid(gates[:, 0 * hidden:1 * hidden])
    f = _sigmoid(gates[:, 1 * hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = _sigmoid(gates[:, 3 * hidden:4 * hidden])
    c = f * c_ref[:] + i * g
    h = o * jnp.tanh(c)
    c_ref[:] = c
    h_ref[:] = h
    out_ref[0] = h


# ---------------------------------------------------------------------------
# Custom-VJP fused LSTM: forward + reverse-time backward kernels
# ---------------------------------------------------------------------------

def _lstm_fwd_kernel(xproj_ref, w_hh_ref, out_h_ref, out_c_ref, h_ref, c_ref,
                     *, time_chunk=1):
    hidden = w_hh_ref.shape[0]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    # statically unrolled chunk of consecutive steps per grid invocation
    # (amortizes the v5e per-grid-step overhead; exact same math)
    for k in range(time_chunk):
        gates = xproj_ref[k] + jnp.dot(h_ref[:], w_hh_ref[:],
                                       preferred_element_type=jnp.float32)
        i = _sigmoid(gates[:, 0 * hidden:1 * hidden])
        f = _sigmoid(gates[:, 1 * hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = _sigmoid(gates[:, 3 * hidden:4 * hidden])
        c = f * c_ref[:] + i * g
        h = o * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = h
        out_h_ref[k] = h
        out_c_ref[k] = c


def _lstm_bwd_kernel(xproj_ref, h_prev_ref, c_prev_ref, c_ref, dh_out_ref,
                     w_hh_ref, dxproj_ref, dwhh_ref,
                     dh_ref, dc_ref, dwhh_acc, *, time_chunk=1):
    """One reversed time CHUNK: recompute gates from residuals, propagate
    (dh, dc) backwards through `time_chunk` steps (latest-first within the
    block), emit dgates (== dxproj) and accumulate dW_hh."""
    hidden = w_hh_ref.shape[0]
    t_rev = pl.program_id(1)
    num_t = pl.num_programs(1)

    @pl.when(t_rev == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dwhh_acc[:] = jnp.zeros_like(dwhh_acc)

    # blocks arrive in reverse time order; within a block, walk the steps
    # from latest (k = TC-1) to earliest (k = 0)
    for k in reversed(range(time_chunk)):
        h_prev = h_prev_ref[k]
        gates = xproj_ref[k] + jnp.dot(h_prev, w_hh_ref[:],
                                       preferred_element_type=jnp.float32)
        i = _sigmoid(gates[:, 0 * hidden:1 * hidden])
        f = _sigmoid(gates[:, 1 * hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = _sigmoid(gates[:, 3 * hidden:4 * hidden])

        dh_total = dh_out_ref[k] + dh_ref[:]
        tanh_c = jnp.tanh(c_ref[k])
        dc = dc_ref[:] + dh_total * o * (1.0 - tanh_c * tanh_c)
        di = dc * g * i * (1.0 - i)
        df = dc * c_prev_ref[k] * f * (1.0 - f)
        dg = dc * i * (1.0 - g * g)
        do = dh_total * tanh_c * o * (1.0 - o)
        dgates = jnp.concatenate([di, df, dg, do], axis=1)      # (Bt, 4H)

        dxproj_ref[k] = dgates
        # dW_hh += h_prev^T @ dgates (contract the batch dim, no transpose op)
        dwhh_acc[:] = dwhh_acc[:] + jax.lax.dot_general(
            h_prev, dgates, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # carry to the previous step
        dh_ref[:] = jax.lax.dot_general(
            dgates, w_hh_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dc_ref[:] = dc * f

    @pl.when(t_rev == num_t - 1)
    def _():
        dwhh_ref[0] = dwhh_acc[:]


@functools.partial(jax.jit, static_argnames=("block_b", "interpret",
                                             "time_chunk"))
def _lstm_fwd_pallas(w_hh, xproj, *, block_b: int, interpret: bool,
                     time_chunk: int = 1):
    """xproj: time-major (T, B, 4H) -> (hs (T, B, H), cs (T, B, H))."""
    seq_len, batch, _ = xproj.shape
    hidden = w_hh.shape[0]
    time_chunk = _clamp_time_chunk(time_chunk, seq_len)
    grid = (batch // block_b, seq_len // time_chunk)
    return pl.pallas_call(
        functools.partial(_lstm_fwd_kernel, time_chunk=time_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((time_chunk, block_b, 4 * hidden),
                         lambda b, t: (t, b, 0)),
            pl.BlockSpec((hidden, 4 * hidden), lambda b, t: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((time_chunk, block_b, hidden), lambda b, t: (t, b, 0)),
            pl.BlockSpec((time_chunk, block_b, hidden), lambda b, t: (t, b, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((seq_len, batch, hidden), xproj.dtype),
            jax.ShapeDtypeStruct((seq_len, batch, hidden), xproj.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, hidden), jnp.float32),
            pltpu.VMEM((block_b, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xproj, w_hh)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret",
                                             "time_chunk"))
def _lstm_bwd_pallas(w_hh, xproj, h_prev, c_prev, cs, dh_out, *,
                     block_b: int, interpret: bool, time_chunk: int = 1):
    """Reverse-time backward. All sequence inputs time-major (T, B, .).
    Returns (dxproj (T, B, 4H), dwhh_partial (num_btiles, H, 4H))."""
    seq_len, batch, _ = xproj.shape
    hidden = w_hh.shape[0]
    time_chunk = _clamp_time_chunk(time_chunk, seq_len)
    nb = batch // block_b
    num_tblocks = seq_len // time_chunk
    grid = (nb, num_tblocks)

    def rev(b, t):
        # time BLOCKS stream in reverse order; the kernel walks the steps
        # inside each block latest-first
        return (num_tblocks - 1 - t, b, 0)

    return pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, time_chunk=time_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((time_chunk, block_b, 4 * hidden), rev),
            pl.BlockSpec((time_chunk, block_b, hidden), rev),
            pl.BlockSpec((time_chunk, block_b, hidden), rev),
            pl.BlockSpec((time_chunk, block_b, hidden), rev),
            pl.BlockSpec((time_chunk, block_b, hidden), rev),
            pl.BlockSpec((hidden, 4 * hidden), lambda b, t: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((time_chunk, block_b, 4 * hidden), rev),
            pl.BlockSpec((1, hidden, 4 * hidden), lambda b, t: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((seq_len, batch, 4 * hidden), xproj.dtype),
            jax.ShapeDtypeStruct((nb, hidden, 4 * hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, hidden), jnp.float32),
            pltpu.VMEM((block_b, hidden), jnp.float32),
            pltpu.VMEM((hidden, 4 * hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xproj, h_prev, c_prev, cs, dh_out, w_hh)


BWD_BLOCK_B = 64  # backward streams 6 per-step buffers; keep VMEM in budget
_INTERPRET_VJP = False  # flipped by tests to run the kernels on CPU
# steps per grid invocation for the custom-VJP kernels (1 = one step per
# invocation, the pre-tuning behavior). Module-level knobs rather than call
# args because lstm_scan_fused is a custom_vjp primitive whose signature is
# (params, x); set them BEFORE the enclosing train/predict step is traced.
FWD_TIME_CHUNK = 1
BWD_TIME_CHUNK = 1
# batch-tile width for the forward train kernel; chunked time blocks stream
# time_chunk * block_b * 6H floats per grid step, so raising FWD_TIME_CHUNK
# usually requires lowering FWD_BLOCK_B to stay inside the ~16 MB scoped
# VMEM limit (v5e: (5, 256) overflows, (5, 64) fits at H=512)
FWD_BLOCK_B = DEFAULT_BLOCK_B


def _pad_batch(x, block_b):
    batch = x.shape[0]
    padded = -(-batch // block_b) * block_b
    if padded != batch:
        x = jnp.pad(x, ((0, padded - batch),) + ((0, 0),) * (x.ndim - 1))
    return x


@jax.custom_vjp
def lstm_scan_fused(params, x):
    """Differentiable fused LSTM layer: `x (B, T, D) -> (B, T, H)` with both
    forward and backward as Pallas reverse-time scans (custom VJP)."""
    return _fused_fwd(params, x)[0]


def _fused_fwd(params, x):
    batch = x.shape[0]
    block_b = min(FWD_BLOCK_B, max(8, batch))
    xp = _pad_batch(x, block_b)
    xproj = jnp.einsum("btd,dh->tbh", xp, params["w_ih"])
    hs, cs = _lstm_fwd_pallas(params["w_hh"], xproj, block_b=block_b,
                              interpret=_INTERPRET_VJP,
                              time_chunk=FWD_TIME_CHUNK)
    out = jnp.moveaxis(hs, 0, 1)[:batch]
    return out, (params, x, hs, cs)


def _fused_bwd(residuals, dout):
    params, x, hs, cs = residuals
    batch, seq_len, _ = x.shape
    hidden = params["w_hh"].shape[0]
    # The forward pads batch to a multiple of its own (larger) block; the
    # backward tiles with BWD_BLOCK_B, so re-pad every time-major buffer up
    # to a multiple of block_b — a floor'd grid would silently leave rows
    # >= block_b*nb unwritten in dxproj and drop their dW contributions.
    block_b = min(BWD_BLOCK_B, max(8, hs.shape[1]))
    padded_b = -(-hs.shape[1] // block_b) * block_b

    def pad_tm(a):  # time-major (T, B, .): pad the batch axis with zeros
        if a.shape[1] == padded_b:
            return a
        return jnp.pad(a, ((0, 0), (0, padded_b - a.shape[1]), (0, 0)))

    hs, cs = pad_tm(hs), pad_tm(cs)
    xp = _pad_batch(x, padded_b)
    xproj = jnp.einsum("btd,dh->tbh", xp, params["w_ih"])
    zeros = jnp.zeros((1, padded_b, hidden), hs.dtype)
    h_prev = jnp.concatenate([zeros, hs[:-1]])
    c_prev = jnp.concatenate([zeros, cs[:-1]])
    # dout's padded rows are zero, so dgates there are exactly zero: no
    # spurious dW_hh/dW_ih contributions from padding.
    dh_out = jnp.moveaxis(_pad_batch(dout, padded_b), 0, 1)  # (T, B, H)

    dxproj, dwhh_parts = _lstm_bwd_pallas(
        params["w_hh"], xproj, h_prev, c_prev, cs, dh_out,
        block_b=block_b, interpret=_INTERPRET_VJP,
        time_chunk=BWD_TIME_CHUNK)
    d_w_hh = jnp.sum(dwhh_parts, axis=0).astype(params["w_hh"].dtype)
    d_w_ih = jnp.einsum("btd,tbh->dh", xp, dxproj).astype(params["w_ih"].dtype)
    dx = jnp.einsum("tbh,dh->btd", dxproj, params["w_ih"])[:batch]
    return {"w_ih": d_w_ih, "w_hh": d_w_hh}, dx


lstm_scan_fused.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def lstm_scan_pallas(params, x, *, block_b: int = DEFAULT_BLOCK_B,
                     interpret: bool = False):
    """Bias-free LSTM layer over `x: (B, T, D)` -> `(B, T, H)` with the
    recurrence as a Pallas kernel. Pads B up to a tile multiple."""
    w_ih, w_hh = params["w_ih"], params["w_hh"]
    batch, seq_len, _ = x.shape
    hidden = w_hh.shape[0]

    block_b = min(block_b, max(8, batch))
    padded_b = -(-batch // block_b) * block_b
    if padded_b != batch:
        x = jnp.pad(x, ((0, padded_b - batch), (0, 0), (0, 0)))

    xproj = jnp.einsum("btd,dh->tbh", x, w_ih)  # time-major (T, B, 4H)

    grid = (padded_b // block_b, seq_len)
    hs = pl.pallas_call(
        _lstm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_b, 4 * hidden), lambda b, t: (t, b, 0)),
            pl.BlockSpec((hidden, 4 * hidden), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_b, hidden), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((seq_len, padded_b, hidden), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_b, hidden), jnp.float32),
            pltpu.VMEM((block_b, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xproj, w_hh)
    return jnp.moveaxis(hs, 0, 1)[:batch]


# ---------------------------------------------------------------------------
# Fully-fused OPNet forward
# ---------------------------------------------------------------------------

def _opnet_kernel(xproj1_ref, boxes_fm_ref, w1_hh_ref, w_att_ref, w2_ih_ref,
                  w2_hh_ref, w_head_ref, y_ref, logits_ref,
                  h1_ref, c1_ref, h2_ref, c2_ref, *, num_objects, feat,
                  time_chunk):
    att_hidden = w1_hh_ref.shape[0]
    vid_hidden = w2_hh_ref.shape[0]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h1_ref[:] = jnp.zeros_like(h1_ref)
        c1_ref[:] = jnp.zeros_like(c1_ref)
        h2_ref[:] = jnp.zeros_like(h2_ref)
        c2_ref[:] = jnp.zeros_like(c2_ref)

    # `time_chunk` consecutive recurrence steps per grid invocation
    # (statically unrolled) — amortizes the v5e per-grid-step overhead
    # over TC steps while the streamed blocks stay TC-times larger.
    for k in range(time_chunk):
        # --- stage 1: who-to-attend LSTM step ---
        gates1 = xproj1_ref[k] + jnp.dot(h1_ref[:], w1_hh_ref[:],
                                         preferred_element_type=jnp.float32)
        i1 = _sigmoid(gates1[:, 0 * att_hidden:1 * att_hidden])
        f1 = _sigmoid(gates1[:, 1 * att_hidden:2 * att_hidden])
        g1 = jnp.tanh(gates1[:, 2 * att_hidden:3 * att_hidden])
        o1 = _sigmoid(gates1[:, 3 * att_hidden:4 * att_hidden])
        c1 = f1 * c1_ref[:] + i1 * g1
        h1 = o1 * jnp.tanh(c1)
        c1_ref[:] = c1
        h1_ref[:] = h1

        # --- attention over the 15 object slots ---
        logits = jnp.dot(h1, w_att_ref[:], preferred_element_type=jnp.float32)
        logits_ref[k] = logits
        probs = jax.nn.softmax(logits, axis=-1)

        # --- soft box selection: boxes are laid out feature-major
        # (o contiguous within each feature), so each feature is one
        # static (B, num_objects) slice ---
        boxes_fm = boxes_fm_ref[k]
        sel_cols = []
        for f in range(feat):
            block = boxes_fm[:, f * num_objects:(f + 1) * num_objects]
            sel_cols.append(jnp.sum(block * probs, axis=1, keepdims=True))
        selected = jnp.concatenate(sel_cols, axis=1)  # (B, feat)

        # --- stage 2: video LSTM step on the selected box ---
        xproj2 = jnp.dot(selected, w2_ih_ref[:],
                         preferred_element_type=jnp.float32)
        gates2 = xproj2 + jnp.dot(h2_ref[:], w2_hh_ref[:],
                                  preferred_element_type=jnp.float32)
        i2 = _sigmoid(gates2[:, 0 * vid_hidden:1 * vid_hidden])
        f2 = _sigmoid(gates2[:, 1 * vid_hidden:2 * vid_hidden])
        g2 = jnp.tanh(gates2[:, 2 * vid_hidden:3 * vid_hidden])
        o2 = _sigmoid(gates2[:, 3 * vid_hidden:4 * vid_hidden])
        c2 = f2 * c2_ref[:] + i2 * g2
        h2 = o2 * jnp.tanh(c2)
        c2_ref[:] = c2
        h2_ref[:] = h2

        y_ref[k] = jnp.dot(h2, w_head_ref[:],
                           preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret",
                                             "compute_dtype", "time_chunk"))
def opnet_fused_forward(params, boxes, *, block_b: int = None,
                        interpret: bool = False, compute_dtype=jnp.float32,
                        time_chunk: int = None):
    """Fused OPNet forward: `boxes (B, T, O, F)` ->
    `(y (B, T, 4), logits (B, O, T))`, matching `models.reasoning.opnet_apply`
    to float tolerance.

    compute_dtype=jnp.bfloat16 runs the streamed activations and weights in
    bf16 (MXU accumulation stays f32 via preferred_element_type; the cell
    carries stay f32 in VMEM) — ~2x matmul throughput at reduced precision.

    time_chunk=TC runs TC consecutive recurrence steps per grid invocation
    (grid t-axis shrinks T -> T/TC), amortizing the per-grid-step dispatch
    overhead; clamped down to the largest divisor of T. The streamed
    xproj1 block grows TC-fold (TC * block_b * 4*H1 * itemsize, double
    buffered) — keep TC * block_b modest or drop to bf16 so it fits VMEM.

    block_b/time_chunk default to the dtype's v5e-tuned production config
    (TUNED_OPNET_BLOCKS); pass them explicitly to override."""
    batch, seq_len, num_objects, feat = boxes.shape
    tuned = TUNED_OPNET_BLOCKS.get(jnp.dtype(compute_dtype),
                                   (DEFAULT_BLOCK_B, 1))
    if block_b is None:
        block_b = tuned[0]
    if time_chunk is None:
        time_chunk = tuned[1]
    time_chunk = _clamp_time_chunk(time_chunk, seq_len)
    w1_ih = params["att_lstm"]["w_ih"].astype(compute_dtype)
    w1_hh = params["att_lstm"]["w_hh"].astype(compute_dtype)
    w_att = params["att_head"]["w"].astype(compute_dtype)
    w2_ih = params["video_lstm"]["w_ih"].astype(compute_dtype)
    w2_hh = params["video_lstm"]["w_hh"].astype(compute_dtype)
    w_head = params["box_head"]["w"].astype(compute_dtype)
    att_hidden = w1_hh.shape[0]
    vid_hidden = w2_hh.shape[0]
    att_out = w_att.shape[1]

    block_b = min(block_b, max(8, batch))
    padded_b = -(-batch // block_b) * block_b
    if padded_b != batch:
        boxes = jnp.pad(boxes, ((0, padded_b - batch), (0, 0), (0, 0), (0, 0)))

    scene = boxes.reshape(padded_b, seq_len, num_objects * feat)
    xproj1 = jnp.einsum("btd,dh->tbh", scene, w1_ih,
                        preferred_element_type=compute_dtype)  # (T, B, 4H1)
    # feature-major layout so the kernel selects each feature contiguously
    boxes_fm = jnp.transpose(boxes, (1, 0, 3, 2)).reshape(
        seq_len, padded_b, feat * num_objects).astype(compute_dtype)

    grid = (padded_b // block_b, seq_len // time_chunk)
    y, logits = pl.pallas_call(
        functools.partial(_opnet_kernel, num_objects=num_objects, feat=feat,
                          time_chunk=time_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((time_chunk, block_b, 4 * att_hidden),
                         lambda b, t: (t, b, 0)),
            pl.BlockSpec((time_chunk, block_b, feat * num_objects),
                         lambda b, t: (t, b, 0)),
            pl.BlockSpec((att_hidden, 4 * att_hidden), lambda b, t: (0, 0)),
            pl.BlockSpec((att_hidden, att_out), lambda b, t: (0, 0)),
            pl.BlockSpec((feat, 4 * vid_hidden), lambda b, t: (0, 0)),
            pl.BlockSpec((vid_hidden, 4 * vid_hidden), lambda b, t: (0, 0)),
            pl.BlockSpec((vid_hidden, 4), lambda b, t: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((time_chunk, block_b, 4), lambda b, t: (t, b, 0)),
            pl.BlockSpec((time_chunk, block_b, att_out),
                         lambda b, t: (t, b, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((seq_len, padded_b, 4), boxes.dtype),
            jax.ShapeDtypeStruct((seq_len, padded_b, att_out), boxes.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, att_hidden), jnp.float32),
            pltpu.VMEM((block_b, att_hidden), jnp.float32),
            pltpu.VMEM((block_b, vid_hidden), jnp.float32),
            pltpu.VMEM((block_b, vid_hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xproj1, boxes_fm, w1_hh, w_att, w2_ih, w2_hh, w_head)

    y = jnp.moveaxis(y, 0, 1)[:batch]
    logits = jnp.transpose(logits, (1, 2, 0))[:batch]  # (B, O, T)
    return y, logits
