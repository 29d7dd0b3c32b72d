"""Profile the fused OPNet inference kernel across (block_b, time_chunk,
compute_dtype) configs on the real chip.

The kernel's grid is (batch_tiles, T/time_chunk) and v5e pays a fixed
per-grid-step overhead, so larger time chunks amortize dispatch while
inflating the double-buffered xproj1 stream (time_chunk * block_b * 4*H1 *
itemsize); bf16 halves both the stream bytes and MXU passes. This sweep
finds the throughput-optimal point; bench.py's headline path stays at the
exact (f32, TC=1) config unless retuned from these results.

Usage: python scripts/profile_opnet_fused.py [--batch 512] [--frames 300]
Prints one line per config: fps, ms/call, and max |y - y_f32_ref|.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from objectpermanence_tpu.config import load_model_config
from objectpermanence_tpu.models.registry import get_model_spec
from objectpermanence_tpu.ops.pallas_scan import opnet_fused_forward

CONFIGS = [
    # (block_b, time_chunk, dtype) — TC must divide 300 (clamped otherwise).
    # Chunked time blocks stream TC*block_b rows per grid step; v5e's ~16 MB
    # scoped VMEM rejects (256, >=5, f32), (512, *, *), (128, 25, bf16):
    # keep TC*block_b*itemsize modest (first-sweep results in the log).
    (256, 1, jnp.float32),   # current production default
    (256, 1, jnp.bfloat16),
    (128, 5, jnp.float32),
    (64, 5, jnp.float32),
    (64, 10, jnp.float32),
    (128, 10, jnp.bfloat16),  # first-sweep winner (29.2 Mfps)
    (64, 15, jnp.bfloat16),
    (128, 6, jnp.bfloat16),
    (64, 20, jnp.bfloat16),
]
ITERS = 24  # >=20 chained dispatches amortize the tunnel floor (CLAUDE.md)

# (FWD_TIME_CHUNK, FWD_BLOCK_B, BWD_TIME_CHUNK, BWD_BLOCK_B) combos for the
# custom-VJP train kernels; VMEM rejects fwd (5, 256) and bwd (5, 64)
TRAIN_CONFIGS = [
    (1, 256, 1, 64),   # current production default
    (5, 64, 1, 64),
    (5, 128, 1, 64),
    (10, 64, 1, 64),
    (10, 32, 1, 64),
    (5, 64, 3, 32),
    (5, 64, 5, 16),
]


def train_sweep(args) -> None:
    """Time grad-of-sum through lstm_scan_fused at the video-LSTM dims
    (the heavier of OPNet's two recurrences) across time-chunk knobs."""
    from objectpermanence_tpu.ops import pallas_scan as ps
    from objectpermanence_tpu.ops.lstm import lstm_init

    params = lstm_init(jax.random.PRNGKey(0), 6, 512)
    x = jax.device_put(np.random.RandomState(0).rand(
        args.batch // 2, args.frames, 6).astype(np.float32))
    frames = x.shape[0] * args.frames
    ref_grad = None

    defaults = (ps.FWD_TIME_CHUNK, ps.FWD_BLOCK_B,
                ps.BWD_TIME_CHUNK, ps.BWD_BLOCK_B)
    for fwd_tc, fwd_bb, bwd_tc, bwd_bb in TRAIN_CONFIGS:
        tag = (f"fwd_tc={fwd_tc:2d}@bb={fwd_bb:3d} "
               f"bwd_tc={bwd_tc:2d}@bb={bwd_bb:3d}")
        try:
            ps.FWD_TIME_CHUNK, ps.FWD_BLOCK_B = fwd_tc, fwd_bb
            ps.BWD_TIME_CHUNK, ps.BWD_BLOCK_B = bwd_tc, bwd_bb
            # fresh jit per config: the knobs are read at trace time
            grad = jax.jit(jax.grad(
                lambda p, xx: jnp.sum(ps.lstm_scan_fused(p, xx) ** 2)))
            g = grad(params, x)
            gw = np.asarray(g["w_hh"])
            if ref_grad is None:
                ref_grad = gw
            gerr = float(np.max(np.abs(gw - ref_grad))
                         / max(np.max(np.abs(ref_grad)), 1e-9))
            best = float("inf")
            for _ in range(3):
                start = time.perf_counter()
                for _ in range(args.iters):
                    g = grad(params, x)
                np.asarray(g["w_hh"][0, 0])
                best = min(best, time.perf_counter() - start)
            ms = best / args.iters * 1e3
            print(f"{tag}: {frames / (best / args.iters) / 1e6:8.2f} Mfps  "
                  f"{ms:7.3f} ms/step  rel|dg|={gerr:.2e}", flush=True)
        except Exception as exc:
            msg = str(exc).replace("\n", " ")[:120]
            print(f"{tag}: FAILED ({type(exc).__name__}: {msg})", flush=True)
        finally:
            (ps.FWD_TIME_CHUNK, ps.FWD_BLOCK_B,
             ps.BWD_TIME_CHUNK, ps.BWD_BLOCK_B) = defaults


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU smoke test; not a "
                         "performance measurement)")
    ap.add_argument("--train", action="store_true",
                    help="also sweep the custom-VJP train-kernel time chunks")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    spec = get_model_spec("opnet")
    params = spec.init(jax.random.PRNGKey(0), load_model_config("opnet"))
    boxes = jax.device_put(np.random.RandomState(0).rand(
        args.batch, args.frames, 15, 6).astype(np.float32))
    frames = args.batch * args.frames

    ref = None
    for block_b, tc, dtype in CONFIGS:
        tag = f"block_b={block_b:3d} tc={tc:2d} {jnp.dtype(dtype).name}"
        try:
            run = lambda: opnet_fused_forward(  # noqa: E731
                params, boxes, block_b=block_b, time_chunk=tc,
                compute_dtype=dtype, interpret=args.interpret)
            y, _ = run()
            np.asarray(y[0, 0])  # sync (axon block_until_ready is a no-op)
            if ref is None:
                ref = np.asarray(y)
            err = float(np.max(np.abs(np.asarray(y) - ref)))
            best = float("inf")
            for _ in range(3):
                start = time.perf_counter()
                for _ in range(args.iters):
                    y, _ = run()
                np.asarray(y[0, 0])
                best = min(best, time.perf_counter() - start)
            ms = best / args.iters * 1e3
            print(f"{tag}: {frames / (best / args.iters) / 1e6:8.2f} Mfps  "
                  f"{ms:7.3f} ms/call  max|dy|={err:.2e}", flush=True)
        except Exception as exc:  # VMEM OOM / Mosaic lowering: report, go on
            msg = str(exc).replace("\n", " ")[:120]
            print(f"{tag}: FAILED ({type(exc).__name__}: {msg})", flush=True)

    if args.train:
        from objectpermanence_tpu.ops import pallas_scan as ps
        ps._INTERPRET_VJP = args.interpret
        print("--- custom-VJP train kernels (video-LSTM dims) ---", flush=True)
        train_sweep(args)


if __name__ == "__main__":
    main()
