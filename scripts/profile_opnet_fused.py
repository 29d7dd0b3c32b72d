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
    # (block_b, time_chunk, dtype) — TC must divide 300 (clamped otherwise)
    (256, 1, jnp.float32),   # current production default
    (512, 1, jnp.float32),
    (256, 1, jnp.bfloat16),
    (512, 1, jnp.bfloat16),
    (256, 5, jnp.float32),
    (256, 5, jnp.bfloat16),
    (128, 10, jnp.float32),
    (256, 10, jnp.bfloat16),
    (128, 10, jnp.bfloat16),
    (128, 25, jnp.bfloat16),
    (64, 25, jnp.bfloat16),
]
ITERS = 24  # >=20 chained dispatches amortize the tunnel floor (CLAUDE.md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU smoke test; not a "
                         "performance measurement)")
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


if __name__ == "__main__":
    main()
