"""Headline benchmark: end-to-end OPNet inference frames/sec on one chip.

Measures the BASELINE.json north-star path the way this framework actually
serves it (ingest-once architecture): the dense video dataset is ingested to
device HBM once (`data/ingest.py` caches dense arrays; eval batches never
re-cross the host boundary), then each batch runs the jit OPNet forward
(who-to-attend LSTM + soft box selection + video LSTM + box head) and its
denormalized pixel boxes stream back D2H as int16 (lossless for 320x240
coordinates, half the wire bytes of the reference's int32 arrays — the
dev-environment host link is a low-bandwidth tunnel, see STATUS.md).
The loop is pipelined the way a production server runs it: several batches
are in flight while earlier predictions stream back (JAX dispatch is
async; np.asarray is the sync).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N/5000,
     "compute_fps": N, "compute_fps_bf16": N, "link_efficiency": N,
     "data": "real:..."|"synthetic"}
value is the D2H-inclusive pipelined number (the headline); compute_fps is
the same-session device-compute ceiling (tiny final fetch only) and is the
STABLE round-over-round number — the headline rides the dev tunnel's
weather, which link_efficiency (= value / compute_fps) makes explicit in
the artifact itself (~1.0 on production PCIe/on-chip serving, <<1 through
a wedged tunnel). compute_fps_bf16 is the ceiling with the fused kernel's
bf16 matmul mode (~1 px box precision trade, `ops/pallas_scan.py`).
vs_baseline is relative to the 5,000 frames/sec/chip north-star target
(/root/repo/BASELINE.json; the reference repo publishes no numbers of its
own — SURVEY §6).
"""

import json
import os
import sys
import time
import zipfile
from pathlib import Path

import jax

# Persistent XLA compilation cache: first compile of the fused kernel +
# pipelined graph can exceed 10 min on a cold low-core container (XLA
# compile is host-CPU-bound); cache it so reruns (and the driver's
# end-of-round invocation) start in seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/data/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

from objectpermanence_tpu.config import load_model_config
from objectpermanence_tpu.infer.reasoning import make_predict_step
from objectpermanence_tpu.models.registry import get_model_spec

BASELINE_FPS = 5000.0  # north-star target, frames/sec/chip
OPNET_CONFIG = load_model_config("opnet")
BATCH_VIDEOS = 512
NUM_FRAMES = 300
WARMUP_ITERS = 2
MEASURE_ITERS = 24   # >=20 chained dispatches: amortizes the ~0.3-1 ms
                     # per-dispatch tunnel floor (CLAUDE.md)
PIPELINE_DEPTH = 4

# real served data: an ingest cache + trained checkpoint from a scaled run
# (scripts/containment_run.py). The repo ships a committed fallback artifact
# (bench_data/: a real ingest cache + the trained flagship OPNet params, see
# scripts/make_bench_data.py) so the bench serves REAL data even on a fresh
# container; synthetic tensors of identical shape remain the last resort
# (shapes are static — throughput is data-independent, but the headline
# artifact should measure the real serving path)
_CANDIDATES = [Path(p) for p in (os.environ.get("BENCH_DATA"),
                                 "/root/data/sim4k", "/root/data/sim2k",
                                 Path(__file__).resolve().parent / "bench_data")
               if p]
BENCH_DATA = next((p for p in _CANDIDATES
                   if (p / "checkpoints" / "opnet").exists()), _CANDIDATES[-1])


def _npz_member_shape(path: Path, member: str):
    """Shape of one array inside an .npz WITHOUT materializing its data
    (header-only read of the zip member)."""
    with zipfile.ZipFile(path) as z:
        with z.open(member + ".npy") as f:
            version = np.lib.format.read_magic(f)
            if version == (1, 0):
                shape, _, _ = np.lib.format.read_array_header_1_0(f)
            else:
                shape, _, _ = np.lib.format.read_array_header_2_0(f)
    return shape


def _load_real(spec, init_params):
    """((params, boxes (BATCH_VIDEOS, NUM_FRAMES, 15, 6)), source_tag) from
    the newest ingest cache + best trained checkpoint under BENCH_DATA, or
    (None, reason)."""
    try:
        from objectpermanence_tpu.utils.checkpoint import (
            best_params_checkpoint, restore_params,
        )
        best = best_params_checkpoint(BENCH_DATA / "checkpoints" / "opnet")
        caches = sorted((BENCH_DATA / "cache").glob("ingest_*.npz"),
                        key=lambda p: p.stat().st_size, reverse=True)
        if best is None or not caches:
            return None, "synthetic (no checkpoint/cache found)"
        cache = next(
            (c for c in caches
             if (lambda s: len(s) == 4 and s[1] >= NUM_FRAMES
                 and s[2:] == (15, 6))(_npz_member_shape(c, "boxes"))),
            None)
        if cache is None:
            return None, "synthetic (no 6-feature ingest cache)"
        boxes = np.load(cache)["boxes"].astype(np.float32)
        reps = -(-BATCH_VIDEOS // boxes.shape[0])
        boxes = np.tile(boxes[:, :NUM_FRAMES], (reps, 1, 1, 1))[:BATCH_VIDEOS]
        # device_put once: orbax restores host numpy; without this every
        # dispatch re-uploads all parameters (the round-2 bench's 4x
        # "tunnel health" swings were exactly this)
        params = jax.device_put(restore_params(best, init_params))
        tag = f"real:{cache.name}+{best.name}"
        print(f"bench data: {cache.name} + {best.name} "
              f"({boxes.shape[0]} videos)", file=sys.stderr)
        return (params, boxes), tag
    except (OSError, KeyError, ValueError, zipfile.BadZipFile) as exc:
        print(f"bench data: falling back to synthetic ({exc})", file=sys.stderr)
        return None, f"synthetic ({type(exc).__name__})"


def _wait_for_backend(max_attempts: int = None, probe_timeout: float = 120.0,
                      sleep_s: float = 60.0) -> None:
    """The dev TPU tunnel wedges transiently — backend init either raises
    UNAVAILABLE fast or HANGS outright; a fresh process minutes later
    usually succeeds (CLAUDE.md). Probe in a subprocess with a hard timeout
    (covers both failure modes without wedging this process) and only
    proceed once a probe init succeeds. Retry chatter goes to stderr; the
    one-JSON-line stdout contract is preserved. The probe runs in its own
    process group with file-redirected output — subprocess.run with
    capture_output + timeout can block forever in its post-timeout
    communicate() when the killed backend child leaves a helper process
    holding the pipe."""
    import signal
    import subprocess
    import tempfile
    if max_attempts is None:
        # tunnel outages run minutes-to-hours; default to ~30 min of
        # patience, tunable for unattended runs (BENCH_PROBE_ATTEMPTS=20
        # waits ~1 h, =1 probes once)
        max_attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "10"))
    for attempt in range(max_attempts):
        with tempfile.TemporaryFile() as err:
            proc = subprocess.Popen(
                [sys.executable, "-c", "import jax; jax.devices()"],
                stdout=subprocess.DEVNULL, stderr=err,
                start_new_session=True)
            try:
                rc = proc.wait(timeout=probe_timeout)
                if rc == 0:
                    return
                err.seek(0)
                lines = err.read().decode(errors="replace").strip().splitlines()
                msg = lines[-1][:160] if lines else f"exit {rc}"
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
                msg = f"probe hung >{probe_timeout:.0f}s"
        if attempt + 1 == max_attempts:
            print(f"bench: backend still unavailable after {max_attempts} "
                  f"probes ({msg}); proceeding anyway", file=sys.stderr,
                  flush=True)
            return
        print(f"bench: backend not ready ({msg}); probe "
              f"{attempt + 2}/{max_attempts} in {sleep_s:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(sleep_s)


def main() -> None:
    _wait_for_backend()
    spec = get_model_spec("opnet")
    params = spec.init(jax.random.PRNGKey(0), OPNET_CONFIG)
    # int16 wire format: lossless for pixel coords in [0, 320]
    predict_step = make_predict_step(spec, out_dtype=np.int16)

    real, data_tag = _load_real(spec, params)
    if real is not None:
        params, real_boxes = real
    else:
        real_boxes = np.random.RandomState(0).rand(
            BATCH_VIDEOS, NUM_FRAMES, 15, 6).astype(np.float32)

    # the ingested dataset, resident in HBM (one-time cost, amortized over
    # epochs/requests exactly as in infer/reasoning.py + data/ingest.py)
    device_batches = [jax.device_put(real_boxes),
                      jax.device_put(np.roll(real_boxes, 1, axis=0))]

    def run(i):
        return predict_step(params, device_batches[i % 2])

    for i in range(WARMUP_ITERS):
        np.asarray(run(i))

    # device-compute ceiling: chain all iters, sync through one tiny fetch
    # (axon's block_until_ready does not block — a (4,) asarray is the sync)
    compute_best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        out = None
        for i in range(MEASURE_ITERS):
            out = run(i)
        np.asarray(out[0, 0])
        compute_best = min(compute_best, time.perf_counter() - start)
    compute_fps = BATCH_VIDEOS * NUM_FRAMES * MEASURE_ITERS / compute_best

    # bf16 fused-kernel ceiling (same shapes; ~1 px box precision trade)
    compute_fps_bf16 = None
    if jax.default_backend() == "tpu":
        import jax.numpy as jnp
        bf16_step = make_predict_step(spec, out_dtype=np.int16,
                                      compute_dtype=jnp.bfloat16)
        np.asarray(bf16_step(params, device_batches[0]))  # compile
        bf16_best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            out = None
            for i in range(MEASURE_ITERS):
                out = bf16_step(params, device_batches[i % 2])
            np.asarray(out[0, 0])
            bf16_best = min(bf16_best, time.perf_counter() - start)
        compute_fps_bf16 = BATCH_VIDEOS * NUM_FRAMES * MEASURE_ITERS / bf16_best

    # headline: D2H-inclusive pipelined serving loop, best sustained window
    # of 3 (the host<->device link — a tunnel in dev, PCIe in production —
    # has throughput jitter that is not a property of the pipeline)
    best_elapsed = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        in_flight = []
        results = 0
        for i in range(MEASURE_ITERS):
            in_flight.append(run(i))
            if len(in_flight) > PIPELINE_DEPTH:
                out = np.asarray(in_flight.pop(0))
                results += 1
        while in_flight:
            out = np.asarray(in_flight.pop(0))
            results += 1
        elapsed = time.perf_counter() - start
        assert results == MEASURE_ITERS and out.shape == (BATCH_VIDEOS, NUM_FRAMES, 4)
        best_elapsed = min(best_elapsed, elapsed)

    frames_per_sec = BATCH_VIDEOS * NUM_FRAMES * MEASURE_ITERS / best_elapsed
    print(json.dumps({
        "metric": "opnet_inference_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec",
        "vs_baseline": round(frames_per_sec / BASELINE_FPS, 3),
        "compute_fps": round(compute_fps, 1),
        "compute_fps_bf16": (round(compute_fps_bf16, 1)
                             if compute_fps_bf16 else None),
        # how much of the device ceiling survives the host link: ~1.0 on
        # production serving, <<1 through an unhealthy dev tunnel — the
        # round-over-round comparable number is compute_fps
        "link_efficiency": round(frames_per_sec / compute_fps, 3),
        "data": data_tag,
    }))


if __name__ == "__main__":
    main()
