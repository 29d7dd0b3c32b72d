"""Batched reasoning inference — the 5k-fps/chip target path.

TPU-native rework of `baselines/inference_main.py:162-257`: the whole
eval set stays on device as `(B, 300, 15, F)`, one jit forward per batch,
a single device->host transfer of int32 pixel boxes, then host-side json
(+ optional cv2 debug video) writing.
"""

from pathlib import Path
from typing import Dict

import jax
import numpy as np

from objectpermanence_tpu.analysis.analyzer import write_bb_predictions
from objectpermanence_tpu.ops import lstm as lstm_ops
from objectpermanence_tpu.data.ingest import IngestedDataset, batches, ingest_directory
from objectpermanence_tpu.models.registry import ModelSpec, init_model
from objectpermanence_tpu.ops.boxes import FRAME_SHAPES
from objectpermanence_tpu.parallel.mesh import make_mesh, pad_batch_to, shard_batch


def fused_opnet_eligible(model_name: str) -> bool:
    """Whether `opnet_fused_forward` implements this architecture: the
    dense OPNet (two LSTMs + dense box head). The MLP variant has no
    temporal LSTM and the MoE variant replaces the dense box head with
    sharded experts — both must take the generic `spec.apply` path."""
    return (model_name.startswith("opnet")
            and "mlp" not in model_name and "moe" not in model_name)


def make_predict_step(spec: ModelSpec, out_dtype=np.int32,
                      compute_dtype=None, time_chunk: int = None):
    """Jit forward -> integer pixel boxes. On TPU backends the OPNet family
    runs the fully-fused Pallas kernel, and the other models' LSTM
    recurrences use the fused Pallas scan (`ops/pallas_scan.py`); elsewhere
    (CPU tests, dry runs) the XLA `lax.scan` path compiles everywhere.

    `out_dtype` picks the D2H wire format: int32 matches the reference's
    output arrays (`inference_main.py:219`); int16 is lossless for 320x240
    pixel coordinates and halves host-transfer bytes (serving path).

    `compute_dtype`/`time_chunk` tune the fused OPNet kernel only (see
    `opnet_fused_forward`): bf16 compute trades ~1 px of box precision for
    matmul throughput; time_chunk=None picks the dtype's v5e-tuned config
    (TUNED_OPNET_BLOCKS). The f32 default preserves exact parity with the
    XLA path (the tuned f32 time blocking is bit-identical)."""
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    use_fused_opnet = on_tpu and fused_opnet_eligible(spec.name)
    fused_dtype = compute_dtype if compute_dtype is not None else jnp.float32

    @jax.jit
    def predict_step(params, boxes):
        if use_fused_opnet:
            from objectpermanence_tpu.ops.pallas_scan import opnet_fused_forward
            out, _ = opnet_fused_forward(params, boxes,
                                         compute_dtype=fused_dtype,
                                         time_chunk=time_chunk)
        elif spec.double_output:
            with lstm_ops.fused_scan(on_tpu):
                out, _ = spec.apply(params, boxes)
        else:
            with lstm_ops.fused_scan(on_tpu):
                out = spec.apply(params, boxes)
        # denormalize to integer pixels on device (`inference_main.py:219`)
        return (out * FRAME_SHAPES).astype(out_dtype)

    return predict_step


def predict_dataset(spec: ModelSpec, params, dataset: IngestedDataset,
                    batch_size: int, mesh=None) -> Dict[str, np.ndarray]:
    """Forward the whole dataset; returns {video_name: (T, 4) int32 boxes}."""
    if mesh is None:
        mesh = make_mesh()
    data_par = mesh.shape["data"]
    batch_size = max(batch_size - batch_size % data_par, data_par)
    predict_step = make_predict_step(spec)

    results: Dict[str, np.ndarray] = {}
    for batch in batches(dataset, batch_size):
        padded, real = pad_batch_to(batch, batch_size)
        sharded = shard_batch({"boxes": padded["boxes"]}, mesh)
        pred_px = np.asarray(predict_step(params, sharded["boxes"]))[:real]
        for name, boxes in zip(batch["names"], pred_px):
            results[name] = boxes
    return results


def write_debug_video(video_path, out_path, predictions: np.ndarray,
                      labels: np.ndarray) -> None:
    """Prediction (yellow) vs GT (blue) debug video, mirroring the
    reference's rendering (`inference_main.py:227-254`). Requires cv2."""
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise RuntimeError(f"Unable to open video {video_path}")
    # cv2 reports one spurious extra frame (`tracking_utils.py:27-30`)
    num_valid = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) - 1
    writer = None
    for frame_idx in range(min(num_valid, len(predictions))):
        ok, frame = cap.read()
        if not ok:
            break
        if writer is None:
            h, w = frame.shape[:2]
            writer = cv2.VideoWriter(str(out_path),
                                     cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
        p = predictions[frame_idx]
        g = labels[frame_idx]
        cv2.rectangle(frame, (int(p[0]), int(p[1])), (int(p[2]), int(p[3])),
                      (0, 255, 255), 3)
        cv2.rectangle(frame, (int(g[0]), int(g[1])), (int(g[2]), int(g[3])),
                      (255, 0, 0), 3)
        writer.write(frame)
    cap.release()
    if writer is not None:
        writer.release()


def reasoning_inference_main(model_name: str, results_dir: str,
                             inference_config, model_config: Dict,
                             mesh=None) -> Dict[str, np.ndarray]:
    """Full inference driver: ingest -> batched forward -> per-video
    `<name>_bb.json` predictions (+ debug videos when raw videos exist)."""
    from objectpermanence_tpu.config import inference_config_from
    cfg = inference_config_from(inference_config)
    samples_dir = cfg.sample_dir
    labels_dir = cfg.labels_dir
    batch_size = cfg.batch_size
    model_path = cfg.model_path
    cache_dir = cfg.cache_dir

    spec, params = init_model(model_name, model_config, checkpoint_path=model_path)
    dataset = ingest_directory(samples_dir, labels_dir, spec.feature_width,
                               cache_dir=cache_dir)
    results_dir = Path(results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)

    predictions = predict_dataset(spec, params, dataset, batch_size, mesh)

    labels_px = (dataset.labels * np.asarray(FRAME_SHAPES, dtype=np.float32)).astype(np.int32)
    labels_by_name = dict(zip(dataset.names, labels_px))

    videos_dir = cfg.videos_dir
    debug_names = set(predictions)
    if cfg.sample_file:
        # debug-video rendering restricted to the sampled videos
        # (reference `get_experiment_videos`, `inference_main.py:22-41`)
        with open(cfg.sample_file) as f:
            debug_names &= {Path(line.strip()).stem for line in f if line.strip()}
    for name, boxes in predictions.items():
        write_bb_predictions(name, results_dir, boxes)
        if videos_dir and name in debug_names:
            video_path = Path(videos_dir) / f"{name}.avi"
            if video_path.exists():
                write_debug_video(video_path, results_dir / f"{name}_results.avi",
                                  boxes, labels_by_name[name])
    return predictions
