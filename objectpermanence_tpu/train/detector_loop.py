"""Detector fine-tuning driver.

Reference recipe (`object_detection/training.py:14-77`): SGD(momentum 0.9,
wd 5e-4), linear warmup over the first epoch's first 1000 iters, per-epoch
eval, checkpoint on improvement. TPU-native: one jit train step, dense
padded GT, deterministic shuffling, orbax checkpoints, detection mAP from
`analysis/detection_eval.py` instead of pycocotools.
"""

import shutil
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from objectpermanence_tpu.analysis.detection_eval import evaluate_detections
from objectpermanence_tpu.data.detection_dataset import DetectionDataset
from objectpermanence_tpu.models.detector import anchors as anchor_lib
from objectpermanence_tpu.models.detector.detector import (
    CaterDetector, DetectorConfig, detector_init,
)
from objectpermanence_tpu.models.detector.training import make_detector_train_step
from objectpermanence_tpu.utils import checkpoint as ckpt


def warmup_schedule(base_lr: float, warmup_iters: int, warmup_factor: float = 1e-3):
    def schedule(step):
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        return base_lr * (warmup_factor * (1 - alpha) + alpha)
    return schedule


def evaluate_detector(detector: CaterDetector, dataset: DetectionDataset,
                      batch_size: int = 8) -> Dict[str, float]:
    predictions, ground_truths = [], []
    seen = set()
    for batch in dataset.batches(batch_size):
        boxes, labels, scores, valid = detector(batch["images"])
        for i, name in enumerate(batch["names"]):
            if name in seen:  # repeat-padded tail
                continue
            seen.add(name)
            keep = valid[i]
            predictions.append({"boxes": boxes[i][keep], "labels": labels[i][keep],
                                "scores": scores[i][keep]})
            gt_keep = batch["gt_valid"][i]
            ground_truths.append({"boxes": batch["gt_boxes"][i][gt_keep],
                                  "labels": batch["gt_labels"][i][gt_keep]})
    return evaluate_detections(predictions, ground_truths)


def train_detector(train_dataset: DetectionDataset,
                   eval_dataset: Optional[DetectionDataset],
                   config: DetectorConfig, *,
                   num_epochs: int = 40, batch_size: int = 2,
                   learning_rate: float = 5e-3, momentum: float = 0.9,
                   weight_decay: float = 5e-4, warmup_iters: int = 1000,
                   checkpoint_dir: str = "./checkpoints/detector",
                   print_step: int = 50, seed: int = 0, mesh=None,
                   init_params=None, resume: bool = False) -> Dict:
    """With `mesh`, image batches are sharded over the mesh's data axis
    (reference `object_detection/training.py` is single-GPU; here XLA
    derives the gradient all-reduce from the input shardings). The batch
    size is rounded up to a multiple of the data axis. `init_params` starts
    from pretrained weights (the reference's COCO fine-tune path,
    `object_detection/models.py:6-20`) instead of random init.

    `resume=True` restores the latest `<checkpoint_dir>/resume/epoch_NNNN`
    full train state (params + SGD momentum) and continues from the next
    epoch — long fine-tunes stream fresh host batches every step, which
    leaks host-side transfer buffers on the axon tunnel client until the
    OS kills the process (observed at twostage epoch 13/16), so epoch-level
    restartability is a production requirement, not a convenience. Only the
    latest epoch state is kept (a detector train state is ~100s of MB vs
    the reasoning models' few MB). Per-epoch rng is derived by fold_in so a
    resumed run sees the same step keys an uninterrupted one would.
    `history` in the returned dict covers only the epochs run this call."""
    from objectpermanence_tpu.parallel.mesh import (
        batch_sharding, replicate, shard_batch,
    )
    if mesh is not None:
        data_par = mesh.shape["data"]
        batch_size = -(-batch_size // data_par) * data_par

    params = (init_params if init_params is not None
              else detector_init(jax.random.PRNGKey(seed), config))
    if mesh is not None:
        params = jax.device_put(params, replicate(mesh))
    anchors = [jnp.asarray(a) for a in anchor_lib.pyramid_anchors(
        config.feature_shapes(), config.strides, config.anchor_sizes)]

    steps_per_epoch = max(len(train_dataset) // batch_size, 1)
    schedule = warmup_schedule(learning_rate, min(warmup_iters, steps_per_epoch - 1)
                               if steps_per_epoch > 1 else 1)
    optimizer = optax.chain(
        optax.clip_by_global_norm(10.0),   # from-scratch detection stability
        optax.add_decayed_weights(weight_decay),
        optax.sgd(schedule, momentum=momentum),
    )
    opt_state = optimizer.init(params)
    train_step = make_detector_train_step(config, anchors, optimizer,
                                          under_mesh=mesh is not None)

    checkpoint_dir = Path(checkpoint_dir)
    start_epoch = 0
    best_map = -1.0
    if resume:
        latest = ckpt.latest_checkpoint(checkpoint_dir / "resume")
        if latest is not None:
            params, opt_state, meta = ckpt.restore_train_state(
                latest, params, opt_state)
            if mesh is not None:
                params = jax.device_put(params, replicate(mesh))
                opt_state = jax.device_put(opt_state, replicate(mesh))
            start_epoch = int(meta["epoch"])
            best_map = float(meta.get("best_map", -1.0))
            print(f"Resumed detector training from {latest} "
                  f"(epoch {start_epoch}, best mAP {best_map:.4f})", flush=True)
    history = []
    start = time.time()

    for epoch in range(start_epoch, num_epochs):
        rng = jax.random.fold_in(jax.random.PRNGKey(seed + 1), epoch)
        losses = []
        pending = []      # device-side losses; fetched at print boundaries
        for it, batch in enumerate(train_dataset.batches(
                batch_size, shuffle=True, seed=seed + epoch)):
            rng, sub = jax.random.split(rng)
            arrays = {k: batch[k] for k in ("images", "gt_boxes", "gt_labels",
                                            "gt_valid")}
            if mesh is not None:
                arrays = shard_batch(arrays, mesh)
            params, opt_state, parts = train_step(
                params, opt_state, jnp.asarray(arrays["images"]),
                jnp.asarray(arrays["gt_boxes"]), jnp.asarray(arrays["gt_labels"]),
                jnp.asarray(arrays["gt_valid"]), sub)
            # keep the loss on device: a float() here would sync every step
            # and serialize the host->device input stream against compute
            # (the NaN abort fires at print boundaries instead)
            pending.append(parts["loss"])
            if (it + 1) % print_step == 0:
                fetched = [float(l) for l in pending]
                pending = []
                if not np.all(np.isfinite(fetched)):
                    raise RuntimeError(
                        f"Loss is {fetched}, stopping training")
                losses.extend(fetched)
                print(f"Epoch {epoch + 1} iter {it + 1}: "
                      f"loss {np.mean(losses[-print_step:]):.4f} "
                      f"({int(time.time() - start)}s)", flush=True)
        fetched = [float(l) for l in pending]
        if fetched and not np.all(np.isfinite(fetched)):
            raise RuntimeError(f"Loss is {fetched}, stopping training")
        losses.extend(fetched)

        metrics = {"epoch": epoch + 1, "train_loss": float(np.mean(losses))}
        if eval_dataset is not None:
            detector = CaterDetector(config, params)
            metrics.update(evaluate_detector(detector, eval_dataset))
            print(f"Epoch {epoch + 1}: loss {metrics['train_loss']:.4f} "
                  f"mAP {metrics.get('mAP', 0):.4f} "
                  f"AP50 {metrics.get('AP50', 0):.4f}", flush=True)
            if metrics["mAP"] > best_map:
                best_map = metrics["mAP"]
                ckpt.save_params(checkpoint_dir / f"best_{round(best_map, 3)}", params)
        history.append(metrics)

        # epoch-granular resume state; keep only the newest (size: the full
        # detector + momentum is ~100s of MB, unlike the reasoning models)
        state_dir = checkpoint_dir / "resume" / f"epoch_{epoch + 1:04d}"
        ckpt.save_train_state(state_dir, params, opt_state,
                              {"epoch": epoch + 1, "best_map": best_map})
        for old in (checkpoint_dir / "resume").iterdir():
            if old.is_dir() and old != state_dir:
                shutil.rmtree(old)

    ckpt.save_params(checkpoint_dir / "final", params)
    return {"params": params, "history": history, "best_map": best_map}
