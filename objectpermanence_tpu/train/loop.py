"""Training driver: jit-compiled train/eval steps over a device mesh.

TPU-native rework of `baselines/training_main.py:120-252`:
- the whole step (forward, loss, backward, Adam update) is ONE jit region
  with donated params/optimizer state — no host round-trips inside a batch
- epoch-end evaluation (denormalize -> per-video mean IoU -> containment
  mIoU) runs fully on device as vectorized jnp, replacing the reference's
  numpy `ResultsAnalyzer` round-trip
- batches are sharded over the mesh's data axis; XLA inserts the gradient
  all-reduce from the sharding annotations
- checkpoints are full training states (params + opt state + scheduler),
  resumable; best-dev params additionally saved like the reference's
  best-dev `.pth` (`training_main.py:19-29`)
"""

import time
from dataclasses import dataclass
from datetime import date
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from objectpermanence_tpu.data.ingest import IngestedDataset, batches
from objectpermanence_tpu.models.registry import ModelSpec
from objectpermanence_tpu.ops.boxes import FRAME_SHAPES, iou_xyxy
from objectpermanence_tpu.parallel.mesh import make_mesh, pad_batch_to, shard_batch
from objectpermanence_tpu.train.losses import total_loss
from objectpermanence_tpu.train.plateau import ReduceLROnPlateau
from objectpermanence_tpu.utils import checkpoint as ckpt


def _forward(spec: ModelSpec, params, boxes, deterministic, rng):
    if spec.double_output:
        out, _ = spec.apply(params, boxes, deterministic=deterministic, rng=rng)
    else:
        out = spec.apply(params, boxes, deterministic=deterministic, rng=rng)
    return out


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    # torch.optim.Adam defaults (b1=0.9, b2=0.999, eps=1e-8), lr injectable
    # so the plateau scheduler can retune it without recompilation.
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def make_train_step(spec: ModelSpec, optimizer):
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, boxes, labels, mask, rng):
        def loss_fn(p):
            # deterministic=False: dropout active in training (transformer)
            out = _forward(spec, p, boxes, False, rng)
            return total_loss(out, labels, mask, spec.no_labels)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


def make_eval_step(spec: ModelSpec):
    """Batch eval: loss pieces + per-video IoU stats, all on device."""

    @jax.jit
    def eval_step(params, boxes, labels, mask):
        out = _forward(spec, params, boxes, True, None)
        _, metrics = total_loss(out, labels, mask, spec.no_labels)

        # reference denormalizes to int32 pixels before IoU
        # (`training_main.py:97-100`)
        pred_px = (out * FRAME_SHAPES).astype(jnp.int32)
        label_px = (labels * FRAME_SHAPES).astype(jnp.int32)
        iou = iou_xyxy(pred_px.astype(jnp.float32), label_px.astype(jnp.float32))

        video_mean_iou = jnp.mean(iou, axis=1)                      # (B,)
        frame_mask = jnp.sum(mask, axis=-1).astype(bool)            # (B, T)
        masked_frames = jnp.sum(frame_mask, axis=1)                 # (B,)
        masked_iou_sum = jnp.sum(iou * frame_mask, axis=1)
        return metrics, video_mean_iou, masked_iou_sum, masked_frames

    return eval_step


def evaluate(spec: ModelSpec, eval_step, params, dataset: IngestedDataset,
             batch_size: int, mesh) -> Dict[str, float]:
    """Full-dataset eval: average loss, mean IoU, containment mIoU.

    Containment mIoU averages only videos with >=1 containment frame,
    matching the reference's NaN-skipping pandas mean
    (`training_main.py:105-115`)."""
    total = 0
    loss_sum = 0.0
    video_ious, cont_sums, cont_counts = [], [], []
    for batch in batches(dataset, batch_size):
        padded, real = pad_batch_to(batch, batch_size)
        sharded = shard_batch({k: v for k, v in padded.items() if k != "names"}, mesh)
        metrics, vid_iou, c_sum, c_cnt = eval_step(
            params, sharded["boxes"], sharded["labels"], sharded["mask"])
        loss_sum += float(metrics["loss"]) * real
        video_ious.append(np.asarray(vid_iou)[:real])
        cont_sums.append(np.asarray(c_sum)[:real])
        cont_counts.append(np.asarray(c_cnt)[:real])
        total += real

    video_ious = np.concatenate(video_ious)
    cont_sums = np.concatenate(cont_sums)
    cont_counts = np.concatenate(cont_counts)
    with_mask = cont_counts > 0
    containment_miou = (
        float(np.mean(cont_sums[with_mask] / cont_counts[with_mask]))
        if with_mask.any() else 0.0
    )
    return {
        "loss": loss_sum / max(total, 1),
        "mean_iou": float(np.mean(video_ious)),
        "containment_mean_iou": containment_miou,
    }


@dataclass
class TrainResult:
    params: Any
    best_dev_iou: float
    history: list


def training_main(spec: ModelSpec, train_dataset: IngestedDataset,
                  dev_dataset: IngestedDataset, train_config: Dict[str, Any],
                  model_config: Dict[str, int], *, mesh=None, seed: int = 0,
                  resume: bool = False) -> TrainResult:
    """Full training run with the reference's recipe
    (`configs/training_config.json`): Adam, plateau LR on train loss,
    best-dev-mIoU checkpointing."""
    batch_size = train_config["batch_size"]
    num_epochs = train_config["num_epochs"]
    learning_rate = train_config["learning_rate"]
    print_step = train_config.get("print_step", 100)
    eval_batch_size = train_config.get("inference_batch_size", 400)
    checkpoints_path = Path(train_config.get("checkpoints_path", "./checkpoints"))
    eval_batch_size = min(eval_batch_size, max(len(train_dataset), len(dev_dataset), 1))

    if mesh is None:
        mesh = make_mesh()
    # batches are padded to a fixed size; keep them divisible by the mesh
    data_par = mesh.shape["data"]
    batch_size = -(-batch_size // data_par) * data_par
    eval_batch_size = -(-eval_batch_size // data_par) * data_par

    params = spec.init(jax.random.PRNGKey(seed), model_config)
    optimizer = make_optimizer(learning_rate)
    opt_state = optimizer.init(params)
    scheduler = ReduceLROnPlateau(
        lr=learning_rate,
        factor=train_config.get("lr_scheduler_factor", 0.8),
        patience=train_config.get("lr_scheduler_patience", 2),
    )

    start_epoch = 0
    # -1 (not the reference's 0, `training_main.py:163`) so the first epoch
    # always produces a best-dev checkpoint even while dev mIoU is still 0.
    highest_dev_iou = -1.0
    ckpt_dir = checkpoints_path / spec.name
    if resume:
        latest = ckpt.latest_checkpoint(ckpt_dir / "resume")
        if latest is not None:
            params, opt_state, meta = ckpt.restore_train_state(latest, params, opt_state)
            scheduler.load_state_dict(meta["scheduler"])
            start_epoch = int(meta["epoch"])
            highest_dev_iou = float(meta["highest_dev_iou"])
            print(f"Resumed from {latest} at epoch {start_epoch}")

    train_step = make_train_step(spec, optimizer)
    eval_step = make_eval_step(spec)

    rng = jax.random.PRNGKey(seed + 1)
    history = []
    start_time = time.time()

    for epoch in range(start_epoch, num_epochs):
        epoch_num = epoch + 1
        running = {"loss": 0.0, "pred_loss": 0.0, "consistency_loss": 0.0}
        pending = []  # async metric pulls — don't block the device per batch

        for batch_idx, batch in enumerate(
                batches(train_dataset, batch_size, shuffle=True, seed=seed + epoch), 1):
            padded, _ = pad_batch_to(batch, batch_size)
            sharded = shard_batch({k: v for k, v in padded.items() if k != "names"}, mesh)
            rng, step_rng = jax.random.split(rng)
            params, opt_state, metrics = train_step(
                params, opt_state, sharded["boxes"], sharded["labels"],
                sharded["mask"], step_rng)
            pending.append(metrics)

            if batch_idx % print_step == 0:
                for m in pending:
                    for key in running:
                        running[key] += float(m[key])
                pending = []
                elapsed = int(time.time() - start_time)
                print(
                    f"Train Epoch: {epoch_num} [{batch_idx * batch_size}/"
                    f"{len(train_dataset)}]\t Average Loss: Total "
                    f"{running['loss'] / print_step:.4f}, Pred "
                    f"{running['pred_loss'] / print_step:.4f} Consistent "
                    f"{running['consistency_loss'] / print_step:.4f} "
                    f"Training began {elapsed} seconds ago")
                running = {k: 0.0 for k in running}

        train_metrics = evaluate(spec, eval_step, params, train_dataset,
                                 eval_batch_size, mesh)
        dev_metrics = evaluate(spec, eval_step, params, dev_dataset,
                               eval_batch_size, mesh)
        print(f"Epoch {epoch_num} Training Set: Loss {train_metrics['loss']:.4f}, "
              f"Mean IoU {train_metrics['mean_iou']:.6f}, "
              f"Mask Mean Iou {train_metrics['containment_mean_iou']:.6f}")
        print(f"Epoch {epoch_num} Dev Set: Loss {dev_metrics['loss']:.4f}, "
              f"Mean IoU {dev_metrics['mean_iou']:.6f}, "
              f"Mask Mean Iou {dev_metrics['containment_mean_iou']:.6f}")
        history.append({"epoch": epoch_num, "train": train_metrics, "dev": dev_metrics})

        new_lr = scheduler.step(train_metrics["loss"])
        opt_state.hyperparams["learning_rate"] = jnp.asarray(new_lr, dtype=jnp.float32)

        if dev_metrics["mean_iou"] > highest_dev_iou:
            highest_dev_iou = dev_metrics["mean_iou"]
            stamp = date.today().strftime("%d-%m-%y")
            best_path = ckpt_dir / f"{stamp}_{round(highest_dev_iou, 3)}"
            ckpt.save_params(best_path, params)
            print(f"Saved best model so far on dev set with type {spec.name} "
                  f"and performance mean IoU of: {round(highest_dev_iou, 3)}")

        ckpt.save_train_state(
            ckpt_dir / "resume" / f"epoch_{epoch_num:04d}", params, opt_state,
            {"epoch": epoch_num, "highest_dev_iou": highest_dev_iou,
             "scheduler": scheduler.state_dict()})

    return TrainResult(params=params, best_dev_iou=highest_dev_iou, history=history)
