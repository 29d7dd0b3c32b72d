"""Training driver: jit-compiled train/eval steps over a device mesh.

TPU-native rework of `baselines/training_main.py:120-252`:
- the whole step (forward, loss, backward, Adam update) is ONE jit region
  with donated params/optimizer state — no host round-trips inside a batch
- datasets are device-resident: arrays are put in HBM once and batches are
  gathered ON DEVICE by index (H2D per step is just the index vector) —
  critical when the host<->device link is slow
- epoch-end evaluation (denormalize -> per-video mean IoU -> containment
  mIoU) runs fully on device as vectorized jnp, replacing the reference's
  numpy `ResultsAnalyzer` round-trip
- batches are sharded over the mesh's data axis; XLA inserts the gradient
  all-reduce from the sharding annotations
- checkpoints are full training states (params + opt state + scheduler),
  resumable; best-dev params additionally saved like the reference's
  best-dev `.pth` (`training_main.py:19-29`)
- observability: optional jax.profiler trace of epoch 1, jax_debug_nans,
  per-epoch jsonl metrics, NaN-loss abort (reference `engine.py:42-45`)
"""

import json
import time
from dataclasses import dataclass
from datetime import date
from functools import partial
from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from objectpermanence_tpu.config import TrainingConfig, training_config_from
from objectpermanence_tpu.data.ingest import IngestedDataset
from objectpermanence_tpu.models.registry import ModelSpec
from objectpermanence_tpu.ops.boxes import FRAME_SHAPES, iou_xyxy
from objectpermanence_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
from objectpermanence_tpu.train.losses import total_loss
from objectpermanence_tpu.train.plateau import ReduceLROnPlateau
from objectpermanence_tpu.utils import checkpoint as ckpt


def _forward(spec: ModelSpec, params, boxes, deterministic, rng,
             with_aux: bool = False, sample_weight=None,
             with_logits: bool = False):
    """-> model output, or (output, aux loss scalar) when `with_aux` and the
    spec carries an auxiliary training loss (opnet_moe's Switch balance
    term), or (output, logits, aux) when additionally `with_logits`.
    `sample_weight` (B,) keeps ragged-batch padding rows out of the
    balance statistics."""
    if with_aux and spec.aux_loss_weight:
        out, logits, aux = spec.apply(params, boxes,
                                      deterministic=deterministic,
                                      rng=rng, return_aux=True,
                                      aux_token_weight=sample_weight)
    elif spec.double_output:
        out, logits = spec.apply(params, boxes, deterministic=deterministic,
                                 rng=rng)
        aux = jnp.zeros(())
    else:
        out, logits, aux = spec.apply(params, boxes,
                                      deterministic=deterministic,
                                      rng=rng), None, jnp.zeros(())
    if with_logits:
        return out, logits, aux
    return (out, aux) if with_aux else out


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    # torch.optim.Adam defaults (b1=0.9, b2=0.999, eps=1e-8), lr injectable
    # so the plateau scheduler can retune it without recompilation.
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def make_train_step(spec: ModelSpec, optimizer):
    """On TPU, LSTM recurrences run through the custom-VJP fused Pallas
    scans (forward AND backward as reverse-time kernels)."""
    on_tpu = jax.default_backend() == "tpu"

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, boxes, labels, mask, rng, weights=None,
                   tracks=None):
        def loss_fn(p):
            from objectpermanence_tpu.ops import lstm as lstm_ops
            # deterministic=False: dropout active in training (transformer)
            with lstm_ops.fused_scan(on_tpu):
                out, logits, aux = _forward(spec, p, boxes, False, rng,
                                            with_aux=True,
                                            sample_weight=weights,
                                            with_logits=True)
            # weights: (B,) 0/1 vector zeroing the repeated-row padding of
            # the ragged final batch so duplicates carry no gradient
            loss, metrics = total_loss(out, labels, mask, spec.no_labels,
                                       sample_weight=weights)
            if spec.aux_loss_weight:
                loss = loss + spec.aux_loss_weight * aux
                metrics = {**metrics, "loss": loss, "balance_loss": aux}
            if spec.att_ce_weight and tracks is not None:
                from objectpermanence_tpu.train.losses import attention_ce_loss
                att_ce = attention_ce_loss(logits, tracks,
                                           sample_weight=weights)
                loss = loss + spec.att_ce_weight * att_ce
                metrics = {**metrics, "loss": loss, "att_ce_loss": att_ce}
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


def make_eval_step(spec: ModelSpec):
    """Batch eval: loss pieces + per-video IoU stats, all on device.
    On TPU the LSTM recurrences use the fused Pallas scan (bit-exact vs the
    XLA path; no autodiff needed in eval)."""
    on_tpu = jax.default_backend() == "tpu"

    @jax.jit
    def eval_step(params, boxes, labels, mask):
        from objectpermanence_tpu.ops import lstm as lstm_ops
        with lstm_ops.fused_scan(on_tpu):
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


class DeviceDataset:
    """Dataset resident in device HBM; batches gathered on device by index
    with the gather output sharded over the mesh's data axis."""

    def __init__(self, dataset: IngestedDataset, mesh):
        repl = replicate(mesh)
        self.count = len(dataset)
        self.boxes = jax.device_put(dataset.boxes, repl)
        self.labels = jax.device_put(dataset.labels, repl)
        mask = (dataset.containment_mask if dataset.containment_mask is not None
                else np.zeros(dataset.labels.shape, dtype=bool))
        self.mask = jax.device_put(mask, repl)
        tracks = (dataset.index_to_track
                  if dataset.index_to_track is not None
                  else np.zeros(dataset.labels.shape[:2], dtype=np.int32))
        self.tracks = jax.device_put(np.asarray(tracks, np.int32), repl)
        out = batch_sharding(mesh)
        self._gather = jax.jit(
            lambda boxes, labels, mask, tracks, idx:
                (boxes[idx], labels[idx], mask[idx], tracks[idx]),
            out_shardings=(out, out, out, out))

    def batch(self, indices: np.ndarray):
        return self._gather(self.boxes, self.labels, self.mask, self.tracks,
                            jnp.asarray(indices, jnp.int32))

    def batch_indices(self, batch_size: int, *, shuffle: bool = False, seed: int = 0):
        """Yield (padded index vector, real count) covering the dataset."""
        order = np.arange(self.count)
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        for start in range(0, self.count, batch_size):
            sel = order[start:start + batch_size]
            real = len(sel)
            if real < batch_size:
                sel = np.concatenate([sel, np.repeat(sel[-1:], batch_size - real)])
            yield sel, real


def evaluate(eval_step, params, data: DeviceDataset, batch_size: int) -> Dict[str, float]:
    """Full-dataset eval: average loss, mean IoU, containment mIoU.

    Containment mIoU averages only videos with >=1 containment frame,
    matching the reference's NaN-skipping pandas mean
    (`training_main.py:105-115`)."""
    total = 0
    loss_sum = 0.0
    video_ious, cont_sums, cont_counts = [], [], []
    for indices, real in data.batch_indices(batch_size):
        boxes, labels, mask, _ = data.batch(indices)
        metrics, vid_iou, c_sum, c_cnt = eval_step(params, boxes, labels, mask)
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
                  dev_dataset: IngestedDataset, train_config,
                  model_config: Dict[str, int], *, mesh=None,
                  resume: bool = False) -> TrainResult:
    """Full training run with the reference's recipe
    (`configs/training_config.json`): Adam, plateau LR on train loss,
    best-dev-mIoU checkpointing."""
    cfg: TrainingConfig = training_config_from(train_config)
    seed = cfg.seed

    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    if mesh is None:
        mesh = make_mesh()
    # batches are padded to a fixed size; keep them divisible by the mesh
    data_par = mesh.shape["data"]
    batch_size = -(-cfg.batch_size // data_par) * data_par
    eval_batch_size = min(cfg.inference_batch_size,
                          max(len(train_dataset), len(dev_dataset), 1))
    eval_batch_size = -(-eval_batch_size // data_par) * data_par

    train_data = DeviceDataset(train_dataset, mesh)
    dev_data = DeviceDataset(dev_dataset, mesh)

    params = spec.init(jax.random.PRNGKey(seed), model_config)
    optimizer = make_optimizer(cfg.learning_rate)
    opt_state = optimizer.init(params)
    scheduler = ReduceLROnPlateau(lr=cfg.learning_rate,
                                  factor=cfg.lr_scheduler_factor,
                                  patience=cfg.lr_scheduler_patience)

    start_epoch = 0
    # -1 (not the reference's 0, `training_main.py:163`) so the first epoch
    # always produces a best-dev checkpoint even while dev mIoU is still 0.
    highest_dev_iou = -1.0
    ckpt_dir = Path(cfg.checkpoints_path) / spec.name
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
    metrics_path = Path(cfg.metrics_file) if cfg.metrics_file else None

    for epoch in range(start_epoch, cfg.num_epochs):
        epoch_num = epoch + 1
        profiling = cfg.profile_dir is not None and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(cfg.profile_dir)
        epoch_start = time.time()
        running = {"loss": 0.0, "pred_loss": 0.0, "consistency_loss": 0.0}
        pending = []  # async metric pulls — don't block the device per batch

        for batch_idx, (indices, real) in enumerate(
                train_data.batch_indices(batch_size, shuffle=True,
                                         seed=seed + epoch), 1):
            boxes, labels, mask, tracks = train_data.batch(indices)
            weights = jnp.asarray(
                (np.arange(batch_size) < real).astype(np.float32))
            rng, step_rng = jax.random.split(rng)
            params, opt_state, metrics = train_step(
                params, opt_state, boxes, labels, mask, step_rng, weights,
                tracks)
            pending.append(metrics)

            if batch_idx % cfg.print_step == 0:
                for m in pending:
                    for key in running:
                        running[key] += float(m[key])
                pending = []
                if not np.isfinite(running["loss"]):
                    raise RuntimeError(
                        f"Loss is {running['loss'] / cfg.print_step}, "
                        f"stopping training")  # reference engine.py:42-45
                elapsed = int(time.time() - start_time)
                print(
                    f"Train Epoch: {epoch_num} [{batch_idx * batch_size}/"
                    f"{len(train_dataset)}]\t Average Loss: Total "
                    f"{running['loss'] / cfg.print_step:.4f}, Pred "
                    f"{running['pred_loss'] / cfg.print_step:.4f} Consistent "
                    f"{running['consistency_loss'] / cfg.print_step:.4f} "
                    f"Training began {elapsed} seconds ago")
                running = {k: 0.0 for k in running}

        if profiling:
            jax.block_until_ready(params)
            jax.profiler.stop_trace()

        train_metrics = evaluate(eval_step, params, train_data, eval_batch_size)
        dev_metrics = evaluate(eval_step, params, dev_data, eval_batch_size)
        if not np.isfinite(train_metrics["loss"]):
            raise RuntimeError(f"Loss is {train_metrics['loss']}, stopping training")
        print(f"Epoch {epoch_num} Training Set: Loss {train_metrics['loss']:.4f}, "
              f"Mean IoU {train_metrics['mean_iou']:.6f}, "
              f"Mask Mean Iou {train_metrics['containment_mean_iou']:.6f}")
        print(f"Epoch {epoch_num} Dev Set: Loss {dev_metrics['loss']:.4f}, "
              f"Mean IoU {dev_metrics['mean_iou']:.6f}, "
              f"Mask Mean Iou {dev_metrics['containment_mean_iou']:.6f}")
        epoch_record = {"epoch": epoch_num, "train": train_metrics,
                        "dev": dev_metrics,
                        "epoch_seconds": round(time.time() - epoch_start, 2),
                        "learning_rate": scheduler.lr}
        history.append(epoch_record)
        if metrics_path is not None:
            with open(metrics_path, "a") as f:
                f.write(json.dumps(epoch_record) + "\n")

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
