"""Losses: L1 prediction + temporal-consistency, with the no-labels masking.

Semantics per the reference train loop (`baselines/training_main.py:192-210`):
- `pred_loss` = elementwise L1 over (B, 300, 4); for `*_no_labels` models it
  is multiplied by the visible-frames mask BEFORE the mean (so the mean is
  still over all elements — masked frames contribute zeros, exactly like
  `nn.L1Loss(reduction="none") * mask` followed by `torch.mean`).
- `consistency_loss` = mean over (B, 299) of the L2 norm of adjacent-frame
  output deltas.
- total = pred + 0.5 * consistency for no-labels models, else pred only.
"""

from typing import Tuple

import jax.numpy as jnp

CONSISTENCY_RATE = 0.5


def _weighted_mean(loss: jnp.ndarray, sample_weight: jnp.ndarray) -> jnp.ndarray:
    """Mean with per-sample (leading-axis) weights, normalized so that
    all-ones weights reproduce jnp.mean exactly. Used to zero out the
    repeated-row padding of the final batch (the reference's DataLoader
    just yields a smaller final batch; our jit shapes are static, so the
    padding must be masked out of the gradient instead)."""
    w = sample_weight.reshape((-1,) + (1,) * (loss.ndim - 1))
    denom = jnp.maximum(jnp.mean(sample_weight), 1e-12)
    return jnp.mean(loss * w) / denom


def l1_pred_loss(output: jnp.ndarray, labels: jnp.ndarray,
                 mask: jnp.ndarray = None,
                 sample_weight: jnp.ndarray = None) -> jnp.ndarray:
    loss = jnp.abs(output - labels)
    if mask is not None:
        loss = loss * mask
    if sample_weight is not None:
        return _weighted_mean(loss, sample_weight)
    return jnp.mean(loss)


def consistency_loss(output: jnp.ndarray, eps: float = 1e-12,
                     sample_weight: jnp.ndarray = None) -> jnp.ndarray:
    """Mean L2 norm of adjacent-frame deltas. The plain norm has a NaN
    gradient at exactly-zero deltas (d/dx sqrt(x) at 0), which real runs hit
    once the model emits identical adjacent boxes — the eps inside the sqrt
    keeps the gradient finite while changing the value by < 1e-6."""
    deltas = output[:, 1:, :] - output[:, :-1, :]
    norms = jnp.sqrt(jnp.sum(deltas * deltas, axis=-1) + eps)
    if sample_weight is not None:
        return _weighted_mean(norms, sample_weight)
    return jnp.mean(norms)


def attention_ce_loss(logits: jnp.ndarray, index_to_track: jnp.ndarray,
                      sample_weight: jnp.ndarray = None) -> jnp.ndarray:
    """Cross-entropy between the who-to-attend logits (B, objects, T) — the
    OPNet-family second output, reference `learned_models.py:50-52` — and
    the containment-oracle targets (B, T) from the datasets
    (`datasets.py:199-257`). The reference computes both and drops them on
    the floor (`training_main.py:185-186`); the beyond-reference
    opnet_att_ce variant adds this term to the loss."""
    import optax

    ce = optax.softmax_cross_entropy_with_integer_labels(
        jnp.swapaxes(logits, 1, 2), index_to_track)        # (B, T)
    if sample_weight is not None:
        return _weighted_mean(ce, sample_weight)
    return jnp.mean(ce)


def total_loss(output: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray,
               no_labels: bool,
               sample_weight: jnp.ndarray = None) -> Tuple[jnp.ndarray, dict]:
    cons = consistency_loss(output, sample_weight=sample_weight)
    if no_labels:
        pred = l1_pred_loss(output, labels, mask.astype(output.dtype),
                            sample_weight=sample_weight)
        loss = pred + CONSISTENCY_RATE * cons
    else:
        pred = l1_pred_loss(output, labels, sample_weight=sample_weight)
        loss = pred
    return loss, {"loss": loss, "pred_loss": pred, "consistency_loss": cons}
