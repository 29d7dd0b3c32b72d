"""Loss semantics: reference-parity values + gradient safety at the
zero-delta singularity (regression for a real NaN mid-training)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from objectpermanence_tpu.train import losses


def test_losses_match_reference_formulas():
    rng = np.random.RandomState(0)
    out = rng.rand(3, 10, 4).astype(np.float32)
    labels = rng.rand(3, 10, 4).astype(np.float32)
    mask = (rng.rand(3, 10, 4) > 0.5)

    # reference: nn.L1Loss(reduction="none") (* mask) -> mean;
    # consistency = mean L2 norm of adjacent deltas (training_main.py:192-210)
    t_out, t_lab = torch.from_numpy(out), torch.from_numpy(labels)
    ref_pred = torch.mean(torch.abs(t_out - t_lab)).item()
    ref_pred_masked = torch.mean(
        torch.abs(t_out - t_lab) * torch.from_numpy(mask.astype(np.float32))).item()
    ref_cons = torch.mean(
        torch.norm(t_out[:, 1:] - t_out[:, :-1], p=2, dim=-1)).item()

    loss, parts = losses.total_loss(jnp.asarray(out), jnp.asarray(labels),
                                    jnp.asarray(mask), no_labels=False)
    np.testing.assert_allclose(float(parts["pred_loss"]), ref_pred, rtol=1e-5)
    np.testing.assert_allclose(float(parts["consistency_loss"]), ref_cons,
                               rtol=1e-4)
    assert float(loss) == float(parts["pred_loss"])  # labels variant: no cons

    loss_nl, parts_nl = losses.total_loss(jnp.asarray(out), jnp.asarray(labels),
                                          jnp.asarray(mask), no_labels=True)
    np.testing.assert_allclose(float(parts_nl["pred_loss"]), ref_pred_masked,
                               rtol=1e-5)
    np.testing.assert_allclose(
        float(loss_nl), ref_pred_masked + 0.5 * ref_cons, rtol=1e-4)


def test_consistency_gradient_finite_at_zero_deltas():
    out = jnp.ones((2, 5, 4))  # identical adjacent frames
    grad = jax.grad(lambda o: losses.consistency_loss(o))(out)
    assert bool(jnp.isfinite(grad).all())


def test_sample_weight_masks_final_batch_padding():
    """ADVICE r1 (low): padded (repeated) rows of the ragged final batch
    must carry zero gradient — the weighted loss over the padded batch must
    equal the plain loss over only the real rows."""
    rng = np.random.RandomState(0)
    real = 3
    out_real = rng.rand(real, 6, 4).astype(np.float32)
    labels_real = rng.rand(real, 6, 4).astype(np.float32)
    # pad by repeating the last row (DeviceDataset.batch_indices behavior)
    out = np.concatenate([out_real, np.repeat(out_real[-1:], 5 - real, 0)])
    labels = np.concatenate(
        [labels_real, np.repeat(labels_real[-1:], 5 - real, 0)])
    mask = np.zeros_like(labels, dtype=bool)
    weights = (np.arange(5) < real).astype(np.float32)

    loss_ref, _ = losses.total_loss(jnp.asarray(out_real),
                                    jnp.asarray(labels_real),
                                    jnp.asarray(mask[:real]), no_labels=False)
    loss_w, _ = losses.total_loss(jnp.asarray(out), jnp.asarray(labels),
                                  jnp.asarray(mask), no_labels=False,
                                  sample_weight=jnp.asarray(weights))
    np.testing.assert_allclose(float(loss_w), float(loss_ref), rtol=1e-6)

    # all-ones weights reproduce the unweighted loss bit-for-bit
    loss_plain, _ = losses.total_loss(jnp.asarray(out), jnp.asarray(labels),
                                      jnp.asarray(mask), no_labels=False)
    loss_ones, _ = losses.total_loss(jnp.asarray(out), jnp.asarray(labels),
                                     jnp.asarray(mask), no_labels=False,
                                     sample_weight=jnp.ones(5, jnp.float32))
    np.testing.assert_allclose(float(loss_ones), float(loss_plain), rtol=1e-7)
