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


def test_attention_ce_loss_targets_and_weights():
    """CE vs the containment-oracle targets: exact value on a hand case,
    ragged-batch padding rows excluded by sample_weight."""
    import jax.numpy as jnp
    import numpy as np
    from objectpermanence_tpu.train.losses import attention_ce_loss

    # logits (B=2, objects=3, T=2): put all mass on the target for row 0,
    # uniform for row 1
    big = 50.0
    logits = np.zeros((2, 3, 2), np.float32)
    logits[0, 1, 0] = big   # frame 0 target 1
    logits[0, 2, 1] = big   # frame 1 target 2
    targets = np.array([[1, 2], [0, 0]], np.int32)
    full = float(attention_ce_loss(jnp.asarray(logits), jnp.asarray(targets)))
    # row 0 CE ~ 0; row 1 CE = log(3) per frame
    np.testing.assert_allclose(full, np.log(3.0) / 2, rtol=1e-5)
    w = jnp.asarray([1.0, 0.0])
    only_row0 = float(attention_ce_loss(jnp.asarray(logits),
                                        jnp.asarray(targets), w))
    assert only_row0 < 1e-5


def test_opnet_att_ce_train_step_uses_tracks():
    """The opnet_att_ce spec adds the attention CE to the loss (metrics
    carry att_ce_loss) and training moves the who-to-attend logits toward
    the oracle targets."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from objectpermanence_tpu.models.registry import get_model_spec
    from objectpermanence_tpu.train.loop import make_optimizer, make_train_step

    cfg = {"object_to_track_pred_dim": 15, "object_to_track_hidden_dim": 16,
           "videos_hidden_dim": 32}
    spec = get_model_spec("opnet_att_ce", cfg)
    assert spec.att_ce_weight == 1.0
    params = spec.init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-2)
    opt_state = optimizer.init(params)
    step = make_train_step(spec, optimizer)
    rng = np.random.RandomState(0)
    boxes = jnp.asarray(rng.rand(4, 8, 15, 6), jnp.float32)
    labels = jnp.asarray(rng.rand(4, 8, 4), jnp.float32)
    mask = jnp.asarray(rng.rand(4, 8, 4) > 0.5)
    tracks = jnp.asarray(rng.randint(0, 15, (4, 8)), jnp.int32)
    first = None
    for i in range(30):
        params, opt_state, metrics = step(params, opt_state, boxes, labels,
                                          mask, jax.random.PRNGKey(i),
                                          None, tracks)
        if first is None:
            first = float(metrics["att_ce_loss"])
    assert "att_ce_loss" in metrics
    assert float(metrics["att_ce_loss"]) < first, \
        (float(metrics["att_ce_loss"]), first)
