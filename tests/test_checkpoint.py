"""Checkpoint utils: save/restore roundtrip and overwrite semantics
(best-checkpoint names derive from rounded metrics and can repeat)."""

import jax.numpy as jnp
import numpy as np

from objectpermanence_tpu.utils import checkpoint as ckpt


def test_save_params_roundtrip_and_overwrite(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    path = tmp_path / "best_0.091"
    ckpt.save_params(path, params)
    restored = ckpt.restore_params(path, params)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(params["w"]))

    # same rounded-metric name again: must overwrite, not raise
    params2 = {"w": params["w"] + 1, "b": params["b"]}
    ckpt.save_params(path, params2)
    restored2 = ckpt.restore_params(path, params)
    np.testing.assert_array_equal(np.asarray(restored2["w"]),
                                  np.asarray(params2["w"]))


def test_train_state_roundtrip_and_overwrite(tmp_path):
    params = {"w": jnp.ones((2, 2))}
    opt_state = {"momentum": jnp.zeros((2, 2))}
    path = tmp_path / "epoch_0001"
    ckpt.save_train_state(path, params, opt_state, {"epoch": 1, "scheduler": {}})
    p, o, meta = ckpt.restore_train_state(path, params, opt_state)
    assert meta["epoch"] == 1
    # overwrite same epoch (resume re-run)
    ckpt.save_train_state(path, params, opt_state, {"epoch": 1, "scheduler": {}})
    assert ckpt.latest_checkpoint(tmp_path) == path.resolve()
