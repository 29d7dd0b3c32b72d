"""Checkpoint utils: save/restore roundtrip and overwrite semantics
(best-checkpoint names derive from rounded metrics and can repeat)."""

import jax
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


def test_init_model_resolves_checkpoint_tree(tmp_path):
    """`inference_config.json: model_path` may point at the checkpoint TREE
    (`<root>/<model>/` with `<stamp>_<miou>` leaves) — the natural analogue
    of the reference's single .pth path — or directly at a leaf; both load
    the best-dev params (registry.init_model)."""
    from objectpermanence_tpu.models.registry import init_model

    cfg = {"object_to_track_pred_dim": 15, "object_to_track_hidden_dim": 16,
           "videos_hidden_dim": 24}
    spec, params = init_model("opnet", cfg, seed=3)
    tree = tmp_path / "opnet"
    ckpt.save_params(tree / "17-08-26_0.25", params)
    # a worse checkpoint and a resume dir must not win
    _, worse = init_model("opnet", cfg, seed=4)
    ckpt.save_params(tree / "16-08-26_0.10", worse)
    ckpt.save_train_state(tree / "resume" / "epoch_0001", params,
                          {"m": jnp.zeros(2)}, {"epoch": 1})

    flat = jax.tree_util.tree_leaves(params)
    for path in (tree, tree / "17-08-26_0.25"):
        _, loaded = init_model("opnet", cfg, seed=9, checkpoint_path=path)
        got = jax.tree_util.tree_leaves(loaded)
        for a, b in zip(flat, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
