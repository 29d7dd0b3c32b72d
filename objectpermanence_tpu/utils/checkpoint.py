"""Checkpointing via orbax: params + optimizer state + step, with resume.

The reference only ever saves best-dev `state_dict` files and cannot resume
reasoning training (`baselines/training_main.py:19-29`, SURVEY §5); here
checkpoints are full training states so interrupted runs restart cleanly.
"""

import json
from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp


def _as_abs(path) -> Path:
    return Path(path).expanduser().resolve()


def save_params(path, params) -> None:
    """Save a bare parameter pytree (the reference's `torch.save(state_dict)`
    analogue, `training_main.py:27-28`). Overwrites like torch.save —
    best-checkpoint names derive from rounded metrics and can repeat."""
    path = _as_abs(path)
    if path.exists():
        import shutil
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(params))


def restore_params(path, like_params):
    """Restore a parameter pytree saved by `save_params`, using
    `like_params` for structure/shape/dtype. Returns DEVICE arrays: orbax
    restores host numpy, and feeding host arrays to a jit re-uploads every
    parameter on every dispatch — ruinous over a low-bandwidth host link
    (mesh users re-`device_put` with their shardings)."""
    path = _as_abs(path)
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(like_params))
    with ocp.StandardCheckpointer() as ckptr:
        return jax.device_put(ckptr.restore(path, abstract))


def save_train_state(path, params, opt_state, metadata: dict) -> None:
    """Full resumable state: params + optax opt_state + host metadata.
    Overwrites (a re-run after resume revisits epoch numbers)."""
    path = _as_abs(path)
    state = {"params": jax.device_get(params), "opt_state": jax.device_get(opt_state)}
    if (path / "state").exists():
        import shutil
        shutil.rmtree(path / "state")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "state", state)
    (path / "metadata.json").write_text(json.dumps(metadata, default=float))


def restore_train_state(path, like_params, like_opt_state):
    path = _as_abs(path)
    abstract = {
        "params": jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(like_params)),
        "opt_state": jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(like_opt_state)),
    }
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path / "state", abstract)
    metadata = json.loads((path / "metadata.json").read_text())
    return state["params"], state["opt_state"], metadata


def best_params_checkpoint(checkpoint_dir) -> Optional[Path]:
    """Best-dev params checkpoint under `checkpoint_dir`: directories named
    `<stamp>_<dev_miou>` by the training loop; picks the highest mIoU
    (ties broken by recency), skipping the `resume/` tree."""
    checkpoint_dir = _as_abs(checkpoint_dir)
    if not checkpoint_dir.is_dir():
        return None

    def score(p: Path) -> Optional[float]:
        try:
            return float(p.name.rsplit("_", 1)[1])
        except (IndexError, ValueError):
            return None

    def is_params_checkpoint(p: Path) -> bool:
        # structural check: an orbax StandardCheckpointer tree, not just any
        # directory with a numeric suffix (e.g. an aborted run's artifacts)
        return (p / "_METADATA").exists() or (p / "_CHECKPOINT_METADATA").exists()

    candidates = [(score(p), p.stat().st_mtime, p)
                  for p in checkpoint_dir.iterdir()
                  if p.is_dir() and p.name != "resume" and score(p) is not None
                  and is_params_checkpoint(p)]
    if not candidates:
        return None
    return max(candidates)[2]


def latest_checkpoint(checkpoint_dir) -> Optional[Path]:
    """Most recent resumable checkpoint under `checkpoint_dir`, if any."""
    checkpoint_dir = _as_abs(checkpoint_dir)
    if not checkpoint_dir.exists():
        return None
    candidates = [p for p in checkpoint_dir.iterdir() if (p / "metadata.json").exists()]
    if not candidates:
        return None
    return max(candidates, key=lambda p: p.stat().st_mtime)
