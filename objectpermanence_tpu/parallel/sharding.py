"""Tensor-parallel parameter shardings for the reasoning models.

LSTM tensor parallelism over MODEL_AXIS: the 4H gate dimension of both
`w_ih` and `w_hh` is sharded, so each model shard owns H/n of every gate.
The recurrence `h @ w_hh` then contracts a model-sharded H against a
replicated-H/sharded-4H weight; XLA inserts the reduce-scatter/all-gather
pattern it derives from the annotations. Linear heads consuming a sharded
hidden activation shard their input dim, producing a psum into replicated
outputs. Batch stays on DATA_AXIS throughout.
"""

import warnings
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from objectpermanence_tpu.parallel.mesh import MODEL_AXIS


def _leaf_spec(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    key = names[-1] if names else ""
    if leaf.ndim != 2:
        return P()
    rows, cols = leaf.shape
    if key in ("w_ih", "w_hh"):
        return P(None, MODEL_AXIS)        # shard the 4H gate dim
    if key == "w" and rows > cols:
        return P(MODEL_AXIS, None)        # head consuming sharded hidden
    return P()


def tp_param_shardings(params: Any, mesh: Mesh, strict: bool = False):
    """Per-leaf NamedShardings implementing hidden-dim tensor parallelism.
    Leaves whose sharded dim doesn't divide the mesh axis fall back to
    replication with a warning (keeps tiny test shapes valid); with
    `strict=True` they raise instead, so a config-size regression cannot
    silently disable tensor parallelism."""
    model_par = mesh.shape[MODEL_AXIS]

    def spec_for(path, leaf):
        spec = _leaf_spec(path, leaf)
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % model_par != 0:
                desc = (f"tp: {jax.tree_util.keystr(path)} dim {dim} "
                        f"({leaf.shape[dim]}) does not divide model axis "
                        f"({model_par})")
                if strict:
                    raise ValueError(desc + "; refusing silent replication")
                warnings.warn(desc + "; replicating this leaf", stacklevel=2)
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Any, mesh: Mesh, strict: bool = False):
    shardings = tp_param_shardings(params, mesh, strict=strict)
    return jax.tree.map(jax.device_put, params, shardings)
