"""Mesh + sharding helpers.

Strategy (SURVEY §2.15): the workload is many independent 300-frame videos,
so the batch axis is the scaling axis — `dp` over `DATA_AXIS` shards videos
across chips, gradients are averaged with a `psum` inserted by XLA from the
sharding annotations. `MODEL_AXIS` is available for tensor-parallel sharding
of the LSTM hidden dimension (used by the multi-chip dry run and for
headroom at large hidden sizes).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    used = n_data * n_model
    if len(devices) < used:
        raise ValueError(
            f"make_mesh needs {used} devices (n_data={n_data} x "
            f"n_model={n_model}) but only {len(devices)} are available "
            f"({[d.platform for d in devices]}). Provision a virtual CPU "
            f"mesh first: set XLA_FLAGS=--xla_force_host_platform_device_"
            f"count={used} and jax.config.update('jax_platforms', 'cpu') "
            f"before the backend initializes.")
    grid = np.asarray(devices[:used]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_pipe_mesh(n_data: Optional[int] = None, n_pipe: int = 2,
                   devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, pipe) mesh for pipeline parallelism
    (`parallel/pipeline.py`)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_pipe
    used = n_data * n_pipe
    if len(devices) < used:
        raise ValueError(f"make_pipe_mesh needs {used} devices, have "
                         f"{len(devices)}")
    grid = np.asarray(devices[:used]).reshape(n_data, n_pipe)
    return Mesh(grid, (DATA_AXIS, PIPE_AXIS))


def make_expert_mesh(n_data: Optional[int] = None, n_expert: int = 2,
                     devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, expert) mesh for expert parallelism
    (`parallel/expert.py`)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_expert
    used = n_data * n_expert
    if len(devices) < used:
        raise ValueError(f"make_expert_mesh needs {used} devices, have "
                         f"{len(devices)}")
    grid = np.asarray(devices[:used]).reshape(n_data, n_expert)
    return Mesh(grid, (DATA_AXIS, "expert"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put array members of a batch dict with batch-axis sharding.

    The batch size must divide the data axis; callers pad the final batch
    (video count is host-side knowledge, shapes stay static for jit).
    """
    sharding = batch_sharding(mesh)
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray) or hasattr(value, "shape"):
            out[key] = jax.device_put(value, sharding)
        else:
            out[key] = value
    return out


def pad_batch_to(batch: dict, size: int) -> tuple:
    """Pad all array members of `batch` along axis 0 up to `size` by
    repeating the last element; returns (padded_batch, real_count).
    Keeps jit shapes static across the ragged final batch."""
    arrays = {k: v for k, v in batch.items() if hasattr(v, "shape")}
    count = next(iter(arrays.values())).shape[0]
    if count == size:
        return batch, count
    out = dict(batch)
    for key, value in arrays.items():
        pad = np.repeat(value[-1:], size - count, axis=0)
        out[key] = np.concatenate([value, pad], axis=0)
    return out, count
