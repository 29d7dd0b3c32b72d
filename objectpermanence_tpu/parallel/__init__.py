"""Device-mesh parallelism: mesh construction, batch/param shardings.

Replaces the reference's vestigial NCCL `torch.distributed` helpers
(`object_detection/utils.py:260-326`) with first-class `jax.sharding`:
data parallelism over the batch-of-videos axis is the primary strategy,
with optional tensor parallelism over hidden dims; XLA lowers the implied
collectives onto ICI.
"""

from objectpermanence_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate, batch_sharding, DATA_AXIS, MODEL_AXIS,
)
