"""objectpermanence_tpu — a TPU-native (JAX/XLA/Pallas) framework for the
CATER "snitch localization" object-permanence task.

Re-designed from scratch for TPU hardware with the same capabilities as the
reference PyTorch/CUDA pipeline (ofrikleinfeld/ObjectPermanence):

- perception: object detection over raw CATER videos (XLA backbone,
  padded top-k proposal selection, Pallas RoIAlign/NMS)
- reasoning: OPNet + learned baselines as fused scan/Pallas kernels
- programmed baselines: heuristic containment reasoner, visual tracker
- drivers: training / inference / preprocess / analysis / cater_inference
- analysis: vectorized IoU / mAP metrics with containment masks

Compute path is jit-compiled JAX sharded over a `jax.sharding.Mesh`
(data-parallel batch-of-videos as the primary axis); host-side IO feeds
dense, statically-shaped device arrays.
"""

__version__ = "0.1.0"

VIDEO_NUM_FRAMES = 300
FRAME_WIDTH = 320
FRAME_HEIGHT = 240
MAX_OBJECTS_IN_FRAME = 15
