"""TPU-native Faster R-CNN perception stack.

Replaces the reference's torchvision `fasterrcnn_resnet50_fpn`
(`object_detection/models.py:6-20`) and its C++/CUDA ops with pure
JAX/XLA + the padded-static formulations in `ops/nms.py` and
`ops/roi_align.py`. Functional parameter pytrees throughout; the whole
per-batch forward (backbone -> FPN -> RPN -> RoI heads -> postprocess)
is one jit region with static shapes.
"""

from objectpermanence_tpu.models.detector.detector import CaterDetector  # noqa: F401
