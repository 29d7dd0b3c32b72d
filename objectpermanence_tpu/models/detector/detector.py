"""Full Faster R-CNN assembly: config, init, jit forward, video driver.

Equivalent surface to the reference's `CaterObjectDetector`
(`baselines/detector.py`) + `get_fast_rcnn_for_fine_tune`
(`object_detection/models.py:6-20`), built from the TPU-native pieces.
All shapes static: images are resized/padded to a fixed pyramid, proposals
and detections are fixed-width padded arrays with NEG_INF score padding.
"""

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from objectpermanence_tpu.models.detector import anchors as anchor_lib
from objectpermanence_tpu.models.detector import fpn, resnet, rpn, roi_heads
from objectpermanence_tpu.ops.nms import NEG_INF

# the reference normalizes frames by /256 before the detector
# (`baselines/detector.py:77`); the ImageNet mean/std then applies inside
# the torchvision transform — both preserved here.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def cast_floating(tree, dtype):
    """Cast floating-point leaves of a pytree to `dtype` (mixed-precision
    compute; integer leaves untouched)."""
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, tree)


@dataclass(frozen=True)
class DetectorConfig:
    num_classes: int = 193            # includes background slot 0 (see note
                                      # in roi_heads.postprocess_detections)
    image_hw: Tuple[int, int] = (240, 320)   # raw CATER frames (H, W)
    min_size: int = 800
    max_size: int = 1333
    backbone_layers: Tuple[int, ...] = (3, 4, 6, 3)
    backbone_width: int = 64
    backbone_norm: str = "frozen"     # "frozen" (pretrained fine-tune) or
                                      # "group" (from-scratch training)
    fpn_channels: int = 256
    anchor_sizes: Tuple[float, ...] = anchor_lib.DEFAULT_SIZES
    rpn_pre_nms_top_n: int = 1000
    rpn_post_nms_top_n: int = 1000
    rpn_nms_thresh: float = 0.7
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 100
    # MXU-friendly mixed precision: "bfloat16" runs backbone/FPN/heads in
    # bf16 while box decode, NMS, and losses stay float32. The reference's
    # CUDA recipe is fp32-only (`object_detection/training.py`); bf16 is the
    # TPU-native speed path (params remain fp32 masters).
    compute_dtype: str = "float32"
    # RoIAlign backend: "auto" uses the whole-batch roi-tiled Pallas kernel
    # (ops/pallas_roi_align.py, ~5x the XLA gather) when on TPU, the
    # pyramid fits VMEM, and execution is single-device, else the gather
    # path; "gather"/"pallas" force one. Under a multi-device mesh "auto"
    # always picks gather — pallas_call has no partitioning rule, so GSPMD
    # would replicate the whole-batch kernel per device.
    roi_backend: str = "auto"

    @property
    def scale(self) -> float:
        h, w = self.image_hw
        return min(self.min_size / min(h, w), self.max_size / max(h, w))

    @property
    def resized_hw(self) -> Tuple[int, int]:
        h, w = self.image_hw
        return (int(round(h * self.scale)), int(round(w * self.scale)))

    @property
    def padded_hw(self) -> Tuple[int, int]:
        h, w = self.resized_hw
        return (math.ceil(h / 32) * 32, math.ceil(w / 32) * 32)

    @property
    def strides(self) -> Tuple[int, ...]:
        return (4, 8, 16, 32, 64)

    def feature_shapes(self) -> List[Tuple[int, int]]:
        h, w = self.padded_hw
        return [(math.ceil(h / s), math.ceil(w / s)) for s in self.strides]


def detector_init(key, config: DetectorConfig, dtype=jnp.float32) -> Dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    backbone = resnet.resnet_init(k1, config.backbone_layers,
                                  config.backbone_width, dtype,
                                  norm=config.backbone_norm)
    channels = resnet.out_channels(config.backbone_layers, config.backbone_width)
    return {
        "backbone": backbone,
        "fpn": fpn.fpn_init(k2, channels, config.fpn_channels, dtype),
        "rpn": rpn.rpn_head_init(k3, config.fpn_channels, 3, dtype),
        "box_head": roi_heads.box_head_init(
            k4, config.fpn_channels, 7, 1024, config.num_classes, dtype),
    }


def preprocess_images(images: jax.Array, config: DetectorConfig) -> jax.Array:
    """uint8/float RGB (B, H0, W0, 3) -> normalized, resized, padded
    (B, Hp, Wp, 3)."""
    x = images.astype(jnp.float32) / 256.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    rh, rw = config.resized_hw
    b = x.shape[0]
    x = jax.image.resize(x, (b, rh, rw, 3), method="bilinear")
    ph, pw = config.padded_hw
    return jnp.pad(x, ((0, 0), (0, ph - rh), (0, pw - rw), (0, 0)))


def forward_features(params, images_prepped, config: DetectorConfig):
    """Backbone + FPN over preprocessed images -> [P2..P6] (NHWC), in
    `config.compute_dtype` (bf16 pyramid under mixed precision)."""
    dtype = jnp.dtype(config.compute_dtype)
    if dtype != jnp.float32:
        params = cast_floating({"backbone": params["backbone"],
                                "fpn": params["fpn"]}, dtype)
        images_prepped = images_prepped.astype(dtype)
    backbone_feats = resnet.resnet_apply(params["backbone"], images_prepped,
                                         norm=config.backbone_norm)
    return fpn.fpn_apply(params["fpn"], backbone_feats)


def propose(params, pyramid, config: DetectorConfig, anchor_arrays):
    objectness, deltas = rpn.rpn_head_apply(params["rpn"], pyramid)
    proposals, scores = rpn.generate_proposals(
        [jax.nn.sigmoid(o) for o in objectness], deltas, anchor_arrays,
        config.padded_hw, config.rpn_pre_nms_top_n, config.rpn_post_nms_top_n,
        config.rpn_nms_thresh)
    return proposals, scores


def _use_pallas_roi(config: DetectorConfig, under_mesh: bool = False,
                    needs_grad: bool = False) -> str:
    """Pick the RoIAlign backend: "" (gather), "resident" (whole-batch
    VMEM-resident tiled kernel) or "windowed" (per-roi DMA windows, for
    pyramids too large for VMEM — the 800px COCO recipe). The resident
    kernel has a Pallas backward; the windowed kernel pairs its forward
    with an exact gather-transpose backward
    (`roi_align_windowed_trainable`) but drops out-of-window taps for
    >~5:1-aspect rois, which early-training RPN proposals routinely
    produce — so AUTO dispatch keeps the exact gather path whenever grads
    are needed, and windowed training is explicit opt-in
    (roi_backend="windowed", for fine-tuning with a warmed-up RPN)."""
    if config.roi_backend == "gather":
        return ""
    if config.roi_backend in ("pallas", "windowed"):
        return "resident" if config.roi_backend == "pallas" else "windowed"
    if under_mesh:
        # pallas_call has no GSPMD partitioning rule: under a sharded mesh
        # the whole-batch kernel would be replicated (or fail to compile)
        # instead of running per-shard — use the gather path, which XLA
        # partitions cleanly over the batch axis
        return ""
    if jax.default_backend() != "tpu":
        return ""
    # Mosaic's minor-dim reshape needs a 128-multiple channel chunk
    if config.fpn_channels % 128 != 0:
        return ""
    # per-level feature planes of ONE image must fit VMEM alongside the
    # kernel's working set (true at the native CATER resolution); larger
    # pyramids stream per-roi windows instead
    h, w = config.padded_hw
    total = sum(math.ceil(h / s) * math.ceil(w / s) for s in (4, 8, 16, 32))
    if total * config.fpn_channels * 4 <= 8 * 2**20:
        return "resident"
    return "" if needs_grad else "windowed"


def batched_roi_align(pyramid, proposals, config: DetectorConfig,
                      layout: str = "nchw", under_mesh: bool = False,
                      needs_grad: bool = False):
    """Pyramid levels (NCHW, or NHWC with layout="nhwc") + (B, N, 4) rois
    -> (B, N, C, p, p), dispatching to the whole-batch roi-tiled Pallas
    kernel or the XLA gather path (identical semantics). Pass
    `under_mesh=True` when the surrounding jit runs over sharded inputs
    (see `_use_pallas_roi`)."""
    backend = _use_pallas_roi(config, under_mesh, needs_grad)
    if backend:
        from objectpermanence_tpu.ops.pallas_roi_align import (
            roi_align_pallas_batched, roi_align_pallas_windowed,
            roi_align_windowed_trainable,
        )
        levels = jax.vmap(roi_heads.assign_levels)(proposals)
        if backend == "resident":
            roi_fn = roi_align_pallas_batched
        else:
            roi_fn = (roi_align_windowed_trainable if needs_grad
                      else roi_align_pallas_windowed)
        pooled = roi_fn(pyramid, proposals, levels, roi_heads.ROI_STRIDES,
                        layout=layout)
        return pooled.astype(pyramid[0].dtype)
    if layout == "nhwc":
        pyramid = [jnp.moveaxis(p, -1, 1) for p in pyramid]
    return jax.vmap(lambda feats, props:
                    roi_heads.multiscale_roi_align(feats, props))(
        pyramid, proposals)


def detect_forward(params, images, config: DetectorConfig, anchor_arrays):
    """Full inference forward for a batch of raw frames.
    -> boxes (B, D, 4) in ORIGINAL image coords, labels, scores, valid."""
    prepped = preprocess_images(images, config)
    pyramid = forward_features(params, prepped, config)
    proposals, prop_scores = propose(params, pyramid, config, anchor_arrays)

    # the pallas kernel consumes the backbone's native NHWC directly; the
    # gather fallback transposes internally
    pooled = batched_roi_align(pyramid[:4], proposals, config,
                               layout="nhwc")                      # (B,N,C,p,p)

    def per_image(pooled_i, props, pscores):
        cls_logits, box_deltas = roi_heads.box_head_apply(params["box_head"],
                                                          pooled_i)
        return roi_heads.postprocess_detections(
            cls_logits, box_deltas, props, pscores, config.padded_hw,
            config.score_thresh, config.nms_thresh, config.detections_per_img)

    boxes, labels, scores = jax.vmap(per_image)(pooled, proposals, prop_scores)
    boxes = boxes / config.scale  # back to original image coordinates
    valid = scores > NEG_INF / 10
    return boxes, labels, scores, valid


class CaterDetector:
    """Host-facing detector wrapper (reference `CaterObjectDetector`):
    loads weights once, runs frame-batched jit inference over videos."""

    def __init__(self, config: Optional[DetectorConfig] = None, params=None,
                 seed: int = 0):
        self.config = config or DetectorConfig()
        self.anchors = [jnp.asarray(a) for a in anchor_lib.pyramid_anchors(
            self.config.feature_shapes(), self.config.strides,
            self.config.anchor_sizes)]
        if params is None:
            params = detector_init(jax.random.PRNGKey(seed), self.config)
        self.params = params
        self._jit_forward = jax.jit(
            lambda p, imgs: detect_forward(p, imgs, self.config, self.anchors))

    @classmethod
    def load(cls, checkpoint_path: Optional[str],
             config: Optional[DetectorConfig] = None) -> "CaterDetector":
        """Load from an orbax checkpoint dir, or a torch `.pth`/`.pt` file
        (raw torchvision `fasterrcnn_resnet50_fpn` state_dict or the
        reference's `{"model_state_dict": ...}` wrapper,
        `baselines/detector.py:55-69`) via the torchvision converter."""
        det = cls(config)
        if checkpoint_path:
            if str(checkpoint_path).endswith((".pth", ".pt")):
                from objectpermanence_tpu.models.detector.convert import (
                    load_torch_checkpoint,
                )
                det.params = load_torch_checkpoint(checkpoint_path)
            else:
                from objectpermanence_tpu.utils.checkpoint import restore_params
                det.params = restore_params(checkpoint_path, det.params)
            print(f"Loaded detector parameters from {checkpoint_path}")
        return det

    def __call__(self, frames: np.ndarray):
        """frames: (B, H, W, 3) RGB -> (boxes, labels, scores, valid) numpy."""
        out = self._jit_forward(self.params, jnp.asarray(frames))
        return tuple(np.asarray(o) for o in out)

    def dispatch_video(self, frames: np.ndarray, batch_size: int = 16):
        """Async-dispatch all frames of one video, chunked to a fixed batch
        (last chunk padded so the jit signature never changes). Returns the
        in-flight (real_len, device_results) list for `collect_video` —
        nothing is fetched here, so host->device streaming of chunk i+1
        overlaps the device compute of chunk i, and a CALLER can overlap
        whole videos (dispatch video i+1 from another thread while video
        i's results are fetched; see infer/preprocess.py) — on
        low-bandwidth host links the transfer, not the compute, is the
        bottleneck."""
        num_frames = len(frames)
        in_flight = []
        for start in range(0, num_frames, batch_size):
            chunk = frames[start:start + batch_size]
            real = len(chunk)
            if real < batch_size:
                pad = np.repeat(chunk[-1:], batch_size - real, axis=0)
                chunk = np.concatenate([chunk, pad])
            in_flight.append(
                (real, self._jit_forward(self.params, jnp.asarray(chunk))))
        return in_flight

    def collect_video(self, in_flight):
        """Fetch + concatenate the results of a `dispatch_video` call."""
        all_out = [[], [], [], []]
        for real, out in in_flight:
            for acc, arr in zip(all_out, out):
                acc.append(np.asarray(arr)[:real])
        return tuple(np.concatenate(acc) for acc in all_out)

    def detect_video(self, frames: np.ndarray, batch_size: int = 16):
        """All frames of one video -> (boxes, labels, scores, valid)."""
        return self.collect_video(self.dispatch_video(frames, batch_size))
