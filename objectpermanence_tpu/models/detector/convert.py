"""torchvision `fasterrcnn_resnet50_fpn` state_dict -> detector pytree.

The reference's perception accuracy comes from fine-tuning a COCO-pretrained
torchvision model (`/root/reference/object_detection/models.py:6-20`) and
loading its checkpoints (`/root/reference/baselines/detector.py:55-69`).
This converter maps that checkpoint family — either the raw torchvision
state_dict or the reference's `{"model_state_dict": ...}` wrapper — into
`detector_init`'s tree so fine-tuning/inference starts from reference
weights (mirroring `models/siam.py`'s converter for the tracker).

Layout transforms:
  - conv weights: torch OIHW -> JAX HWIO (transpose (2, 3, 1, 0))
  - linear weights: torch (out, in) -> ours (in, out) (transpose)
  - FrozenBatchNorm2d: weight/bias/running_mean/running_var map onto our
    frozen_bn's scale/bias/mean/var unchanged
Supports both the torchvision<=0.5 naming the reference pins
(`fpn.inner_blocks.0.weight`, `rpn.head.conv.weight`) and the modern
nested naming (`fpn.inner_blocks.0.0.weight`, `rpn.head.conv.0.0.weight`).
"""

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

RESNET50_LAYERS = (3, 4, 6, 3)


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


class _StateDict:
    """Name-flexible accessor that tracks which keys were consumed."""

    def __init__(self, sd: Mapping[str, object]):
        self.sd = dict(sd)
        self.used = set()

    def get(self, *names: str) -> np.ndarray:
        for name in names:
            if name in self.sd:
                self.used.add(name)
                return _to_np(self.sd[name])
        raise KeyError(f"none of {names} found in state_dict "
                       f"(have e.g. {sorted(self.sd)[:5]}...)")

    def conv(self, *names: str) -> jnp.ndarray:
        return jnp.asarray(self.get(*names).transpose(2, 3, 1, 0))

    def vec(self, *names: str) -> jnp.ndarray:
        return jnp.asarray(self.get(*names))

    def linear(self, *names: str) -> jnp.ndarray:
        return jnp.asarray(self.get(*names).T)


def _bn(s: _StateDict, prefix: str) -> Dict:
    return {"scale": s.vec(f"{prefix}.weight"),
            "bias": s.vec(f"{prefix}.bias"),
            "mean": s.vec(f"{prefix}.running_mean"),
            "var": s.vec(f"{prefix}.running_var")}


def convert_torchvision_state_dict(state_dict: Mapping[str, object],
                                   layers=RESNET50_LAYERS,
                                   strict: bool = True) -> Dict:
    """-> params tree matching `detector_init(key, DetectorConfig())`.

    strict=True raises if any weight-like key in the state_dict was not
    consumed (catches silent architecture drift)."""
    if "model_state_dict" in state_dict:  # reference checkpoint wrapper
        state_dict = state_dict["model_state_dict"]
    s = _StateDict(state_dict)

    # --- ResNet-50 backbone (torchvision `backbone.body`) ---
    backbone = {
        "stem_conv": s.conv("backbone.body.conv1.weight"),
        "stem_bn": _bn(s, "backbone.body.bn1"),
        "stages": [],
    }
    for stage, blocks in enumerate(layers):
        stage_params = []
        for b in range(blocks):
            p = f"backbone.body.layer{stage + 1}.{b}"
            block = {
                "conv1": s.conv(f"{p}.conv1.weight"),
                "bn1": _bn(s, f"{p}.bn1"),
                "conv2": s.conv(f"{p}.conv2.weight"),
                "bn2": _bn(s, f"{p}.bn2"),
                "conv3": s.conv(f"{p}.conv3.weight"),
                "bn3": _bn(s, f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in s.sd:
                block["downsample"] = {
                    "conv": s.conv(f"{p}.downsample.0.weight"),
                    "bn": _bn(s, f"{p}.downsample.1"),
                }
            stage_params.append(block)
        backbone["stages"].append(stage_params)

    # --- FPN (torchvision<=0.5 flat names; >=0.12 nested `.0.`) ---
    fpn = {"lateral": [], "lateral_b": [], "output": [], "output_b": []}
    for i in range(len(layers)):
        fpn["lateral"].append(s.conv(
            f"backbone.fpn.inner_blocks.{i}.weight",
            f"backbone.fpn.inner_blocks.{i}.0.weight"))
        fpn["lateral_b"].append(s.vec(
            f"backbone.fpn.inner_blocks.{i}.bias",
            f"backbone.fpn.inner_blocks.{i}.0.bias"))
        fpn["output"].append(s.conv(
            f"backbone.fpn.layer_blocks.{i}.weight",
            f"backbone.fpn.layer_blocks.{i}.0.weight"))
        fpn["output_b"].append(s.vec(
            f"backbone.fpn.layer_blocks.{i}.bias",
            f"backbone.fpn.layer_blocks.{i}.0.bias"))

    # --- RPN head ---
    rpn = {
        "conv": s.conv("rpn.head.conv.weight", "rpn.head.conv.0.0.weight"),
        "conv_b": s.vec("rpn.head.conv.bias", "rpn.head.conv.0.0.bias"),
        "cls": s.conv("rpn.head.cls_logits.weight"),
        "cls_b": s.vec("rpn.head.cls_logits.bias"),
        "reg": s.conv("rpn.head.bbox_pred.weight"),
        "reg_b": s.vec("rpn.head.bbox_pred.bias"),
    }

    # --- box head (TwoMLPHead + FastRCNNPredictor) ---
    # fc6 flattens torch's (N, C, 7, 7) NCHW pooled features; our
    # box_head_apply flattens the same (N, C, p, p) layout, so the weight
    # matrix needs no channel reshuffle, only the (out, in) -> (in, out)
    # transpose.
    box_head = {
        "fc6": {"w": s.linear("roi_heads.box_head.fc6.weight"),
                "b": s.vec("roi_heads.box_head.fc6.bias")},
        "fc7": {"w": s.linear("roi_heads.box_head.fc7.weight"),
                "b": s.vec("roi_heads.box_head.fc7.bias")},
        "cls": {"w": s.linear("roi_heads.box_predictor.cls_score.weight"),
                "b": s.vec("roi_heads.box_predictor.cls_score.bias")},
        "reg": {"w": s.linear("roi_heads.box_predictor.bbox_pred.weight"),
                "b": s.vec("roi_heads.box_predictor.bbox_pred.bias")},
    }

    params = {"backbone": backbone, "fpn": fpn, "rpn": rpn,
              "box_head": box_head}

    if strict:
        ignorable = ("num_batches_tracked",)
        unused = [k for k in s.sd
                  if k not in s.used and not k.endswith(ignorable)]
        if unused:
            raise ValueError(
                f"{len(unused)} state_dict keys not consumed by the "
                f"converter (first few: {sorted(unused)[:6]}); pass "
                f"strict=False to ignore")
    return params


def export_torchvision_state_dict(params: Dict,
                                  layers=RESNET50_LAYERS) -> Dict[str, np.ndarray]:
    """Inverse of `convert_torchvision_state_dict`: detector pytree ->
    torchvision<=0.5-named state_dict (numpy values, torch-layout). Lets a
    JAX-trained detector be saved as the reference's checkpoint format
    (`baselines/detector.py:55-69` can load it after `torch.save`) and makes
    the converter testable as a bijection."""
    sd: Dict[str, np.ndarray] = {}

    def put_conv(name, w):
        sd[name] = np.asarray(w).transpose(3, 2, 0, 1)   # HWIO -> OIHW

    def put_vec(name, v):
        sd[name] = np.asarray(v)

    def put_bn(prefix, bn):
        put_vec(f"{prefix}.weight", bn["scale"])
        put_vec(f"{prefix}.bias", bn["bias"])
        put_vec(f"{prefix}.running_mean", bn["mean"])
        put_vec(f"{prefix}.running_var", bn["var"])

    def put_linear(name, lin):
        sd[f"{name}.weight"] = np.asarray(lin["w"]).T    # (in,out) -> (out,in)
        put_vec(f"{name}.bias", lin["b"])

    backbone = params["backbone"]
    put_conv("backbone.body.conv1.weight", backbone["stem_conv"])
    put_bn("backbone.body.bn1", backbone["stem_bn"])
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            p = f"backbone.body.layer{stage + 1}.{b}"
            block = backbone["stages"][stage][b]
            for i in (1, 2, 3):
                put_conv(f"{p}.conv{i}.weight", block[f"conv{i}"])
                put_bn(f"{p}.bn{i}", block[f"bn{i}"])
            if "downsample" in block:
                put_conv(f"{p}.downsample.0.weight", block["downsample"]["conv"])
                put_bn(f"{p}.downsample.1", block["downsample"]["bn"])

    fpn = params["fpn"]
    for i in range(len(layers)):
        put_conv(f"backbone.fpn.inner_blocks.{i}.weight", fpn["lateral"][i])
        put_vec(f"backbone.fpn.inner_blocks.{i}.bias", fpn["lateral_b"][i])
        put_conv(f"backbone.fpn.layer_blocks.{i}.weight", fpn["output"][i])
        put_vec(f"backbone.fpn.layer_blocks.{i}.bias", fpn["output_b"][i])

    rpn = params["rpn"]
    put_conv("rpn.head.conv.weight", rpn["conv"])
    put_vec("rpn.head.conv.bias", rpn["conv_b"])
    put_conv("rpn.head.cls_logits.weight", rpn["cls"])
    put_vec("rpn.head.cls_logits.bias", rpn["cls_b"])
    put_conv("rpn.head.bbox_pred.weight", rpn["reg"])
    put_vec("rpn.head.bbox_pred.bias", rpn["reg_b"])

    box_head = params["box_head"]
    put_linear("roi_heads.box_head.fc6", box_head["fc6"])
    put_linear("roi_heads.box_head.fc7", box_head["fc7"])
    put_linear("roi_heads.box_predictor.cls_score", box_head["cls"])
    put_linear("roi_heads.box_predictor.bbox_pred", box_head["reg"])
    return sd


def load_torch_checkpoint(path: str, strict: bool = True) -> Dict:
    """Load a torch .pth checkpoint (torchvision download or the
    reference's fine-tuned `{"model_state_dict": ...}` format) and convert.
    Reference load path: `baselines/detector.py:55-69`."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return convert_torchvision_state_dict(sd, strict=strict)
