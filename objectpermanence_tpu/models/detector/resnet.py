"""ResNet backbone with frozen batch-norm, as functional JAX.

Mirrors the torchvision detection backbone family (ResNet-50 by default:
bottleneck blocks [3, 4, 6, 3]); batch-norm layers are frozen affine
transforms (torchvision `FrozenBatchNorm2d`), the standard choice for
detection fine-tuning with small batches. NHWC layout (TPU-native).
"""

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    """He-normal (fan_out, relu) like torchvision's detection convs."""
    fan_out = kh * kw * cout
    std = np.sqrt(2.0 / fan_out)
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def conv2d(x, w, stride=1, padding=None):
    """Conv with torch-style symmetric k//2 padding by default. NOTE: not
    XLA "SAME" — for stride>1 SAME pads asymmetrically ((0,1) for k=3),
    shifting outputs by one pixel vs torch's padding=1; symmetric padding
    is required for converted torchvision weights to be numerically
    faithful. For stride=1 the two are identical."""
    if padding is None:
        kh, kw = w.shape[0], w.shape[1]
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def frozen_bn_init(channels, dtype=jnp.float32):
    return {
        "scale": jnp.ones((channels,), dtype),
        "bias": jnp.zeros((channels,), dtype),
        "mean": jnp.zeros((channels,), dtype),
        "var": jnp.ones((channels,), dtype),
    }


def frozen_bn(params, x, eps=1e-5):
    # precomputable affine: w = scale/sqrt(var+eps), b = bias - mean*w
    w = params["scale"] * jax.lax.rsqrt(params["var"] + eps)
    b = params["bias"] - params["mean"] * w
    return x * w + b


def group_norm_init(channels, dtype=jnp.float32):
    return {"scale": jnp.ones((channels,), dtype),
            "bias": jnp.zeros((channels,), dtype)}


def group_norm(params, x, groups: int = 32, eps: float = 1e-5):
    """Stateless GroupNorm (NHWC). The from-scratch norm choice: frozen BN
    with identity statistics normalizes nothing, which blows up training
    without pretrained weights (the reference always starts from
    torchvision's COCO checkpoint)."""
    b, h, w, c = x.shape
    g = min(groups, c)
    xg = x.reshape(b, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(b, h, w, c) * params["scale"] + params["bias"]


def norm_init(channels, norm: str, dtype=jnp.float32):
    return group_norm_init(channels, dtype) if norm == "group" else \
        frozen_bn_init(channels, dtype)


def apply_norm(params, x, norm: str):
    return group_norm(params, x) if norm == "group" else frozen_bn(params, x)


def _bottleneck_init(key, cin, width, stride, dtype, norm):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cout = width * 4
    params = {
        "conv1": conv_init(k1, 1, 1, cin, width, dtype),
        "bn1": norm_init(width, norm, dtype),
        "conv2": conv_init(k2, 3, 3, width, width, dtype),
        "bn2": norm_init(width, norm, dtype),
        "conv3": conv_init(k3, 1, 1, width, cout, dtype),
        "bn3": norm_init(cout, norm, dtype),
    }
    if stride != 1 or cin != cout:
        params["downsample"] = {
            "conv": conv_init(k4, 1, 1, cin, cout, dtype),
            "bn": norm_init(cout, norm, dtype),
        }
    return params


def _bottleneck(params, x, stride, norm):
    identity = x
    out = jax.nn.relu(apply_norm(params["bn1"], conv2d(x, params["conv1"]), norm))
    out = jax.nn.relu(apply_norm(params["bn2"], conv2d(out, params["conv2"], stride), norm))
    out = apply_norm(params["bn3"], conv2d(out, params["conv3"]), norm)
    if "downsample" in params:
        identity = apply_norm(params["downsample"]["bn"],
                              conv2d(x, params["downsample"]["conv"], stride), norm)
    return jax.nn.relu(out + identity)


def resnet_init(key, layers: Sequence[int] = (3, 4, 6, 3), width: int = 64,
                dtype=jnp.float32, norm: str = "frozen") -> Dict:
    """ResNet-50 by default; `layers`/`width` shrink it for tests.
    norm: "frozen" (fine-tuning pretrained weights, torchvision-style) or
    "group" (GroupNorm, for from-scratch training)."""
    keys = jax.random.split(key, 1 + len(layers))
    params = {
        "stem_conv": conv_init(keys[0], 7, 7, 3, width, dtype),
        "stem_bn": norm_init(width, norm, dtype),
        "stages": [],
    }
    cin = width
    for stage, blocks in enumerate(layers):
        stage_width = width * (2 ** stage)
        stride = 1 if stage == 0 else 2
        block_keys = jax.random.split(keys[1 + stage], blocks)
        stage_params = []
        for b in range(blocks):
            stage_params.append(_bottleneck_init(
                block_keys[b], cin, stage_width, stride if b == 0 else 1,
                dtype, norm))
            cin = stage_width * 4
        params["stages"].append(stage_params)
    return params


def resnet_apply(params, x, norm: str = "frozen") -> List[jax.Array]:
    """x: (B, H, W, 3) -> [C2, C3, C4, C5] feature maps (strides 4..32)."""
    x = conv2d(x, params["stem_conv"], stride=2)
    x = jax.nn.relu(apply_norm(params["stem_bn"], x, norm))
    # torch MaxPool2d(3, stride=2, padding=1): symmetric (1,1) padding, not
    # XLA SAME (which pads (0,1) at stride 2 and shifts the grid)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1),
                              ((0, 0), (1, 1), (1, 1), (0, 0)))
    features = []
    for stage, stage_params in enumerate(params["stages"]):
        for b, block in enumerate(stage_params):
            stride = 2 if (stage > 0 and b == 0) else 1
            x = _bottleneck(block, x, stride, norm)
        features.append(x)
    return features


def out_channels(layers: Sequence[int] = (3, 4, 6, 3), width: int = 64) -> List[int]:
    return [width * (2 ** s) * 4 for s in range(len(layers))]
