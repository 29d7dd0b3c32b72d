"""Feature Pyramid Network over the ResNet stages (torchvision-style:
1x1 laterals, nearest x2 top-down, 3x3 output convs, P6 = stride-2
subsample of P5). Laterals and output convs carry biases like torchvision's
`FeaturePyramidNetwork` (its 1x1/3x3 convs default to bias=True) so
converted checkpoints round-trip exactly."""

from typing import Dict, List

import jax
import jax.numpy as jnp

from objectpermanence_tpu.models.detector.resnet import conv2d, conv_init


def fpn_init(key, in_channels: List[int], out_channels: int = 256,
             dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 2 * len(in_channels))
    return {
        "lateral": [conv_init(keys[2 * i], 1, 1, cin, out_channels, dtype)
                    for i, cin in enumerate(in_channels)],
        "lateral_b": [jnp.zeros((out_channels,), dtype)
                      for _ in in_channels],
        "output": [conv_init(keys[2 * i + 1], 3, 3, out_channels, out_channels, dtype)
                   for i in range(len(in_channels))],
        "output_b": [jnp.zeros((out_channels,), dtype)
                     for _ in in_channels],
    }


def fpn_apply(params, features: List[jax.Array]) -> List[jax.Array]:
    """[C2..C5] -> [P2, P3, P4, P5, P6] all with out_channels channels."""
    laterals = [conv2d(f, w) + b for f, w, b in
                zip(features, params["lateral"], params["lateral_b"])]

    outs = [None] * len(laterals)
    last = laterals[-1]
    outs[-1] = last
    for i in range(len(laterals) - 2, -1, -1):
        b, h, w, c = laterals[i].shape
        upsampled = jax.image.resize(last, (b, h, w, c), method="nearest")
        last = laterals[i] + upsampled
        outs[i] = last

    pyramid = [conv2d(o, w) + b for o, w, b in
               zip(outs, params["output"], params["output_b"])]
    # LastLevelMaxPool: stride-2 max-pool with kernel 1 == subsampling
    pyramid.append(pyramid[-1][:, ::2, ::2, :])
    return pyramid
