"""Fast-lane coverage for `windowed_out_of_contract_mask` — the post-hoc
contract measurement used when the in-dispatch host-callback counter cannot
run (the axon PjRt client; see ops/pallas_roi_align.py). Exact agreement
with the in-dispatch mask is asserted in the slow lane
(tests/test_pallas_roi_align.py::test_windowed_contract_stats)."""

import jax.numpy as jnp
import numpy as np

from objectpermanence_tpu.models.detector.roi_heads import ROI_STRIDES
from objectpermanence_tpu.ops import pallas_roi_align as pra


def test_contract_mask_flags_extreme_aspect_only():
    shapes = [(64, 128), (32, 64), (16, 32), (8, 16)]
    level_shapes = [(h, w, float(s)) for (h, w), s in zip(shapes, ROI_STRIDES)]
    rois = jnp.asarray([[
        [10.0, 10.0, 40.0, 40.0],     # small square: in contract
        [5.0, 5.0, 200.0, 200.0],     # large square: in contract
        [2.0, 100.0, 500.0, 106.0],   # ~80:1 aspect: drops taps
    ]], jnp.float32)
    levels = jnp.zeros((1, 3), jnp.int32)
    m = np.asarray(pra.windowed_out_of_contract_mask(
        rois, levels, level_shapes, channels=4, channel_chunk=4, win=32))
    assert m.shape == (1, 3)
    assert not m[0, 0] and not m[0, 1] and m[0, 2]


def test_contract_mask_quant_matches_kernel_widening():
    # the helper and the kernel share _window_quant: f32 + cc=4 widens
    # win=32 to 64 (quant = x_quant = 32), f32 + cc=128 keeps 8/1 quanta
    assert pra._window_quant(4, 4, 32) == (64, 8, 32)
    assert pra._window_quant(4, 128, 48) == (56, 8, 1)
    assert pra._window_quant(2, 128, 48) == (64, 16, 1)
