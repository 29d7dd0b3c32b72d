"""SiamRPN visual tracker (DaSiamRPN family), TPU-native.

Functional JAX re-implementation of the vendored tracker (reference
`baselines/DaSiamRPN/code/net.py` + `run_SiamRPN.py`): an AlexNet-style
siamese feature extractor whose template branch produces per-anchor
correlation kernels; tracking cross-correlates the search-region features
against those kernels to get 19x19 (or 21x21) score/regression maps.

Split of responsibilities (SURVEY §7 "hard parts"): the convnet + kernel
correlation + softmax run as jit XLA on device (two static input sizes);
the inherently frame-sequential crop / anchor decode / penalty / window
logic stays host-side numpy — identical math to the reference, exposed as
pure functions for unit testing.

Weights: the upstream `SiamRPNVOT.model` blob is not shipped (it is missing
from the reference snapshot too); `convert_torch_state_dict` maps it into
our parameter tree when a user supplies it.
"""

from dataclasses import dataclass, replace
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from objectpermanence_tpu.models.heuristic import AbstractReasoner, get_label_bb
from objectpermanence_tpu.vocab import SNITCH_CLASS_INDEX

# SiamRPNvot: size=1, feature_out=256 (reference `net.py:69-72`)
FEATURE_CHANNELS = (3, 96, 256, 384, 384, 256)
FEATURE_OUT = 256
NUM_ANCHORS = 5

VOT_CFG = {"lr": 0.45, "window_influence": 0.44, "penalty_k": 0.04,
           "instance_size": 271, "adaptive": False}


# ---------------------------------------------------------------------------
# Network (functional, NCHW like the upstream weights)
# ---------------------------------------------------------------------------

def _conv_init(key, cout, cin, kh, kw, dtype=jnp.float32):
    fan_in = cin * kh * kw
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(key, (cout, cin, kh, kw), dtype) * std


def _bn_init(channels, dtype=jnp.float32):
    return {"scale": jnp.ones((channels,), dtype),
            "bias": jnp.zeros((channels,), dtype),
            "mean": jnp.zeros((channels,), dtype),
            "var": jnp.ones((channels,), dtype)}


def siam_init(key, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 10)
    c = FEATURE_CHANNELS
    return {
        "features": [
            {"conv": _conv_init(ks[0], c[1], c[0], 11, 11, dtype), "bn": _bn_init(c[1], dtype)},
            {"conv": _conv_init(ks[1], c[2], c[1], 5, 5, dtype), "bn": _bn_init(c[2], dtype)},
            {"conv": _conv_init(ks[2], c[3], c[2], 3, 3, dtype), "bn": _bn_init(c[3], dtype)},
            {"conv": _conv_init(ks[3], c[4], c[3], 3, 3, dtype), "bn": _bn_init(c[4], dtype)},
            {"conv": _conv_init(ks[4], c[5], c[4], 3, 3, dtype), "bn": _bn_init(c[5], dtype)},
        ],
        "conv_r1": {"w": _conv_init(ks[5], FEATURE_OUT * 4 * NUM_ANCHORS, c[5], 3, 3, dtype),
                    "b": jnp.zeros((FEATURE_OUT * 4 * NUM_ANCHORS,), dtype)},
        "conv_r2": {"w": _conv_init(ks[6], FEATURE_OUT, c[5], 3, 3, dtype),
                    "b": jnp.zeros((FEATURE_OUT,), dtype)},
        "conv_cls1": {"w": _conv_init(ks[7], FEATURE_OUT * 2 * NUM_ANCHORS, c[5], 3, 3, dtype),
                      "b": jnp.zeros((FEATURE_OUT * 2 * NUM_ANCHORS,), dtype)},
        "conv_cls2": {"w": _conv_init(ks[8], FEATURE_OUT, c[5], 3, 3, dtype),
                      "b": jnp.zeros((FEATURE_OUT,), dtype)},
        "regress_adjust": {"w": _conv_init(ks[9], 4 * NUM_ANCHORS, 4 * NUM_ANCHORS, 1, 1, dtype),
                           "b": jnp.zeros((4 * NUM_ANCHORS,), dtype)},
    }


def convert_torch_state_dict(state_dict) -> Dict:
    """Upstream `SiamRPNvot` torch state_dict -> our parameter tree."""
    def t(name):
        return jnp.asarray(np.asarray(state_dict[name]))

    feats = []
    # featureExtract indices of conv/bn layers in the torch Sequential
    for conv_i, bn_i in [(0, 1), (4, 5), (8, 9), (11, 12), (14, 15)]:
        feats.append({
            "conv": t(f"featureExtract.{conv_i}.weight"),
            "bn": {"scale": t(f"featureExtract.{bn_i}.weight"),
                   "bias": t(f"featureExtract.{bn_i}.bias"),
                   "mean": t(f"featureExtract.{bn_i}.running_mean"),
                   "var": t(f"featureExtract.{bn_i}.running_var")},
        })
    out = {"features": feats}
    for name in ("conv_r1", "conv_r2", "conv_cls1", "conv_cls2", "regress_adjust"):
        out[name] = {"w": t(f"{name}.weight"), "b": t(f"{name}.bias")}
    return out


def _conv_nchw(x, w, b=None, stride=1):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if b is not None:
        y = y + b[None, :, None, None]
    return y


def _bn(params, x, eps=1e-5):
    w = params["scale"] * jax.lax.rsqrt(params["var"] + eps)
    b = params["bias"] - params["mean"] * w
    return x * w[None, :, None, None] + b[None, :, None, None]


def _maxpool3s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, 3, 3), (1, 1, 2, 2), "VALID")


def feature_extract(params, x):
    """x: (B, 3, S, S) float -> (B, 256, s, s)."""
    f = params["features"]
    x = _bn(f[0]["bn"], _conv_nchw(x, f[0]["conv"], stride=2))
    x = jax.nn.relu(_maxpool3s2(x))
    x = _bn(f[1]["bn"], _conv_nchw(x, f[1]["conv"]))
    x = jax.nn.relu(_maxpool3s2(x))
    x = jax.nn.relu(_bn(f[2]["bn"], _conv_nchw(x, f[2]["conv"])))
    x = jax.nn.relu(_bn(f[3]["bn"], _conv_nchw(x, f[3]["conv"])))
    x = _bn(f[4]["bn"], _conv_nchw(x, f[4]["conv"]))
    return x


@jax.jit
def temple(params, z):
    """Exemplar crop (1, 3, 127, 127) -> correlation kernels
    (r1 (20, 256, 4, 4), cls1 (10, 256, 4, 4))."""
    z_f = feature_extract(params, z)
    r1 = _conv_nchw(z_f, params["conv_r1"]["w"], params["conv_r1"]["b"])
    cls1 = _conv_nchw(z_f, params["conv_cls1"]["w"], params["conv_cls1"]["b"])
    k = r1.shape[-1]
    r1_kernel = r1.reshape(NUM_ANCHORS * 4, FEATURE_OUT, k, k)
    cls1_kernel = cls1.reshape(NUM_ANCHORS * 2, FEATURE_OUT, k, k)
    return r1_kernel, cls1_kernel


@jax.jit
def track_forward(params, kernels, x):
    """Search crop (1, 3, S, S) -> (delta (4, A*s*s), score_fg (A*s*s,))
    flattened in the reference's channel-major order."""
    r1_kernel, cls1_kernel = kernels
    x_f = feature_extract(params, x)
    r2 = _conv_nchw(x_f, params["conv_r2"]["w"], params["conv_r2"]["b"])
    cls2 = _conv_nchw(x_f, params["conv_cls2"]["w"], params["conv_cls2"]["b"])
    delta = _conv_nchw(r2, r1_kernel)
    delta = _conv_nchw(delta, params["regress_adjust"]["w"],
                       params["regress_adjust"]["b"])
    score = _conv_nchw(cls2, cls1_kernel)
    # (1, 4A, s, s) -> (4, A*s*s). The reference flattens with
    # `permute(1,2,3,0).view(4,-1)` (`run_SiamRPN.py:70-71`): channel
    # c = coord*A + anchor, i.e. row r covers channels [r*A, (r+1)*A) with
    # each channel's s*s spatial block contiguous — exactly a row-major
    # reshape of the (4A, s, s) map to (4, A*s*s). Anchor index within a
    # row is then a*s*s + spatial, matching generate_anchor's layout.
    delta = delta[0].reshape(4, -1)
    score = score[0].reshape(2, -1)
    score_fg = jax.nn.softmax(score, axis=0)[1]
    return delta, score_fg


# ---------------------------------------------------------------------------
# Host-side tracker math (pure, unit-testable)
# ---------------------------------------------------------------------------

def generate_anchor(total_stride: int, scales, ratios, score_size: int) -> np.ndarray:
    """(A * score_size^2, 4) cx/cy/w/h anchors (reference
    `run_SiamRPN.py:14-39`, including its int truncation)."""
    anchor_num = len(ratios) * len(scales)
    anchor = np.zeros((anchor_num, 4), np.float32)
    size = total_stride * total_stride
    count = 0
    for ratio in ratios:
        ws = int(np.sqrt(size / ratio))
        hs = int(ws * ratio)
        for scale in scales:
            anchor[count, 2] = ws * scale
            anchor[count, 3] = hs * scale
            count += 1
    anchor = np.tile(anchor, score_size * score_size).reshape((-1, 4))
    ori = -(score_size / 2) * total_stride
    grid = [ori + total_stride * d for d in range(score_size)]
    xx, yy = np.meshgrid(grid, grid)
    anchor[:, 0] = np.tile(xx.flatten(), (anchor_num, 1)).flatten()
    anchor[:, 1] = np.tile(yy.flatten(), (anchor_num, 1)).flatten()
    return anchor


def get_subwindow(im: np.ndarray, pos, original_sz: int, model_sz: int,
                  avg_chans: np.ndarray) -> np.ndarray:
    """Padded square crop centered at pos, resized to model_sz
    (reference `utils.py:47-90`)."""
    import cv2

    original_sz = max(int(original_sz), 2)  # degenerate-crop guard
    c = (original_sz + 1) / 2
    context_xmin = round(pos[0] - c)
    context_xmax = context_xmin + original_sz - 1
    context_ymin = round(pos[1] - c)
    context_ymax = context_ymin + original_sz - 1
    h, w = im.shape[:2]
    left_pad = int(max(0.0, -context_xmin))
    top_pad = int(max(0.0, -context_ymin))
    right_pad = int(max(0.0, context_xmax - w + 1))
    bottom_pad = int(max(0.0, context_ymax - h + 1))

    if any([top_pad, bottom_pad, left_pad, right_pad]):
        padded = np.empty((h + top_pad + bottom_pad, w + left_pad + right_pad, 3),
                          im.dtype)
        padded[:] = avg_chans
        padded[top_pad:top_pad + h, left_pad:left_pad + w] = im
        im = padded
        context_xmin += left_pad
        context_xmax += left_pad
        context_ymin += top_pad
        context_ymax += top_pad

    patch = im[int(context_ymin):int(context_ymax + 1),
               int(context_xmin):int(context_xmax + 1)]
    if patch.shape[0] != model_sz:
        patch = cv2.resize(patch, (model_sz, model_sz))
    return patch


def tracker_update(delta: np.ndarray, score: np.ndarray, anchors: np.ndarray,
                   window: np.ndarray, target_pos: np.ndarray,
                   target_sz_scaled: np.ndarray, scale_z: float,
                   penalty_k: float, window_influence: float, lr_factor: float
                   ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Anchor decode + scale/ratio penalty + cosine window + smoothed size
    update (reference `tracker_eval`, `run_SiamRPN.py:67-114`)."""
    decoded = np.empty_like(delta)
    decoded[0] = delta[0] * anchors[:, 2] + anchors[:, 0]
    decoded[1] = delta[1] * anchors[:, 3] + anchors[:, 1]
    # clip the log-size regressions so exp() and the downstream size/penalty
    # products stay inside f32 range: candidates past exp(20)*anchor (~1e10
    # px) are maximally penalized either way, and the clip avoids inf/nan
    # churn with untrained weights (the reference overflows here)
    decoded[2] = np.exp(np.minimum(delta[2], 20.0)) * anchors[:, 2]
    decoded[3] = np.exp(np.minimum(delta[3], 20.0)) * anchors[:, 3]

    def change(r):
        # r can underflow to exactly 0.0 for degenerate candidates; the
        # clamp only affects those (result is huge either way)
        return np.maximum(r, 1.0 / np.maximum(r, np.float32(1e-30)))

    def sz(w, h):
        pad = (w + h) * 0.5
        return np.sqrt((w + pad) * (h + pad))

    # Clamp decoded sizes away from zero before the ratio math: exp() of a
    # large negative regression output underflows to 0.0 in float32 and the
    # reference's unguarded divides emit inf/nan (and RuntimeWarnings). The
    # clamp only moves already-degenerate candidates (their penalty -> 0
    # either way), so normal-path numerics are bit-identical.
    eps = np.float32(1e-12)
    dw = np.maximum(decoded[2], eps)
    dh = np.maximum(decoded[3], eps)
    tw = max(target_sz_scaled[0], eps)
    th = max(target_sz_scaled[1], eps)

    s_c = change(sz(dw, dh) / sz(tw, th))
    # (tw/th)/(dw/dh) as a product ratio: dw/dh can underflow to 0 in f32
    r_c = change((tw * dh) / (th * dw))
    penalty = np.exp(-(r_c * s_c - 1.0) * penalty_k)
    pscore = penalty * score
    pscore = pscore * (1 - window_influence) + window * window_influence
    best = int(np.argmax(pscore))

    target = decoded[:, best] / scale_z
    target_sz = target_sz_scaled / scale_z
    lr = penalty[best] * score[best] * lr_factor

    new_pos = np.array([target[0] + target_pos[0], target[1] + target_pos[1]])
    new_sz = np.array([target_sz[0] * (1 - lr) + target[2] * lr,
                       target_sz[1] * (1 - lr) + target[3] * lr])
    return new_pos, new_sz, float(score[best])


@dataclass
class SiamState:
    pos: np.ndarray
    sz: np.ndarray
    kernels: Tuple
    window: np.ndarray
    anchors: np.ndarray
    avg_chans: np.ndarray
    instance_size: int
    im_hw: Tuple[int, int]
    score: float = 0.0


class SiamRPNTracker:
    """Stateful host driver around the jit net (exemplar init + per-frame
    track), mirroring `SiamRPN_init`/`SiamRPN_track`."""

    EXEMPLAR = 127
    STRIDE = 8
    CONTEXT = 0.5
    RATIOS = (0.33, 0.5, 1, 2, 3)
    SCALES = (8,)

    def __init__(self, params=None, cfg: Optional[dict] = None, seed: int = 0):
        self.params = params if params is not None else siam_init(jax.random.PRNGKey(seed))
        self.cfg = dict(VOT_CFG, **(cfg or {}))

    def init(self, im: np.ndarray, target_pos, target_sz) -> SiamState:
        target_pos = np.asarray(target_pos, np.float64)
        # degenerate-size guard: an edge-clipped detection can hand over a
        # zero-width/-height box, which would make the exemplar crop empty
        # (the reference crashes in cv2.resize there)
        target_sz = np.maximum(np.asarray(target_sz, np.float64), 2.0)
        instance_size = self.cfg["instance_size"]
        if self.cfg.get("adaptive"):
            area_ratio = (target_sz[0] * target_sz[1]) / float(im.shape[0] * im.shape[1])
            instance_size = 287 if area_ratio < 0.004 else 271
        score_size = (instance_size - self.EXEMPLAR) // self.STRIDE + 1

        anchors = generate_anchor(self.STRIDE, self.SCALES, self.RATIOS, score_size)
        avg_chans = np.mean(im, axis=(0, 1))

        wc_z = target_sz[0] + self.CONTEXT * target_sz.sum()
        hc_z = target_sz[1] + self.CONTEXT * target_sz.sum()
        s_z = round(np.sqrt(wc_z * hc_z))
        z_crop = get_subwindow(im, target_pos, int(s_z), self.EXEMPLAR, avg_chans)
        z = jnp.asarray(z_crop.transpose(2, 0, 1)[None], jnp.float32)
        kernels = temple(self.params, z)

        hanning = np.hanning(score_size)
        window = np.tile(np.outer(hanning, hanning).flatten(), len(self.RATIOS))
        return SiamState(pos=target_pos, sz=target_sz, kernels=kernels,
                         window=window, anchors=anchors, avg_chans=avg_chans,
                         instance_size=instance_size, im_hw=im.shape[:2])

    def track(self, state: SiamState, im: np.ndarray) -> SiamState:
        # NOTE: the reference swaps w/h in the search-context computation
        # (`run_SiamRPN.py:169-170`); preserved for parity.
        wc_z = state.sz[1] + self.CONTEXT * state.sz.sum()
        hc_z = state.sz[0] + self.CONTEXT * state.sz.sum()
        s_z = np.sqrt(wc_z * hc_z)
        scale_z = self.EXEMPLAR / s_z
        d_search = (state.instance_size - self.EXEMPLAR) / 2
        s_x = s_z + 2 * (d_search / scale_z)

        x_crop = get_subwindow(im, state.pos, int(round(s_x)),
                               state.instance_size, state.avg_chans)
        x = jnp.asarray(x_crop.transpose(2, 0, 1)[None], jnp.float32)
        delta, score = track_forward(self.params, state.kernels, x)

        new_pos, new_sz, best_score = tracker_update(
            np.asarray(delta), np.asarray(score), state.anchors, state.window,
            state.pos, state.sz * scale_z, scale_z,
            self.cfg["penalty_k"], self.cfg["window_influence"], self.cfg["lr"])

        h, w = state.im_hw
        new_pos = np.array([min(max(0, new_pos[0]), w), min(max(0, new_pos[1]), h)])
        new_sz = np.array([min(max(10, new_sz[0]), w), min(max(10, new_sz[1]), h)])
        return replace(state, pos=new_pos, sz=new_sz, score=best_score)


# ---------------------------------------------------------------------------
# Programmed reasoner wiring (reference `programmed_models.py:25-68`)
# ---------------------------------------------------------------------------

class ObjectDetectWithSiamTracker(AbstractReasoner):
    """Snap to the detector's snitch box when visible; otherwise run the
    SiamRPN tracker on pixels from the last known position."""

    def __init__(self, tracker: SiamRPNTracker,
                 index_to_track: int = SNITCH_CLASS_INDEX):
        super().__init__(index_to_track)
        self.tracker = tracker
        self.tracker_state: Optional[SiamState] = None
        self.tracker_initiated = False

    def track_for_frame(self, frame, frame_index, frames_predictions,
                        video_name=None) -> None:
        frame_prediction = {
            "bb": frames_predictions["bb"][frame_index],
            "labels": frames_predictions["labels"][frame_index],
        }
        (cx, cy, w, h), (x1, y1, x2, y2) = get_label_bb(
            frame_prediction, self.index_to_track)

        if cx >= 0 and cy >= 0:
            self.state["target_pos"] = (cx, cy)
            self.state["target_sz"] = (w, h)
            self.state["snitch_box"] = [x1, y1, x2, y2]
            self.tracker_initiated = False
            self.snitch_visible = True
        else:
            self.snitch_visible = False
            if not self.tracker_initiated:
                self.tracker_state = self.tracker.init(
                    frame, np.asarray(self.state["target_pos"], np.float64),
                    np.asarray(self.state["target_sz"], np.float64))
                self.tracker_initiated = True
            self.tracker_state = self.tracker.track(self.tracker_state, frame)
            self.state["target_pos"] = tuple(self.tracker_state.pos)
            self.state["target_sz"] = tuple(self.tracker_state.sz)


def build_siam_reasoner(model_weights: str = "") -> ObjectDetectWithSiamTracker:
    """Factory used by the trackers driver. `model_weights` may be the
    upstream torch blob (`SiamRPNVOT.model`, a .pth/.model state_dict), an
    orbax checkpoint dir saved by `train/siam_loop.py`, or empty for random
    init (structure-complete; accuracy requires trained weights)."""
    params = None
    if model_weights:
        from pathlib import Path
        if Path(model_weights).is_dir():
            from objectpermanence_tpu.utils.checkpoint import restore_params
            params = restore_params(model_weights,
                                    siam_init(jax.random.PRNGKey(0)))
        else:
            import torch
            sd = torch.load(model_weights, map_location="cpu")
            params = convert_torch_state_dict(
                {k: v.numpy() for k, v in sd.items()})
    return ObjectDetectWithSiamTracker(SiamRPNTracker(params))
