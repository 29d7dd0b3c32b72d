"""SiamRPN tracker training on rendered scenes (template/search pairs).

The reference vendors DaSiamRPN as a *pretrained* tracker (its
`SiamRPNVOT.model` blob is absent from the snapshot, so the tracker branch
of `ObjectDetectWithSiamTracker` has only ever run with random weights
here). This module trains the same network (`models/siam.py`) from scratch
on the renderer's domain, with the SiamRPN recipe (Li et al., CVPR'18):
template 127 / search 271 crops of the same object dt frames apart,
per-anchor softmax classification (IoU>0.6 pos / <0.3 neg, balanced
sample) + smooth-L1 regression of (dx/aw, dy/ah, log gw/aw, log gh/ah) —
the exact inverse of the inference decode in `tracker_update`
(`run_SiamRPN.py:67-114`).

TPU-native: pairs are pre-cropped ONCE on host into a dense uint8 npz
(crop geometry identical to `SiamRPNTracker.init/track`, including the
reference's w/h-swap quirk), then the whole train loop is one jit step
over device-resident data. BatchNorm runs on batch statistics under
training with an EMA of running stats written back into the parameter
tree, so inference-mode `feature_extract` (frozen stats) serves the
trained weights unchanged.
"""

import json
import time
from pathlib import Path
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from objectpermanence_tpu.models import siam
from objectpermanence_tpu.models.detector.training import (
    balanced_sample, smooth_l1,
)
from objectpermanence_tpu.ops.boxes import pairwise_iou_xyxy

EXEMPLAR = siam.SiamRPNTracker.EXEMPLAR          # 127
INSTANCE = siam.VOT_CFG["instance_size"]         # 271
STRIDE = siam.SiamRPNTracker.STRIDE              # 8
SCORE_SIZE = (INSTANCE - EXEMPLAR) // STRIDE + 1  # 19
NUM_ANCHORS_TOTAL = siam.NUM_ANCHORS * SCORE_SIZE * SCORE_SIZE


# ---------------------------------------------------------------------------
# Pair extraction (host, cv2): crop geometry mirrors SiamRPNTracker
# ---------------------------------------------------------------------------

def _track_visible_frames(scene: dict, label: int, num_frames: int) -> np.ndarray:
    from objectpermanence_tpu.datagen.perfect_perception import (
        contained_frame_ranges,
    )
    spans = contained_frame_ranges(scene).get(label, [])
    visible = np.ones(num_frames, bool)
    for start, end in spans:
        visible[start:end + 1] = False
    return np.flatnonzero(visible)


def _crop_pair(frames: np.ndarray, box_t, box_t2, rng) -> Tuple:
    """(template u8 (127,127,3), search u8 (271,271,3), gt (4,) cx/cy/w/h
    in crop-centered, search-scaled coords) for one (t, t+dt) pair."""
    (bx, by, bw, bh), (b2x, b2y, b2w, b2h) = box_t, box_t2
    pos = np.array([bx + bw / 2, by + bh / 2], np.float64)
    sz = np.maximum(np.array([bw, bh], np.float64), 2.0)
    avg = frames[0].mean(axis=(0, 1))

    # template: init()'s context formula
    wc_z = sz[0] + 0.5 * sz.sum()
    hc_z = sz[1] + 0.5 * sz.sum()
    s_z_t = round(np.sqrt(wc_z * hc_z))
    z = siam.get_subwindow(frames[0], pos, int(s_z_t), EXEMPLAR, avg)

    # search: track()'s formula (w/h swap preserved) around the PREVIOUS
    # position, jittered to mimic drift
    wc = sz[1] + 0.5 * sz.sum()
    hc = sz[0] + 0.5 * sz.sum()
    s_z = np.sqrt(wc * hc)
    scale_z = EXEMPLAR / s_z
    s_x = int(round(s_z + 2 * ((INSTANCE - EXEMPLAR) / 2) / scale_z))
    center = pos + rng.uniform(-12, 12, size=2)
    x = siam.get_subwindow(frames[1], center, s_x, INSTANCE, avg)

    scale = INSTANCE / s_x
    g_c = np.array([b2x + b2w / 2, b2y + b2h / 2]) - center
    gt = np.array([g_c[0] * scale, g_c[1] * scale,
                   max(b2w, 2.0) * scale, max(b2h, 2.0) * scale], np.float32)
    return z.astype(np.uint8), x.astype(np.uint8), gt


def build_pair_dataset(videos_dir, scenes_dir, labels_dir, out_npz, *,
                       num_pairs: int = 4000, pairs_per_video: int = 4,
                       max_dt: int = 20, seed: int = 0) -> Path:
    """Sample (template, search, gt) crops from rendered videos into one
    dense npz. Tracks any visible object class, not just the snitch."""
    import cv2

    from objectpermanence_tpu.datagen.perfect_perception import (
        class_index_for_track, instance_track_name,
    )

    videos_dir, scenes_dir = Path(videos_dir), Path(scenes_dir)
    labels_dir, out_npz = Path(labels_dir), Path(out_npz)
    if out_npz.exists():
        print(f"[siam-data] {out_npz} exists, reusing", flush=True)
        return out_npz

    rng = np.random.RandomState(seed)
    videos = sorted(videos_dir.glob("*.avi"))
    rng.shuffle(videos)
    zs, xs, gts = [], [], []
    t0 = time.time()
    for video_path in videos:
        if len(gts) >= num_pairs:
            break
        name = video_path.stem
        scene = json.loads((scenes_dir / f"{name}.json").read_text())
        gt_bb = json.loads((labels_dir / f"{name}_bb.json").read_text())
        num_frames = len(next(iter(gt_bb.values())))

        cap = cv2.VideoCapture(str(video_path))
        tracks = [(instance_track_name(o), class_index_for_track(
            instance_track_name(o))) for o in scene["objects"]]
        made = 0
        for _ in range(pairs_per_video * 3):       # rejection budget
            if made >= pairs_per_video or len(gts) >= num_pairs:
                break
            track, label = tracks[rng.randint(len(tracks))]
            visible = _track_visible_frames(scene, label, num_frames)
            if len(visible) < 2:
                continue
            t = int(rng.choice(visible[:-1]))
            later = visible[(visible > t) & (visible <= t + max_dt)]
            if len(later) == 0:
                continue
            t2 = int(rng.choice(later))
            pair_frames = []
            ok = True
            for f in (t, t2):
                cap.set(cv2.CAP_PROP_POS_FRAMES, f)
                ret, frame = cap.read()
                if not ret:
                    ok = False
                    break
                pair_frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if not ok:
                continue
            z, x, gt = _crop_pair(pair_frames, gt_bb[track][t],
                                  gt_bb[track][t2], rng)
            zs.append(z)
            xs.append(x)
            gts.append(gt)
            made += 1
        cap.release()
        if len(gts) % 500 < pairs_per_video:
            print(f"[siam-data] {len(gts)}/{num_pairs} pairs "
                  f"({time.time()-t0:.0f}s)", flush=True)

    out_npz.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_npz, z=np.stack(zs), x=np.stack(xs),
                        gt=np.stack(gts))
    print(f"[siam-data] wrote {len(gts)} pairs -> {out_npz} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return out_npz


# ---------------------------------------------------------------------------
# Batched training forward (batch-stat BN + per-sample correlation)
# ---------------------------------------------------------------------------

def _bn_train(p, x):
    """BatchNorm on batch statistics -> (y, (mean, var))."""
    mean = jnp.mean(x, axis=(0, 2, 3))
    var = jnp.var(x, axis=(0, 2, 3))
    w = p["scale"] * jax.lax.rsqrt(var + 1e-5)
    b = p["bias"] - mean * w
    return x * w[None, :, None, None] + b[None, :, None, None], (mean, var)


def _features_train(params, x) -> Tuple[jax.Array, List]:
    f = params["features"]
    stats = []
    x, s = _bn_train(f[0]["bn"], siam._conv_nchw(x, f[0]["conv"], stride=2))
    stats.append(s)
    x = jax.nn.relu(siam._maxpool3s2(x))
    x, s = _bn_train(f[1]["bn"], siam._conv_nchw(x, f[1]["conv"]))
    stats.append(s)
    x = jax.nn.relu(siam._maxpool3s2(x))
    x, s = _bn_train(f[2]["bn"], siam._conv_nchw(x, f[2]["conv"]))
    stats.append(s)
    x = jax.nn.relu(x)
    x, s = _bn_train(f[3]["bn"], siam._conv_nchw(x, f[3]["conv"]))
    stats.append(s)
    x = jax.nn.relu(x)
    x, s = _bn_train(f[4]["bn"], siam._conv_nchw(x, f[4]["conv"]))
    stats.append(s)
    return x, stats


def _corr(feat, kernels):
    """Per-sample cross-correlation: feat (C, H, W) x kernels (K, C, k, k)
    -> (K, H-k+1, W-k+1)."""
    return jax.lax.conv_general_dilated(
        feat[None], kernels, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]


def pair_forward_train(params, z, x):
    """z (B,3,127,127), x (B,3,271,271) float -> (delta (B,4,Na),
    score_logits (B,2,Na), bn_stats). Flattening matches the inference
    path's channel-major order (`track_forward`)."""
    batch = z.shape[0]
    z_f, stats_z = _features_train(params, z)
    x_f, stats_x = _features_train(params, x)

    r1 = siam._conv_nchw(z_f, params["conv_r1"]["w"], params["conv_r1"]["b"])
    cls1 = siam._conv_nchw(z_f, params["conv_cls1"]["w"],
                           params["conv_cls1"]["b"])
    k = r1.shape[-1]
    r1_k = r1.reshape(batch, siam.NUM_ANCHORS * 4, siam.FEATURE_OUT, k, k)
    cls1_k = cls1.reshape(batch, siam.NUM_ANCHORS * 2, siam.FEATURE_OUT, k, k)

    r2 = siam._conv_nchw(x_f, params["conv_r2"]["w"], params["conv_r2"]["b"])
    cls2 = siam._conv_nchw(x_f, params["conv_cls2"]["w"],
                           params["conv_cls2"]["b"])

    delta = jax.vmap(_corr)(r2, r1_k)                       # (B, 4A, s, s)
    delta = siam._conv_nchw(delta, params["regress_adjust"]["w"],
                            params["regress_adjust"]["b"])
    score = jax.vmap(_corr)(cls2, cls1_k)                   # (B, 2A, s, s)
    delta = delta.reshape(batch, 4, -1)
    score = score.reshape(batch, 2, -1)
    stats = [(jnp.concatenate([mz[None], mx[None]]).mean(0),
              jnp.concatenate([vz[None], vx[None]]).mean(0))
             for (mz, vz), (mx, vx) in zip(stats_z, stats_x)]
    return delta, score, stats


# ---------------------------------------------------------------------------
# Loss + train step
# ---------------------------------------------------------------------------

def _anchor_arrays():
    anchors = siam.generate_anchor(STRIDE, siam.SiamRPNTracker.SCALES,
                                   siam.SiamRPNTracker.RATIOS, SCORE_SIZE)
    cxcywh = jnp.asarray(anchors)                            # (Na, 4)
    xyxy = jnp.stack([cxcywh[:, 0] - cxcywh[:, 2] / 2,
                      cxcywh[:, 1] - cxcywh[:, 3] / 2,
                      cxcywh[:, 0] + cxcywh[:, 2] / 2,
                      cxcywh[:, 1] + cxcywh[:, 3] / 2], axis=-1)
    return cxcywh, xyxy


def siam_pair_loss(rng, delta, score, gt, anchors_cxcywh, anchors_xyxy,
                   num_samples: int = 64, positive_fraction: float = 0.25,
                   reg_weight: float = 1.0):
    """Loss for ONE pair. gt (4,) cx/cy/w/h in anchor coords."""
    gt_xyxy = jnp.array([gt[0] - gt[2] / 2, gt[1] - gt[3] / 2,
                         gt[0] + gt[2] / 2, gt[1] + gt[3] / 2])[None]
    iou = pairwise_iou_xyxy(gt_xyxy, anchors_xyxy)[0]        # (Na,)
    # SiamRPN assignment 0.6/0.3 (+ always the best anchor), encoded in
    # match_boxes semantics: 0 = pos, -1 (BELOW_LOW) = neg, -2 = ignore
    matches = jnp.where(iou >= 0.6, 0, -2)
    matches = jnp.where(iou < 0.3, -1, matches)
    matches = jnp.where(iou == jnp.max(iou), 0, matches)
    sampled, pos = balanced_sample(rng, matches, num_samples,
                                   positive_fraction)
    num_sampled = jnp.maximum(jnp.sum(sampled), 1)
    num_pos = jnp.maximum(jnp.sum(pos), 1)

    labels = (matches == 0).astype(jnp.int32)                # (Na,)
    cls = optax.softmax_cross_entropy_with_integer_labels(
        score.T, labels)                                     # (Na,)
    cls_loss = jnp.sum(jnp.where(sampled, cls, 0.0)) / num_sampled

    targets = jnp.stack([
        (gt[0] - anchors_cxcywh[:, 0]) / anchors_cxcywh[:, 2],
        (gt[1] - anchors_cxcywh[:, 1]) / anchors_cxcywh[:, 3],
        jnp.log(gt[2] / anchors_cxcywh[:, 2]),
        jnp.log(gt[3] / anchors_cxcywh[:, 3]),
    ])                                                       # (4, Na)
    reg = smooth_l1(delta - targets, beta=1.0).sum(axis=0)
    reg_loss = jnp.sum(jnp.where(pos, reg, 0.0)) / num_pos
    return cls_loss, reg_weight * reg_loss


def siam_train_init(key, head_scale: float = 0.1):
    """`siam_init` with the correlation heads scaled down for trainability:
    the depthwise correlation contracts 256x4x4 unit-scale (post-BN)
    features against kernel features of the same scale, so unscaled
    Kaiming heads produce |logits| ~ 60-90 at init and the loss diverges.
    Scaling both branch heads by 0.1 brings initial logits to ~O(1)."""
    params = siam.siam_init(key)
    for name in ("conv_r1", "conv_cls1", "conv_r2", "conv_cls2"):
        params[name] = {"w": params[name]["w"] * head_scale,
                        "b": params[name]["b"]}
    return params


def make_siam_train_step(optimizer, bn_momentum: float = 0.1):
    anchors_cxcywh, anchors_xyxy = _anchor_arrays()

    def apply_bn_stats(params, stats):
        feats = []
        for layer, (mean, var) in zip(params["features"], stats):
            bn = dict(layer["bn"])
            bn["mean"] = (1 - bn_momentum) * bn["mean"] + bn_momentum * mean
            bn["var"] = (1 - bn_momentum) * bn["var"] + bn_momentum * var
            feats.append({"conv": layer["conv"], "bn": bn})
        out = dict(params)
        out["features"] = feats
        return out

    @jax.jit
    def train_step(params, opt_state, z, x, gt, rng):
        def loss_fn(p):
            delta, score, stats = pair_forward_train(p, z, x)
            rngs = jax.random.split(rng, z.shape[0])
            cls_l, reg_l = jax.vmap(
                lambda d, s, g, r: siam_pair_loss(
                    r, d, s, g, anchors_cxcywh, anchors_xyxy)
            )(delta, score, gt, rngs)
            return jnp.mean(cls_l) + jnp.mean(reg_l), (
                jnp.mean(cls_l), jnp.mean(reg_l), stats)

        (loss, (cls_l, reg_l, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = apply_bn_stats(params, stats)
        return params, opt_state, {"loss": loss, "cls": cls_l, "reg": reg_l}

    return train_step


def evaluate_pairs(params, z, x, gt, batch_size: int = 64) -> Dict[str, float]:
    """Inference-mode (frozen-BN) eval: IoU between the argmax-score
    anchor's decoded box and gt, plus center-hit rate (<8 px)."""
    anchors_cxcywh, anchors_xyxy = _anchor_arrays()

    @jax.jit
    def fwd(p, zb, xb):
        z_f = siam.feature_extract(p, zb)
        x_f = siam.feature_extract(p, xb)
        r1 = siam._conv_nchw(z_f, p["conv_r1"]["w"], p["conv_r1"]["b"])
        cls1 = siam._conv_nchw(z_f, p["conv_cls1"]["w"], p["conv_cls1"]["b"])
        k = r1.shape[-1]
        r1_k = r1.reshape(zb.shape[0], siam.NUM_ANCHORS * 4,
                          siam.FEATURE_OUT, k, k)
        cls1_k = cls1.reshape(zb.shape[0], siam.NUM_ANCHORS * 2,
                              siam.FEATURE_OUT, k, k)
        r2 = siam._conv_nchw(x_f, p["conv_r2"]["w"], p["conv_r2"]["b"])
        cls2 = siam._conv_nchw(x_f, p["conv_cls2"]["w"], p["conv_cls2"]["b"])
        delta = jax.vmap(_corr)(r2, r1_k)
        delta = siam._conv_nchw(delta, p["regress_adjust"]["w"],
                                p["regress_adjust"]["b"])
        score = jax.vmap(_corr)(cls2, cls1_k)
        delta = delta.reshape(zb.shape[0], 4, -1)
        score = jax.nn.softmax(score.reshape(zb.shape[0], 2, -1), axis=1)[:, 1]
        best = jnp.argmax(score, axis=-1)                    # (B,)
        d = jnp.take_along_axis(delta, best[:, None, None].repeat(4, 1),
                                axis=-1)[..., 0]             # (B, 4)
        a = anchors_cxcywh[best]                             # (B, 4)
        cx = d[:, 0] * a[:, 2] + a[:, 0]
        cy = d[:, 1] * a[:, 3] + a[:, 1]
        w = jnp.exp(jnp.minimum(d[:, 2], 20.0)) * a[:, 2]
        h = jnp.exp(jnp.minimum(d[:, 3], 20.0)) * a[:, 3]
        return jnp.stack([cx, cy, w, h], axis=-1)

    n = len(gt)
    ious, hits = [], []
    for start in range(0, n, batch_size):
        zb = z[start:start + batch_size]
        xb = x[start:start + batch_size]
        gb = gt[start:start + batch_size]
        if len(zb) < batch_size:    # pad to the jit signature
            pad = batch_size - len(zb)
            zb = np.concatenate([zb, zb[-1:].repeat(pad, 0)])
            xb = np.concatenate([xb, xb[-1:].repeat(pad, 0)])
        pred = np.asarray(fwd(params, jnp.asarray(zb), jnp.asarray(xb)))
        pred = pred[:len(gb)]
        p_xyxy = np.stack([pred[:, 0] - pred[:, 2] / 2,
                           pred[:, 1] - pred[:, 3] / 2,
                           pred[:, 0] + pred[:, 2] / 2,
                           pred[:, 1] + pred[:, 3] / 2], axis=-1)
        g_xyxy = np.stack([gb[:, 0] - gb[:, 2] / 2, gb[:, 1] - gb[:, 3] / 2,
                           gb[:, 0] + gb[:, 2] / 2, gb[:, 1] + gb[:, 3] / 2],
                          axis=-1)
        lt = np.maximum(p_xyxy[:, :2], g_xyxy[:, :2])
        rb = np.minimum(p_xyxy[:, 2:], g_xyxy[:, 2:])
        inter = np.prod(np.clip(rb - lt, 0, None), axis=-1)
        area_p = np.prod(p_xyxy[:, 2:] - p_xyxy[:, :2], axis=-1)
        area_g = np.prod(g_xyxy[:, 2:] - g_xyxy[:, :2], axis=-1)
        ious.append(inter / np.maximum(area_p + area_g - inter, 1e-9))
        hits.append(np.hypot(pred[:, 0] - gb[:, 0],
                             pred[:, 1] - gb[:, 1]) < 8.0)
    return {"mean_iou": float(np.mean(np.concatenate(ious))),
            "center_hit": float(np.mean(np.concatenate(hits)))}


def siam_train_main(pairs_npz, checkpoint_dir, *, num_epochs: int = 30,
                    batch_size: int = 32, learning_rate: float = 5e-3,
                    momentum: float = 0.9, holdout: int = 256,
                    seed: int = 0, print_step: int = 50) -> Dict:
    """Train on a pre-built pair npz; saves orbax params under
    `checkpoint_dir/final` (loadable by `build_siam_reasoner`)."""
    from objectpermanence_tpu.utils import checkpoint as ckpt

    blob = np.load(pairs_npz)
    z_all = blob["z"].astype(np.float32).transpose(0, 3, 1, 2)
    x_all = blob["x"].astype(np.float32).transpose(0, 3, 1, 2)
    gt_all = blob["gt"].astype(np.float32)
    z_val, x_val, gt_val = (a[:holdout] for a in (z_all, x_all, gt_all))
    z_tr, x_tr, gt_tr = (a[holdout:] for a in (z_all, x_all, gt_all))
    num = len(gt_tr)
    print(f"[siam-train] {num} train / {len(gt_val)} holdout pairs",
          flush=True)

    params = siam_train_init(jax.random.PRNGKey(seed))
    # cosine decay like modern SiamRPN recipes; warmup one epoch
    steps_per_epoch = max(num // batch_size, 1)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, steps_per_epoch,
        num_epochs * steps_per_epoch, learning_rate * 0.01)
    optimizer = optax.chain(optax.clip_by_global_norm(10.0),
                            optax.sgd(schedule, momentum=momentum))
    opt_state = optimizer.init(params)
    train_step = make_siam_train_step(optimizer)

    # device-resident data (~1 GB as fp32; keep uint8 on host otherwise)
    z_d, x_d, gt_d = (jax.device_put(a) for a in (z_tr, x_tr, gt_tr))

    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed + 1)
    history = []
    t0 = time.time()
    for epoch in range(num_epochs):
        order = rng.permutation(num)
        losses = []
        for it in range(steps_per_epoch):
            idx = jnp.asarray(order[it * batch_size:(it + 1) * batch_size])
            key, sub = jax.random.split(key)
            params, opt_state, metrics = train_step(
                params, opt_state, z_d[idx], x_d[idx], gt_d[idx], sub)
            if (it + 1) % print_step == 0:
                losses.append({k: float(v) for k, v in metrics.items()})
                print(f"[siam-train] epoch {epoch+1} it {it+1}: "
                      f"{losses[-1]} ({time.time()-t0:.0f}s)", flush=True)
        ev = evaluate_pairs(params, z_val, x_val, gt_val)
        print(f"[siam-train] epoch {epoch+1}: holdout {ev}", flush=True)
        history.append({"epoch": epoch + 1, **ev})

    final = Path(checkpoint_dir) / "final"
    ckpt.save_params(final, params)
    return {"params": params, "history": history, "checkpoint": str(final)}
