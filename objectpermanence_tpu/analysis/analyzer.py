"""ResultsAnalyzer: per-video IoU / thresholded-overlap metrics with masked
aggregations, producing the same CSV column schema as the reference
(`baselines/tracking_utils.py:106-397`) from fully vectorized numpy.

Column names (must stay stable — downstream tooling keys on them):
- `{agg_name}_{metric}` for unmasked aggregations (e.g. `overall_iou`,
  `overall_map_0.5`)
- `{agg_name}_mean_{metric}` + `{agg_name}_ratio` for masked IoU
- `{agg_name}_mean_map_{thresh}` for masked mAP
"""

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from objectpermanence_tpu.ops.boxes import iou_xyxy
from objectpermanence_tpu.vocab import SNITCH_TRACK_NAME

DEFECT_SENTINEL = -100  # reference skips videos containing this marker


def parse_gt_bb_json(path) -> np.ndarray:
    """GT `<name>_bb.json` -> (T, 4) int xyxy snitch boxes
    (reference `tracking_utils.py:76-93`)."""
    with open(path) as f:
        tracks = json.load(f)
    raw = np.asarray(tracks[SNITCH_TRACK_NAME], dtype=np.float64)
    return np.stack([raw[:, 0], raw[:, 1], raw[:, 0] + raw[:, 2],
                     raw[:, 1] + raw[:, 3]], axis=-1)


def write_bb_predictions(video_name: str, predictions_dir, boxes) -> Path:
    """Write `<name>_bb.json` predictions (reference
    `tracking_utils.py:96-103`)."""
    path = Path(predictions_dir) / f"{video_name}_bb.json"
    data = [[int(x1), int(y1), int(x2), int(y2)] for x1, y1, x2, y2 in np.asarray(boxes)]
    # atomic write: a crash mid-dump must not leave a truncated file that
    # poisons skip_existing resumes
    tmp = path.with_suffix(".json.tmp")
    with open(tmp, "w") as f:
        json.dump(data, f, indent=2)
    tmp.replace(path)
    return path


def parse_frames_mask_file(path, video_names: Sequence[str],
                           video_lengths: Dict[str, int]) -> Dict[str, np.ndarray]:
    """Tab-separated annotation file -> per-video boolean frame masks
    (reference `tracking_utils.py:258-276`)."""
    wanted = set(video_names)
    masks = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            name, frames_str = line.split("\t")
            if name not in wanted:
                continue
            mask = np.zeros(video_lengths[name], dtype=bool)
            if frames_str:
                mask[np.array(frames_str.split(","), dtype=np.int64)] = True
            masks[name] = mask
    return masks


class ResultsAnalyzer:
    """Vectorized equivalent of the reference analyzer: IoU for all videos
    computed in one shot, aggregations as masked reductions."""

    def __init__(self, video_names: List[str], predictions: np.ndarray,
                 labels: np.ndarray, iou_thresholds: Optional[List[float]] = None):
        predictions = np.asarray(predictions, dtype=np.float64)
        labels = np.asarray(labels, dtype=np.float64)
        assert len(video_names) == len(predictions) == len(labels)

        # skip "defected" videos carrying the -100 sentinel
        # (reference `tracking_utils.py:234-235`)
        keep = ~np.any(predictions == DEFECT_SENTINEL, axis=(1, 2))
        self.video_names = [n for n, k in zip(video_names, keep) if k]
        self.predictions = predictions[keep]
        self.labels = labels[keep]
        self.iou_thresholds = iou_thresholds or []

        self.iou = np.asarray(iou_xyxy(self.predictions, self.labels))  # (V, T)
        self.overlap = {t: self.iou > t for t in self.iou_thresholds}
        self.metrics: Dict[str, np.ndarray] = {}

    @classmethod
    def init_from_files(cls, predictions_dir, labels_dir,
                        iou_thresholds: Optional[List[float]] = None):
        """Pair `<name>_bb.json` predictions with GT jsons
        (reference `tracking_utils.py:162-204`)."""
        predictions_dir, labels_dir = Path(predictions_dir), Path(labels_dir)
        names, preds, gts = [], [], []
        for f_pred in sorted(predictions_dir.glob("*_bb.json")):
            name = f_pred.stem[:-3]
            gt_path = labels_dir / f"{name}_bb.json"
            if not gt_path.exists():
                continue
            with open(f_pred) as f:
                preds.append(np.asarray(json.load(f), dtype=np.float64))
            gts.append(parse_gt_bb_json(gt_path))
            names.append(name)
        return cls(names, np.stack(preds), np.stack(gts), iou_thresholds)

    @property
    def num_frames(self) -> int:
        return self.iou.shape[1]

    def video_lengths(self) -> Dict[str, int]:
        return {name: self.num_frames for name in self.video_names}

    def frames_mask(self, annotation_file) -> Dict[str, np.ndarray]:
        return parse_frames_mask_file(annotation_file, self.video_names,
                                      self.video_lengths())

    def _mask_matrix(self, masks: Dict[str, np.ndarray]) -> np.ndarray:
        return np.stack([
            masks.get(name, np.zeros(self.num_frames, dtype=bool))
            for name in self.video_names
        ])

    def compute_aggregated_metric(self, agg_name: str, agg_fn, metric: str = "iou") -> None:
        if metric == "iou":
            self.metrics[f"{agg_name}_{metric}"] = np.array(
                [float(agg_fn(row)) for row in self.iou])
        elif metric == "map":
            for thresh, overlap in self.overlap.items():
                self.metrics[f"{agg_name}_{metric}_{thresh}"] = np.array(
                    [float(agg_fn(row)) for row in overlap])
        else:
            raise NotImplementedError(f"metric {metric!r} is not supported")

    def compute_aggregated_metric_masking_frames(self, agg_name: str, agg_fn,
                                                 masks: Dict[str, np.ndarray],
                                                 metric: str = "iou") -> None:
        mask = self._mask_matrix(masks)
        counts = mask.sum(axis=1)

        def masked_rows(values):
            return np.array([
                float(agg_fn(row[m])) if c else np.nan
                for row, m, c in zip(values, mask, counts)
            ])

        if metric == "iou":
            self.metrics[f"{agg_name}_mean_{metric}"] = masked_rows(self.iou)
            self.metrics[f"{agg_name}_ratio"] = np.where(
                counts > 0, counts / mask.shape[1], 0.0)
        elif metric == "map":
            for thresh, overlap in self.overlap.items():
                self.metrics[f"{agg_name}_mean_map_{thresh}"] = masked_rows(overlap)
        else:
            raise NotImplementedError(f"metric {metric!r} is not supported")

    def compute_precision_data(self, thresholds: Optional[List[float]] = None,
                               masks: Optional[Dict[str, np.ndarray]] = None) -> None:
        """Precision@t sweep (reference `tracking_utils.py:360-377`)."""
        if thresholds is None:
            thresholds = [i / 20 for i in range(20)]
        for t in thresholds:
            def t_agg(x, _t=t):
                return np.sum(x > _t) / x.shape[0]
            if masks is not None:
                self.compute_aggregated_metric_masking_frames(
                    f"occ_precision_{t}", t_agg, masks)
            else:
                self.compute_aggregated_metric(f"precision_{t}", t_agg)

    def get_analysis_df(self) -> pd.DataFrame:
        order = np.argsort(self.video_names)
        data = {"videos_names": [self.video_names[i] for i in order]}
        for name, values in self.metrics.items():
            data[name] = values[order]
        return pd.DataFrame(data)

    def write_results(self, path) -> None:
        self.get_analysis_df().round(3).to_csv(path, index=None)
