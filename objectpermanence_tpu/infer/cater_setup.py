"""CATER-setup inference: last-frame snitch box -> 6x6 grid class CSV.

Reference `baselines/cater_setup_inference.py:35-103` (OPNet-only): take
the final frame's predicted box, project its center through the
image->ground-plane homography, and bin into the 36-way grid class.
"""

from pathlib import Path
from typing import Dict

import numpy as np
import pandas as pd

from objectpermanence_tpu.data.ingest import ingest_directory
from objectpermanence_tpu.infer.reasoning import predict_dataset
from objectpermanence_tpu.models.registry import init_model
from objectpermanence_tpu.ops.homography import grid_classes_for_centers


def cater_setup_inference(model_name: str, results_dir: str,
                          inference_config, model_config: Dict,
                          mesh=None) -> pd.DataFrame:
    from objectpermanence_tpu.config import inference_config_from
    cfg = inference_config_from(inference_config)

    spec, params = init_model(model_name, model_config,
                              checkpoint_path=cfg.model_path)
    dataset = ingest_directory(cfg.sample_dir, cfg.labels_dir,
                               spec.feature_width, cache_dir=cfg.cache_dir)
    predictions = predict_dataset(spec, params, dataset, cfg.batch_size, mesh)

    names = list(predictions.keys())
    last_boxes = np.stack([predictions[n][-1] for n in names]).astype(np.float64)
    centers = np.stack([
        (last_boxes[:, 0] + last_boxes[:, 2]) / 2,
        (last_boxes[:, 1] + last_boxes[:, 3]) / 2,
    ], axis=-1)
    classes = grid_classes_for_centers(centers)

    results_df = pd.DataFrame({
        "video_names": [f"{n}.avi" for n in names],
        "class_predictions": classes,
    })
    results_dir = Path(results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    results_df.to_csv(results_dir / "class_pred_results.csv", index=False)
    return results_df
