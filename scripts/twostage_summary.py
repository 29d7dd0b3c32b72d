"""Summarize per-model two-stage analysis CSVs into results_models.json.

The analyze stage (`scripts/two_stage_run.py analyze --model M`) writes one
reference-schema per-video CSV per architecture (`analysis.csv` for opnet,
`analysis_<model>.csv` otherwise — the same columns as the reference's
`baselines/analyze_iou_offline.py`). This script reduces them to the compact
per-model comparison table quoted in STATUS.md: per-column mean over videos,
NaN-skipping exactly like the reference's masked aggregation (videos whose
mask never fires contribute nothing — `tracking_utils.py:323-358`).

    python scripts/twostage_summary.py --root /root/data/twostage \
        --models opnet transformer_lstm baseline_lstm opnet_moe
"""

import argparse
import csv
import json
import math
from pathlib import Path

COLUMNS = {
    "overall_iou": "overall_iou",
    "contained_iou": "contained_mean_iou",
    "full_occlusion_iou": "full_occlusion_mean_iou",
    "visible_iou": "visibility_gt_0_mean_iou",
    "map_0.5": "overall_map_0.5",
}


def summarize_csv(path: Path) -> dict:
    with open(path) as f:
        rows = list(csv.DictReader(f))
    out = {"videos": len(rows)}
    for name, col in COLUMNS.items():
        vals = [float(r[col]) for r in rows if r[col] not in ("", None)]
        vals = [v for v in vals if not math.isnan(v)]
        out[name] = round(sum(vals) / len(vals), 4) if vals else None
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, default=Path("/root/data/twostage"))
    ap.add_argument("--models", nargs="+",
                    default=["opnet", "transformer_lstm", "baseline_lstm",
                             "opnet_moe"])
    ap.add_argument("--out", type=Path, default=None,
                    help="default: <root>/results_models.json")
    args = ap.parse_args()

    table = []
    for model in args.models:
        suffix = "" if model == "opnet" else f"_{model}"
        path = args.root / f"analysis{suffix}.csv"
        if not path.exists():
            print(f"[summary] {model}: no {path.name}, skipping", flush=True)
            continue
        row = {"model": model, **summarize_csv(path)}
        # provenance: merge the training stamp (two_stage_run.py opnet stage)
        # so the table self-describes which run budget produced each row
        meta_path = args.root / f"train_meta{suffix}.json"
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
            row["train_videos"] = meta.get("train_videos")
            row["epochs"] = meta.get("epochs")
            row["best_dev_iou"] = meta.get("best_dev_iou")
        table.append(row)

    out = args.out or (args.root / "results_models.json")
    out.write_text(json.dumps(table, indent=2))
    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
