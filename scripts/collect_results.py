"""Mirror compact result artifacts from /root/data into the repo.

The dev containers are ephemeral: everything under /root/data (rendered
videos, checkpoints, result CSVs) vanishes on a reset, which orphans the
numbers quoted in STATUS.md. This script copies the SMALL evidence files
(CSVs, json reports, metrics tails) into `results/` inside the repo so they
can be committed and survive resets. Bulk artifacts (videos, ingest caches,
orbax checkpoints) are deliberately excluded.

Usage: python scripts/collect_results.py   (idempotent; copies what exists)
"""

import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "results"

# (source, destination-under-results/) — compact evidence files only
ARTIFACTS = [
    # perfect-perception flagship (scripts/containment_run.py)
    ("/root/data/sim4k/analysis.csv", "sim4k/perfect_analysis.csv"),
    ("/root/data/sim4k/metrics.jsonl", "sim4k/perfect_train_metrics.jsonl"),
    # REAL two-stage pipeline (scripts/two_stage_run.py). The round-4
    # container's bounded 800-video fair-budget rerun was archived to
    # run800/ before the 1,600-video stair-step reused the live paths —
    # the frozen twostage800 evidence now mirrors from the archive.
    ("/root/data/twostage/run800/analysis.csv", "twostage800/analysis.csv"),
    ("/root/data/twostage/run800/metrics.jsonl",
     "twostage800/opnet_train_metrics.jsonl"),
    ("/root/data/twostage/run800/results_models.json",
     "twostage800/results_models.json"),
    ("/root/data/twostage/detector/report.json",
     "twostage800/detector_report.json"),
    # round 4: the 1,600-video stair-step on the same detector/scenes
    ("/root/data/twostage/analysis.csv", "twostage1600/analysis.csv"),
    ("/root/data/twostage/analysis_transformer_lstm.csv",
     "twostage1600/analysis_transformer_lstm.csv"),
    ("/root/data/twostage/analysis_opnet_moe.csv",
     "twostage1600/analysis_opnet_moe.csv"),
    ("/root/data/twostage/analysis_baseline_lstm.csv",
     "twostage1600/analysis_baseline_lstm.csv"),
    ("/root/data/twostage/metrics.jsonl",
     "twostage1600/opnet_train_metrics.jsonl"),
    ("/root/data/twostage/perception_stats.json",
     "twostage1600/perception_stats.json"),
    ("/root/data/twostage/cater/grid_results.json",
     "twostage1600/grid_results.json"),
    ("/root/data/twostage/checkpoints/moe_balance.json",
     "twostage1600/moe_balance_two_stage.json"),
    ("/root/data/twostage/results_models.json",
     "twostage1600/results_models.json"),
    # CATER-setup grid accuracy (scripts/cater_grid_run.py)
    ("/root/data/sim4k/cater/grid_results.json", "sim4k/cater_grid_results.json"),
    # unbiased-planner eval (scripts/unbiased_eval.py). NOTE: the committed
    # unbiased/results.json + analysis_opnet.csv are the FROZEN round-3 eval
    # of the (since-reset) full-data checkpoints — later containers rewrite
    # /root/data/unbiased with evals of different checkpoints, so those two
    # now mirror to *_latest names instead of clobbering history.
    ("/root/data/unbiased/results.json", "unbiased/results_latest_eval.json"),
    ("/root/data/unbiased/analysis_opnet.csv",
     "unbiased/analysis_opnet_latest.csv"),
    # tracker OPE benchmark (scripts/tracker_benchmark.py)
    ("/root/data/trackbench3/results.json", "trackbench/results.json"),
    # SiamRPN training log (scripts/siam_run.py prints, nohup captures)
    ("/tmp/siam_run.log", "siam/train_log.txt"),
    # variant sweep tables (scripts/variant_sweep.py)
    ("/root/data/sim4k/sweep/results.json", "sim4k/sweep_full_results.json"),
    ("/root/data/sim4k/sweep_160ep_800/results.json",
     "sim4k/sweep_160ep_800_results.json"),
    # round 4: reference-geometry detector run (scripts/detector_800px_run.py)
    ("/root/data/det800/det800/report.json", "det800/report_800px_windowed.json"),
    ("/root/data/det800/detnative/report.json", "det800/report_native_control.json"),
    ("/root/data/det800/steptime.json", "det800/steptime.json"),
    # round 4: trained opnet_moe + route balance (scripts/moe_balance.py)
    ("/root/data/sim4k/sweep_160ep_800_bal/results.json",
     "moe/results_fair_budget_bal.json"),
    ("/root/data/sim4k/sweep_160ep_800_bal/moe_balance.json",
     "moe/moe_balance_switch.json"),
    ("/root/data/sim4k/sweep_160ep_800/moe_balance.json",
     "moe/moe_balance_no_aux.json"),
    # round 4: unbiased-planner TRAINING sweep (scripts/unbiased_eval.py train)
    ("/root/data/unb/sweep/results.json", "unbiased/sweep_trained_results.json"),
]

MAX_BYTES = 4 * 1024 * 1024  # refuse to copy anything bulky by accident


def main() -> int:
    dests = [dst for _, dst in ARTIFACTS]
    dupes = {d for d in dests if dests.count(d) > 1}
    if dupes:
        print(f"FATAL: duplicate destinations would clobber: {sorted(dupes)}",
              file=sys.stderr)
        return 1
    copied, skipped = [], []
    for src, dst in ARTIFACTS:
        src_p = Path(src)
        if not src_p.exists():
            skipped.append(src)
            continue
        if src_p.stat().st_size > MAX_BYTES:
            print(f"SKIP (too large): {src}", file=sys.stderr)
            continue
        dst_p = OUT / dst
        dst_p.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(src_p, dst_p)
        copied.append(dst)
    print(json.dumps({"copied": copied, "missing": skipped}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
