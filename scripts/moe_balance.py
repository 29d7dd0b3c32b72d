"""Route-balance report for a trained opnet_moe checkpoint (VERDICT r3 #4).

Loads the best sweep checkpoint, recomputes the MoE head's router decisions
over the held-out test split, and prints the expert usage histogram +
mean gate probability — evidence the Switch-style top-1 router learned a
non-collapsed routing (a collapsed router sends ~100% of frames to one
expert).

    python scripts/moe_balance.py --root /root/data/sim4k \
        --sweep-dir sweep_160ep_800
    python scripts/moe_balance.py --root /root/data/twostage \
        --ckpt-dir /root/data/twostage/checkpoints/opnet_moe \
        --src /root/data/sim4k --perception od_real
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, default=Path("/root/data/sim4k"))
    ap.add_argument("--sweep-dir", default="sweep_160ep_800")
    ap.add_argument("--ckpt-dir", type=Path, default=None,
                    help="explicit checkpoint tree (default: sweep layout)")
    ap.add_argument("--src", type=Path, default=None,
                    help="where test labels/annotations live (default: --root)")
    ap.add_argument("--perception", default="od_perception",
                    help="test perception dir name (od_real for two-stage)")
    ap.add_argument("--batch", type=int, default=300)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from objectpermanence_tpu.config import load_model_config
    from objectpermanence_tpu.data.ingest import ingest_directory
    from objectpermanence_tpu.models import reasoning
    from objectpermanence_tpu.models.registry import get_model_spec
    from objectpermanence_tpu.parallel.expert import moe_route
    from objectpermanence_tpu.utils.checkpoint import (
        best_params_checkpoint, restore_params,
    )

    spec = get_model_spec("opnet_moe")
    config = load_model_config("opnet")
    ckpt_dir = args.ckpt_dir or args.root / args.sweep_dir / "opnet_moe" / "opnet_moe"
    best = best_params_checkpoint(ckpt_dir)
    if best is None:
        sys.exit(f"no trained opnet_moe checkpoint under {ckpt_dir}")
    params = restore_params(best, spec.init(jax.random.PRNGKey(0), config))

    src = args.src or args.root
    ds = ingest_directory(args.root / "test" / args.perception,
                          src / "test" / "labels",
                          spec.feature_width,
                          src / "test" / "annotations" / "containment_annotations.txt",
                          str(args.root / "cache"))

    @jax.jit
    def route(boxes):
        selected, _ = reasoning._who_to_attend(params, boxes, None)
        hidden = reasoning.lstm_apply(params["video_lstm"], selected)
        return moe_route(params["box_head"], hidden)

    num_experts = params["box_head"]["w1"].shape[0]
    counts = np.zeros(num_experts, np.int64)
    gate_sum = 0.0
    gate_n = 0
    for i in range(0, len(ds), args.batch):
        top1, gate, _ = route(ds.boxes[i:i + args.batch])
        counts += np.bincount(np.asarray(top1).ravel(), minlength=num_experts)
        gate = np.asarray(gate)
        gate_sum += float(gate.sum())      # token-weighted: the ragged final
        gate_n += gate.size                # batch counts by its actual size

    frac = counts / counts.sum()
    report = {
        "checkpoint": str(best),
        "videos": len(ds),
        "expert_fraction": [round(float(f), 4) for f in frac],
        "max_expert_fraction": round(float(frac.max()), 4),
        "mean_gate_prob": round(gate_sum / gate_n, 4),
    }
    out = (args.ckpt_dir.parent if args.ckpt_dir
           else args.root / args.sweep_dir) / "moe_balance.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
