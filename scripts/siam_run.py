"""Train SiamRPN on rendered scenes, then re-run the OPE benchmark.

Closes the "dead tracker branch" gap: the upstream `SiamRPNVOT.model` blob
is absent from the reference snapshot, so the tracker had only random
weights (OPE AUC 0.003). This trains the same net on renderer-domain
template/search pairs (`train/siam_loop.py`) and re-scores the
programmed-baseline comparison on a large rendered video set.

    python scripts/siam_run.py data     # build the pair npz (CPU)
    python scripts/siam_run.py train    # train on chip
    python scripts/siam_run.py bench    # OPE on the big test render set
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["data", "train", "bench", "all"])
    ap.add_argument("--root", type=Path, default=Path("/root/data/siam"))
    ap.add_argument("--train-src", type=Path,
                    default=Path("/root/data/sim4k/train"))
    ap.add_argument("--train-videos", type=Path,
                    default=Path("/root/data/twostage/train/videos"))
    ap.add_argument("--bench-src", type=Path,
                    default=Path("/root/data/sim4k/test"))
    ap.add_argument("--bench-videos", type=Path,
                    default=Path("/root/data/twostage/test/videos"))
    ap.add_argument("--pairs", type=int, default=4000)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--bench-limit", type=int, default=120)
    args = ap.parse_args()

    args.root.mkdir(parents=True, exist_ok=True)
    pairs_npz = args.root / "pairs.npz"

    if args.stage in ("data", "all"):
        import jax
        jax.config.update("jax_platforms", "cpu")   # cv2-only stage
        from objectpermanence_tpu.train.siam_loop import build_pair_dataset
        build_pair_dataset(args.train_videos, args.train_src / "scenes",
                           args.train_src / "labels", pairs_npz,
                           num_pairs=args.pairs)

    if args.stage in ("train", "all"):
        from objectpermanence_tpu.train.siam_loop import siam_train_main
        result = siam_train_main(pairs_npz, args.root / "checkpoint",
                                 num_epochs=args.epochs,
                                 batch_size=args.batch,
                                 learning_rate=args.lr)
        print(f"[siam] final holdout: {result['history'][-1]}", flush=True)

    if args.stage in ("bench", "all"):
        import subprocess
        cmd = [sys.executable, "scripts/tracker_benchmark.py",
               "--root", str(args.root / "ope"),
               "--weights", str(args.root / "checkpoint" / "final"),
               "--existing-src", str(args.bench_src),
               "--existing-videos", str(args.bench_videos),
               "--limit", str(args.bench_limit)]
        print("[siam] running:", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True,
                       cwd=Path(__file__).resolve().parent.parent)


if __name__ == "__main__":
    main()
