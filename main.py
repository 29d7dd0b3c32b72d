"""CLI for the TPU-native ObjectPermanence framework.

Same surface as the reference `main.py` (training / inference / preprocess /
analysis / cater_inference subcommands with identical flags), dispatching to
the JAX drivers.
"""

import argparse
import json
from typing import Any, Dict


def _load_json(path) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def build_parser() -> argparse.ArgumentParser:
    from objectpermanence_tpu.models.registry import (
        INFERENCE_SUPPORTED_MODELS, TRAINING_SUPPORTED_MODELS,
    )

    parser = argparse.ArgumentParser(
        description="training and inference over the CATER data (TPU-native)")
    subparsers = parser.add_subparsers()

    inference_parser = subparsers.add_parser("inference")
    inference_parser.set_defaults(mode="inference")
    inference_parser.add_argument("--model_type", type=str, required=True,
                                  choices=INFERENCE_SUPPORTED_MODELS)
    inference_parser.add_argument("--results_dir", type=str, required=True)
    inference_parser.add_argument("--inference_config", type=str, required=True)
    inference_parser.add_argument("--model_config", type=str, required=False)

    preprocess_parser = subparsers.add_parser("preprocess")
    preprocess_parser.set_defaults(mode="preprocess")
    preprocess_parser.add_argument("--results_dir", type=str, required=True)
    preprocess_parser.add_argument("--config", type=str, required=True)

    training_parser = subparsers.add_parser("training")
    training_parser.set_defaults(mode="training")
    training_parser.add_argument("--model_type", type=str, required=True,
                                 choices=TRAINING_SUPPORTED_MODELS)
    training_parser.add_argument("--model_config", type=str, required=True)
    training_parser.add_argument("--training_config", type=str, required=True)
    training_parser.add_argument("--resume", action="store_true",
                                 help="resume from the latest checkpoint")

    analysis_parser = subparsers.add_parser("analysis")
    analysis_parser.set_defaults(mode="analysis")
    analysis_parser.add_argument("--predictions_dir", type=str, required=True)
    analysis_parser.add_argument("--labels_dir", type=str, required=True)
    analysis_parser.add_argument("--containment_annotations", type=str, required=False)
    analysis_parser.add_argument("--containment_only_static_annotations", type=str,
                                 required=False)
    analysis_parser.add_argument("--containment_with_movements_annotations", type=str,
                                 required=False)
    analysis_parser.add_argument("--visibility_ratio_gt_0", type=str, required=False)
    analysis_parser.add_argument("--visibility_ratio_gt_30", type=str, required=False)
    analysis_parser.add_argument("--visibility_ratio_gt_99", type=str, required=False)
    analysis_parser.add_argument("--iou_thresholds", type=str, required=True,
                                 default="0.5,0.9")
    analysis_parser.add_argument("--output_file", type=str, required=True)

    cater_parser = subparsers.add_parser("cater_inference")
    cater_parser.set_defaults(mode="cater_inference")
    cater_parser.add_argument("--results_dir", type=str, required=True)
    cater_parser.add_argument("--inference_config", type=str, required=True)
    cater_parser.add_argument("--model_config", type=str, required=False)
    # the reference's driver is OPNet-only (`cater_setup_inference.py:35`);
    # any learned variant works here (as in scripts/cater_grid_run.py)
    cater_parser.add_argument("--model_type", type=str, default="opnet",
                              choices=TRAINING_SUPPORTED_MODELS)

    return parser


def main(argv=None) -> None:
    from objectpermanence_tpu.models.registry import TRAINING_SUPPORTED_MODELS

    args = build_parser().parse_args(argv)
    mode = getattr(args, "mode", None)
    if mode is None:
        build_parser().print_help()
        return

    if mode == "inference":
        inference_config = _load_json(args.inference_config)
        if args.model_type in TRAINING_SUPPORTED_MODELS:
            from objectpermanence_tpu.infer.reasoning import reasoning_inference_main
            model_config = _load_json(args.model_config)
            reasoning_inference_main(args.model_type, args.results_dir,
                                     inference_config, model_config)
        else:
            from objectpermanence_tpu.infer.trackers import trackers_inference_main
            trackers_inference_main(args.model_type, args.results_dir,
                                    inference_config)

    elif mode == "preprocess":
        from objectpermanence_tpu.infer.preprocess import preprocess_main
        preprocess_main(args.results_dir, _load_json(args.config))

    elif mode == "training":
        from objectpermanence_tpu.data.ingest import ingest_directory
        from objectpermanence_tpu.models.registry import get_model_spec
        from objectpermanence_tpu.train.loop import training_main

        model_config = _load_json(args.model_config)
        train_config = _load_json(args.training_config)
        spec = get_model_spec(args.model_type)
        cache_dir = train_config.get("cache_dir")
        train_dataset = ingest_directory(
            train_config["train_sample_dir"], train_config["train_labels_dir"],
            spec.feature_width, train_config["train_containment_file"], cache_dir)
        dev_dataset = ingest_directory(
            train_config["dev_sample_dir"], train_config["dev_labels_dir"],
            spec.feature_width, train_config["dev_containment_file"], cache_dir)
        training_main(spec, train_dataset, dev_dataset, train_config, model_config,
                      resume=args.resume)

    elif mode == "analysis":
        from objectpermanence_tpu.analysis.offline import analyze_results
        iou_thresholds = [float(t) for t in args.iou_thresholds.split(",")]
        analyze_results(args.predictions_dir, args.labels_dir, args.output_file,
                        args.containment_annotations,
                        args.containment_only_static_annotations,
                        args.containment_with_movements_annotations,
                        args.visibility_ratio_gt_0, args.visibility_ratio_gt_30,
                        args.visibility_ratio_gt_99, iou_thresholds)

    elif mode == "cater_inference":
        from objectpermanence_tpu.infer.cater_setup import cater_setup_inference
        cater_setup_inference(args.model_type, args.results_dir,
                              _load_json(args.inference_config),
                              _load_json(args.model_config))


if __name__ == "__main__":
    main()
