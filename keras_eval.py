#!/usr/bin/env python3
"""VOC mAP evaluation over a dataset — new capability (the reference has no
quantitative eval, SURVEY.md §4); flag surface mirrors keras_inference.py.

Example:
    python keras_eval.py log/<run>/yolo_model.h5 --train_set voc \
        --model_def yolo_mobilev1 --depth_multiplier 0.75
"""

import argparse
import sys

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp

    from k210_yolo_framework_tpu.config import TrainConfig, YoloSpec
    from k210_yolo_framework_tpu.data.annotations import load_ann_list
    from k210_yolo_framework_tpu.eval import calibrate_from_rows, \
        collect_detections, match_detections, match_detections_sweep, \
        split_calibration_rows
    from k210_yolo_framework_tpu.inference import Predictor, VOC_LABELS
    from k210_yolo_framework_tpu.models import build_network
    from k210_yolo_framework_tpu.training import checkpoint as CK
    from k210_yolo_framework_tpu.training import train as T
    from k210_yolo_framework_tpu.utils import INFO, NOTE, quantize_mode

    spec = YoloSpec.from_files(
        f"data/{args.train_set}_anchor.npy",
        in_hw=tuple(args.image_size),
        out_hws=tuple(args.output_size),
        class_num=args.class_num)

    net = build_network(args.model_def, spec.in_hw, spec.nanchors,
                        spec.class_num, alpha=args.depth_multiplier)
    state = T.create_train_state(net, TrainConfig(), jax.random.PRNGKey(0))
    variables = CK.load_variables(args.pre_ckpt, args.model_def, state)
    print(INFO, f"Load CKPT {args.pre_ckpt}")

    pred = Predictor(net, variables, spec, obj_thresh=args.obj_thresh,
                     iou_thresh=args.iou_thresh, max_out=args.max_out,
                     compute_dtype=jnp.bfloat16
                     if str(args.bf16).lower() == "true" else jnp.float32,
                     quantize=quantize_mode(args.quantize))
    ann = load_ann_list(f"data/{args.train_set}_img_ann.npy")
    if quantize_mode(args.quantize) == "int8_act_cal":
        # calibration rows must be disjoint from the eval rows (nncase
        # calibrates on a separate `ncc --dataset`; calibrating on the eval
        # set leaks evaluation data into the quantization ranges)
        calib = load_ann_list(args.calib_list) if args.calib_list else None
        ann, calib_rows = split_calibration_rows(ann, calib, args.calib_size)
        src = args.calib_list or f"last {len(calib_rows)} rows (held out)"
        print(NOTE, f"int8_act_cal: calibrating on {len(calib_rows)} rows "
                    f"from {src}")
        if not args.calib_list:
            # the default tail holdout shrinks the eval set, so cross-mode
            # mAP comparisons on the same file are NOT on identical rows —
            # pass --calib_list (train split) to keep the eval set whole
            print(NOTE, f"eval set is {len(ann)} rows after the holdout "
                        "(other quantize modes eval the full list; use "
                        "--calib_list to keep eval sets identical)")
        calibrate_from_rows(pred, calib_rows)
    if args.limit:
        ann = ann[:args.limit]
    print(INFO, f"evaluating {len(ann)} rows")

    record = collect_detections(pred, ann, args.class_num,
                                batch_size=args.batch_size,
                                progress=lambda d, t: print(f"\r eval {d}/{t}", end=""))
    print()
    res = match_detections(record, args.map_iou, not args.use_12_metric)
    if args.coco:
        sweep = match_detections_sweep(record)
        print(NOTE, f"mAP@[.5:.95] = {sweep['map']:.4f}  "
              + " ".join(f"{k}:{v:.3f}" for k, v in sweep["map_per_iou"].items()))
    labels = VOC_LABELS if args.class_num == len(VOC_LABELS) else [
        str(i) for i in range(args.class_num)]
    for c, ap in enumerate(res["ap"]):
        if not np.isnan(ap):
            print(f"  {labels[c]:<16s} AP@{args.map_iou:.2f} = {ap:.4f}")
    print(NOTE, f"mAP@{args.map_iou:.2f} = {res['map']:.4f}")
    return 0


def parse_args(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("pre_ckpt", type=str)
    parser.add_argument("--train_set", type=str, default="voc")
    parser.add_argument("--class_num", type=int, default=20)
    parser.add_argument("--model_def", type=str, default="yolo_mobilev2")
    parser.add_argument("--depth_multiplier", type=float,
                        choices=[0.5, 0.75, 1.0], default=1.0)
    parser.add_argument("--image_size", type=int, default=(224, 320), nargs="+")
    parser.add_argument("--output_size", type=int, default=(7, 10, 14, 20), nargs="+")
    parser.add_argument("--obj_thresh", type=float, default=0.01,
                        help="LOW for mAP — AP integrates the full PR curve")
    parser.add_argument("--iou_thresh", type=float, default=0.45)
    parser.add_argument("--map_iou", type=float, default=0.5)
    parser.add_argument("--max_out", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--use_12_metric", action="store_true",
                        help="all-points AP instead of VOC07 11-point")
    parser.add_argument("--coco", action="store_true",
                        help="also report COCO-style mAP@[.5:.95]")
    parser.add_argument("--bf16", type=str, default="False",
                        help="bf16 conv compute; default fp32 keeps exact "
                             "training-time numerics (bf16 can shift an "
                             "overfit/borderline model's detections)")
    parser.add_argument("--quantize", type=str, default="False",
                        help="int8: serve from per-channel int8 conv kernels "
                             "(the reference's kmodel quantization story) — "
                             "measures the mAP cost of quantized serving; "
                             "int8_act: also int8 MXU conv compute (affine "
                             "act scales; int8_act_sym = symmetric)")
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--calib_list", type=str, default=None,
                        help="ann npy with int8_act_cal calibration images "
                             "(the `ncc --dataset` analogue, e.g. the train "
                             "split); default holds out the eval list's last "
                             "--calib_size rows instead")
    parser.add_argument("--calib_size", type=int, default=32)
    return parser.parse_args(argv)


if __name__ == "__main__":
    sys.exit(main(parse_args(sys.argv[1:])))
