#!/usr/bin/env python3
"""Freeze/export entry — CLI-compatible with the reference's keras_freeze.py
(same positional ckpt argument; prints input/output node info).  Produces the
reference's .tflite flatbuffer (nncase-consumable; optional int8 PTQ) plus
StableHLO serving artifacts and .h5 weights — see export.py docstring."""

import argparse
import sys
from pathlib import Path


def main(args):
    import jax

    from k210_yolo_framework_tpu.config import TrainConfig, YoloSpec
    from k210_yolo_framework_tpu.export import freeze
    from k210_yolo_framework_tpu.models import build_network
    from k210_yolo_framework_tpu.training import checkpoint as CK
    from k210_yolo_framework_tpu.training import train as T
    from k210_yolo_framework_tpu.utils import NOTE

    spec = YoloSpec.from_files(
        f"data/{args.train_set}_anchor.npy",
        in_hw=tuple(args.image_size),
        out_hws=tuple(args.output_size),
        class_num=args.class_num)
    net = build_network(args.model_def, spec.in_hw, spec.nanchors,
                        spec.class_num, alpha=args.depth_multiplier)
    state = T.create_train_state(net, TrainConfig(), jax.random.PRNGKey(0))
    variables = CK.load_variables(args.pre_ckpt, args.model_def, state)

    rep_images = None
    if args.tflite_dataset:
        # calibration set for full-int8 PTQ — the nncase `--dataset` analogue
        # (/root/reference/README.md:152-154).  Each image goes through the
        # SAME preprocessing the deployed model sees (stage -> letterbox ->
        # img/max normalize), not a distorting resize: activation ranges
        # calibrated on a padded/aspect-true pixel distribution.
        import numpy as np
        from PIL import Image

        from k210_yolo_framework_tpu.data.pipeline import CANVAS_HW, stage_image
        from k210_yolo_framework_tpu.ops import letterbox as LB

        paths = sorted(p for p in Path(args.tflite_dataset).iterdir()
                       if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp"))
        if not paths:
            raise SystemExit(f"no images in --tflite_dataset {args.tflite_dataset}")
        staged = [stage_image(np.asarray(Image.open(p).convert("RGB")), CANVAS_HW)
                  for p in paths[:64]]
        canvases = np.stack([c for c, _ in staged])
        hws = np.stack([hw for _, hw in staged])

        def _prep(canvas, hw):
            img = LB.letterbox_image(canvas, hw, spec.in_hw)
            return LB.normalize_image(img)

        rep_images = np.asarray(jax.jit(jax.vmap(_prep))(canvases, hws),
                                np.float32)
        print(NOTE, f"full-int8 calibration over {len(rep_images)} images "
                    "(serving-parity letterbox preprocessing)")

    out_dir = args.out_dir or str(Path(args.pre_ckpt).parent / "Freeze_save")
    arts = freeze(net, variables, spec, out_dir,
                  tflite=str(args.tflite).lower() == "true",
                  tflite_int8=str(args.tflite_int8).lower() == "true"
                  or rep_images is not None,
                  rep_images=rep_images,
                  model_def=args.model_def
                  if str(args.reference_h5).lower() == "true" else None)
    print(NOTE, f"export artifacts: {arts}")


def parse_arguments(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("pre_ckpt", type=str, help="checkpoint (.h5 or orbax dir)")
    parser.add_argument("--train_set", type=str, default="voc")
    parser.add_argument("--class_num", type=int, default=20)
    parser.add_argument("--model_def", type=str, default="yolo_mobilev1")
    parser.add_argument("--depth_multiplier", type=float, default=0.75)
    parser.add_argument("--image_size", type=int, default=(224, 320), nargs="+")
    parser.add_argument("--output_size", type=int, default=(7, 10, 14, 20), nargs="+")
    parser.add_argument("--out_dir", type=str, default=None)
    parser.add_argument("--tflite", type=str, default="True",
                        help="write yolo_model.tflite (reference freeze product)")
    parser.add_argument("--tflite_int8", type=str, default="False",
                        help="also write a dynamic-range int8 .tflite")
    parser.add_argument("--reference_h5", type=str, default="True",
                        help="also write yolo_model_reference.h5 — a Keras-"
                             "layout weights file the reference's own "
                             "scripts load with stock load_weights "
                             "(reference keras_train.py:52-57)")
    parser.add_argument("--tflite_dataset", type=str, default=None,
                        help="directory of calibration images -> FULL int8 "
                             ".tflite (the reference's `ncc --dataset` step, "
                             "README.md:152-154); implies --tflite_int8")
    return parser.parse_args(argv)


if __name__ == "__main__":
    main(parse_arguments(sys.argv[1:]))
