#!/usr/bin/env python3
"""Single-image inference — CLI-compatible with the reference's
keras_inference.py (same positional/flag surface, keras_inference.py:179-201);
the whole path (letterbox -> model -> decode -> per-class NMS) runs as one
jitted TPU program.  Output boxes print in the reference's
``[top left bottom right score class]`` table (keras_inference.py:146-154);
the drawn image is saved next to the input (headless environments can't
``.show()``).
"""

import argparse
import sys
from pathlib import Path

import numpy as np


def main(args):
    import jax

    from k210_yolo_framework_tpu.config import YoloSpec
    from k210_yolo_framework_tpu.data.annotations import read_image
    from k210_yolo_framework_tpu.inference import Predictor, draw_detections
    from k210_yolo_framework_tpu.models import build_network
    from k210_yolo_framework_tpu.training import checkpoint as CK
    from k210_yolo_framework_tpu.training import train as T
    from k210_yolo_framework_tpu.config import TrainConfig
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
    print(INFO, f" Load CKPT {args.pre_ckpt}")

    import jax.numpy as jnp
    pred = Predictor(net, variables, spec,
                     obj_thresh=args.obj_thresh, iou_thresh=args.iou_thresh,
                     compute_dtype=jnp.bfloat16 if str(args.bf16).lower() == "true"
                     else None,
                     quantize=quantize_mode(args.quantize))
    img = read_image(args.test_image)
    if pred.quantize == "int8_act_cal":
        # single-image CLI: calibrate on the input itself (a 1-image
        # representative set — nncase accepts equally small calib sets)
        import numpy as _np
        pred.calibrate(img[None], _np.asarray([img.shape[:2]], _np.int32))
    det = pred.predict_image(img)

    if len(det.classes) > 0:
        print("[top\tleft\tbottom\tright\tscore\tclass]")
        for box, score, c in zip(det.boxes, det.scores, det.classes):
            top, left, bottom, right = box
            print(f"[{top:.1f}\t{left:.1f}\t{bottom:.1f}\t{right:.1f}\t{score:.2f}\t{int(c):2d}]")
        out = draw_detections(img, det)
        out_path = args.output or str(Path(args.test_image).with_suffix("")) + "_det.png"
        from PIL import Image
        Image.fromarray(out).save(out_path)
        print(INFO, f" Saved result to {out_path}")
    else:
        print(NOTE, " no boxes detected")


def parse_args(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_set", type=str, default="voc")
    parser.add_argument("--class_num", type=int, default=20)
    parser.add_argument("--model_def", type=str, default="yolo_mobilev2")
    parser.add_argument("--depth_multiplier", type=float,
                        choices=[0.5, 0.75, 1.0], default=1.0)
    parser.add_argument("--image_size", type=int, default=(224, 320), nargs="+")
    parser.add_argument("--output_size", type=int, default=(7, 10, 14, 20), nargs="+")
    parser.add_argument("--obj_thresh", type=float, default=0.7)
    parser.add_argument("--iou_thresh", type=float, default=0.3)
    parser.add_argument("--output", type=str, default=None,
                        help="output image path (new; headless replacement for .show())")
    parser.add_argument("--bf16", type=str, default="False",
                        help="bf16 conv compute (fast serving; default keeps "
                             "exact fp32 reference numerics)")
    parser.add_argument("--quantize", type=str, default="False",
                        help="'int8' (or 'True') serves from per-channel int8 "
                             "conv kernels — the kmodel device-story analogue; "
                             "'int8_act' also computes dense convs in int8 on "
                             "the MXU (dynamic affine activation quantization; "
                             "'int8_act_sym' = symmetric scales, faster but "
                             "costs accuracy)")
    parser.add_argument("pre_ckpt", type=str)
    parser.add_argument("test_image", type=str)
    return parser.parse_args(argv)


if __name__ == "__main__":
    main(parse_args(sys.argv[1:]))
