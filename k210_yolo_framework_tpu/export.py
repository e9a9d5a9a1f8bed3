"""Model export (the reference's freeze stage).

The reference freezes ``.h5 -> .tflite`` via TFLiteConverter and hands off to
nncase for ``.kmodel`` (/root/reference/keras_freeze.py:15-23; README.md:
144-154).  Deliverables here:

  * a REAL ``.tflite`` flatbuffer of the raw-output model (``[B, h, w,
    a*(5+C)]`` heads, the reference's ``yolo_model`` export view) via
    TFLite's jax frontend — the artifact nncase ingests for ``.kmodel``;
    optional full-int8 PTQ with a representative dataset (the kmodel's
    own quantization recipe);
  * the same model as StableHLO via ``jax.export`` — the portable
    compiler-consumable artifact for XLA-family runtimes;
  * the FULL serving program (uint8 frames -> NMS'd boxes) as StableHLO;
  * an ``.h5`` weights file (the ``yolo_model.h5`` analogue);
  * printed input/output "node" names + shapes (keras_freeze.py:21-23 UX).

TF is an export-time-only dependency (never on the train/serve path); all
TFLite entry points degrade gracefully when it is absent.  kmodel itself
requires nncase + K210 hardware — out of scope on this image.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from k210_yolo_framework_tpu.config import YoloSpec
from k210_yolo_framework_tpu.models.yolonet import YoloNet
from k210_yolo_framework_tpu.training import checkpoint as CK

__all__ = ["export_stablehlo", "export_tflite", "freeze"]


def export_stablehlo(net: YoloNet, variables: Dict, batch: int = 1) -> bytes:
    """Serialize the raw-output forward as StableHLO."""
    from jax import export as jexport

    def forward(x):
        return tuple(net.apply_raw(variables, x, train=False))

    x_spec = jax.ShapeDtypeStruct((batch, net.in_hw[0], net.in_hw[1], 3), jnp.float32)
    exported = jexport.export(jax.jit(forward))(x_spec)
    return exported.serialize()


def export_tflite(net: YoloNet, variables: Dict, batch: int = 1,
                  int8: bool = False,
                  rep_images: Optional[np.ndarray] = None) -> bytes:
    """``.tflite`` flatbuffer of the raw-output model — the reference's
    freeze product (keras_freeze.py:15-23), consumable by nncase for
    ``.kmodel`` (README.md:152-154).

    ``int8=True`` applies post-training quantization: dynamic-range
    (weights-only) without ``rep_images``, full int8 with them
    (``rep_images``: [n, in_h, in_w, 3] float32 in [0, 1], the calibration
    set nncase's ``--dataset`` flag corresponds to).  Model I/O stays
    float32 either way so downstream decode code is unchanged.
    """
    import tensorflow as tf  # export-time-only dependency

    def forward(x):
        return tuple(net.apply_raw(variables, x, train=False))

    x = np.zeros((batch, net.in_hw[0], net.in_hw[1], 3), np.float32)
    conv = tf.lite.TFLiteConverter.experimental_from_jax(
        [forward], [[("images", x)]])
    if int8:
        conv.optimizations = [tf.lite.Optimize.DEFAULT]
        if rep_images is not None:
            def rep():
                for img in rep_images:
                    yield [np.asarray(img, np.float32)[None]]
            conv.representative_dataset = rep
            conv.target_spec.supported_ops = [
                tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    return conv.convert()


def export_serving_stablehlo(predictor, batch: int = 1,
                             canvas_hw=None,
                             top_k: Optional[int] = None) -> bytes:
    """Serialize the FULL serving program — uint8 frames in, NMS'd boxes out
    (letterbox + conv stack + decode + per-class NMS) — as StableHLO.

    This is the framework's analogue of the reference's flashed kmodel + C
    region layer (SURVEY.md §7 step 9): one deployable artifact that covers
    the whole device story.  Uses the XLA NMS path (the Pallas kernel is a
    platform-specific custom call and would pin the artifact to one TPU
    generation).
    """
    import jax
    from jax import export as jexport

    from k210_yolo_framework_tpu.ops import decode as D
    from k210_yolo_framework_tpu.ops import letterbox as LB
    from k210_yolo_framework_tpu.ops import nms as N

    # an uncalibrated int8_act_cal predictor would otherwise die deep
    # inside jexport with an opaque flax scope error
    predictor._require_calibrated()
    spec = predictor.spec
    canvas_hw = canvas_hw or spec.in_hw
    # For a quantized predictor the artifact keeps the INT8 kernels as its
    # constants — dequantization happens inside the exported program, so the
    # serialized serving program is ~4x smaller and deploys the same int8
    # weights the predictor serves from (the kmodel deployment story).
    net, variables = predictor.net, predictor.variables

    def serve(canvases_u8, img_hws):
        variables_m = predictor._materialize(variables)
        def one(canvas, hw):
            img = LB.letterbox_image(canvas, hw, spec.in_hw,
                                     dtype=predictor.compute_dtype)
            return LB.normalize_image(img).astype(predictor.compute_dtype)

        imgs = jax.vmap(one)(canvases_u8, img_hws)
        preds = net.apply(variables_m, imgs)

        def decode_one(pred_list, hw):
            return D.decode_outputs(pred_list, spec, hw, predictor.class_softmax)

        boxes, scores = jax.vmap(decode_one)(preds, img_hws)
        # By default NMS the FULL decoded candidate set (sum of h*w*a over
        # layers — 1050 at 224x320), exactly like the live Predictor's
        # Pallas kernel: any smaller top_k can truncate the pool a dense
        # low-threshold scene feeds the greedy pass, making the exported
        # artifact diverge from live serving.  ``top_k`` stays exposed for
        # targets where the sort budget matters.
        k = top_k if top_k is not None else sum(
            hw[0] * hw[1] * spec.nanchors for hw in spec.out_hws)
        return tuple(N.batched_nms(boxes, scores, predictor.obj_thresh,
                                   predictor.iou_thresh, predictor.max_out,
                                   top_k=k))

    c_spec = jax.ShapeDtypeStruct((batch, canvas_hw[0], canvas_hw[1], 3), jnp.uint8)
    hw_spec = jax.ShapeDtypeStruct((batch, 2), jnp.int32)
    exported = jexport.export(jax.jit(serve))(c_spec, hw_spec)
    return exported.serialize()


def freeze(net: YoloNet, variables: Dict, spec: YoloSpec, out_dir: str,
           batch: int = 1, tflite: bool = True,
           tflite_int8: bool = False,
           rep_images: Optional[np.ndarray] = None,
           model_def: Optional[str] = None) -> Dict[str, str]:
    """Write all export artifacts; returns {artifact: path}.

    With ``model_def`` given, also writes ``yolo_model_reference.h5`` — a
    Keras-layout weights file the REFERENCE's own scripts can load with
    stock ``load_weights`` (port.save_reference_h5), closing the
    ours->reference interchange direction."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    arts: Dict[str, str] = {}

    hlo_path = out / "yolo_model.stablehlo"
    hlo_path.write_bytes(export_stablehlo(net, variables, batch))
    arts["stablehlo"] = str(hlo_path)

    if model_def is not None:
        from k210_yolo_framework_tpu.port import save_reference_h5
        ref_path = out / "yolo_model_reference.h5"
        save_reference_h5(str(ref_path), variables, model_def)
        arts["reference_h5"] = str(ref_path)

    from k210_yolo_framework_tpu.inference import Predictor
    serving_path = out / "yolo_serving.stablehlo"
    serving_path.write_bytes(export_serving_stablehlo(
        Predictor(net, variables, spec), batch=batch))
    arts["serving"] = str(serving_path)

    h5_path = out / "yolo_model.h5"
    CK.save_h5(str(h5_path), variables)
    arts["h5"] = str(h5_path)

    if tflite or tflite_int8:
        try:
            if tflite:
                tfl_path = out / "yolo_model.tflite"
                tfl_path.write_bytes(export_tflite(net, variables, batch))
                arts["tflite"] = str(tfl_path)
            if tflite_int8:  # independent of the fp32 artifact
                # with rep_images: full int8 (the nncase --dataset recipe);
                # without: dynamic-range (weights-only)
                q_path = out / "yolo_model_int8.tflite"
                q_path.write_bytes(export_tflite(net, variables, batch,
                                                 int8=True,
                                                 rep_images=rep_images))
                arts["tflite_int8"] = str(q_path)
        except ImportError:
            print("NOTE: tensorflow unavailable — skipping .tflite artifact "
                  "(StableHLO + h5 written)")

    print("Model Inputs Node:  image:0",
          (batch, net.in_hw[0], net.in_hw[1], 3), "float32")
    for l, hw in enumerate(spec.out_hws):
        print(f"Model Outputs Node: l{l + 1}/raw:0",
              (batch, hw[0], hw[1], spec.nanchors * spec.nchannels), "float32")

    return arts
