"""Detection head decode: raw logits -> image-space boxes + per-class scores.

Reference semantics (the canonical TF flavor, SURVEY.md §7 "hard parts"):
  * score = sigmoid(class) * sigmoid(conf)   (keras_inference.py:101)
  * xy/wh via sigmoid+offset / exp*anchor     (tools/utils.py:524-547)
  * letterbox-inverse to original-image yxyx  (keras_inference.py:32-72)
  * all layers concatenated                   (keras_inference.py:113-114)

The C region layer's softmax-over-classes variant (region_layer.c:133-136)
is available behind ``class_softmax=True`` so on-device (K210) numerics can
be emulated.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import YoloSpec
from k210_yolo_framework_tpu.ops.codec import xywh_grid_to_all
from k210_yolo_framework_tpu.ops.letterbox import correct_boxes

__all__ = ["decode_layer", "decode_outputs", "num_candidates"]


def num_candidates(spec: YoloSpec) -> int:
    """Total boxes across layers (e.g. 7*10*3 + 14*20*3 = 1050 for VOC demo)."""
    return sum(h * w * spec.nanchors for h, w in spec.out_hws)


def decode_layer(pred: jnp.ndarray, layer: int, spec: YoloSpec,
                 image_hw, class_softmax: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode one layer's [..., h, w, a, 5+C] raw output.

    Returns (yxyx boxes in original-image pixels [..., h*w*a, 4],
             scores [..., h*w*a, C]).
    """
    pred = pred.astype(jnp.float32)
    pred_xy = pred[..., 0:2]
    pred_wh = pred[..., 2:4]
    pred_conf = pred[..., 4:5]
    pred_cls = pred[..., 5:]

    if class_softmax:
        # region_layer.c:91-136 — softmax classes, sigmoid conf.
        scores = jax.nn.softmax(pred_cls, axis=-1) * jax.nn.sigmoid(pred_conf)
    else:
        scores = jax.nn.sigmoid(pred_cls) * jax.nn.sigmoid(pred_conf)

    xy_all, wh_all = xywh_grid_to_all(pred_xy, pred_wh, layer, spec)
    boxes = correct_boxes(xy_all, wh_all, spec.in_hw, image_hw)

    lead = pred.shape[:-4]
    n = pred.shape[-4] * pred.shape[-3] * pred.shape[-2]
    return boxes.reshape(lead + (n, 4)), scores.reshape(lead + (n, spec.class_num))


def decode_outputs(preds: Sequence[jnp.ndarray], spec: YoloSpec, image_hw,
                   class_softmax: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode + concat all output layers (keras_inference.py:94-114)."""
    all_boxes: List[jnp.ndarray] = []
    all_scores: List[jnp.ndarray] = []
    for l, p in enumerate(preds):
        b, s = decode_layer(p, l, spec, image_hw, class_softmax)
        all_boxes.append(b)
        all_scores.append(s)
    return jnp.concatenate(all_boxes, axis=-2), jnp.concatenate(all_scores, axis=-2)
