"""Label codecs: gt boxes <-> grid labels, grid <-> image coordinate transforms.

This is the semantic heart of the framework.  Reference behavior reproduced:

  * ``Helper.box_to_label``  (/root/reference/tools/utils.py:207-230):
    per gt box pick (layer, anchor) by max center-aligned IoU, grid cell by
    ``floor(xy * out_wh)``, write clipped xywh + conf=1 + one-hot class.
    The reference's per-box Python loop becomes an ordered scatter (a
    ``fori_loop`` over a fixed-size padded box tensor) so encoding runs
    batched on-device; later boxes overwrite earlier ones exactly like the
    reference loop.
  * ``Helper.label_to_box``  (/root/reference/tools/utils.py:293-307).
  * ``tf_xywh_to_all``       (/root/reference/tools/utils.py:524-547).
  * ``tf_xywh_to_grid``      (/root/reference/tools/utils.py:550-572).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from k210_yolo_framework_tpu.config import YoloSpec
from k210_yolo_framework_tpu.ops.boxes import centered_iou

__all__ = [
    "MAX_BOXES",
    "pad_boxes",
    "assign_anchor",
    "encode_labels",
    "encode_labels_batch",
    "decode_labels",
    "xywh_grid_to_all",
    "xywh_all_to_grid",
]

# Fixed gt-box capacity per image.  VOC images have <= 56 objects; 64 keeps
# shapes static without measurable cost (the encode loop is ~64 tiny scatters).
MAX_BOXES = 64


def pad_boxes(boxes: np.ndarray, max_boxes: int = MAX_BOXES) -> Tuple[np.ndarray, np.ndarray]:
    """Pad an [n, 5] (class, x, y, w, h) annotation to fixed size.

    Returns (padded [max_boxes, 5], valid mask [max_boxes]).
    """
    boxes = np.asarray(boxes, dtype=np.float32).reshape(-1, 5)
    n = min(len(boxes), max_boxes)
    out = np.zeros((max_boxes, 5), dtype=np.float32)
    out[:n] = boxes[:n]
    valid = np.zeros((max_boxes,), dtype=bool)
    valid[:n] = True
    return out, valid


def assign_anchor(wh: jnp.ndarray, anchors: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best (layer, anchor) index per gt box by center-aligned IoU.

    ``wh``: [n, 2]; ``anchors``: [L, A, 2].  Mirrors
    ``Helper._get_anchor_index`` (/root/reference/tools/utils.py:190-205):
    ``np.unravel_index(np.argmax(iou), (L, A))``.
    """
    iou = centered_iou(wh[:, None, None, :], anchors[None])  # [n, L, A]
    nl, na = anchors.shape[0], anchors.shape[1]
    flat = jnp.argmax(iou.reshape(-1, nl * na), axis=-1)
    return flat // na, flat % na


def encode_labels(boxes: jnp.ndarray, valid: jnp.ndarray, spec: YoloSpec) -> List[jnp.ndarray]:
    """Encode one image's gt boxes into per-layer grid labels.

    Parameters
    ----------
    boxes: [MAX_BOXES, 5] (class, x, y, w, h), xywh normalized to [0, 1].
    valid: [MAX_BOXES] bool.

    Returns
    -------
    list of [out_h, out_w, anchor_num, 5 + class_num] float32 labels, one per
    output layer — identical layout to ``Helper.box_to_label``
    (/root/reference/tools/utils.py:207-230).
    """
    anchors = jnp.asarray(spec.anchors_np())
    layer_idx, anchor_idx = assign_anchor(boxes[:, 3:5], anchors)

    # Payload per box: xywh clipped to [1e-8, 1], conf=1 (utils.py:226-228).
    xywh = jnp.clip(boxes[:, 1:5], 1e-8, 1.0)
    cls_idx = boxes[:, 0].astype(jnp.int32)

    labels = []
    for l, (h, w) in enumerate(spec.out_hws):
        # Grid cell per box for THIS layer (utils.py:140-156): floor(xy * wh).
        idx = jnp.floor(boxes[:, 1] * w).astype(jnp.int32)
        idy = jnp.floor(boxes[:, 2] * h).astype(jnp.int32)
        mine = valid & (layer_idx == l)
        # Out-of-range POSITIVE index => dropped by scatter mode='drop'
        # (negative indices would wrap, numpy-style).
        idx = jnp.where(mine, idx, w)

        label = jnp.zeros((h, w, spec.nanchors, spec.nchannels), jnp.float32)

        def body(i, lab):
            # The reference assigns xywh/conf and ONLY SETS the new class bit
            # (utils.py:226-228): an earlier box in the same (cell, anchor)
            # keeps its one-hot class.  Read-modify-write reproduces that.
            prev = lab[idy[i], idx[i], anchor_idx[i]]
            row = jnp.concatenate([xywh[i], jnp.ones((1,), jnp.float32), prev[5:]])
            row = row.at[5 + cls_idx[i]].set(1.0)
            return lab.at[idy[i], idx[i], anchor_idx[i]].set(row, mode="drop")

        # Ordered writes: later boxes overwrite earlier ones in the same cell,
        # matching the reference's sequential Python loop.
        labels.append(jax.lax.fori_loop(0, boxes.shape[0], body, label))
    return labels


def encode_labels_batch(boxes: jnp.ndarray, valid: jnp.ndarray, spec: YoloSpec) -> List[jnp.ndarray]:
    """Batched encode: boxes [B, MAX_BOXES, 5], valid [B, MAX_BOXES]."""
    return jax.vmap(lambda b, v: encode_labels(b, v, spec))(boxes, valid)


def decode_labels(labels: Sequence[jnp.ndarray], spec: YoloSpec, thresh: float = 0.7,
                  max_boxes: int = MAX_BOXES) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of :func:`encode_labels` with static output shape.

    Reference ``label_to_box`` (/root/reference/tools/utils.py:293-307)
    returns a variable-length [n, 5] (class, x, y, w, h) stack of cells with
    conf > thresh; here we return the top ``max_boxes`` by confidence as
    ([max_boxes, 5], valid mask).
    """
    flat_rows = jnp.concatenate([l.reshape(-1, spec.nchannels) for l in labels], axis=0)
    conf = flat_rows[:, 4]
    k = min(max_boxes, flat_rows.shape[0])
    top_conf, top_i = jax.lax.top_k(conf, k)
    rows = flat_rows[top_i]
    cls = jnp.argmax(rows[:, 5:], axis=-1).astype(jnp.float32)
    out = jnp.concatenate([cls[:, None], rows[:, :4]], axis=-1)
    return out, top_conf > thresh


def xywh_grid_to_all(grid_pred_xy: jnp.ndarray, grid_pred_wh: jnp.ndarray,
                     layer: int, spec: YoloSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw head output -> whole-image scale, [..., h, w, a, 2] each.

    ``(sigmoid(xy) + offset) / out_wh`` and ``exp(wh) * anchors`` —
    ``tf_xywh_to_all`` (/root/reference/tools/utils.py:524-547).
    """
    h, w = spec.out_hws[layer]
    offset = jnp.asarray(spec.xy_offset(layer))
    anchors_l = jnp.asarray(spec.anchors_np()[layer])
    out_wh = jnp.asarray([w, h], dtype=grid_pred_xy.dtype)
    all_xy = (jax.nn.sigmoid(grid_pred_xy) + offset) / out_wh
    all_wh = jnp.exp(grid_pred_wh) * anchors_l
    return all_xy, all_wh


def xywh_all_to_grid(all_true_xy: jnp.ndarray, all_true_wh: jnp.ndarray,
                     layer: int, spec: YoloSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-image truth -> grid scale.

    ``xy * out_wh - offset`` and ``log(wh / anchors)`` — ``tf_xywh_to_grid``
    (/root/reference/tools/utils.py:550-572).  ``log(0) = -inf`` for empty
    cells is expected; the loss zeroes it behind the obj mask exactly like the
    reference's ``K.switch`` guard (utils.py:762-764).
    """
    h, w = spec.out_hws[layer]
    offset = jnp.asarray(spec.xy_offset(layer))
    anchors_l = jnp.asarray(spec.anchors_np()[layer])
    out_wh = jnp.asarray([w, h], dtype=all_true_xy.dtype)
    grid_xy = all_true_xy * out_wh - offset
    grid_wh = jnp.log(all_true_wh / anchors_l)
    return grid_xy, grid_wh
