"""Label codecs: gt boxes <-> grid labels, grid <-> image coordinate transforms.

This is the semantic heart of the framework.  Reference behavior reproduced:

  * ``Helper.box_to_label``  (/root/reference/tools/utils.py:207-230):
    per gt box pick (layer, anchor) by max center-aligned IoU, grid cell by
    ``floor(xy * out_wh)``, write clipped xywh + conf=1 + one-hot class.
    The reference's per-box Python loop becomes three order-free scatters
    over a fixed-size padded box tensor (payload via a last-writer
    collision test, classes via scatter-max — see ``encode_labels``) so
    encoding runs batched on-device with the loop's exact overwrite/
    accumulate semantics.
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
        # Out-of-range cells never write (the reference loop's write would
        # be dropped); they must ALSO stay out of the collision test below,
        # where a flattened slot id for idx==w would alias cell (idy+1, 0)
        # and falsely mark that cell's real box as overwritten.
        inb = (idx >= 0) & (idx < w) & (idy >= 0) & (idy < h)
        mine = valid & (layer_idx == l) & inb

        # Reference semantics (utils.py:226-228, a sequential Python loop):
        # later boxes OVERWRITE xywh/conf in their (cell, anchor) slot, but
        # class one-hot bits accumulate (the loop only SETS the new bit).
        # Vectorized equivalent — the fori_loop of read-modify-write
        # scatters this replaces ran 64 sequential tiny scatters per
        # image/layer (~8 ms per 64-image batch on TPU):
        #   * payload (xywh + conf): keep only the LAST valid box per slot
        #     (an [n, n] upper-triangular collision test), then one scatter
        #     with unique indices;
        #   * classes: scatter-max of every box's one-hot bit (order-free).
        slot = (idy * w + idx) * spec.nanchors + anchor_idx
        same = (slot[None, :] == slot[:, None]) & mine[None, :] & mine[:, None]
        overwritten = jnp.triu(same, k=1).any(axis=1)
        winner = mine & ~overwritten
        # Out-of-range POSITIVE index => dropped by scatter mode='drop'
        # (negative indices would wrap, numpy-style).
        ix_w = jnp.where(winner, idx, w)
        ix_m = jnp.where(mine, idx, w)

        payload = jnp.concatenate(
            [xywh, jnp.ones((xywh.shape[0], 1), jnp.float32)], axis=-1)
        lab5 = jnp.zeros((h, w, spec.nanchors, 5), jnp.float32)
        lab5 = lab5.at[idy, ix_w, anchor_idx].set(payload, mode="drop")
        labc = jnp.zeros((h, w, spec.nanchors, spec.nchannels - 5), jnp.float32)
        labc = labc.at[idy, ix_m, anchor_idx, cls_idx].max(1.0, mode="drop")
        labels.append(jnp.concatenate([lab5, labc], axis=-1))
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
