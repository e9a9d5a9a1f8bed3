"""Box geometry primitives (pure jnp, fully batched).

Semantics match the reference exactly:
  * center-aligned ("fake") IoU — /root/reference/tools/utils.py:158-188
  * broadcast IoU of xywh boxes  — /root/reference/tools/utils.py:617-659
  * center<->corner transforms   — /root/reference/tools/utils.py:493-521
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "centered_iou",
    "iou_xywh",
    "center_to_corner",
    "corner_to_center",
]


def centered_iou(wh_a: jnp.ndarray, wh_b: jnp.ndarray) -> jnp.ndarray:
    """IoU of (w, h) boxes after aligning both centers at the origin.

    Broadcasts like the reference ``Helper._fake_iou``
    (/root/reference/tools/utils.py:158-188): ``wh_a`` of shape [..., 2]
    against ``wh_b`` of shape [..., 2]; leading dims broadcast.
    """
    a_maxes = wh_a / 2.0
    b_maxes = wh_b / 2.0
    inner_maxes = jnp.minimum(a_maxes, b_maxes)
    inner_mins = jnp.maximum(-a_maxes, -b_maxes)
    inner_wh = jnp.maximum(inner_maxes - inner_mins, 0.0)
    inner_area = inner_wh[..., 0] * inner_wh[..., 1]
    s1 = wh_a[..., 0] * wh_a[..., 1]
    s2 = wh_b[..., 0] * wh_b[..., 1]
    return inner_area / (s1 + s2 - inner_area)


def iou_xywh(pred_xy: jnp.ndarray, pred_wh: jnp.ndarray,
             valid_xy: jnp.ndarray, valid_wh: jnp.ndarray) -> jnp.ndarray:
    """IoU of every predicted box against every valid box.

    ``pred_*``: [..., 2] (e.g. [h, w, a, 2]), ``valid_*``: [n, 2].
    Returns [..., n] — the reference's ``tf_iou``
    (/root/reference/tools/utils.py:617-659).
    """
    b1_xy = pred_xy[..., None, :]
    b1_wh = pred_wh[..., None, :]
    b1_half = b1_wh / 2.0
    b1_mins, b1_maxes = b1_xy - b1_half, b1_xy + b1_half

    b2_xy = valid_xy[None, :]
    b2_wh = valid_wh[None, :]
    b2_half = b2_wh / 2.0
    b2_mins, b2_maxes = b2_xy - b2_half, b2_xy + b2_half

    inter_mins = jnp.maximum(b1_mins, b2_mins)
    inter_maxes = jnp.minimum(b1_maxes, b2_maxes)
    inter_wh = jnp.maximum(inter_maxes - inter_mins, 0.0)
    inter_area = inter_wh[..., 0] * inter_wh[..., 1]
    b1_area = b1_wh[..., 0] * b1_wh[..., 1]
    b2_area = b2_wh[..., 0] * b2_wh[..., 1]
    return inter_area / (b1_area + b2_area - inter_area)


def center_to_corner(boxes: jnp.ndarray, in_hw=None) -> jnp.ndarray:
    """[..., 4] xywh -> xyxy; scaled to pixels when ``in_hw`` given
    (/root/reference/tools/utils.py:493-506)."""
    x, y, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    x1, y1 = x - w / 2.0, y - h / 2.0
    x2, y2 = x + w / 2.0, y + h / 2.0
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    if in_hw is not None:
        scale = jnp.asarray([in_hw[1], in_hw[0], in_hw[1], in_hw[0]], dtype=out.dtype)
        out = out * scale
    return out


def corner_to_center(boxes: jnp.ndarray, in_hw=None) -> jnp.ndarray:
    """[..., 4] xyxy -> xywh; from pixel scale when ``in_hw`` given
    (/root/reference/tools/utils.py:508-521)."""
    if in_hw is not None:
        scale = jnp.asarray([in_hw[1], in_hw[0], in_hw[1], in_hw[0]], dtype=boxes.dtype)
        boxes = boxes / scale
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([(x1 + x2) / 2.0, (y1 + y2) / 2.0, x2 - x1, y2 - y1], axis=-1)
