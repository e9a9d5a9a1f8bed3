"""Per-class greedy NMS with static shapes (TPU-friendly).

Reference behavior (/root/reference/keras_inference.py:116-131):
  * candidates masked by ``score >= obj_thresh`` per class;
  * per class, ``tf.image.non_max_suppression`` — greedy by descending
    score, suppressing IoU > iou_threshold, at most 30 boxes out;
  * all classes concatenated.

TF's NMS is data-dependent; here it becomes a fixed-trip-count selection
loop: ``max_out`` iterations of (argmax over masked scores, suppress one IoU
row), vmapped over classes.  No dynamic shapes, no host sync — the whole
thing jits into the serving graph.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["NmsResult", "per_class_nms", "batched_nms"]

_NEG = -1e9


class NmsResult(NamedTuple):
    """Fixed-size detections: [class_num * max_out] entries."""

    boxes: jnp.ndarray    # [C * max_out, 4] yxyx
    scores: jnp.ndarray   # [C * max_out]
    classes: jnp.ndarray  # [C * max_out] int32
    valid: jnp.ndarray    # [C * max_out] bool


def _iou_yxyx(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one yxyx box against [N, 4]."""
    ymin = jnp.maximum(box[0], boxes[:, 0])
    xmin = jnp.maximum(box[1], boxes[:, 1])
    ymax = jnp.minimum(box[2], boxes[:, 2])
    xmax = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.maximum(ymax - ymin, 0.0) * jnp.maximum(xmax - xmin, 0.0)
    area1 = jnp.maximum(box[2] - box[0], 0.0) * jnp.maximum(box[3] - box[1], 0.0)
    area2 = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(boxes[:, 3] - boxes[:, 1], 0.0)
    union = area1 + area2 - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _one_class_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                   score_thresh: float, iou_thresh: float, max_out: int):
    """Greedy NMS for one class: boxes [N, 4], scores [N]."""
    live = jnp.where(scores >= score_thresh, scores, _NEG)

    def body(_, carry):
        live, out_idx, out_score, k = carry
        i = jnp.argmax(live)
        s = live[i]
        ok = s > _NEG / 2
        out_idx = out_idx.at[k].set(jnp.where(ok, i, -1))
        out_score = out_score.at[k].set(jnp.where(ok, scores[i], 0.0))
        iou = _iou_yxyx(boxes[i], boxes)
        live = jnp.where(ok & (iou > iou_thresh), _NEG, live)
        live = live.at[i].set(_NEG)
        return live, out_idx, out_score, k + jnp.where(ok, 1, 0)

    out_idx = jnp.full((max_out,), -1, jnp.int32)
    out_score = jnp.zeros((max_out,), jnp.float32)
    live, out_idx, out_score, k = jax.lax.fori_loop(
        0, max_out, body, (live, out_idx, out_score, jnp.int32(0)))
    valid = out_idx >= 0
    sel = jnp.maximum(out_idx, 0)
    return boxes[sel], out_score, valid


def per_class_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                  score_thresh: float = 0.7, iou_thresh: float = 0.3,
                  max_out: int = 30) -> NmsResult:
    """NMS each class independently (keras_inference.py:118-131).

    boxes: [N, 4] yxyx (shared across classes); scores: [N, C].
    """
    class_num = scores.shape[-1]
    b, s, v = jax.vmap(
        lambda sc: _one_class_nms(boxes, sc, score_thresh, iou_thresh, max_out)
    )(scores.T)  # over classes
    classes = jnp.broadcast_to(
        jnp.arange(class_num, dtype=jnp.int32)[:, None], (class_num, max_out))
    return NmsResult(
        boxes=b.reshape(-1, 4),
        scores=s.reshape(-1),
        classes=classes.reshape(-1),
        valid=v.reshape(-1),
    )


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                score_thresh: float = 0.7, iou_thresh: float = 0.3,
                max_out: int = 30) -> NmsResult:
    """Batch dim in front: boxes [B, N, 4], scores [B, N, C]."""
    return jax.vmap(
        lambda b, s: per_class_nms(b, s, score_thresh, iou_thresh, max_out)
    )(boxes, scores)
