"""Per-class greedy NMS with static shapes (TPU-friendly).

Reference behavior (/root/reference/keras_inference.py:116-131):
  * candidates masked by ``score >= obj_thresh`` per class;
  * per class, ``tf.image.non_max_suppression`` — greedy by descending
    score, suppressing IoU > iou_threshold, at most 30 boxes out;
  * all classes concatenated.

TF's NMS is data-dependent; here it becomes a static-shape program built
for the TPU's vector unit:

  1. ``top_k`` keeps the K highest-scoring candidates per class (greedy
     NMS can only ever select from the score-ordered prefix; K defaults to
     64 >> the 30-box output cap, so this is exact for any input with at
     most K above-threshold candidates per class);
  2. one broadcast IoU matrix [K, K] per (image, class), upper-triangle
     masked so a box can only suppress strictly lower-scored boxes;
  3. greedy selection as a FIXED-POINT iteration over the whole batch:
     ``keep ← valid & ¬(keep ∘ edge)`` repeated until unchanged.  Each
     sweep settles at least one more level of the suppression-chain DAG,
     so it converges to the exact sequential-greedy answer in
     (max chain depth) sweeps — single digits in practice, ≤ K always.
     One ``while_loop`` for the entire [B·C] batch (one device dispatch
     per sweep) instead of a K-step sequential scan per class;
  4. kept boxes compact into the fixed [max_out] output slots by a rank
     scatter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["NmsResult", "per_class_nms", "batched_nms"]


class NmsResult(NamedTuple):
    """Fixed-size detections: [class_num * max_out] entries."""

    boxes: jnp.ndarray    # [C * max_out, 4] yxyx
    scores: jnp.ndarray   # [C * max_out]
    classes: jnp.ndarray  # [C * max_out] int32
    valid: jnp.ndarray    # [C * max_out] bool


def _iou_matrix_yxyx(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of [..., K, 4] yxyx boxes -> [..., K, K]."""
    ymin = jnp.maximum(boxes[..., :, None, 0], boxes[..., None, :, 0])
    xmin = jnp.maximum(boxes[..., :, None, 1], boxes[..., None, :, 1])
    ymax = jnp.minimum(boxes[..., :, None, 2], boxes[..., None, :, 2])
    xmax = jnp.minimum(boxes[..., :, None, 3], boxes[..., None, :, 3])
    inter = jnp.maximum(ymax - ymin, 0.0) * jnp.maximum(xmax - xmin, 0.0)
    area = (jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
            * jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0))
    union = area[..., :, None] + area[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def greedy_keep_sorted(boxes: jnp.ndarray, valid: jnp.ndarray,
                       iou_thresh: float) -> jnp.ndarray:
    """Exact greedy-NMS keep mask for score-DESCENDING candidates.

    boxes [..., K, 4], valid [..., K] -> keep [..., K] bool.
    """
    k = boxes.shape[-2]
    iou = _iou_matrix_yxyx(boxes)                            # [..., K, K]
    tri = jnp.triu(jnp.ones((k, k), bool), 1)                # j suppresses i>j
    edge = ((iou > iou_thresh) & tri).astype(jnp.float32)

    def sweep(keep):
        # suppressed[i] = any kept j<i with overlap: batched matvec (MXU)
        hits = jnp.einsum("...j,...ji->...i", keep.astype(jnp.float32), edge)
        return valid & (hits == 0.0)

    def cond(carry):
        keep, prev_changed = carry
        return prev_changed

    def body(carry):
        keep, _ = carry
        new = sweep(keep)
        return new, jnp.any(new != keep)

    keep, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(True)))
    return keep


def _compact(kept, boxes, scores, max_out):
    """Scatter kept entries (score order) into fixed [max_out] slots."""
    rank = jnp.cumsum(kept) - 1
    ok = kept & (rank < max_out)
    tgt = jnp.where(ok, rank, max_out)                       # overflow slot
    out_boxes = jnp.zeros((max_out + 1, 4), boxes.dtype).at[tgt].set(boxes)[:max_out]
    out_scores = jnp.zeros((max_out + 1,), scores.dtype).at[tgt].set(scores)[:max_out]
    out_valid = jnp.zeros((max_out + 1,), bool).at[tgt].set(ok)[:max_out]
    return out_boxes, out_scores, out_valid


def per_class_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                  score_thresh: float = 0.7, iou_thresh: float = 0.3,
                  max_out: int = 30, top_k: int = 64) -> NmsResult:
    """NMS each class independently (keras_inference.py:118-131).

    boxes: [N, 4] yxyx (shared across classes); scores: [N, C].
    """
    n, class_num = scores.shape
    k = min(top_k, n)
    # [C, K] best candidates per class, score-descending
    top_scores, top_idx = jax.lax.top_k(scores.T, k)
    top_boxes = boxes[top_idx]                               # [C, K, 4]
    valid = top_scores >= score_thresh

    kept = greedy_keep_sorted(top_boxes, valid, iou_thresh)  # [C, K]
    b, s, v = jax.vmap(_compact, in_axes=(0, 0, 0, None))(
        kept, top_boxes, top_scores, max_out)
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
                max_out: int = 30, top_k: int = 64) -> NmsResult:
    """Batch dim in front: boxes [B, N, 4], scores [B, N, C].

    The greedy fixed-point runs over the whole [B, C] batch in ONE
    while_loop (sweeps until every row converges), so device dispatches
    stay O(chain depth), not O(B·C·K).
    """
    bsz, n, class_num = scores.shape
    k = min(top_k, n)
    top_scores, top_idx = jax.lax.top_k(jnp.swapaxes(scores, 1, 2), k)  # [B, C, K]
    top_boxes = jnp.take_along_axis(boxes[:, None], top_idx[..., None], axis=2)
    valid = top_scores >= score_thresh

    kept = greedy_keep_sorted(top_boxes, valid, iou_thresh)             # [B, C, K]
    b, s, v = jax.vmap(jax.vmap(_compact, in_axes=(0, 0, 0, None)),
                       in_axes=(0, 0, 0, None))(kept, top_boxes, top_scores, max_out)
    classes = jnp.broadcast_to(
        jnp.arange(class_num, dtype=jnp.int32)[None, :, None],
        (bsz, class_num, max_out))
    return NmsResult(
        boxes=b.reshape(bsz, -1, 4),
        scores=s.reshape(bsz, -1),
        classes=classes.reshape(bsz, -1),
        valid=v.reshape(bsz, -1),
    )
