"""The five-term YOLO loss with IoU ignore masks (pure jnp, fully batched).

Exact transliteration of ``create_loss_fn``
(/root/reference/tools/utils.py:708-793):

    xy    BCE-with-logits vs grid truth  * obj * (2 - w*h)          / B
    wh    MSE on log-space               * obj * (2 - w*h) * w_wh   / B
    obj   BCE                            * obj * w_obj              / B
    noobj BCE                 * (1-obj) * ignore_mask * w_noobj     / B
    cls   BCE                            * obj                      / B

The reference's per-batch-element Python loop for the ignore mask
(utils.py:698-705) — which bakes ``batch_size`` copies of the IoU subgraph
into the TF graph — becomes a single ``top_k`` gather of candidate gt boxes
plus one masked broadcast IoU, vmapped over the batch.  Semantics for images
with zero gt boxes are pinned by test: the reference's ``reduce_max`` over an
empty set yields -inf, so ``best_iou < thresh`` is everywhere True; the
masked form yields best_iou == 0 < thresh — identical for any thresh > 0.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import YoloSpec
from k210_yolo_framework_tpu.ops.boxes import iou_xywh
from k210_yolo_framework_tpu.ops.codec import MAX_BOXES, xywh_all_to_grid, xywh_grid_to_all

__all__ = ["yolo_layer_loss", "yolo_loss", "yolo_loss_layers", "l2_penalty"]


def _bce_logits(labels: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """tf.nn.sigmoid_cross_entropy_with_logits (utils.py:770 et al.)."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def calc_ignore_mask(y_true: jnp.ndarray, pred_xy_all: jnp.ndarray, pred_wh_all: jnp.ndarray,
                     obj_thresh: float, iou_thresh: float,
                     max_boxes: int = MAX_BOXES) -> jnp.ndarray:
    """Vectorized ignore mask, one image (no batch dim).

    y_true: [h, w, a, 5+C]; pred_*_all: [h, w, a, 2] already image-scale.
    Returns [h, w, a, 1] float mask (utils.py:662-705 semantics).
    """
    conf = y_true[..., 4].reshape(-1)
    k = min(max_boxes, conf.shape[0])
    top_conf, top_i = jax.lax.top_k(conf, k)
    gt = y_true[..., 0:4].reshape(-1, 4)[top_i]
    valid = top_conf > obj_thresh

    iou = iou_xywh(pred_xy_all, pred_wh_all, gt[:, 0:2], gt[:, 2:4])  # [h,w,a,k]
    iou = jnp.where(valid, iou, 0.0)
    best_iou = jnp.max(iou, axis=-1, keepdims=True)
    return (best_iou < iou_thresh).astype(jnp.float32)


def yolo_layer_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray, layer: int, spec: YoloSpec,
                    batch_size: int, obj_thresh: float, iou_thresh: float,
                    obj_weight: float, noobj_weight: float, wh_weight: float) -> jnp.ndarray:
    """Loss for one output layer, batched inputs [B, h, w, a, 5+C]."""
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)

    grid_pred_xy = y_pred[..., 0:2]
    grid_pred_wh = y_pred[..., 2:4]
    pred_conf = y_pred[..., 4:5]
    pred_cls = y_pred[..., 5:]

    all_true_xy = y_true[..., 0:2]
    all_true_wh = y_true[..., 2:4]
    true_conf = y_true[..., 4:5]
    true_cls = y_true[..., 5:]

    obj_mask = true_conf                       # soft mask (utils.py:753)
    obj_mask_bool = y_true[..., 4] > obj_thresh

    pred_xy_all, pred_wh_all = xywh_grid_to_all(grid_pred_xy, grid_pred_wh, layer, spec)
    ignore_mask = jax.vmap(
        lambda yt, pxy, pwh: calc_ignore_mask(yt, pxy, pwh, obj_thresh, iou_thresh)
    )(y_true, pred_xy_all, pred_wh_all)

    grid_true_xy, grid_true_wh = xywh_all_to_grid(all_true_xy, all_true_wh, layer, spec)
    # K.switch log(0) guard (utils.py:762-764).
    grid_true_wh = jnp.where(obj_mask_bool[..., None], grid_true_wh, 0.0)

    coord_weight = 2.0 - all_true_wh[..., 0:1] * all_true_wh[..., 1:2]

    xy_loss = jnp.sum(obj_mask * coord_weight *
                      _bce_logits(grid_true_xy, grid_pred_xy)) / batch_size
    wh_loss = jnp.sum(obj_mask * coord_weight * wh_weight *
                      jnp.square(grid_true_wh - grid_pred_wh)) / batch_size
    obj_loss = obj_weight * jnp.sum(obj_mask * _bce_logits(true_conf, pred_conf)) / batch_size
    noobj_loss = noobj_weight * jnp.sum((1.0 - obj_mask) * ignore_mask *
                                        _bce_logits(true_conf, pred_conf)) / batch_size
    cls_loss = jnp.sum(obj_mask * _bce_logits(true_cls, pred_cls)) / batch_size

    return obj_loss + noobj_loss + cls_loss + xy_loss + wh_loss


def yolo_loss_layers(y_trues: Sequence[jnp.ndarray], y_preds: Sequence[jnp.ndarray],
                     spec: YoloSpec, batch_size: int, obj_thresh: float,
                     iou_thresh: float, obj_weight: float, noobj_weight: float,
                     wh_weight: float) -> List[jnp.ndarray]:
    """Per-output-layer losses — the reference compiles one loss per output
    and streams each in the progress bar as ``l1_loss``/``l2_loss``
    (keras_train.py:73-79)."""
    return [
        yolo_layer_loss(yt, yp, l, spec, batch_size, obj_thresh, iou_thresh,
                        obj_weight, noobj_weight, wh_weight)
        for l, (yt, yp) in enumerate(zip(y_trues, y_preds))
    ]


def yolo_loss(y_trues: Sequence[jnp.ndarray], y_preds: Sequence[jnp.ndarray], spec: YoloSpec,
              batch_size: int, obj_thresh: float, iou_thresh: float,
              obj_weight: float, noobj_weight: float, wh_weight: float) -> jnp.ndarray:
    """Total loss = sum over output layers (keras sums the per-output losses,
    keras_train.py:77-78)."""
    total = 0.0
    for term in yolo_loss_layers(y_trues, y_preds, spec, batch_size, obj_thresh,
                                 iou_thresh, obj_weight, noobj_weight, wh_weight):
        total = total + term
    return total


def l2_penalty(params, scale: float = 5e-4, key_marker: str = "dark_conv") -> jnp.ndarray:
    """keras ``kernel_regularizer=l2(5e-4)`` on Darknet convs (yolonet.py:247).

    keras l2(w) adds ``w * sum(k^2)`` per kernel; applied only to conv kernels
    under modules whose name carries ``key_marker`` — exactly the layers the
    reference regularizes.
    """
    total = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = [getattr(p, "key", "") for p in path]
        if any(key_marker in str(n) for n in names) and "kernel" in names:
            total = total + jnp.sum(jnp.square(leaf))
    return scale * total
