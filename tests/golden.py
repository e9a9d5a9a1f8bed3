"""Independent numpy golden implementations of the reference math.

These re-derive, in plain numpy, the exact formulas documented in SURVEY.md
(with reference file:line cites) so the jnp implementations can be tested for
numeric agreement without TF.  They are deliberately simple and loop-based.
"""

import numpy as np


def fake_iou(a, b):
    """Center-aligned IoU (tools/utils.py:158-188)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    a_maxes, b_maxes = a / 2.0, b / 2.0
    inner_mins = np.maximum(-a_maxes, -b_maxes)
    inner_maxes = np.minimum(a_maxes, b_maxes)
    iw = np.maximum(inner_maxes - inner_mins, 0.0)
    inner = iw[..., 0] * iw[..., 1]
    s1 = a[..., 0] * a[..., 1]
    s2 = b[..., 0] * b[..., 1]
    return inner / (s1 + s2 - inner)


def box_to_label(true_box, anchors, out_hws, class_num):
    """Sequential-loop label encode (tools/utils.py:207-230)."""
    anchors = np.asarray(anchors, np.float64)
    nl = anchors.shape[0]
    labels = [np.zeros((out_hws[i][0], out_hws[i][1], anchors.shape[1], 5 + class_num),
                       dtype="float32") for i in range(nl)]
    for box in true_box:
        iou = fake_iou(box[3:5], anchors)
        l, n = np.unravel_index(np.argmax(iou), iou.shape)
        idx, idy = np.floor(box[1:3] * np.array(out_hws[l])[::-1]).astype(int)
        labels[l][idy, idx, n, 0:4] = np.clip(box[1:5], 1e-8, 1.0)
        labels[l][idy, idx, n, 4] = 1.0
        labels[l][idy, idx, n, 5 + int(box[0])] = 1.0
    return labels


def xy_offset(out_hw):
    """Grid offsets [h, w, 1, 2] (tools/utils.py:232-253)."""
    h, w = out_hw
    gy = np.tile(np.arange(h).reshape(-1, 1, 1, 1), (1, w, 1, 1))
    gx = np.tile(np.arange(w).reshape(1, -1, 1, 1), (h, 1, 1, 1))
    return np.concatenate([gx, gy], -1).astype(np.float64)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def xywh_to_all(grid_xy, grid_wh, out_hw, anchors_l):
    """(tools/utils.py:524-547)."""
    all_xy = (sigmoid(grid_xy) + xy_offset(out_hw)) / np.array(out_hw, np.float64)[::-1]
    all_wh = np.exp(grid_wh) * anchors_l
    return all_xy, all_wh


def xywh_to_grid(all_xy, all_wh, out_hw, anchors_l):
    """(tools/utils.py:550-572)."""
    grid_xy = all_xy * np.array(out_hw, np.float64)[::-1] - xy_offset(out_hw)
    # log(0) -> -inf is intentional here: the reference guards it AFTER the
    # transform with K.switch (tools/utils.py:762-764) and so do our callers;
    # silence the expected RuntimeWarning so real warnings stay visible.
    with np.errstate(divide="ignore"):
        grid_wh = np.log(all_wh / anchors_l)
    return grid_xy, grid_wh


def iou_xywh(pred_xy, pred_wh, valid_xy, valid_wh):
    """Broadcast IoU (tools/utils.py:617-659)."""
    b1_xy = pred_xy[..., None, :]
    b1_wh = pred_wh[..., None, :]
    b1_mins, b1_maxes = b1_xy - b1_wh / 2, b1_xy + b1_wh / 2
    b2_xy = valid_xy[None]
    b2_wh = valid_wh[None]
    b2_mins, b2_maxes = b2_xy - b2_wh / 2, b2_xy + b2_wh / 2
    imins = np.maximum(b1_mins, b2_mins)
    imaxes = np.minimum(b1_maxes, b2_maxes)
    iwh = np.maximum(imaxes - imins, 0.0)
    inter = iwh[..., 0] * iwh[..., 1]
    return inter / (b1_wh[..., 0] * b1_wh[..., 1] + b2_wh[..., 0] * b2_wh[..., 1] - inter)


def letterbox_warp(img, in_hw):
    """Bilinear affine warp with zero fill, skimage pixel-center convention
    (tools/utils.py:376-399): out[y, x] = img[(y - ty) / s, (x - tx) / s]."""
    img = np.asarray(img, np.float64)
    ih, iw = img.shape[:2]
    in_h, in_w = in_hw
    scale = min(in_w / iw, in_h / ih)
    tx = int((in_w - iw * scale) / 2)
    ty = int((in_h - ih * scale) / 2)
    out = np.zeros((in_h, in_w, img.shape[2]), np.float64)
    for y in range(in_h):
        for x in range(in_w):
            sx = (x - tx) / scale
            sy = (y - ty) / scale
            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
            fx, fy = sx - x0, sy - y0
            acc = np.zeros(img.shape[2])
            for dy, wy in ((0, 1 - fy), (1, fy)):
                for dx, wx in ((0, 1 - fx), (1, fx)):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < ih and 0 <= xx < iw and wy * wx > 0:
                        acc += wy * wx * img[yy, xx]
            out[y, x] = acc
    return np.trunc(out).clip(0, 255)


def correct_box(box_xy, box_wh, input_shape, image_shape):
    """(keras_inference.py:32-72)."""
    box_yx = box_xy[..., ::-1]
    box_hw = box_wh[..., ::-1]
    input_shape = np.asarray(input_shape, np.float64)
    image_shape = np.asarray(image_shape, np.float64)
    new_shape = np.round(image_shape * np.min(input_shape / image_shape))
    offset = (input_shape - new_shape) / 2.0 / input_shape
    scale = input_shape / new_shape
    box_yx = (box_yx - offset) * scale
    box_hw = box_hw * scale
    mins = box_yx - box_hw / 2
    maxes = box_yx + box_hw / 2
    boxes = np.concatenate([mins, maxes], -1)
    return boxes * np.concatenate([image_shape, image_shape], -1)


def bce_logits(labels, logits):
    """tf.nn.sigmoid_cross_entropy_with_logits."""
    return np.maximum(logits, 0) - logits * labels + np.log1p(np.exp(-np.abs(logits)))


def yolo_loss(y_true, y_pred, out_hw, anchors_l, batch_size,
              obj_thresh, iou_thresh, obj_weight, noobj_weight, wh_weight):
    """Five-term per-layer loss (tools/utils.py:741-789) with the reference's
    per-batch-element ignore-mask loop (utils.py:698-705)."""
    y_true = np.asarray(y_true, np.float64)
    y_pred = np.asarray(y_pred, np.float64)
    grid_pred_xy = y_pred[..., 0:2]
    grid_pred_wh = y_pred[..., 2:4]
    pred_conf = y_pred[..., 4:5]
    pred_cls = y_pred[..., 5:]
    all_true_xy = y_true[..., 0:2]
    all_true_wh = y_true[..., 2:4]
    true_conf = y_true[..., 4:5]
    true_cls = y_true[..., 5:]
    obj_mask = true_conf
    obj_mask_bool = y_true[..., 4] > obj_thresh

    pred_xy_all, pred_wh_all = xywh_to_all(grid_pred_xy, grid_pred_wh, out_hw, anchors_l)
    ignore = []
    for bc in range(batch_size):
        vxy = all_true_xy[bc][obj_mask_bool[bc]]
        vwh = all_true_wh[bc][obj_mask_bool[bc]]
        if len(vxy) == 0:
            # reduce_max over empty -> -inf -> (-inf < thresh) == True
            ignore.append(np.ones(obj_mask_bool[bc].shape + (1,)))
        else:
            iou = iou_xywh(pred_xy_all[bc], pred_wh_all[bc], vxy, vwh)
            best = iou.max(-1, keepdims=True)
            ignore.append((best < iou_thresh).astype(np.float64))
    ignore_mask = np.stack(ignore)

    grid_true_xy, grid_true_wh = xywh_to_grid(all_true_xy, all_true_wh, out_hw, anchors_l)
    grid_true_wh = np.where(obj_mask_bool[..., None], grid_true_wh, 0.0)

    coord_weight = 2 - all_true_wh[..., 0:1] * all_true_wh[..., 1:2]
    xy_loss = np.sum(obj_mask * coord_weight * bce_logits(grid_true_xy, grid_pred_xy)) / batch_size
    wh_loss = np.sum(obj_mask * coord_weight * wh_weight *
                     np.square(grid_true_wh - grid_pred_wh)) / batch_size
    obj_loss = obj_weight * np.sum(obj_mask * bce_logits(true_conf, pred_conf)) / batch_size
    noobj_loss = noobj_weight * np.sum(
        (1 - obj_mask) * ignore_mask * bce_logits(true_conf, pred_conf)) / batch_size
    cls_loss = np.sum(obj_mask * bce_logits(true_cls, pred_cls)) / batch_size
    return obj_loss + noobj_loss + cls_loss + xy_loss + wh_loss
