"""Fully fused YOLO head: decode + letterbox-inverse + per-class NMS in ONE
Pallas TPU kernel.

Extends ops/nms_pallas.py by pulling the decode stage
(ops/decode.py — sigmoid xy + grid offset, exp wh * anchor, score =
sigmoid(cls)*sigmoid(conf) or softmax flavor, letterbox inverse to
original-image yxyx) into the same VMEM-resident program, so the decoded
boxes/scores never round-trip through HBM and the [B, N, C] -> [B, C, N]
transpose disappears.

Layout per grid program (one image):
  * ``preds_t``  [Ep, Np]  — raw logits, entries (tx ty tw th conf cls...)
    on SUBLANES, the N=Σ h·w·a candidates on LANES;
  * ``geom``     [8, Np]   — per-candidate constants precomputed once from
    the YoloSpec: gx, gy, 1/gw, 1/gh, anchor_w, anchor_h, valid, pad;
  * ``lbox``     [1, G, 8] — per-image letterbox-inverse scalars
    (off_y, off_x, sy, sx, img_h, img_w, 0, 0), from ``img_hw`` (the
    leading grid dim keeps the block mosaic-legal for any G);
  * outputs identical to nms_pallas (boxes [4, Cp, So], scores [Cp, So]).

Reference math: tools/utils.py:524-547 (decode), keras_inference.py:32-72
(correct_box), 94-131 (scores + per-class NMS), region_layer.c:91-136
(softmax flavor).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from k210_yolo_framework_tpu.config import YoloSpec
from k210_yolo_framework_tpu.ops.nms import NmsResult
from k210_yolo_framework_tpu.ops.nms_pallas import _round_up, greedy_select_loop

__all__ = ["candidate_geometry", "letterbox_inverse_params",
           "fused_decode_nms"]

_NEG = -1e9


def candidate_geometry(spec: YoloSpec) -> np.ndarray:
    """[8, N] per-candidate constants: gx, gy, 1/gw, 1/gh, aw, ah, 1, 0.

    Candidate order matches ops/decode.decode_outputs: layers concatenated,
    within a layer row-major (gy, gx, anchor)."""
    cols = []
    anchors = spec.anchors_np()
    for l, (h, w) in enumerate(spec.out_hws):
        gy, gx, a = np.meshgrid(np.arange(h), np.arange(w),
                                np.arange(spec.nanchors), indexing="ij")
        aw = anchors[l][:, 0][a]
        ah = anchors[l][:, 1][a]
        n = h * w * spec.nanchors
        cols.append(np.stack([
            gx.reshape(n), gy.reshape(n),
            np.full(n, 1.0 / w), np.full(n, 1.0 / h),
            aw.reshape(n), ah.reshape(n),
            np.ones(n), np.zeros(n)]))
    return np.concatenate(cols, axis=1).astype(np.float32)


def letterbox_inverse_params(img_hws: jnp.ndarray, in_hw) -> jnp.ndarray:
    """[B, 8] (off_y, off_x, sy, sx, img_h, img_w, 0, 0) — the ``correct_box``
    factors (keras_inference.py:32-72, ROUND semantics)."""
    image_shape = img_hws.astype(jnp.float32)                      # [B, 2]
    input_shape = jnp.asarray(in_hw, jnp.float32)
    new_shape = jnp.round(image_shape * jnp.min(input_shape / image_shape,
                                                axis=-1, keepdims=True))
    # degenerate aspect (e.g. a 4000x8 strip) can round an extent to 0 ->
    # inf/NaN boxes; the firmware twin clamps likewise (region_layer.cpp)
    new_shape = jnp.maximum(new_shape, 1.0)
    offset = (input_shape - new_shape) / 2.0 / input_shape         # [B, 2]
    scale = input_shape / new_shape                                # [B, 2]
    zeros = jnp.zeros_like(offset)
    return jnp.concatenate([offset, scale, image_shape, zeros], axis=-1)


def _decode_and_select(p, g, lb, *, n: int, classes: int, cp: int, so: int,
                       max_out: int, iou_thresh: float, class_softmax: bool,
                       stop_below: float):
    """The kernel math on plain arrays: p [G, Ep, Np] raw logits, g [8, Np]
    candidate geometry, lb [G, 8] letterbox factors -> five [G, Cp, So]
    winner buffers.  Shared verbatim between the Pallas kernel (one grid
    program's block) and the off-TPU pure-jnp twin (whole batch at once) —
    the greedy steps are the sequential critical path, so stacking G
    images' class rows into each step amortizes it G-fold; the loop
    early-exits once every stacked row's best candidate is below
    ``stop_below``."""
    gx, gy = g[0:1], g[1:2]
    inv_gw, inv_gh = g[2:3], g[3:4]
    aw, ah = g[4:5], g[5:6]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, p.shape[2]), 2)
    in_range = lane < n                               # [1, 1, Np]

    # decode to normalized net xywh (tools/utils.py:524-547)
    cx = (jax.nn.sigmoid(p[:, 0:1]) + gx) * inv_gw    # [G, 1, Np]
    cy = (jax.nn.sigmoid(p[:, 1:2]) + gy) * inv_gh
    bw = jnp.exp(p[:, 2:3]) * aw
    bh = jnp.exp(p[:, 3:4]) * ah

    # letterbox inverse -> original-image pixels (keras_inference.py:32-72)
    gsz = lb.shape[0]

    def col(i):                                       # [G, 1, 1]
        return lb[:, i:i + 1].reshape(gsz, 1, 1)

    off_y, off_x = col(0), col(1)
    sy, sx = col(2), col(3)
    ih, iw = col(4), col(5)
    oy, ox = (cy - off_y) * sy, (cx - off_x) * sx
    oh, ow = bh * sy, bw * sx
    y0 = (oy - oh * 0.5) * ih                         # [G, 1, Np]
    x0 = (ox - ow * 0.5) * iw
    y1 = (oy + oh * 0.5) * ih
    x1 = (ox + ow * 0.5) * iw

    conf = jax.nn.sigmoid(p[:, 4:5])                  # [G, 1, Np]
    cls_logits = p[:, 5:5 + cp]                       # [G, Cp, Np] (pad rows >= C)
    row = jax.lax.broadcasted_iota(jnp.int32, cls_logits.shape, 1)
    real_cls = row < classes
    if class_softmax:  # firmware flavor (region_layer.c:91-136)
        # pad rows must not enter the normalization
        masked = jnp.where(real_cls, cls_logits, _NEG)
        scores = jax.nn.softmax(masked, axis=1) * conf
    else:              # canonical TF flavor (keras_inference.py:101)
        scores = jax.nn.sigmoid(cls_logits) * conf
    scores = jnp.where(in_range & real_cls, scores, _NEG)

    return greedy_select_loop(scores, y0, x0, y1, x1, so, max_out,
                              iou_thresh, stop_below=stop_below)


def _kernel(preds_ref, geom_ref, lbox_ref, out_boxes_ref, out_scores_ref,
            **params):
    """One grid program of G images (refs: preds [G, Ep, Np], geom [8, Np],
    lbox [1, G, 8] — the leading grid dim keeps the (G, 8) block
    mosaic-legal for any G — outs [G, 4, Cp, So] / [G, Cp, So])."""
    w_s, w_y0, w_x0, w_y1, w_x1 = _decode_and_select(
        preds_ref[:], geom_ref[:], lbox_ref[0],
        so=out_scores_ref.shape[-1], **params)
    out_scores_ref[:] = w_s
    out_boxes_ref[:, 0] = w_y0
    out_boxes_ref[:, 1] = w_x0
    out_boxes_ref[:, 2] = w_y1
    out_boxes_ref[:, 3] = w_x1


def fused_decode_nms(preds: Sequence[jnp.ndarray], spec: YoloSpec,
                     img_hws: jnp.ndarray, score_thresh: float = 0.7,
                     iou_thresh: float = 0.3, max_out: int = 30,
                     class_softmax: bool = False,
                     interpret: bool | None = None,
                     images_per_program: int | None = None) -> NmsResult:
    """preds: per layer [B, h, w, a, 5+C] raw logits; img_hws [B, 2] i32.

    Output matches decode_outputs + batched_nms_pallas exactly.
    ``images_per_program`` overrides the VMEM-envelope formula for G (the
    number of images whose class rows share one program's greedy chain) —
    a tuning knob; numerics are G-invariant (each image's rows are
    independent problems).

    Off-TPU (``interpret`` True, the default there) the SAME kernel math
    (``_decode_and_select``) runs as one plain-jnp call over the whole
    batch — Pallas interpret-mode plumbing compiles this program ~25-50x
    slower on CPU than the math itself, and the ``pallas_call`` mosaic
    plumbing is TPU-only anyway; the pure twin keeps every numeric line
    shared and covered by the CPU suite.
    """
    # interpret="pallas" emulates the real kernel plumbing off-TPU (see
    # batched_nms_pallas) — test-only, pinned against the twin on a tiny spec
    pl_interpret = interpret == "pallas"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pl_interpret:
        interpret = False
    bsz = preds[0].shape[0]
    classes = spec.class_num
    e = 5 + classes

    flat = [p.reshape(bsz, -1, e) for p in preds]
    n = sum(f.shape[1] for f in flat)
    np_ = _round_up(n, 128)
    cp = _round_up(classes, 8)
    ep = _round_up(5 + cp, 8)  # entry rows must cover the padded class rows
    so = _round_up(max_out, 128)
    # Images per program: more images amortize the sequential greedy-NMS
    # chain, but every image adds VMEM-resident block + scratch that scales
    # with BOTH the candidate count (np_) and the padded class count
    # (preds block ~ep*np_, score/suppression scratch ~cp*np_ each).  Scale
    # G down so the total footprint stays inside the ~16 MB scoped-VMEM
    # limit: G*np_*(ep + 2*cp) bounded by the proven 2-layer VOC envelope
    # (G=8 at np_=1152, ep=32, cp=24; darknet53's 4480 candidates get G=2,
    # an 80-class 2-layer spec gets G=2 as well).
    G = max(1, min(8, (8 * 1152 * (32 + 2 * 24)) // (np_ * (ep + 2 * cp))))
    if images_per_program is not None:
        G = images_per_program
    bp = bsz if interpret else _round_up(bsz, G)

    preds_t = jnp.transpose(jnp.concatenate(flat, axis=1), (0, 2, 1))
    preds_t = jnp.pad(preds_t.astype(jnp.float32),
                      ((0, bp - bsz), (0, ep - e), (0, np_ - n)))
    geom = jnp.pad(jnp.asarray(candidate_geometry(spec)),
                   ((0, 0), (0, np_ - n)))
    lbox = letterbox_inverse_params(img_hws, spec.in_hw)        # [B, 8]
    lbox = jnp.pad(lbox, ((0, bp - bsz), (0, 0)), constant_values=1.0)

    params = dict(n=n, classes=classes, cp=cp, max_out=max_out,
                  iou_thresh=iou_thresh, class_softmax=class_softmax,
                  stop_below=score_thresh)
    if interpret:
        w_s, w_y0, w_x0, w_y1, w_x1 = _decode_and_select(
            preds_t, geom, lbox, so=so, **params)
        out_s = w_s                                             # [B, Cp, So]
        out_b = jnp.stack([w_y0, w_x0, w_y1, w_x1], axis=1)     # [B, 4, Cp, So]
    else:
        out_b, out_s = pl.pallas_call(
            functools.partial(_kernel, **params),
            grid=(bp // G,),
            in_specs=[
                pl.BlockSpec((G, ep, np_), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, np_), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, 8), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((G, 4, cp, so), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, cp, so), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bp, 4, cp, so), jnp.float32),
                jax.ShapeDtypeStruct((bp, cp, so), jnp.float32),
            ),
            interpret=pl_interpret,
        )(preds_t, geom, lbox.reshape(bp // G, G, 8))

    out_scores = out_s[:bsz, :classes, :max_out]
    out_boxes = jnp.transpose(out_b[:bsz, :, :classes, :max_out], (0, 2, 3, 1))
    valid = out_scores >= score_thresh
    out_boxes = jnp.where(valid[..., None], out_boxes, 0.0)
    classes_arr = jnp.broadcast_to(
        jnp.arange(classes, dtype=jnp.int32)[None, :, None],
        (bsz, classes, max_out))
    return NmsResult(
        boxes=out_boxes.reshape(bsz, -1, 4),
        scores=jnp.where(valid, out_scores, 0.0).reshape(bsz, -1),
        classes=classes_arr.reshape(bsz, -1),
        valid=valid.reshape(bsz, -1),
    )
