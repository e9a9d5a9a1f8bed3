"""Fused per-class greedy NMS as a single Pallas TPU kernel.

Replaces the gather/scatter/top_k-based XLA path (ops/nms.py) on TPU.
Reference semantics preserved exactly (/root/reference/keras_inference.py:
116-131 — per-class ``tf.image.non_max_suppression``, score >= obj_thresh,
IoU > iou_thresh suppression, max_out boxes per class, first-index
tie-breaking like TF).

Design (one grid program per image — everything lives in VMEM):
  * scores laid out [C, N] (classes on sublanes, candidates on lanes) and
    boxes [4, N]: each greedy step is pure VPU work — a lane-wise max, a
    first-index-of-max mask, a masked broadcast to extract the winning
    box, one [C, N] IoU row, and a suppression select.  No gathers, no
    scatters, no sorts, and no HBM traffic beyond the in/out arrays —
    the 1050-candidate working set is ~100 KB.
  * the greedy selection runs as a ``lax.while_loop`` over at most
    ``max_out`` (30) steps with an early exit: winners come out in
    non-increasing score order, so once the best remaining candidate is
    below ``score_thresh`` every later slot would be post-masked anyway —
    typical frames finish in a handful of steps, dense worst cases
    degrade to the full 30.
  * a box selected with score below ``score_thresh`` only ever happens
    once every above-threshold candidate is consumed, so thresholding the
    output slots afterwards is exactly the reference's pre-filter (which
    is also why the early exit is bit-exact).

Off-TPU the same kernel math (``_select`` / ``greedy_select_loop``) runs
as one plain-jnp call over the whole batch: Pallas interpret mode compiles
this program 25-50x slower on CPU than the math itself, and the
``pallas_call`` mosaic plumbing is TPU-only anyway — the pure twin keeps
every numeric line shared and covered by the CPU suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from k210_yolo_framework_tpu.ops.nms import NmsResult

__all__ = ["batched_nms_pallas"]

_NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def greedy_select_loop(scores, y0, x0, y1, x1, so: int,
                       max_out: int, iou_thresh: float,
                       stop_below: float | None = None,
                       unroll: bool = False):
    """The in-VMEM greedy NMS selection loop shared by the NMS-only kernel
    and the fused decode+NMS kernel (ops/yolo_head_pallas.py).

    scores [..., Np] (already padding-masked to _NEG), one independent NMS
    problem per leading-dims ROW (a row is one (image, class) pair — the
    fused kernel stacks several images' class rows per program to amortize
    the per-pass overhead); y0/x0/y1/x1 broadcast against it.  Returns
    winner buffers ``(scores, y0, x0, y1, x1)``, each [..., so] with winner
    k in slot k — unfilled slots hold _NEG score / 0 coords.

    Each step is a lane-max, a first-index-of-max mask, masked broadcasts
    to extract the winner, one IoU row, and a suppression select — pure
    VPU work, no gathers/sorts.  The loop is a ``while`` with an
    early-exit: greedy winners come out in non-increasing score order, so
    once the best remaining candidate scores below ``stop_below`` every
    later winner would too — and the callers post-mask sub-``score_thresh``
    slots to zero, so stopping there leaves the final NmsResult
    bit-identical to the full ``max_out``-step unroll (the reference
    pre-filters score >= obj_thresh BEFORE NMS, keras_inference.py:116).
    On typical frames only a few candidates per class clear the serving
    threshold, so this skips most of the 30-step chain.

    ``unroll=True`` runs the SAME step body as a static Python loop over
    all ``max_out`` steps (no early exit — results identical, winners past
    the threshold are post-masked either way); it exists so
    ``tests/test_nms_pallas.py`` can pin while≡unroll equality, i.e. that
    the early exit never changes what a caller keeps.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
    area = jnp.maximum(y1 - y0, 0.0) * jnp.maximum(x1 - x0, 0.0)
    stop = _NEG if stop_below is None else stop_below

    def step(scores, m):
        """One greedy selection: returns the winner ([R, 1] score + coords)
        and the suppressed scores / next per-row max."""
        sel = jnp.min(jnp.where(scores == m, lane, jnp.int32(2**30)),
                      axis=-1, keepdims=True)                         # [R, 1]
        is_sel = lane == sel                                          # [R, Np]

        def pick(row):  # -> [R, 1] winning coordinate per row
            return jnp.max(jnp.where(is_sel, row, _NEG), axis=-1, keepdims=True)

        sy0, sx0, sy1, sx1 = pick(y0), pick(x0), pick(y1), pick(x1)
        s_area = jnp.maximum(sy1 - sy0, 0.0) * jnp.maximum(sx1 - sx0, 0.0)

        # IoU of each row's winner against every candidate: [R, Np]
        iy = jnp.maximum(jnp.minimum(sy1, y1) - jnp.maximum(sy0, y0), 0.0)
        ix = jnp.maximum(jnp.minimum(sx1, x1) - jnp.maximum(sx0, x0), 0.0)
        inter = iy * ix
        union = s_area + area - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        scores = jnp.where((iou > iou_thresh) | is_sel, _NEG, scores)
        m_next = jnp.max(scores, axis=-1, keepdims=True)              # [R, 1]
        return (m, sy0, sx0, sy1, sx1), scores, m_next

    m0 = jnp.max(scores, axis=-1, keepdims=True)

    if unroll:
        # Static loop, winners stitched once at the end — markedly cheaper
        # to compile than carrying [R, so] buffers through 30 body copies.
        winners, m = [], m0
        for _ in range(max_out):
            w, scores, m = step(scores, m)
            winners.append(w)
        cols = [jnp.concatenate(c, axis=-1) for c in zip(*winners)]   # [R, max_out]
        pad = [(0, 0)] * (scores.ndim - 1) + [(0, so - max_out)]
        return (jnp.pad(cols[0], pad, constant_values=_NEG),
                *(jnp.pad(c, pad) for c in cols[1:]))

    out_shape = scores.shape[:-1] + (so,)
    slot = jax.lax.broadcasted_iota(jnp.int32, out_shape, scores.ndim - 1)
    bufs = (jnp.full(out_shape, _NEG, scores.dtype),) + \
        (jnp.zeros(out_shape, scores.dtype),) * 4

    def cond(carry):
        k, _, m = carry[0], carry[1], carry[2]
        # any-row (NOT jnp.max(m) >= stop): max() would let a single NaN
        # score — e.g. a diverged checkpoint — poison the reduction and
        # abort step 0 for EVERY row in the program; `>=` is False for NaN,
        # so under any() a NaN row simply counts as done while healthy rows
        # keep selecting, matching the unroll path's row-local degradation
        return (k < max_out) & jnp.any(m >= stop)

    def body(carry):
        k, scores, m = carry[0], carry[1], carry[2]
        w, scores, m_next = step(scores, m)
        put = slot == k                                               # [R, so]
        bufs = tuple(jnp.where(put, v, buf)
                     for v, buf in zip(w, carry[3:]))
        return (k + 1, scores, m_next) + bufs

    carry = jax.lax.while_loop(cond, body, (jnp.int32(0), scores, m0) + bufs)
    return carry[3], carry[4], carry[5], carry[6], carry[7]


def _select(boxes_t, scores_t, *, n: int, so: int, max_out: int,
            iou_thresh: float, stop_below: float):
    """The kernel math on plain arrays: boxes_t [..., 4, Np],
    scores_t [..., Cp, Np] -> five [..., Cp, So] winner buffers.  Shared
    between the Pallas kernel (one image's block) and the off-TPU pure-jnp
    twin (whole batch)."""
    y0 = boxes_t[..., 0:1, :]                     # [..., 1, Np]
    x0 = boxes_t[..., 1:2, :]
    y1 = boxes_t[..., 2:3, :]
    x1 = boxes_t[..., 3:4, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, scores_t.shape,
                                    scores_t.ndim - 1)
    scores = jnp.where(lane < n, scores_t, _NEG)  # mask lane padding
    return greedy_select_loop(scores, y0, x0, y1, x1, so, max_out,
                              iou_thresh, stop_below=stop_below)


def _nms_kernel(boxes_ref, scores_ref, out_boxes_ref, out_scores_ref,
                **params):
    """One image: boxes_ref [1, 4, Np], scores_ref [1, Cp, Np],
    out_boxes_ref [1, 4, Cp, So], out_scores_ref [1, Cp, So]."""
    w_s, w_y0, w_x0, w_y1, w_x1 = _select(
        boxes_ref[0], scores_ref[0], so=out_scores_ref.shape[-1], **params)
    out_scores_ref[0] = w_s
    out_boxes_ref[0, 0] = w_y0
    out_boxes_ref[0, 1] = w_x0
    out_boxes_ref[0, 2] = w_y1
    out_boxes_ref[0, 3] = w_x1


def batched_nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray,
                       score_thresh: float = 0.7, iou_thresh: float = 0.3,
                       max_out: int = 30,
                       interpret: bool | None = None) -> NmsResult:
    """boxes [B, N, 4] yxyx, scores [B, N, C] -> NmsResult batched [B, ...].

    Output layout/order matches ops/nms.py ``batched_nms`` (class-major,
    score-descending within class).
    """
    bsz, nboxes, class_num = scores.shape
    # interpret=True -> pure-jnp twin (the off-TPU default); the string
    # "pallas" -> pl.pallas_call(interpret=True), i.e. emulate the REAL
    # kernel plumbing (BlockSpecs, index maps, ref stores) off-TPU — too
    # slow to compile for routine CPU tests, but tests/test_nms_pallas.py
    # pins it against the twin on a tiny config so the plumbing is covered
    pl_interpret = interpret == "pallas"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pl_interpret:
        interpret = False

    np_ = _round_up(nboxes, 128)
    cp = _round_up(class_num, 8)
    so = _round_up(max_out, 128)  # static-store slots, lane-padded

    boxes_t = jnp.transpose(boxes, (0, 2, 1)).astype(jnp.float32)     # [B, 4, N]
    scores_t = jnp.transpose(scores, (0, 2, 1)).astype(jnp.float32)   # [B, C, N]
    boxes_t = jnp.pad(boxes_t, ((0, 0), (0, 0), (0, np_ - nboxes)))
    scores_t = jnp.pad(scores_t, ((0, 0), (0, cp - class_num),
                                  (0, np_ - nboxes)), constant_values=_NEG)

    params = dict(n=nboxes, max_out=max_out, iou_thresh=iou_thresh,
                  stop_below=score_thresh)
    if interpret:
        # off-TPU: same math, whole batch in one plain-jnp call (see
        # fused_decode_nms for why Pallas interpret mode is avoided)
        w_s, w_y0, w_x0, w_y1, w_x1 = _select(
            boxes_t, scores_t, so=so, **params)
        out_s = w_s                                             # [B, Cp, So]
        out_b = jnp.stack([w_y0, w_x0, w_y1, w_x1], axis=1)     # [B, 4, Cp, So]
    else:
        out_b, out_s = pl.pallas_call(
            functools.partial(_nms_kernel, **params),
            grid=(bsz,),
            in_specs=[
                pl.BlockSpec((1, 4, np_), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cp, np_), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 4, cp, so), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cp, so), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bsz, 4, cp, so), jnp.float32),
                jax.ShapeDtypeStruct((bsz, cp, so), jnp.float32),
            ),
            interpret=pl_interpret,
        )(boxes_t, scores_t)

    out_scores = out_s[:, :class_num, :max_out]                       # [B, C, M]
    out_boxes = jnp.transpose(out_b[:, :, :class_num, :max_out],
                              (0, 2, 3, 1))                           # [B, C, M, 4]
    valid = out_scores >= score_thresh
    out_boxes = jnp.where(valid[..., None], out_boxes, 0.0)           # parity w/ nms.py
    classes = jnp.broadcast_to(
        jnp.arange(class_num, dtype=jnp.int32)[None, :, None],
        (bsz, class_num, max_out))
    return NmsResult(
        boxes=out_boxes.reshape(bsz, -1, 4),
        scores=jnp.where(valid, out_scores, 0.0).reshape(bsz, -1),
        classes=classes.reshape(bsz, -1),
        valid=valid.reshape(bsz, -1),
    )
