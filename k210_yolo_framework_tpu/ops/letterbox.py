"""Letterbox resize (aspect-preserving scale + centered pad) and its inverse.

Reference semantics:
  * forward: ``Helper._process_img`` (/root/reference/tools/utils.py:357-406)
    — scalar scale ``min(in_wh / img_wh)``, integer-truncated centered
    translation, bilinear warp with zero fill, boxes moved through the same
    affine, then per-image ``img / max(img)`` normalization (NOT /255).
  * inverse: ``correct_box`` (/root/reference/keras_inference.py:32-72).

TPU-first design: the warp is ``jax.image.scale_and_translate`` (separable
bilinear, no gather) with traced scale/translation, so ONE compiled kernel
letterboxes any original size staged into a fixed canvas — no per-shape
recompiles, fully batchable.  ``scale_and_translate`` places pixel centers at
``i + 0.5`` while skimage's affine warp uses ``i``; the translation is
adjusted by ``0.5 * (1 - scale)`` to make the two samplings identical.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "letterbox_params",
    "letterbox_image",
    "letterbox_stem_patches",
    "letterbox_boxes",
    "normalize_image",
    "correct_boxes",
]


def letterbox_params(img_hw: jnp.ndarray, in_hw: Tuple[int, int]):
    """Scalar scale + integer (w, h) translation for one image.

    ``img_hw``: (h, w) of the original image (traced or static).
    Mirrors utils.py:378-385 including the ``astype(int)`` truncation.
    """
    img_wh = jnp.asarray([img_hw[1], img_hw[0]], jnp.float32)
    in_wh = jnp.asarray([in_hw[1], in_hw[0]], jnp.float32)
    scale = jnp.min(in_wh / img_wh)
    translation = jnp.trunc((in_wh - img_wh * scale) / 2.0)
    return scale, translation


def letterbox_image(img: jnp.ndarray, img_hw: jnp.ndarray, in_hw: Tuple[int, int],
                    dtype=jnp.float32) -> jnp.ndarray:
    """Letterbox ``img`` ([H, W, C], any real dtype) into ``in_hw``.

    ``img`` may be a fixed-size staging canvas whose top-left [img_hw] region
    holds the real image (zeros elsewhere); ``img_hw`` is the true size.
    Returns ``dtype`` [in_h, in_w, C] in the input's value range.

    The warp's COORDINATE math is always fp32: bf16 scale/translation move
    the sampling positions by up to a pixel (measured mean per-pixel diff
    ~40/255 on a real photo), which would skew serving against the
    fp32-warped pixels the model trained on.  ``dtype`` sets the PIXEL
    dtype of the resample einsum and output — the fp32 weight matrices are
    cast after they are built, so bf16 keeps the fast path's bandwidth
    without moving any sample position (only the 2-tap blend rounds).
    """
    scale, translation = letterbox_params(img_hw, in_hw)
    # skimage pixel-center convention -> scale_and_translate convention.
    adj = 0.5 * (1.0 - scale)
    ty, tx = translation[1] + adj, translation[0] + adj
    try:
        # separable resample with EXPLICIT weight-matrix dtype control;
        # parity with the public call is pinned by tests/test_letterbox.py
        from jax._src.image.scale import (  # noqa: PLC2701
            _fill_triangle_kernel, compute_weight_mat)

        w_h = compute_weight_mat(img.shape[0], in_hw[0], scale, ty,
                                 _fill_triangle_kernel, False)
        w_w = compute_weight_mat(img.shape[1], in_hw[1], scale, tx,
                                 _fill_triangle_kernel, False)
        out = jnp.einsum("hwc,hi,wj->ijc", img.astype(dtype),
                         w_h.astype(dtype), w_w.astype(dtype))
    except (ImportError, TypeError):
        # private helper moved or changed signature: correct-but-fp32 fallback
        # (the parity test in tests/test_letterbox.py pins the two paths
        # against each other on every JAX upgrade)
        out = jax.image.scale_and_translate(
            img.astype(jnp.float32),
            shape=(in_hw[0], in_hw[1], img.shape[-1]),
            spatial_dims=(0, 1),
            scale=jnp.stack([scale, scale]),
            translation=jnp.stack([ty, tx]),
            method="linear",
            antialias=False,
        )
    # Reference warps -> .astype('uint8') (truncation) before augment/normalize.
    return jnp.clip(jnp.trunc(out.astype(jnp.float32)), 0.0, 255.0).astype(dtype)


def letterbox_stem_patches(img: jnp.ndarray, img_hw: jnp.ndarray,
                           in_hw: Tuple[int, int], *,
                           kernel: Tuple[int, int] = (3, 3),
                           stride: Tuple[int, int] = (2, 2),
                           pad: Tuple[int, int] = (1, 1),
                           dtype=jnp.float32) -> jnp.ndarray:
    """Letterbox ``img`` and emit the STEM CONV'S im2col patches directly:
    ``[Ho, kh, Wo, kw, C]`` where ``out[i, dy, j, dx, c]`` equals the
    zero-padded letterboxed canvas at ``(stride_h*i + dy - pad_h,
    stride_w*j + dx - pad_w, c)``.

    Why: the serving profile's #2 device cost is the uint8 canvas relayout
    into the stem conv's tiling (0.54 ms = 14.9 % of the batch-128 step at
    309 GB/s — BASELINE.md).  That copy exists because the canvas is
    materialised in NHWC and then re-read in conv layout.  But the resample
    is an einsum against two small weight matrices, and im2col is a column
    RE-INDEXING of those matrices — ``w2[:, (i, dy)] = w[:, s*i + dy - p]``
    (zero column where the tap lands in the zero padding) — so the same
    einsum can emit the patches tensor straight in the layout the stem's
    MXU matmul consumes, and the NHWC canvas never exists in the program.
    The patch overlap duplicates pixels (~2.2x for a 3x3/s2 stem), which is
    cheap uint8 traffic; the relayout copy is what disappears.  This is the
    producer-side fix the round-4 consumer-side probes (bf16 store,
    batch-last layout, pinned input layout — all measured negatives,
    BASELINE.md) could not reach.

    Values are BIT-IDENTICAL to ``letterbox_image`` followed by patch
    extraction: the weight columns are the same columns in a different
    order, and each output element is the same two contractions in the same
    order (pinned by tests/test_stem_modes.py).  Geometry is gated to
    stride-2 stems by the callers — a stride-1 stem would inflate pixel
    traffic ~9x.

    Requires the explicit-weight-matrix path (jax private helper, same as
    :func:`letterbox_image`); raises ImportError where unavailable so the
    caller falls back to the default stem.
    """
    from jax._src.image.scale import (  # noqa: PLC2701
        _fill_triangle_kernel, compute_weight_mat)

    (kh, kw), (sh, sw), (ph, pw) = kernel, stride, pad
    ho = (in_hw[0] + 2 * ph - kh) // sh + 1
    wo = (in_hw[1] + 2 * pw - kw) // sw + 1
    scale, translation = letterbox_params(img_hw, in_hw)
    adj = 0.5 * (1.0 - scale)
    ty, tx = translation[1] + adj, translation[0] + adj
    w_h = compute_weight_mat(img.shape[0], in_hw[0], scale, ty,
                             _fill_triangle_kernel, False)
    w_w = compute_weight_mat(img.shape[1], in_hw[1], scale, tx,
                             _fill_triangle_kernel, False)

    def dup(w, n_in, n_out, k, s, p):
        # zero columns where a tap reads the conv's zero padding, then one
        # strided slab per in-kernel offset, interleaved (i, dy)-major
        wp = jnp.pad(w, ((0, 0), (p, max(0, s * (n_out - 1) + k - p - n_in))))
        slabs = [wp[:, dy::s][:, :n_out] for dy in range(k)]
        return jnp.stack(slabs, axis=-1).reshape(w.shape[0], n_out * k)

    w_h2 = dup(w_h, in_hw[0], ho, kh, sh, ph)
    w_w2 = dup(w_w, in_hw[1], wo, kw, sw, pw)
    out = jnp.einsum("hwc,hp,wq->pqc", img.astype(dtype),
                     w_h2.astype(dtype), w_w2.astype(dtype))
    out = jnp.clip(jnp.trunc(out.astype(jnp.float32)), 0.0, 255.0)
    return out.astype(dtype).reshape(ho, kh, wo, kw, img.shape[-1])


def letterbox_boxes(boxes: jnp.ndarray, img_hw: jnp.ndarray, in_hw: Tuple[int, int]) -> jnp.ndarray:
    """Move [..., 5] (class, x, y, w, h) normalized boxes through the letterbox
    affine (utils.py:388-395)."""
    img_wh = jnp.asarray([img_hw[1], img_hw[0]], jnp.float32)
    in_wh = jnp.asarray([in_hw[1], in_hw[0]], jnp.float32)
    scale, translation = letterbox_params(img_hw, in_hw)
    xy = (boxes[..., 1:3] * img_wh * scale + translation) / in_wh
    wh = boxes[..., 3:5] * img_wh * scale / in_wh
    return jnp.concatenate([boxes[..., 0:1], xy, wh], axis=-1)


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """Per-image ``img / max(img)`` (utils.py:404-405 — deliberately not /255)."""
    return img / jnp.maximum(jnp.max(img), 1e-12)


def correct_boxes(box_xy: jnp.ndarray, box_wh: jnp.ndarray,
                  in_hw: Tuple[int, int], image_hw) -> jnp.ndarray:
    """Undo the letterbox: normalized net-scale xywh -> original-image yxyx px.

    Exact transliteration of ``correct_box``
    (/root/reference/keras_inference.py:32-72); note it recomputes the pad
    from ``round`` rather than the forward's truncation — kept verbatim.
    """
    box_yx = box_xy[..., ::-1]
    box_hw = box_wh[..., ::-1]
    input_shape = jnp.asarray(in_hw, jnp.float32)
    image_shape = jnp.asarray(image_hw, jnp.float32)
    # clamp: a degenerate aspect can round an extent to 0 (the reference
    # would emit inf boxes there; the firmware clamps — region_layer.cpp)
    new_shape = jnp.maximum(
        jnp.round(image_shape * jnp.min(input_shape / image_shape)), 1.0)
    offset = (input_shape - new_shape) / 2.0 / input_shape
    scale = input_shape / new_shape
    box_yx = (box_yx - offset) * scale
    box_hw = box_hw * scale
    box_mins = box_yx - box_hw / 2.0
    box_maxes = box_yx + box_hw / 2.0
    boxes = jnp.concatenate([box_mins, box_maxes], axis=-1)
    return boxes * jnp.concatenate([image_shape, image_shape], axis=-1)
