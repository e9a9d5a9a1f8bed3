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
