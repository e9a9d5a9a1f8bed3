"""On-device data augmentation: OneOf{fliplr, rotate, translate}.

Reproduces the reference's imgaug pipeline
(/root/reference/tools/utils.py:84-88, 309-337) with jax PRNG instead of
imgaug's global RNG:

    OneOf([ Fliplr(0.5),                      # 50% horizontal mirror
            Affine(rotate=(-10, 10)),         # uniform degrees
            Affine(translate_percent=+-0.1) ])# uniform per-axis

One branch is chosen uniformly per image; boxes ride the same affine: the 4
corners are transformed, re-boxed axis-aligned, then clipped to the image and
dropped when fully outside (imgaug ``remove_out_of_image().clip_out_of_image()``,
utils.py:332).

Deliberate fix vs the reference (recorded per SURVEY.md §7): utils.py:336
re-attaches class ids as ``p[0:n]`` — the FIRST n classes — so dropping a
middle box mislabels every later box.  Here each box keeps its own class and
is masked invalid instead of removed (static shapes).

TPU-first: NO gathers anywhere.  A general inverse-affine bilinear resample
(`_inverse_affine_sample`) lowers to per-pixel XLA gathers, which run on the
TPU scalar path — measured 189 ms for a 64x224x320 batch, 13x the whole
train step.  The production path therefore samples each OneOf branch with
MXU/VPU-friendly primitives instead:

  * flip       — an exact lane reversal (``img[:, ::-1]``);
  * translate  — constant-offset bilinear: 4 dynamic-slice taps of a padded
                 image + lerp;
  * rotate     — the classic 3-shear decomposition
                 R(t) = Sx(-tan(t/2)) . Sy(sin t) . Sx(-tan(t/2)); each
                 axis-aligned shear pass is an EXACT two-tap bilinear with a
                 per-line offset, computed as a weighted sum of STATIC
                 slices of a padded image (offsets are bounded by the +-10
                 degree range, so the slice set is static and XLA fuses the
                 whole pass into one VPU loop).

The gather-based `_inverse_affine_sample` is kept as the test oracle: each
shear pass must match it exactly (same two-tap math) on the corresponding
shear matrix.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["augment_image_and_boxes", "augment_batch"]

MAX_ROT_DEG = 10.0     # reference: Affine(rotate=(-10, 10)) (utils.py:86)
MAX_TRANSLATE = 0.1    # reference: Affine(translate_percent=+-0.1)

# Rotation implementation for the stratified batch path: "slice" = the
# per-image slice-sum 3-shear below; "pallas" = the VMEM-resident fused
# kernel (ops/rotate_pallas.py, bit-identical); "auto" = pallas on a TPU
# backend when the frame fits VMEM, slice everywhere else (CPU tests, the
# CPU-mesh dryrun, oversized frames).  Module-level so probes/rollback can
# flip it without re-plumbing call sites.
ROTATE_IMPL = "auto"


def _inverse_affine_sample(img: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-resample ``img`` [H, W, C] through inverse affine ``inv``
    (3x3, maps output (x, y, 1) -> input (x, y, 1)); zero fill outside."""
    h, w = img.shape[0], img.shape[1]
    # pixel-CENTER convention: index i covers continuous coordinate i + 0.5,
    # so the continuous-space affine applies to (x + .5, y + .5) and the
    # result maps back to index space with -0.5.  This keeps the image warp
    # exactly consistent with the box corner transform (same matrix).
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2] - 0.5
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2] - 0.5

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inside[..., None], v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


# A shear's weighted-sum runs one slice term per possible integer offset —
# O(range) HBM traffic.  Above this bound the pass decomposes radix-style
# (profiled round 3: the three rotation shears were 8.6 ms of a 27.4 ms
# train step at bounds 14/31; the split cuts the term count ~2-3.4x).
_SHEAR_RADIX = 8


def _shear_x_direct(img: jnp.ndarray, offs: jnp.ndarray, bound: int) -> jnp.ndarray:
    """One weighted slice term per integer offset in [-bound, bound+1]."""
    h, w = img.shape[0], img.shape[1]
    k = jnp.floor(offs).astype(jnp.int32)          # [H] integer part
    f = (offs - jnp.floor(offs)).astype(img.dtype)[:, None, None]
    padded = jnp.pad(img, ((0, 0), (bound + 1, bound + 1), (0, 0)))
    acc = jnp.zeros_like(img)
    for kk in range(-bound, bound + 2):
        # img[y, x - kk] == padded[:, bound+1-kk : bound+1-kk+w]
        wk = (k == kk).astype(img.dtype)[:, None, None] * (1 - f) \
            + (k == kk - 1).astype(img.dtype)[:, None, None] * f
        acc = acc + wk * jax.lax.slice_in_dim(padded, bound + 1 - kk,
                                              bound + 1 - kk + w, axis=1)
    return acc


def _shear_x(img: jnp.ndarray, offs: jnp.ndarray, bound: int) -> jnp.ndarray:
    """Horizontal shear pass: ``out[y, x] = img[y, x - offs[y]]`` with exact
    two-tap bilinear along x; zero fill outside.  ``offs`` [H] continuous,
    |offs| < ``bound`` (static).  Gather-free: a weighted sum over static
    column slices of the zero-padded image — only the two slices bracketing
    each row's offset get nonzero weight.

    Large bounds split EXACTLY into a coarse integer shift (multiples of
    ``_SHEAR_RADIX``, pure select — the fractional taps are untouched) into
    an intermediate with a one-radix margin, then a fine two-tap shear with
    the remainder offset in [0, R): O(range/R + R) slice terms instead of
    O(range)."""
    if bound <= 2 * _SHEAR_RADIX:
        return _shear_x_direct(img, offs, bound)
    return _shear_radix(img, offs, bound, axis=1)


def _shear_radix(img: jnp.ndarray, offs: jnp.ndarray, bound: int,
                 axis: int) -> jnp.ndarray:
    """Shared radix body for both shear passes: shift along ``axis`` (1 =
    columns/x, 0 = rows/y) by per-line continuous ``offs`` (indexed by the
    OTHER axis).  Coarse integer shift in multiples of ``_SHEAR_RADIX``
    into an intermediate with a one-radix margin, then a fine two-tap shear
    with the remainder in [0, R) — numerically IDENTICAL to the direct
    weighted sum (only zero-weight slice terms are removed)."""
    import math
    R = _SHEAR_RADIX
    n = img.shape[axis]

    def bc(v):
        # broadcast a per-line vector over the sheared axis + channels
        return jnp.expand_dims(v, (axis, 2))

    k = jnp.floor(offs)
    coarse = jnp.floor(k / R) * R                  # multiple of R, <= k
    kmax = R * int(math.ceil(bound / R))           # |coarse| <= kmax
    pad = kmax + R
    ki = coarse.astype(jnp.int32)
    pads = [(0, 0), (0, 0), (0, 0)]
    pads[axis] = (pad, pad)
    padded = jnp.pad(img, pads)
    # tmp = img shifted by -R-coarse on an n+2R frame: the margin keeps
    # content a fine shift of up to R pixels would re-enter
    tshape = list(img.shape)
    tshape[axis] = n + 2 * R
    tmp = jnp.zeros(tshape, img.dtype)
    for kc in range(-kmax, kmax + 1, R):
        sel = bc((ki == kc).astype(img.dtype))
        tmp = tmp + sel * jax.lax.slice_in_dim(padded, pad - R - kc,
                                               pad + R - kc + n, axis=axis)
    f = bc((offs - k).astype(img.dtype))
    kf = (k - coarse).astype(jnp.int32)            # remainder in [0, R-1]
    acc = jnp.zeros_like(img)
    for kk in range(0, R + 1):
        wk = bc((kf == kk).astype(img.dtype)) * (1 - f) \
            + bc((kf == kk - 1).astype(img.dtype)) * f
        acc = acc + wk * jax.lax.slice_in_dim(tmp, R - kk, R - kk + n,
                                              axis=axis)
    return acc


def _shear_y_direct(img: jnp.ndarray, offs: jnp.ndarray, bound: int) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    k = jnp.floor(offs).astype(jnp.int32)          # [W]
    f = (offs - jnp.floor(offs)).astype(img.dtype)[None, :, None]
    padded = jnp.pad(img, ((bound + 1, bound + 1), (0, 0), (0, 0)))
    acc = jnp.zeros_like(img)
    for kk in range(-bound, bound + 2):
        wk = (k == kk).astype(img.dtype)[None, :, None] * (1 - f) \
            + (k == kk - 1).astype(img.dtype)[None, :, None] * f
        acc = acc + wk * jax.lax.slice_in_dim(padded, bound + 1 - kk,
                                              bound + 1 - kk + h, axis=0)
    return acc


def _shear_y(img: jnp.ndarray, offs: jnp.ndarray, bound: int) -> jnp.ndarray:
    """Vertical shear pass: ``out[y, x] = img[y - offs[x], x]``; two-tap
    bilinear along y, zero fill; ``offs`` [W], |offs| < ``bound`` (static).
    Same radix decomposition as :func:`_shear_x` above the bound threshold."""
    if bound <= 2 * _SHEAR_RADIX:
        return _shear_y_direct(img, offs, bound)
    return _shear_radix(img, offs, bound, axis=0)


def _shear_conv_batch(imgs: jnp.ndarray, offs: jnp.ndarray, bound: int,
                      axis: int) -> jnp.ndarray:
    """Every line of a BATCH through its two-tap shear in ONE depthwise 1-D
    convolution — a round-5 MEASURED NEGATIVE, kept per the repo's
    documented-experiments policy (see CLAUDE.md); the production path is
    the per-image slice-sum shear (:func:`_shear_x`/:func:`_shear_y`).

    ``imgs`` [N, H, W, C]; ``axis=2`` shifts along W with ``offs`` [N, H]
    (x-shear, the batched :func:`_shear_x_direct`); ``axis=1`` shifts along H
    with ``offs`` [N, W] (batched :func:`_shear_y_direct`).

    Same math: the direct form is a ~2*bound-term weighted sum of padded
    slices, where only the two taps bracketing each line's offset are
    nonzero.  Expressed as a per-line-filter (= depthwise,
    ``feature_group_count`` = batch*lines*channels) VALID convolution, the
    frame is read ONCE and the tap sum runs in-register; zero-weight taps
    contribute exact zeros, so the result is the same two-tap lerp (fp32
    accumulation via ``preferred_element_type``, one rounding instead of
    two — exact parity with the slice-sum path in fp32, pinned by
    tests/test_augment.py).

    Measured (v5e, `_probe_aug.py stages`, augment stage of the training
    preprocess, rotation slice = batch/3): slice-sum 2.48 ms @batch 64 /
    5.44 ms @128; this conv form 6.60 ms @64 / 5.81 ms @128.  XLA:TPU lowers
    the ~36k-group 1-D depthwise conv to VPU code that is 2.7x SLOWER at
    batch 64 and no better at 128 (and it compiles for minutes).  The
    select-chain slice-sum, wasteful as its O(bound) HBM re-reads look, is
    the faster program on this hardware."""
    n, h, w, c = imgs.shape
    taps = 2 * bound + 2
    k = jnp.floor(offs)
    f = (offs - k).astype(imgs.dtype)
    ki = k.astype(jnp.int32)
    # tap j covers integer offset kk = bound + 1 - j (matching the direct
    # slice start bound+1-kk): out[x] = sum_j t[j] * padded[x + j]
    kks = bound + 1 - jnp.arange(taps, dtype=jnp.int32)
    w_taps = ((ki[..., None] == kks).astype(imgs.dtype) * (1 - f[..., None])
              + (ki[..., None] == kks - 1).astype(imgs.dtype) * f[..., None])

    if axis == 2:
        x = imgs.transpose(0, 1, 3, 2)             # [N, H, C, W]
        span = w
    elif axis == 1:
        x = imgs.transpose(0, 2, 3, 1)             # [N, W, C, H]
        span = h
    else:
        raise ValueError(f"axis must be 1 or 2, got {axis}")
    lines = x.shape[1]
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (bound + 1, bound + 1)))
    g = n * lines * c
    lhs = x.reshape(1, g, span + taps)
    rhs = jnp.broadcast_to(w_taps[:, :, None, :],
                           (n, lines, c, taps)).reshape(g, 1, taps)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=g,
        preferred_element_type=jnp.float32)
    out = out[..., :span].astype(imgs.dtype).reshape(n, lines, c, span)
    if axis == 2:
        return out.transpose(0, 1, 3, 2)
    return out.transpose(0, 3, 1, 2)


def _rotate_3shear_batch(imgs: jnp.ndarray, thetas: jnp.ndarray) -> jnp.ndarray:
    """Batched :func:`_rotate_3shear` (per-image ``thetas`` [N]) built on the
    one-conv-per-pass shear — identical pad/crop frame math.  Measured
    negative, unwired (see :func:`_shear_conv_batch`); exact-parity twin of
    the production path, pinned by tests/test_augment.py."""
    import math
    n, h, w, _c = imgs.shape
    amax = math.tan(math.radians(MAX_ROT_DEG) / 2.0)
    bmax = math.sin(math.radians(MAX_ROT_DEG))
    px = int(math.ceil(amax * (h / 2.0))) + 2
    py = int(math.ceil(bmax * (w / 2.0 + px))) + 2
    hp, wp = h + 2 * py, w + 2 * px
    work = jnp.pad(imgs, ((0, 0), (py, py), (px, px), (0, 0)))

    a = -jnp.tan(thetas / 2.0)
    b = jnp.sin(thetas)
    xb = int(math.ceil(amax * (hp / 2.0))) + 1
    yb = int(math.ceil(bmax * (wp / 2.0))) + 1
    ys = jnp.arange(hp, dtype=jnp.float32) + 0.5 - (py + h / 2.0)
    xs = jnp.arange(wp, dtype=jnp.float32) + 0.5 - (px + w / 2.0)
    out = _shear_conv_batch(work, a[:, None] * ys[None, :], xb, axis=2)
    out = _shear_conv_batch(out, b[:, None] * xs[None, :], yb, axis=1)
    out = _shear_conv_batch(out, a[:, None] * ys[None, :], xb, axis=2)
    return out[:, py:py + h, px:px + w, :]


def _rotate_3shear(img: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate about the image center by ``theta`` (radians, |theta| <=
    MAX_ROT_DEG) via Sx(a) . Sy(b) . Sx(a), a = -tan(theta/2), b = sin
    theta.  Each pass is an exact axis-aligned bilinear; the composition is
    the standard Paeth rotation (3 cheap passes instead of one gather).

    The working frame is padded by the passes' maximum displacements and
    cropped afterwards: a same-size intermediate would zero-clip edge
    content that the composed rotation maps back inside (boxes ride the
    exact matrix, so clipped pixels would silently disagree with a still-
    valid gt box near the border)."""
    import math
    h, w = img.shape[0], img.shape[1]
    amax = math.tan(math.radians(MAX_ROT_DEG) / 2.0)
    bmax = math.sin(math.radians(MAX_ROT_DEG))
    px = int(math.ceil(amax * (h / 2.0))) + 2          # x-shear reach
    py = int(math.ceil(bmax * (w / 2.0 + px))) + 2     # y-shear reach
    hp, wp = h + 2 * py, w + 2 * px
    work = jnp.pad(img, ((py, py), (px, px), (0, 0)))

    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    xb = int(math.ceil(amax * (hp / 2.0))) + 1
    yb = int(math.ceil(bmax * (wp / 2.0))) + 1
    # offsets pivot about the ORIGINAL image center, at (py+cy, px+cx) here
    ys = jnp.arange(hp, dtype=jnp.float32) + 0.5 - (py + h / 2.0)
    xs = jnp.arange(wp, dtype=jnp.float32) + 0.5 - (px + w / 2.0)
    out = _shear_x(work, a * ys, xb)
    out = _shear_y(out, b * xs, yb)
    out = _shear_x(out, a * ys, xb)
    return out[py:py + h, px:px + w, :]


def _translate_bilinear(img: jnp.ndarray, tx: jnp.ndarray, ty: jnp.ndarray
                        ) -> jnp.ndarray:
    """``out[y, x] = img[y - ty, x - tx]`` for constant continuous (tx, ty),
    |tx| <= MAX_TRANSLATE*w, |ty| <= MAX_TRANSLATE*h: 4 dynamic-slice taps
    of the padded image + lerp (no gather)."""
    import math
    h, w = img.shape[0], img.shape[1]
    mx = math.ceil(MAX_TRANSLATE * w) + 1
    my = math.ceil(MAX_TRANSLATE * h) + 1
    kx = jnp.floor(tx).astype(jnp.int32)
    ky = jnp.floor(ty).astype(jnp.int32)
    fx = (tx - jnp.floor(tx)).astype(img.dtype)
    fy = (ty - jnp.floor(ty)).astype(img.dtype)
    padded = jnp.pad(img, ((my, my), (mx, mx), (0, 0)))

    def tap(dy, dx):
        return jax.lax.dynamic_slice(padded, (my - ky - dy, mx - kx - dx,
                                              jnp.int32(0)), img.shape)

    top = tap(0, 0) * (1 - fx) + tap(0, 1) * fx
    bot = tap(1, 0) * (1 - fx) + tap(1, 1) * fx
    return top * (1 - fy) + bot * fy


def _flip_params(key: jax.Array, img_hw: Tuple[int, int]):
    """Fliplr(0.5): mirror columns with prob 0.5 (utils.py:85)."""
    h, w = img_hw
    do_flip = jax.random.bernoulli(key, 0.5)
    flip = jnp.asarray([[-1.0, 0.0, float(w)], [0.0, 1.0, 0.0],
                        [0.0, 0.0, 1.0]], jnp.float32)
    m = jnp.where(do_flip, flip, jnp.eye(3, dtype=jnp.float32))
    return m, do_flip


def _rot_params(key: jax.Array, img_hw: Tuple[int, int]):
    """Affine(rotate U(-10, 10) deg) about the image center (utils.py:86)."""
    h, w = img_hw
    theta = jnp.deg2rad(jax.random.uniform(key, (), minval=-10.0, maxval=10.0))
    c, s = jnp.cos(theta), jnp.sin(theta)
    cx, cy = w / 2.0, h / 2.0
    m = jnp.asarray(
        [[c, -s, cx - c * cx + s * cy],
         [s, c, cy - s * cx - c * cy],
         [0.0, 0.0, 1.0]], jnp.float32)
    return m, theta


def _tr_params(key: jax.Array, img_hw: Tuple[int, int]):
    """Affine(translate_percent +-0.1 per axis) (utils.py:87)."""
    h, w = img_hw
    k_tx, k_ty = jax.random.split(key)
    tx = jax.random.uniform(k_tx, (), minval=-0.1, maxval=0.1) * w
    ty = jax.random.uniform(k_ty, (), minval=-0.1, maxval=0.1) * h
    m = jnp.asarray([[1.0, 0.0, tx], [0.0, 1.0, ty], [0.0, 0.0, 1.0]],
                    jnp.float32)
    return m, tx, ty


def _branch_matrices(key: jax.Array, img_hw: Tuple[int, int]):
    """Forward 3x3 affine for each OneOf branch + selector.

    Matrices live in CONTINUOUS image coordinates (pixel i spans [i, i+1),
    center i+0.5) — the imgaug convention — so the identical matrix moves
    both the resampling grid and the box corners; a mirror is x' = w - x
    and rotation pivots about (w/2, h/2)."""
    k_branch, k_flip, k_rot, k_tr, _ = jax.random.split(key, 5)
    branch = jax.random.randint(k_branch, (), 0, 3)
    m0, do_flip = _flip_params(k_flip, img_hw)
    m1, theta = _rot_params(k_rot, img_hw)
    m2, tx, ty = _tr_params(k_tr, img_hw)
    mats = jnp.stack([m0, m1, m2])
    fwd = mats[branch]
    return fwd, branch, do_flip, theta, (tx, ty)


def _affine_boxes(boxes: jnp.ndarray, valid: jnp.ndarray, fwd: jnp.ndarray,
                  img_hw: Tuple[int, int]):
    """Move [N, 5] (class, x, y, w, h) normalized boxes through ``fwd``;
    imgaug-style corner transform + axis-aligned rebox + clip + drop."""
    h, w = img_hw
    scale = jnp.asarray([w, h], jnp.float32)
    xy = boxes[:, 1:3] * scale
    half = boxes[:, 3:5] * scale / 2.0
    # 4 corners [N, 4, 2]
    signs = jnp.asarray([[-1, -1], [1, -1], [-1, 1], [1, 1]], jnp.float32)
    corners = xy[:, None, :] + signs[None] * half[:, None, :]
    # explicit multiply-add: keeps full f32 (a 3x3 dot would hit the MXU and
    # round to its default lower matmul precision)
    cx, cy = corners[..., 0], corners[..., 1]
    moved = jnp.stack(
        [fwd[0, 0] * cx + fwd[0, 1] * cy + fwd[0, 2],
         fwd[1, 0] * cx + fwd[1, 1] * cy + fwd[1, 2]], axis=-1)

    mins = moved.min(axis=1)
    maxes = moved.max(axis=1)
    # fully outside -> invalid (remove_out_of_image)
    inside = (maxes[:, 0] > 0) & (maxes[:, 1] > 0) & (mins[:, 0] < w) & (mins[:, 1] < h)
    # clip to image (clip_out_of_image)
    mins = jnp.clip(mins, 0.0, scale)
    maxes = jnp.clip(maxes, 0.0, scale)
    new_xy = (mins + maxes) / 2.0 / scale
    new_wh = (maxes - mins) / scale
    nonempty = (new_wh[:, 0] > 0) & (new_wh[:, 1] > 0)
    out = jnp.concatenate([boxes[:, 0:1], new_xy, new_wh], axis=-1)
    return out, valid & inside & nonempty


def augment_image_and_boxes(key: jax.Array, img: jnp.ndarray, boxes: jnp.ndarray,
                            valid: jnp.ndarray):
    """Augment one [H, W, C] image + [N, 5] boxes.  Returns (img, boxes, valid).

    Boxes always ride the exact selected affine; the image rides the
    gather-free per-branch sampler (see module docstring).  Under ``vmap``
    every branch is computed and selected per image (lax.cond would become
    a select anyway); flip and translate are near-free, so the cost is one
    3-shear rotation per image."""
    fwd, branch, do_flip, theta, (tx, ty) = _branch_matrices(
        key, (img.shape[0], img.shape[1]))
    # floating inputs keep their dtype (bf16 preprocess halves the shear
    # bandwidth; uint8-sourced pixels fit bf16's 8-bit mantissa exactly)
    img_f = img if jnp.issubdtype(img.dtype, jnp.floating) \
        else img.astype(jnp.float32)
    flip_img = jnp.where(do_flip, img_f[:, ::-1, :], img_f)
    rot_img = _rotate_3shear(img_f, theta)
    tr_img = _translate_bilinear(img_f, tx, ty)
    img_out = jax.lax.select_n(branch, flip_img, rot_img, tr_img)
    boxes_out, valid_out = _affine_boxes(boxes, valid, fwd, (img.shape[0], img.shape[1]))
    return img_out, boxes_out, valid_out


def _as_float(img: jnp.ndarray) -> jnp.ndarray:
    return img if jnp.issubdtype(img.dtype, jnp.floating) \
        else img.astype(jnp.float32)


def augment_batch(key: jax.Array, imgs: jnp.ndarray, boxes: jnp.ndarray,
                  valid: jnp.ndarray, mode: str = "stratified"):
    """Batched augmentation: imgs [B, H, W, C], boxes [B, N, 5], valid [B, N].

    ``mode='iid'`` is the reference's exact OneOf semantics: every image
    independently draws one of the three branches — which, under jit's
    static shapes, costs computing ALL branches for ALL images and
    selecting (the round-3 profile put the unused-rotation share at ~2/3 of
    the whole augment cost).

    ``mode='stratified'`` (default, a deliberate TPU-first deviation): a
    random permutation of the batch is split into three STATIC slices —
    flip | rotate | translate, sizes ⌈B/3⌉/⌊B/3⌋/⌊B/3⌋ — and each slice
    computes only its own branch, cutting the rotation and translate work
    3×.  Marginally each image still gets a near-uniform random branch
    (22/64 vs 21/64 at B=64) with the same per-branch parameter
    distributions; only the iid-ness across images within one batch is
    traded away, which augmentation does not rely on (if anything the
    per-batch branch mix has lower variance).  Outputs are returned in
    PERMUTED order — boxes/valid ride the same permutation, so image↔label
    alignment is exact; batch order carries no meaning in training.  Exact
    imgaug parity testing should use ``mode='iid'``.
    """
    b = imgs.shape[0]
    if mode == "iid" or b < 3:
        keys = jax.random.split(key, b)
        return jax.vmap(augment_image_and_boxes)(keys, imgs, boxes, valid)
    if mode != "stratified":
        raise ValueError(f"unknown augment mode {mode!r} (iid|stratified)")

    k_perm, k_img = jax.random.split(key)
    perm = jax.random.permutation(k_perm, b)
    # whole-image batch gather: contiguous rows, bandwidth-bound (NOT the
    # per-pixel scalar-path gathers the module docstring bans)
    imgs = jnp.take(imgs, perm, axis=0)
    boxes = jnp.take(boxes, perm, axis=0)
    valid = jnp.take(valid, perm, axis=0)
    keys = jax.random.split(k_img, b)
    hw = (imgs.shape[1], imgs.shape[2])

    n_rot, n_tr = b // 3, b // 3
    n_flip = b - n_rot - n_tr  # flip absorbs the remainder: it is ~free

    def one_flip(k, img, bx, vl):
        m, do_flip = _flip_params(k, hw)
        img_f = _as_float(img)
        out = jnp.where(do_flip, img_f[:, ::-1, :], img_f)
        bx2, vl2 = _affine_boxes(bx, vl, m, hw)
        return out, bx2, vl2

    def rot_slice_batch(ks, ims, bx, vl):
        ms, thetas = jax.vmap(lambda k: _rot_params(k, hw))(ks)
        ims_f = _as_float(ims)
        impl = ROTATE_IMPL
        if impl == "auto":
            from k210_yolo_framework_tpu.ops import rotate_pallas as RP
            impl = "pallas" if (
                jax.default_backend() == "tpu"
                and RP.pallas_rotate_supported(hw[0], hw[1], ims.shape[-1],
                                               ims_f.dtype)) else "slice"
        if impl == "slice":
            out = jax.vmap(_rotate_3shear)(ims_f, thetas)
        else:
            from k210_yolo_framework_tpu.ops import rotate_pallas as RP
            out = RP.rotate_3shear_pallas(ims_f, thetas,
                                          interpret=(impl == "interpret"))
        bx2, vl2 = jax.vmap(lambda b, v, m: _affine_boxes(b, v, m, hw))(
            bx, vl, ms)
        return out, bx2, vl2

    def one_tr(k, img, bx, vl):
        m, tx, ty = _tr_params(k, hw)
        out = _translate_bilinear(_as_float(img), tx, ty)
        bx2, vl2 = _affine_boxes(bx, vl, m, hw)
        return out, bx2, vl2

    lo, mid = n_flip, n_flip + n_rot
    parts = [
        jax.vmap(one_flip)(keys[:lo], imgs[:lo], boxes[:lo], valid[:lo]),
        rot_slice_batch(keys[lo:mid], imgs[lo:mid], boxes[lo:mid],
                        valid[lo:mid]),
        jax.vmap(one_tr)(keys[mid:], imgs[mid:], boxes[mid:], valid[mid:]),
    ]
    return tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                 for i in range(3))
