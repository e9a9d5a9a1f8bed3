"""Pallas TPU kernel: the augment rotation's 3-shear composition in ONE
VMEM-resident program per image.

The production rotation (`ops/augment.py:_rotate_3shear`, the Paeth
decomposition R(t) = Sx(a) . Sy(b) . Sx(a)) runs as three XLA loop fusions.
The round-3 train profile pinned those fusions as the fused train step's #1
non-conv cost (the fine-shear weighted sums ran at 34 GB/s modeled — each
pass re-reads the padded working frame once per slice term, and the
intermediate frame makes an HBM round-trip between passes) and named the fix:
"a Pallas kernel holding the frame row-block in VMEM across all terms could
cut most of it" (BASELINE.md round-3 train profile).  A depthwise-conv
formulation was round 5's first attempt and measured NEGATIVE
(`augment._shear_conv_batch`); this kernel is the second: one grid step per
image loads the frame into VMEM ONCE, runs all three shear passes as
weighted sums over VMEM scratch (channels stay interleaved on the lane
axis, so a shift by kk columns is a lane slice at kk*C), and writes only
the cropped output — HBM traffic drops to one read + one write per image
regardless of term count.

Compile-scale lesson (round 5, recorded): a fully-unrolled formulation
(124 static slice+FMA terms over the whole frame) compiles fine at toy
sizes but is rejected at the production 224x320 frame — Mosaic crashed on
the bf16 variant (sublane pad/concat and 16-bit minor-dim reshapes are
unsupported) and the fp32 variant exceeded the remote compiler's budget
(>580 s).  This version therefore (a) runs each pass as a
``lax.fori_loop`` over terms with dynamic-offset reads from VMEM scratch
(the compiled graph is per-pass constant-size), and (b) computes
internally in fp32 regardless of image dtype (bf16 in/out casts happen
in-kernel; every Mosaic limit above is 16-bit-specific).

Numerics: the same term-by-term weighted sum in the same ascending-kk
order as the slice-sum path, with the per-term two-tap weights precomputed
OUTSIDE the kernel with the exact `_shear_x_direct` formula (selects and
lerp in the IMAGE dtype, then exact-upcast to fp32).  The production
`_shear_radix` path (used when a bound exceeds 2*_SHEAR_RADIX) differs
from the direct sum only by removed zero-weight terms (its own docstring's
invariant), so adding the zeros back is exact.  For fp32 images the match
to the slice path is ULP-level (separate XLA programs, FMA contraction may
differ).  For bf16 images the kernel's fp32 accumulation is strictly MORE
accurate than the slice path's per-op bf16 rounding; the parity tolerance
reflects bf16 resolution, not a defect.  Pinned by
tests/test_augment.py::test_rotate_pallas_matches_slice_sum.

Reference semantics covered: imgaug Affine(rotate=(-10, 10)) — one of the
three OneOf augmentation branches (/root/reference/tools/utils.py:84-88).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rotate_3shear_pallas", "pallas_rotate_supported"]

# VMEM budget guard: fp32 scratch frames + loop carries + the double-buffered
# input block must fit comfortably under the ~16 MB/core VMEM.
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _frame_geometry(h: int, w: int, max_deg: float):
    """The exact working-frame/pad/bound math of `_rotate_3shear`."""
    amax = math.tan(math.radians(max_deg) / 2.0)
    bmax = math.sin(math.radians(max_deg))
    px = int(math.ceil(amax * (h / 2.0))) + 2
    py = int(math.ceil(bmax * (w / 2.0 + px))) + 2
    hp, wp = h + 2 * py, w + 2 * px
    xb = int(math.ceil(amax * (hp / 2.0))) + 1
    yb = int(math.ceil(bmax * (wp / 2.0))) + 1
    return px, py, hp, wp, xb, yb


def pallas_rotate_supported(h: int, w: int, c: int, dtype) -> bool:
    """Static check that one image's working frames fit the VMEM budget."""
    from k210_yolo_framework_tpu.ops.augment import MAX_ROT_DEG
    px, py, hp, wp, xb, yb = _frame_geometry(h, w, MAX_ROT_DEG)
    hp2 = hp + 2 * (yb + 1)
    wpc = wp * c
    wpc2 = (wp + 2 * (xb + 1)) * c
    itemsize = jnp.dtype(dtype).itemsize
    frames = (
        2 * hp2 * wpc2 * itemsize      # double-buffered input block
        + hp2 * wpc2 * 4               # s0: fp32 padded frame
        + hp2 * wpc * 4                # s1: x-sheared frame
        + hp * wpc2 * 4                # s2: y-sheared frame, lane margins
        + 2 * hp2 * wpc * 4            # largest loop carry + accumulator
        + (2 * yb + 2) * wpc * 4       # wy
        + hp2 * (2 * xb + 2) * 4       # wxT
    )
    return frames <= _VMEM_BUDGET_BYTES


def _two_tap_weights(offs: jnp.ndarray, bound: int, dtype) -> jnp.ndarray:
    """Per-term weights of the direct slice-sum shear, `_shear_x_direct`'s
    exact formula: term kk in [-bound, bound+1] gets
    (k == kk)*(1-f) + (k == kk-1)*f computed in the image dtype.

    offs: [..., L] continuous per-line offsets -> [..., T, L] weights.
    """
    k = jnp.floor(offs)
    ki = k.astype(jnp.int32)
    f = (offs - k).astype(dtype)
    kks = jnp.arange(-bound, bound + 2, dtype=jnp.int32)  # [T]
    sel0 = (ki[..., None, :] == kks[:, None]).astype(dtype)
    sel1 = (ki[..., None, :] == (kks - 1)[:, None]).astype(dtype)
    return sel0 * (1 - f[..., None, :]) + sel1 * f[..., None, :]


def _rot3_kernel(img_ref, wxt_ref, wy_ref, out_ref, s0_ref, s1_ref, s2_ref,
                 *, h: int, w: int, c: int, px: int, py: int,
                 hp: int, wp: int, xb: int, yb: int):
    """One image: Sx -> Sy -> Sx entirely in VMEM, channels lane-interleaved.

    img_ref [1, hp2, wpc2] image dtype — the frame pre-padded with BOTH the
    y-shear margin rows (my = yb+1; Mosaic cannot pad sublanes in-kernel)
    and the x-shear margin lanes (mx = (xb+1)*c).  wxt_ref [1, hp2, Tx]
    fp32 (per-row x-shear weights TRANSPOSED so a term's column extracts as
    a [rows, 1] dynamic slice — no minor-dim reshape); wy_ref [1, Ty, wpc]
    fp32.  out_ref [1, h, w*c] image dtype.  s0/s1/s2: fp32 VMEM scratch
    (padded frame / x-sheared / y-sheared-with-lane-margins).  Each pass is
    a fori_loop over terms reading dynamic-offset slices from scratch — the
    compiled graph is constant-size in the term counts.
    """
    my = yb + 1
    mxc = (xb + 1) * c
    wpc = wp * c
    hp2 = hp + 2 * my
    tx = 2 * xb + 2
    ty = 2 * yb + 2

    s0_ref[...] = img_ref[0].astype(jnp.float32)

    # Pass 1: x-shear over all hp2 rows (zero margin rows stay zero).
    def body1(i, acc):
        # term kk = i - xb reads lanes starting at mxc - kk*c
        s = (2 * xb + 1 - i) * c
        wcol = wxt_ref[0, :, pl.ds(i, 1)]
        return acc + wcol * s0_ref[:, pl.ds(s, wpc)]

    s1_ref[...] = jax.lax.fori_loop(
        0, tx, body1, jnp.zeros((hp2, wpc), jnp.float32))

    # Pass 2: y-shear -> hp rows; term kk = i - yb reads rows starting at
    # my - kk = my + yb - i from the margin-embedded x-sheared frame.
    def body2(i, acc):
        wrow = wy_ref[0, pl.ds(i, 1), :]
        return acc + wrow * s1_ref[pl.ds(my + yb - i, hp), :]

    acc2 = jax.lax.fori_loop(
        0, ty, body2, jnp.zeros((hp, wpc), jnp.float32))
    s2_ref[...] = jnp.zeros((hp, wpc + 2 * mxc), jnp.float32)
    s2_ref[:, mxc:mxc + wpc] = acc2

    # Pass 3: x-shear over the central hp rows (their weight rows are the
    # production offsets; see rotate_3shear_pallas).
    def body3(i, acc):
        s = (2 * xb + 1 - i) * c
        wcol = wxt_ref[0, my:my + hp, pl.ds(i, 1)]
        return acc + wcol * s2_ref[:, pl.ds(s, wpc)]

    acc3 = jax.lax.fori_loop(
        0, tx, body3, jnp.zeros((hp, wpc), jnp.float32))
    out = jax.lax.slice(acc3, (py, px * c), (py + h, (px + w) * c))
    out_ref[0] = out.astype(out_ref.dtype)


def rotate_3shear_pallas(imgs: jnp.ndarray, thetas: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Batched center rotation by per-image ``thetas`` (radians, |theta| <=
    augment.MAX_ROT_DEG), matching ``vmap(_rotate_3shear)`` (ULP-level for
    fp32; strictly-more-accurate fp32 accumulation for bf16 — see module
    docstring).

    imgs [N, H, W, C] floating; returns same shape/dtype.  ``interpret=True``
    emulates the kernel off-TPU (the CI parity path).  Like the other Pallas
    serving kernels (ops/nms_pallas.py), this is a single-device program —
    under a GSPMD mesh the caller's jnp fallback applies (augment.py gates
    on the backend; the CPU-mesh dryrun exercises the fallback).
    """
    from k210_yolo_framework_tpu.ops.augment import MAX_ROT_DEG

    n, h, w, c = imgs.shape
    dtype = imgs.dtype
    px, py, hp, wp, xb, yb = _frame_geometry(h, w, MAX_ROT_DEG)
    my = yb + 1
    hp2 = hp + 2 * my
    wpc = wp * c
    wpc2 = wpc + 2 * (xb + 1) * c

    # Pre-pad the production working margins (py/px) PLUS the y-shear margin
    # rows and x-shear margin lanes (see _rot3_kernel docstring).
    work = jnp.pad(imgs, ((0, 0), (py + my, py + my),
                          (px + xb + 1, px + xb + 1), (0, 0)))
    work = work.reshape(n, hp2, wpc2)

    a = -jnp.tan(thetas / 2.0)
    b = jnp.sin(thetas)
    # ys2 over the taller frame; rows [my, my+hp) reproduce the production
    # ys = arange(hp) + 0.5 - (py + h/2) exactly.
    ys2 = jnp.arange(hp2, dtype=jnp.float32) + 0.5 - (py + my + h / 2.0)
    xs = jnp.arange(wp, dtype=jnp.float32) + 0.5 - (px + w / 2.0)
    # Weights: computed in the image dtype (the slice path's exact values),
    # then upcast to fp32 for the kernel (exact).
    wx = _two_tap_weights(a[:, None] * ys2[None, :], xb, dtype)  # [N,Tx,hp2]
    wy = _two_tap_weights(b[:, None] * xs[None, :], yb, dtype)   # [N,Ty,wp]
    wy = jnp.repeat(wy, c, axis=-1)                              # [N,Ty,wpc]
    wxt = jnp.swapaxes(wx.astype(jnp.float32), 1, 2)             # [N,hp2,Tx]
    wy = wy.astype(jnp.float32)

    kernel = functools.partial(_rot3_kernel, h=h, w=w, c=c, px=px, py=py,
                               hp=hp, wp=wp, xb=xb, yb=yb)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp2, wpc2), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, hp2, 2 * xb + 2), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 2 * yb + 2, wpc), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w * c), dtype),
        scratch_shapes=[
            pltpu.VMEM((hp2, wpc2), jnp.float32),
            pltpu.VMEM((hp2, wpc), jnp.float32),
            pltpu.VMEM((hp, wpc2), jnp.float32),
        ],
        interpret=interpret,
    )(work, wxt, wy)
    return out.reshape(n, h, w, c)
