"""Fused depthwise-separable block: dw3x3 + BN + ReLU + pw1x1 + BN + LeakyReLU
in ONE Pallas TPU kernel — a MEASURED NEGATIVE RESULT, kept as a tested
experiment, NOT wired into the model path.

Hypothesis: MobileNetV1's stride-1 blocks (/root/reference/models/
keras_mobilenet.py:359-436 — dw ReLU, pw LeakyReLU(0.3)) dominate the
serving forward and XLA emits the two convolutions as separate HLOs, so
every block round-trips its intermediate activation through HBM; fusing
them in VMEM should approach the single-pass bandwidth roofline.

Measurement (v5e via axon, bf16, batch 256, chained best-of-3, 2026-08-17):

    shape                fused kernel   XLA conv pair
    112x160x24 -> 48        18.5 ms        2.70 ms
    56x80x96   -> 96         5.99          2.51
    28x40x192  -> 192        3.53          1.90
    14x20x384  -> 384        1.96          1.36
    7x10x768   -> 768        1.44          1.17

XLA wins every shape: its grouped-conv kernels use channel-packed layouts,
while this kernel's NHWC VMEM tiles waste (128 - C%128) lanes per vector op
(catastrophic at C=24) and pay fp32 VPU accumulation for the 9-tap stencil.
Back-of-envelope: the XLA pair is already within ~1.5x of the pure-traffic
roofline (in + mid r/w + out at ~800 GB/s), so the best possible fusion win
was ~40% — and only a layout-transforming kernel could realize it.  Verdict:
on this hardware generation the stock convs + XLA epilogue fusion are the
right call (models/layers.py docstring says the same); revisit only if a
profile shows the inter-conv round-trip dominating on a future chip.

Design (if resurrected):

  * depthwise 3x3 = 9 shifted multiply-accumulates over a 1px-padded input
    tile (VPU, fp32 accumulation);
  * both BatchNorms folded to per-channel scale/bias (eval mode);
  * pointwise 1x1 = one [rows, C] @ [C, Cout] MXU matmul per row chunk,
    fp32 accumulation, LeakyReLU epilogue.

Grid is one image per program; rows are processed in static chunks so VMEM
holds only the padded input, the pw weights and one chunk of intermediates.

Runs in interpret mode off-TPU so tests exercise identical code paths;
``fused_dwsep_reference`` is the pure-XLA oracle the kernel is tested
against bit-close.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_dwsep", "fused_dwsep_reference", "fold_bn"]


def fold_bn(scale, bias, mean, var, eps: float):
    """Eval-mode BatchNorm -> per-channel (mul, add): y = x*mul + add."""
    mul = scale / jnp.sqrt(var + eps)
    return mul, bias - mean * mul


def fused_dwsep_reference(x, dw_k, dw_mul, dw_add, pw_k, pw_mul, pw_add,
                          pw_alpha: float = 0.3):
    """Pure-XLA oracle: the exact math the kernel must reproduce."""
    c = x.shape[-1]
    t = jax.lax.conv_general_dilated(
        x, dw_k.reshape(3, 3, 1, c).astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    t = t.astype(jnp.float32) * dw_mul + dw_add
    t = jnp.maximum(t, 0.0).astype(x.dtype)
    o = jnp.einsum("bhwc,co->bhwo", t, pw_k.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    o = o * pw_mul + pw_add
    return jnp.where(o > 0, o, pw_alpha * o).astype(x.dtype)


def _kernel(x_ref, dwk_ref, dwm_ref, dwa_ref, pwk_ref, pwm_ref, pwa_ref,
            o_ref, *, HC: int, W: int, pw_alpha: float):
    pwk = pwk_ref[...]                      # [C, Cout] compute dtype
    acc = jnp.zeros((HC, W, x_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = x_ref[0, dy:dy + HC, dx:dx + W, :]
            acc = acc + tap.astype(jnp.float32) * dwk_ref[dy, dx, :]
    t = acc * dwm_ref[0] + dwa_ref[0]
    t = jnp.maximum(t, 0.0).astype(pwk.dtype)
    o = jnp.dot(t.reshape(HC * W, -1), pwk,
                preferred_element_type=jnp.float32)
    o = o * pwm_ref[...] + pwa_ref[...]
    o = jnp.where(o > 0, o, pw_alpha * o)
    o_ref[0] = o.reshape(HC, W, -1).astype(o_ref.dtype)


def _row_chunk(h: int, target: int = 28) -> int:
    """Largest divisor of ``h`` that is <= target (so out blocks tile H
    exactly and the Element-indexed input windows stay in bounds)."""
    for d in range(min(h, target), 0, -1):
        if h % d == 0:
            return d
    return 1


def fused_dwsep(x, dw_k, dw_mul, dw_add, pw_k, pw_mul, pw_add,
                pw_alpha: float = 0.3, interpret=None):
    """Fused stride-1 SAME dw-separable block.

    x: [B, H, W, C]; dw_k: [3, 3, C]; pw_k: [C, Cout];
    dw_mul/dw_add: [C] f32 folded dw-BN; pw_mul/pw_add: [Cout] f32.
    Returns [B, H, W, Cout] in x.dtype.

    Grid is (batch, row-chunks); the input window for a chunk is its rows
    plus a 1px halo, expressed with an ``pl.Element``-indexed dim so
    consecutive windows overlap (a plain Blocked dim cannot).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    cout = pw_k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hc = _row_chunk(h)

    out = pl.pallas_call(
        functools.partial(_kernel, HC=hc, W=w, pw_alpha=pw_alpha),
        grid=(b, h // hc),
        in_specs=[
            # Mosaic: every dim must be Element when any is (element-offset
            # index_map; windows along H overlap by the 1px halo)
            pl.BlockSpec((pl.Element(1), pl.Element(hc + 2),
                          pl.Element(w + 2), pl.Element(c)),
                         lambda i, j: (i, j * hc, 0, 0)),
            pl.BlockSpec((3, 3, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hc, w, cout), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        interpret=interpret,
    )(xp, dw_k.astype(jnp.float32), dw_mul.reshape(1, c).astype(jnp.float32),
      dw_add.reshape(1, c).astype(jnp.float32), pw_k.astype(x.dtype),
      pw_mul.reshape(1, cout).astype(jnp.float32),
      pw_add.reshape(1, cout).astype(jnp.float32))
    return out
