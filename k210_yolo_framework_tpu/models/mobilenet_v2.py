"""K210-modified MobileNetV2 backbone (flax.linen).

Clone of the reference fork /root/reference/models/keras_mobilenet_v2.py with
its deliberate deviations from stock keras-applications MobileNetV2:

  * the first conv is FIXED at 32 filters, ignoring
    ``_make_divisible(32 * alpha, 8)`` (line 313 vs 311);
  * inverted residual blocks 1 and 2 override their expansion widths to 48
    and 124 channels when ``alpha > 0.6`` (lines 329-331) — a K210 KPU RAM
    cap, kept for weight parity;
  * every stride-2 depthwise uses explicit ((1,1),(1,1)) zero-pad + VALID
    (lines 453-463).

BN: momentum 0.999, eps 1e-3; activations ReLU6 (lines 319-323).
Returns the two YOLO taps: ``block_13_expand_relu`` (stride 16) and the final
``out_relu`` 1280-channel output (stride 32) (yolonet.py:83-84).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from k210_yolo_framework_tpu.models.layers import ConvBN, relu6

__all__ = ["MobileNetV2", "make_divisible"]


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """(keras_mobilenet_v2.py:118-125)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


_BN = dict(bn_momentum=0.999, bn_epsilon=1e-3)

# (filters, stride, expansion) per block id 0..16 (keras_mobilenet_v2.py:325-364).
_BLOCKS = [
    (16, 1, 1), (24, 2, 6), (24, 1, 6),
    (32, 2, 6), (32, 1, 6), (32, 1, 6),
    (64, 2, 6), (64, 1, 6), (64, 1, 6), (64, 1, 6),
    (96, 1, 6), (96, 1, 6), (96, 1, 6),
    (160, 2, 6), (160, 1, 6), (160, 1, 6),
    (320, 1, 6),
]


class _InvertedResBlock(nn.Module):
    """(keras_mobilenet_v2.py:426-485)."""

    filters: int
    stride: int
    expansion: int
    alpha: float
    block_id: int
    expand_channel: Optional[int] = None
    dtype: Any = jnp.float32
    safe_dw_grad: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        in_channels = x.shape[-1]
        pointwise_filters = make_divisible(int(self.filters * self.alpha), 8)

        expand_out = None
        if self.block_id:  # block 0 has no expand conv
            width = self.expand_channel if self.expand_channel else self.expansion * in_channels
            x = ConvBN(features=width, kernel=(1, 1), act=relu6,
                       dtype=self.dtype, name="expand", **_BN)(x, train)
            expand_out = x

        explicit = ((1, 1), (1, 1)) if self.stride == 2 else None
        x = ConvBN(features=0, kernel=(3, 3), strides=(self.stride, self.stride),
                   explicit_pad=explicit, act=relu6, depthwise=True,
                   safe_dw_grad=self.safe_dw_grad,
                   dtype=self.dtype, name="depthwise", **_BN)(x, train)
        x = ConvBN(features=pointwise_filters, kernel=(1, 1), act=None,
                   dtype=self.dtype, name="project", **_BN)(x, train)

        if in_channels == pointwise_filters and self.stride == 1:
            x = inputs + x
        return x, expand_out


class MobileNetV2(nn.Module):
    """K210-modified MobileNetV2; ``alpha`` is the reference's DEPTHMUL."""

    alpha: float = 1.0
    dtype: Any = jnp.float32
    safe_dw_grad: bool = True
    # "patches": x is the pre-extracted stem patches tensor from
    # letterbox_stem_patches (serving path; see layers.ConvBN.stem_mode)
    stem_mode: str = "default"

    @nn.compact
    def __call__(self, x, train: bool = False, input_scale=None):
        a = self.alpha
        # Stem: FIXED 32 filters (the K210 mod, line 313), stride 2, pad+valid.
        # input_scale: per-image normalisation folded past the linear stem conv.
        x = ConvBN(features=32, kernel=(3, 3), strides=(2, 2),
                   explicit_pad=((1, 1), (1, 1)), act=relu6,
                   dtype=self.dtype, stem_mode=self.stem_mode,
                   name="stem", **_BN)(x, train, input_scale)

        tap16 = None
        for bid, (f, s, e) in enumerate(_BLOCKS):
            expand_channel = None
            if a > 0.6 and bid == 1:
                expand_channel = 48   # K210 RAM cap (line 329)
            if a > 0.6 and bid == 2:
                expand_channel = 124  # K210 RAM cap (line 331)
            x, expand_out = _InvertedResBlock(
                filters=f, stride=s, expansion=e, alpha=a, block_id=bid,
                expand_channel=expand_channel, dtype=self.dtype,
                safe_dw_grad=self.safe_dw_grad,
                name=f"block_{bid}")(x, train)
            if bid == 13:  # 'block_13_expand_relu' tap (yolonet.py:83)
                tap16 = expand_out

        # Last conv: 1280 (no alpha when alpha <= 1) (lines 369-382).
        last = make_divisible(1280 * a, 8) if a > 1.0 else 1280
        x = ConvBN(features=last, kernel=(1, 1), act=relu6,
                   dtype=self.dtype, name="conv_last", **_BN)(x, train)
        return tap16, x
