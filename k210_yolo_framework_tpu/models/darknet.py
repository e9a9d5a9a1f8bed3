"""Darknet bodies: tiny-yolo v3 and full darknet53 (flax.linen).

Structure cloned from /root/reference/models/yolonet.py:
  * tiny body: lines 107-126 (conv/maxpool ladder, incl. the stride-1 2x2
    maxpool before the 1024 conv);
  * darknet53: ``darknet_body``/``resblock_body`` lines 194-215 (top/left-only
    zero-pad before every stride-2 conv);
  * ``make_last_layers``: lines 218-229.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from k210_yolo_framework_tpu.models.layers import DarknetConvBN

__all__ = ["TinyYoloBody", "Darknet53", "LastLayers"]


def _maxpool(x, strides):
    return nn.max_pool(x, window_shape=(2, 2), strides=(strides, strides), padding="SAME")


class TinyYoloBody(nn.Module):
    """Tiny YOLOv3 body; returns (stride-16 tap, stride-32 trunk)
    (yolonet.py:110-126)."""

    dtype: Any = jnp.float32
    # "nativeconv" forces nn.Conv for the cin=3 stem (see ConvBN.stem_mode)
    stem_mode: str = "default"

    @nn.compact
    def __call__(self, x, train: bool = False, input_scale=None):
        # input_scale: per-image normalisation folded past the linear stem conv.
        for i, f in enumerate([16, 32, 64, 128]):
            x = DarknetConvBN(f, (3, 3), dtype=self.dtype,
                              stem_mode=self.stem_mode if i == 0 else "default",
                              name=f"conv_{i}")(
                x, train, input_scale if i == 0 else None)
            x = _maxpool(x, 2)
        x1 = DarknetConvBN(256, (3, 3), dtype=self.dtype, name="conv_4")(x, train)

        x = _maxpool(x1, 2)
        x = DarknetConvBN(512, (3, 3), dtype=self.dtype, name="conv_5")(x, train)
        x = _maxpool(x, 1)  # 2x2 stride-1 SAME pool (yolonet.py:124)
        x = DarknetConvBN(1024, (3, 3), dtype=self.dtype, name="conv_6")(x, train)
        x2 = DarknetConvBN(256, (1, 1), dtype=self.dtype, name="conv_7")(x, train)
        return x1, x2


class _ResBlockBody(nn.Module):
    """Downsample + n residual units (yolonet.py:194-204)."""

    filters: int
    num_blocks: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # DarknetConvBN pads top/left-only for stride 2 (yolonet.py:197).
        x = DarknetConvBN(self.filters, (3, 3), strides=(2, 2),
                          dtype=self.dtype, name="down")(x, train)
        for i in range(self.num_blocks):
            y = DarknetConvBN(self.filters // 2, (1, 1),
                              dtype=self.dtype, name=f"res_{i}_1x1")(x, train)
            y = DarknetConvBN(self.filters, (3, 3),
                              dtype=self.dtype, name=f"res_{i}_3x3")(y, train)
            x = x + y
        return x


class Darknet53(nn.Module):
    """52-conv darknet body; returns (stride-8, stride-16, stride-32) taps —
    the reference's layers[92], layers[152], and final output
    (yolonet.py:164-172, 207-215)."""

    dtype: Any = jnp.float32
    # "nativeconv" forces nn.Conv for the cin=3 stem (see ConvBN.stem_mode)
    stem_mode: str = "default"

    @nn.compact
    def __call__(self, x, train: bool = False, input_scale=None):
        # input_scale: per-image normalisation folded past the linear stem conv.
        x = DarknetConvBN(32, (3, 3), dtype=self.dtype,
                          stem_mode=self.stem_mode, name="stem")(
            x, train, input_scale)
        x = _ResBlockBody(64, 1, dtype=self.dtype, name="stage_1")(x, train)
        x = _ResBlockBody(128, 2, dtype=self.dtype, name="stage_2")(x, train)
        tap8 = _ResBlockBody(256, 8, dtype=self.dtype, name="stage_3")(x, train)
        tap16 = _ResBlockBody(512, 8, dtype=self.dtype, name="stage_4")(tap8, train)
        tap32 = _ResBlockBody(1024, 4, dtype=self.dtype, name="stage_5")(tap16, train)
        return tap8, tap16, tap32


class LastLayers(nn.Module):
    """5x alternating 1x1/3x3 trunk + 3x3 branch (yolonet.py:218-229).

    Returns (trunk for the next scale, pre-head feature)."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        for i, (ff, k) in enumerate([(f, 1), (f * 2, 3), (f, 1), (f * 2, 3), (f, 1)]):
            x = DarknetConvBN(ff, (k, k), dtype=self.dtype, name=f"trunk_{i}")(x, train)
        y = DarknetConvBN(f * 2, (3, 3), dtype=self.dtype, name="branch")(x, train)
        return x, y
