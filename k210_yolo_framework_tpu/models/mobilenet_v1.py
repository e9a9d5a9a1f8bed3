"""K210-modified MobileNetV1 backbone (flax.linen).

Clone of the reference fork /root/reference/models/keras_mobilenet.py with its
deliberate deviations from stock keras-applications MobileNet:

  * block 1 pointwise filters = ``40 if alpha == 1 else 64`` (line 217);
  * the stem conv's ReLU6 is replaced by LeakyReLU(0.3) (line 356);
  * depthwise convs activate with unbounded ReLU, pointwise with
    LeakyReLU(0.3) (lines 428, 436);
  * every stride-2 conv uses explicit ((1,1),(1,1)) zero-pad + VALID
    (lines 342-348, 415-425) — a K210 KPU constraint, kept for weight parity.

Returns the two feature taps the YOLO head consumes: ``conv_pw_11_relu``
(stride 16) and the final block output (stride 32) (yolonet.py:23-25).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from k210_yolo_framework_tpu.models.layers import ConvBN, leaky_relu

__all__ = ["MobileNetV1"]

# (pointwise filters before alpha-scaling, stride) per block, blocks 2..13
# (keras_mobilenet.py:218-229).  Block 1 is special-cased below.
_BLOCKS = [
    (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
    (1024, 2), (1024, 1),
]


class _DWBlock(nn.Module):
    """Depthwise 3x3 (ReLU) + pointwise 1x1 (LeakyReLU 0.3)
    (keras_mobilenet.py:359-436)."""

    filters: int
    strides: Tuple[int, int]
    dtype: Any = jnp.float32
    safe_dw_grad: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        explicit = ((1, 1), (1, 1)) if self.strides == (2, 2) else None
        x = ConvBN(features=0, kernel=(3, 3), strides=self.strides,
                   explicit_pad=explicit, act=nn.relu, depthwise=True,
                   safe_dw_grad=self.safe_dw_grad,
                   dtype=self.dtype, name="dw")(x, train)
        x = ConvBN(features=self.filters, kernel=(1, 1), act=leaky_relu(0.3),
                   dtype=self.dtype, name="pw")(x, train)
        return x


class MobileNetV1(nn.Module):
    """K210-modified MobileNetV1; ``alpha`` is the reference's DEPTHMUL."""

    alpha: float = 1.0
    dtype: Any = jnp.float32
    safe_dw_grad: bool = True
    # "patches": x is the pre-extracted stem patches tensor from
    # letterbox_stem_patches (serving path; see layers.ConvBN.stem_mode)
    stem_mode: str = "default"

    @nn.compact
    def __call__(self, x, train: bool = False, input_scale=None):
        a = self.alpha
        # Stem: 32*alpha, stride 2, LeakyReLU(0.3) (keras_mobilenet.py:216, 291-356).
        # input_scale: per-image normalisation folded past the linear stem conv.
        x = ConvBN(features=int(32 * a), kernel=(3, 3), strides=(2, 2),
                   explicit_pad=((1, 1), (1, 1)), act=leaky_relu(0.3),
                   dtype=self.dtype, stem_mode=self.stem_mode,
                   name="stem")(x, train, input_scale)
        # Block 1: the K210 mod — 40 if alpha == 1 else 64 (line 217).
        block1_filters = 40 if a == 1.0 else 64
        x = _DWBlock(filters=int(block1_filters * a), strides=(1, 1),
                     dtype=self.dtype, safe_dw_grad=self.safe_dw_grad,
                     name="block_1")(x, train)
        tap16 = None
        for i, (f, s) in enumerate(_BLOCKS, start=2):
            x = _DWBlock(filters=int(f * a), strides=(s, s),
                         dtype=self.dtype, safe_dw_grad=self.safe_dw_grad,
                         name=f"block_{i}")(x, train)
            if i == 11:  # 'conv_pw_11_relu' tap (yolonet.py:23)
                tap16 = x
        return tap16, x
