"""YOLO network builders: backbone + FPN-style head, 4 model families.

Re-designs /root/reference/models/yolonet.py:12-191 as flax modules.  Every
builder produces the same dual contract as the reference: RAW head outputs
``[B, h, w, anchor_num * (5 + class_num)]`` (the export surface) and a
reshaped training view ``[B, h, w, anchor_num, 5 + class_num]``
(yolonet.py:40-44).  Output order is layer 0 = coarsest grid = biggest
anchors, matching make_anchor_list.py:211-213.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from k210_yolo_framework_tpu.models.darknet import Darknet53, LastLayers, TinyYoloBody
from k210_yolo_framework_tpu.models.layers import (
    DarknetConvBN,
    darknet_head_conv,
    upsample2x,
)
from k210_yolo_framework_tpu.models.mobilenet_v1 import MobileNetV1
from k210_yolo_framework_tpu.models.mobilenet_v2 import MobileNetV2

__all__ = ["YoloNet", "build_network", "NETWORKS"]


class _TwoScaleHead(nn.Module):
    """Shared 2-scale head used by the mobilenet/tiny builders.

    y1 from the stride-32 trunk; y2 from upsample(trunk 1x1-128) ++ stride-16
    tap (yolonet.py:27-38, 86-96, 128-138).  Concat order is [trunk, tap].
    """

    out_channels: int
    y1_filters: int
    y2_filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tap16, trunk32, train: bool = False):
        y1 = DarknetConvBN(self.y1_filters, (3, 3), dtype=self.dtype,
                           name="y1_conv")(trunk32, train)
        y1 = darknet_head_conv(self.out_channels, dtype=self.dtype, name="y1_out")(y1)

        x = DarknetConvBN(128, (1, 1), dtype=self.dtype, name="up_conv")(trunk32, train)
        x = upsample2x(x)
        x = jnp.concatenate([x, tap16], axis=-1)
        y2 = DarknetConvBN(self.y2_filters, (3, 3), dtype=self.dtype,
                           name="y2_conv")(x, train)
        y2 = darknet_head_conv(self.out_channels, dtype=self.dtype, name="y2_out")(y2)
        return [y1, y2]


class YoloMobileV1(nn.Module):
    """yolo_mobilev1 (yolonet.py:12-46): y1 width 128 if alpha > 0.8 else 192,
    y2 width fixed 128."""

    anchor_num: int
    class_num: int
    alpha: float = 0.75
    dtype: Any = jnp.float32
    safe_dw_grad: bool = True
    stem_mode: str = "default"  # see layers.ConvBN.stem_mode

    @nn.compact
    def __call__(self, x, train: bool = False, input_scale=None):
        tap16, trunk = MobileNetV1(alpha=self.alpha, dtype=self.dtype,
                                   safe_dw_grad=self.safe_dw_grad,
                                   stem_mode=self.stem_mode,
                                   name="backbone")(x, train, input_scale)
        out = self.anchor_num * (self.class_num + 5)
        return _TwoScaleHead(out_channels=out,
                             y1_filters=128 if self.alpha > 0.8 else 192,
                             y2_filters=128, dtype=self.dtype,
                             name="head")(tap16, trunk, train)


class YoloMobileV2(nn.Module):
    """yolo_mobilev2 (yolonet.py:49-104): both head widths 128 if alpha > 0.7
    else 192."""

    anchor_num: int
    class_num: int
    alpha: float = 1.0
    dtype: Any = jnp.float32
    safe_dw_grad: bool = True
    stem_mode: str = "default"  # see layers.ConvBN.stem_mode

    @nn.compact
    def __call__(self, x, train: bool = False, input_scale=None):
        tap16, trunk = MobileNetV2(alpha=self.alpha, dtype=self.dtype,
                                   safe_dw_grad=self.safe_dw_grad,
                                   stem_mode=self.stem_mode,
                                   name="backbone")(x, train, input_scale)
        out = self.anchor_num * (self.class_num + 5)
        w = 128 if self.alpha > 0.7 else 192
        return _TwoScaleHead(out_channels=out, y1_filters=w, y2_filters=w,
                             dtype=self.dtype, name="head")(tap16, trunk, train)


class TinyYolo(nn.Module):
    """tiny_yolo (yolonet.py:107-158): y1 width 512, y2 width 256."""

    anchor_num: int
    class_num: int
    alpha: float = 1.0  # unused; uniform builder signature
    dtype: Any = jnp.float32
    safe_dw_grad: bool = True  # no depthwise convs here; uniform signature
    stem_mode: str = "default"  # "nativeconv" only (stride-1 stem)

    @nn.compact
    def __call__(self, x, train: bool = False, input_scale=None):
        tap16, trunk = TinyYoloBody(dtype=self.dtype, stem_mode=self.stem_mode,
                                    name="backbone")(
            x, train, input_scale)
        out = self.anchor_num * (self.class_num + 5)
        return _TwoScaleHead(out_channels=out, y1_filters=512, y2_filters=256,
                             dtype=self.dtype, name="head")(tap16, trunk, train)


class Yolo(nn.Module):
    """Full YOLOv3 with darknet53, 3 output scales (yolonet.py:161-191)."""

    anchor_num: int
    class_num: int
    alpha: float = 1.0  # unused; uniform builder signature
    dtype: Any = jnp.float32
    safe_dw_grad: bool = True  # no depthwise convs here; uniform signature
    stem_mode: str = "default"  # "nativeconv" only (stride-1 stem)

    @nn.compact
    def __call__(self, x, train: bool = False, input_scale=None):
        tap8, tap16, tap32 = Darknet53(dtype=self.dtype,
                                       stem_mode=self.stem_mode,
                                       name="backbone")(
            x, train, input_scale)
        out = self.anchor_num * (self.class_num + 5)

        x, y = LastLayers(512, dtype=self.dtype, name="last_512")(tap32, train)
        y1 = darknet_head_conv(out, dtype=self.dtype, name="y1_out")(y)

        x = DarknetConvBN(256, (1, 1), dtype=self.dtype, name="up1_conv")(x, train)
        x = jnp.concatenate([upsample2x(x), tap16], axis=-1)
        x, y = LastLayers(256, dtype=self.dtype, name="last_256")(x, train)
        y2 = darknet_head_conv(out, dtype=self.dtype, name="y2_out")(y)

        x = DarknetConvBN(128, (1, 1), dtype=self.dtype, name="up2_conv")(x, train)
        x = jnp.concatenate([upsample2x(x), tap8], axis=-1)
        _, y = LastLayers(128, dtype=self.dtype, name="last_128")(x, train)
        y3 = darknet_head_conv(out, dtype=self.dtype, name="y3_out")(y)
        return [y1, y2, y3]


NETWORKS: Dict[str, Callable] = {
    "yolo_mobilev1": YoloMobileV1,
    "yolo_mobilev2": YoloMobileV2,
    "tiny_yolo": TinyYolo,
    "yolo": Yolo,
}


@dataclasses.dataclass
class YoloNet:
    """Built network: the module plus the reference's dual output contract.

    ``apply_raw`` = the reference's ``yolo_model`` (export view);
    ``apply``     = ``yolo_model_warpper`` (training view, reshaped)
    (yolonet.py:40-44).
    """

    module: nn.Module
    anchor_num: int
    class_num: int
    in_hw: Sequence[int]
    n_out_layers: int = 2  # 3 for the full darknet53 'yolo' builder

    @functools.cached_property
    def _jit_init(self):
        # jitted (vs flax's eager init) so XLA compiles the init graph once
        # — and the persistent compile cache carries it across processes;
        # eager init of the larger backbones costs many seconds per call on
        # a 1-core XLA:CPU host and is re-paid on every run
        return jax.jit(lambda rng, x: self.module.init(rng, x, train=False))

    def init(self, rng: jax.Array, batch: int = 1) -> FrozenDict:
        x = jnp.zeros((batch, self.in_hw[0], self.in_hw[1], 3), jnp.float32)
        return self._jit_init(rng, x)

    def apply_raw(self, variables, x, train: bool = False, **kw):
        return self.module.apply(variables, x, train=train, **kw)

    def reshape_outputs(self, outputs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        c = 5 + self.class_num
        return [o.reshape(o.shape[0], o.shape[1], o.shape[2], self.anchor_num, c)
                for o in outputs]

    def apply(self, variables, x, train: bool = False, **kw):
        if train:
            outputs, updates = self.module.apply(
                variables, x, train=True, mutable=["batch_stats"], **kw)
            return self.reshape_outputs(outputs), updates
        return self.reshape_outputs(self.apply_raw(variables, x, train=False, **kw))


def build_network(model_def: str, in_hw, anchor_num: int, class_num: int,
                  alpha: float = 1.0, dtype=jnp.float32,
                  safe_dw_grad: bool = True) -> YoloNet:
    """Select a builder by name — the reference's ``eval(model_def)``
    (keras_train.py:49) without the eval.

    ``safe_dw_grad``: keep True (default) on any mesh with a model/TP axis —
    see layers.DepthwiseConv; False skips the partitioner-safe depthwise
    kernel gradient's extra HBM reads where the stock one is provably
    correct (single device / pure DP).
    """
    if model_def not in NETWORKS:
        raise KeyError(f"unknown model_def {model_def!r}; have {sorted(NETWORKS)}")
    module = NETWORKS[model_def](anchor_num=anchor_num, class_num=class_num,
                                 alpha=alpha, dtype=dtype,
                                 safe_dw_grad=safe_dw_grad)
    return YoloNet(module=module, anchor_num=anchor_num, class_num=class_num,
                   in_hw=tuple(in_hw),
                   n_out_layers=3 if model_def == "yolo" else 2)
