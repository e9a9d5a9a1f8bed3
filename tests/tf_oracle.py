"""tf.keras oracle builders replicating the reference model graphs.

Ground truth for the weight-port maps in ``k210_yolo_framework_tpu/port.py``:
these functions rebuild the reference's four architectures with vanilla
tf.keras layers in the reference's exact creation order, so **Keras itself
assigns the auto-numbered layer names** (``conv2d_N`` /
``batch_normalization_N``).  Saving one of these models to ``.h5`` therefore
produces a file whose layer names come from the same mechanism that produced
the reference's shipped checkpoints (TF1 Keras used the same
per-graph-creation-order counters) — porting from it validates the maps
against real Keras behavior instead of against themselves.

Layer configurations are re-derived from the reference sources (cited below),
not copied:

  * DarknetConv2D / DarknetConv2D_BN_Leaky — /root/reference/models/yolonet.py:244-260
  * head graphs                            — yolonet.py:27-38, 86-96, 128-138
  * tiny body                              — yolonet.py:110-126
  * darknet53 + last layers                — yolonet.py:194-229
  * MobileNetV1 K210 fork                  — /root/reference/models/keras_mobilenet.py:216-230, 291-436
  * MobileNetV2 K210 fork                  — /root/reference/models/keras_mobilenet_v2.py:310-392, 426-485

Keras-3 vs TF1-Keras h5 differences (handled by port.py): weight names drop
the ``:0`` suffix, and depthwise kernels are stored as ``kernel`` rather than
``depthwise_kernel`` (same [kh, kw, C, 1] shape).
"""

from __future__ import annotations

import numpy as np


def _keras():
    from tensorflow import keras

    keras.backend.clear_session()  # reset the auto-numbering counters
    return keras


# ---------------------------------------------------------------- darknet ops

def _dark_conv_bn_leaky(L, filters, kernel, strides=(1, 1)):
    """DarknetConv2D_BN_Leaky (yolonet.py:253-260): no-bias conv + BN +
    LeakyReLU(0.1); stride-2 pads top/left then VALID (yolonet.py:197, 248)."""

    def f(x):
        if strides == (2, 2):
            x = L.ZeroPadding2D(((1, 0), (1, 0)))(x)
            pad = "valid"
        else:
            pad = "same"
        x = L.Conv2D(filters, kernel, strides=strides, padding=pad, use_bias=False)(x)
        x = L.BatchNormalization()(x)
        return L.LeakyReLU(negative_slope=0.1)(x)

    return f


def _dark_out_conv(L, filters):
    """Final 1x1 DarknetConv2D with bias, no BN/act (yolonet.py:29, 244-250)."""
    return lambda x: L.Conv2D(filters, (1, 1), padding="same", use_bias=True)(x)


def _two_scale_head(L, tap16, trunk32, out_ch, y1_filters, y2_filters):
    """The shared 2-scale head, reference creation order (yolonet.py:27-38):
    y1 3x3+BN, y1 out, up 1x1+BN, upsample, concat, y2 3x3+BN, y2 out."""
    y1 = _dark_conv_bn_leaky(L, y1_filters, (3, 3))(trunk32)
    y1 = _dark_out_conv(L, out_ch)(y1)

    x = _dark_conv_bn_leaky(L, 128, (1, 1))(trunk32)
    x = L.UpSampling2D(2)(x)
    x = L.Concatenate()([x, tap16])
    y2 = _dark_conv_bn_leaky(L, y2_filters, (3, 3))(x)
    y2 = _dark_out_conv(L, out_ch)(y2)
    return [y1, y2]


# ------------------------------------------------------------- mobilenet v1

def _mobilenet_v1_body(L, x, alpha):
    """K210 MobileNetV1 fork (keras_mobilenet.py:216-230, 291-436): stem
    LeakyReLU(0.3), block-1 filters 40/64, dw ReLU + pw LeakyReLU(0.3),
    stride-2 = explicit ((1,1),(1,1)) pad + VALID.  Returns (tap16, trunk32)
    = conv_pw_11_relu / final block (yolonet.py:23-25)."""

    def conv_block(x, filters, strides):
        filters = int(filters * alpha)
        if strides == (2, 2):
            x = L.ZeroPadding2D(((1, 1), (1, 1)), name="conv1_pad")(x)
            x = L.Conv2D(filters, (3, 3), padding="valid", use_bias=False,
                         strides=strides, name="conv1")(x)
        else:
            x = L.Conv2D(filters, (3, 3), padding="same", use_bias=False,
                         strides=strides, name="conv1")(x)
        x = L.BatchNormalization(name="conv1_bn")(x)
        return L.LeakyReLU(negative_slope=0.3, name="conv1_relu")(x)

    def dw_block(x, pw_filters, block_id, strides=(1, 1)):
        pw_filters = int(pw_filters * alpha)
        if strides != (1, 1):
            x = L.ZeroPadding2D(((1, 1), (1, 1)), name=f"conv_pad_{block_id}")(x)
        x = L.DepthwiseConv2D(
            (3, 3), padding="same" if strides == (1, 1) else "valid",
            strides=strides, use_bias=False, name=f"conv_dw_{block_id}")(x)
        x = L.BatchNormalization(name=f"conv_dw_{block_id}_bn")(x)
        x = L.ReLU(name=f"conv_dw_{block_id}_relu")(x)
        x = L.Conv2D(pw_filters, (1, 1), padding="same", use_bias=False,
                     name=f"conv_pw_{block_id}")(x)
        x = L.BatchNormalization(name=f"conv_pw_{block_id}_bn")(x)
        return L.LeakyReLU(negative_slope=0.3, name=f"conv_pw_{block_id}_relu")(x)

    x = conv_block(x, 32, (2, 2))
    x = dw_block(x, 40 if alpha == 1.0 else 64, 1)
    plan = [(128, (2, 2)), (128, (1, 1)), (256, (2, 2)), (256, (1, 1)),
            (512, (2, 2)), (512, (1, 1)), (512, (1, 1)), (512, (1, 1)),
            (512, (1, 1)), (512, (1, 1)), (1024, (2, 2)), (1024, (1, 1))]
    tap16 = None
    for bid, (f, s) in enumerate(plan, start=2):
        x = dw_block(x, f, bid, s)
        if bid == 11:
            tap16 = x
    return tap16, x


def build_mobilev1(in_hw, anchor_num=3, class_num=20, alpha=0.75):
    keras = _keras()
    L = keras.layers
    inputs = keras.Input((in_hw[0], in_hw[1], 3))
    tap16, trunk = _mobilenet_v1_body(L, inputs, alpha)
    outs = _two_scale_head(L, tap16, trunk, anchor_num * (class_num + 5),
                           128 if alpha > 0.8 else 192, 128)
    return keras.Model(inputs, outs)


# ------------------------------------------------------------- mobilenet v2

def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _mobilenet_v2_body(L, x, alpha):
    """K210 MobileNetV2 fork (keras_mobilenet_v2.py:310-392, 426-485): stem
    FIXED 32 filters, blocks 1/2 expand 48/124 when alpha > .6, stride-2 dw =
    explicit pad + VALID, BN(momentum .999, eps 1e-3), ReLU6.  Returns
    (block_13_expand_relu tap, out_relu trunk) (yolonet.py:83-84)."""
    BN = dict(epsilon=1e-3, momentum=0.999)

    def block(x, filters, stride, expansion, block_id, expand_channel=None):
        in_ch = x.shape[-1]
        pw_filters = _make_divisible(int(filters * alpha), 8)
        inputs = x
        prefix = f"block_{block_id}_" if block_id else "expanded_conv_"
        expand_out = None
        if block_id:
            width = expand_channel if expand_channel else expansion * in_ch
            x = L.Conv2D(width, 1, padding="same", use_bias=False,
                         name=prefix + "expand")(x)
            x = L.BatchNormalization(name=prefix + "expand_BN", **BN)(x)
            x = L.ReLU(6.0, name=prefix + "expand_relu")(x)
            expand_out = x
        if stride == 2:
            x = L.ZeroPadding2D(((1, 1), (1, 1)), name=prefix + "pad")(x)
        x = L.DepthwiseConv2D(3, strides=stride, use_bias=False,
                              padding="same" if stride == 1 else "valid",
                              name=prefix + "depthwise")(x)
        x = L.BatchNormalization(name=prefix + "depthwise_BN", **BN)(x)
        x = L.ReLU(6.0, name=prefix + "depthwise_relu")(x)
        x = L.Conv2D(pw_filters, 1, padding="same", use_bias=False,
                     name=prefix + "project")(x)
        x = L.BatchNormalization(name=prefix + "project_BN", **BN)(x)
        if in_ch == pw_filters and stride == 1:
            x = L.Add(name=prefix + "add")([inputs, x])
        return x, expand_out

    x = L.ZeroPadding2D(((1, 1), (1, 1)), name="Conv1_pad")(x)
    x = L.Conv2D(32, 3, strides=(2, 2), padding="valid", use_bias=False,
                 name="Conv1")(x)
    x = L.BatchNormalization(name="bn_Conv1", **BN)(x)
    x = L.ReLU(6.0, name="Conv1_relu")(x)

    plan = [(16, 1, 1), (24, 2, 6), (24, 1, 6),
            (32, 2, 6), (32, 1, 6), (32, 1, 6),
            (64, 2, 6), (64, 1, 6), (64, 1, 6), (64, 1, 6),
            (96, 1, 6), (96, 1, 6), (96, 1, 6),
            (160, 2, 6), (160, 1, 6), (160, 1, 6),
            (320, 1, 6)]
    tap16 = None
    for bid, (f, s, e) in enumerate(plan):
        expand_channel = None
        if alpha > 0.6 and bid == 1:
            expand_channel = 48
        if alpha > 0.6 and bid == 2:
            expand_channel = 124
        x, expand_out = block(x, f, s, e, bid, expand_channel)
        if bid == 13:
            tap16 = expand_out

    last = _make_divisible(1280 * alpha, 8) if alpha > 1.0 else 1280
    x = L.Conv2D(last, 1, use_bias=False, name="Conv_1")(x)
    x = L.BatchNormalization(name="Conv_1_bn", **BN)(x)
    x = L.ReLU(6.0, name="out_relu")(x)
    return tap16, x


def build_mobilev2(in_hw, anchor_num=3, class_num=20, alpha=0.75):
    keras = _keras()
    L = keras.layers
    inputs = keras.Input((in_hw[0], in_hw[1], 3))
    tap16, trunk = _mobilenet_v2_body(L, inputs, alpha)
    w = 128 if alpha > 0.7 else 192
    outs = _two_scale_head(L, tap16, trunk, anchor_num * (class_num + 5), w, w)
    return keras.Model(inputs, outs)


# ---------------------------------------------------------------- tiny yolo

def build_tiny_yolo(in_hw, anchor_num=3, class_num=20):
    """tiny_yolo (yolonet.py:107-138): all layers auto-numbered."""
    keras = _keras()
    L = keras.layers
    inputs = keras.Input((in_hw[0], in_hw[1], 3))
    x = inputs
    for f in [16, 32, 64, 128]:
        x = _dark_conv_bn_leaky(L, f, (3, 3))(x)
        x = L.MaxPooling2D((2, 2), strides=(2, 2), padding="same")(x)
    x1 = _dark_conv_bn_leaky(L, 256, (3, 3))(x)

    x2 = L.MaxPooling2D((2, 2), strides=(2, 2), padding="same")(x1)
    x2 = _dark_conv_bn_leaky(L, 512, (3, 3))(x2)
    x2 = L.MaxPooling2D((2, 2), strides=(1, 1), padding="same")(x2)
    x2 = _dark_conv_bn_leaky(L, 1024, (3, 3))(x2)
    x2 = _dark_conv_bn_leaky(L, 256, (1, 1))(x2)

    outs = _two_scale_head(L, x1, x2, anchor_num * (class_num + 5), 512, 256)
    return keras.Model(inputs, outs)


# ---------------------------------------------------------------- full yolo

def build_yolo(in_hw, anchor_num=3, class_num=20):
    """Full yolo (yolonet.py:161-229): darknet53 + 3 last-layer stacks."""
    keras = _keras()
    L = keras.layers
    inputs = keras.Input((in_hw[0], in_hw[1], 3))

    def resblock_body(x, num_filters, num_blocks):
        x = L.ZeroPadding2D(((1, 0), (1, 0)))(x)
        x = L.Conv2D(num_filters, (3, 3), strides=(2, 2), padding="valid",
                     use_bias=False)(x)
        x = L.BatchNormalization()(x)
        x = L.LeakyReLU(negative_slope=0.1)(x)
        for _ in range(num_blocks):
            y = _dark_conv_bn_leaky(L, num_filters // 2, (1, 1))(x)
            y = _dark_conv_bn_leaky(L, num_filters, (3, 3))(y)
            x = L.Add()([x, y])
        return x

    def make_last_layers(x, f, out_filters):
        for ff, k in [(f, 1), (f * 2, 3), (f, 1), (f * 2, 3), (f, 1)]:
            x = _dark_conv_bn_leaky(L, ff, (k, k))(x)
        y = _dark_conv_bn_leaky(L, f * 2, (3, 3))(x)
        y = _dark_out_conv(L, out_filters)(y)
        return x, y

    x = _dark_conv_bn_leaky(L, 32, (3, 3))(inputs)
    x = resblock_body(x, 64, 1)
    x = resblock_body(x, 128, 2)
    tap8 = resblock_body(x, 256, 8)
    tap16 = resblock_body(tap8, 512, 8)
    tap32 = resblock_body(tap16, 1024, 4)

    out_ch = anchor_num * (class_num + 5)
    x, y1 = make_last_layers(tap32, 512, out_ch)
    x = _dark_conv_bn_leaky(L, 256, (1, 1))(x)
    x = L.UpSampling2D(2)(x)
    x = L.Concatenate()([x, tap16])
    x, y2 = make_last_layers(x, 256, out_ch)
    x = _dark_conv_bn_leaky(L, 128, (1, 1))(x)
    x = L.UpSampling2D(2)(x)
    x = L.Concatenate()([x, tap8])
    _, y3 = make_last_layers(x, 128, out_ch)
    return keras.Model(inputs, [y1, y2, y3])


# ------------------------------------------------------------------ helpers

def randomize_weights(model, seed=0):
    """Replace every weight with seeded random values (BN variance kept
    positive, kernels fan-in-scaled so activations stay O(1) even through
    darknet53's 75 layers — fixed-scale weights explode to ~1e15 there and
    fp32 accumulation-order noise then swamps any parity tolerance)."""
    rng = np.random.default_rng(seed)
    new = []
    for w in model.weights:
        shape = tuple(w.shape)
        name = w.name if isinstance(w.name, str) else w.name
        if "moving_variance" in name or name == "variance":
            new.append(0.5 + rng.uniform(0.0, 1.0, shape).astype(np.float32))
        elif "gamma" in name:
            new.append(1.0 + 0.2 * rng.standard_normal(shape).astype(np.float32))
        elif len(shape) >= 2:  # conv/dense kernel: He-like scaling
            if len(shape) == 4 and shape[-1] == 1:  # depthwise [kh,kw,C,1]
                fan_in = int(shape[0] * shape[1])
            else:
                fan_in = int(np.prod(shape[:-1]))
            std = 1.6 / np.sqrt(fan_in)
            new.append((std * rng.standard_normal(shape)).astype(np.float32))
        else:  # bias / beta / moving_mean
            new.append(0.1 * rng.standard_normal(shape).astype(np.float32))
    model.set_weights(new)
    return model
