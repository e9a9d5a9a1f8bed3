"""Serving stem variants (inference.Predictor stem_mode).

``patches``: the letterbox einsum emits the stem conv's im2col patches
directly (ops.letterbox.letterbox_stem_patches), so the NHWC uint8 canvas —
and the relayout copy it forced into the stem conv's tiling (BASELINE.md
batch-128 profile, 0.54 ms = 14.9 % of device time) — never exists in the
serving program.  These tests pin (1) the patch VALUES bit-match the default
letterbox + manual extraction, and (2) the end-to-end detections match the
default stem path.

``nativeconv``: probe variant forcing nn.Conv for the cin<=4 stem instead of
_StemConv — numerics must match the im2col formulation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import YoloSpec
from k210_yolo_framework_tpu.inference import Predictor
from k210_yolo_framework_tpu.ops import letterbox as LB
from k210_yolo_framework_tpu.utils.detmatch import assert_detections_close

import shared


def _manual_patches(img_u8: np.ndarray, kh=3, kw=3, sh=2, sw=2, ph=1, pw=1):
    """[H, W, C] uint8 -> [Ho, kh, Wo, kw, C] zero-padded patches (numpy)."""
    h, w, c = img_u8.shape
    ho = (h + 2 * ph - kh) // sh + 1
    wo = (w + 2 * pw - kw) // sw + 1
    xp = np.pad(img_u8, ((ph, ph), (pw, pw), (0, 0)))
    out = np.zeros((ho, kh, wo, kw, c), img_u8.dtype)
    for i in range(ho):
        for dy in range(kh):
            for j in range(wo):
                out[i, dy, j] = xp[sh * i + dy, sw * j: sw * j + kw]
    return out


@pytest.mark.parametrize("hw", [(240, 320), (180, 320), (240, 200)],
                         ids=["full", "short", "narrow"])
def test_letterbox_stem_patches_matches_manual_extraction(hw):
    """Patch values == default letterbox -> uint8 -> zero-pad -> extract,
    including the zero-weight-column padding taps at the borders."""
    rng = np.random.default_rng(3)
    canvas = np.zeros((240, 320, 3), np.uint8)
    canvas[:hw[0], :hw[1]] = rng.integers(0, 256, (*hw, 3)).astype(np.uint8)
    in_hw = (96, 128)
    hw_j = jnp.asarray(hw, jnp.int32)

    base = np.asarray(LB.letterbox_image(
        jnp.asarray(canvas), hw_j, in_hw).astype(jnp.uint8))
    want = _manual_patches(base)

    got = np.asarray(LB.letterbox_stem_patches(
        jnp.asarray(canvas), hw_j, in_hw).astype(jnp.uint8))
    assert got.shape == want.shape
    # same weight columns, same contraction order -> bit-identical pixels
    np.testing.assert_array_equal(got, want)


def _spec_and_pred(stem_mode, alpha=0.5, model="yolo_mobilev1"):
    anchors = np.array([[[0.7, 0.6], [0.5, 0.5], [0.4, 0.3]],
                        [[0.3, 0.3], [0.2, 0.2], [0.15, 0.15]]], np.float32)
    spec = YoloSpec.create((96, 96), ((3, 3), (6, 6)), 5, anchors)
    net, variables = shared.net_and_vars(model, spec.in_hw, spec.nanchors,
                                         spec.class_num, alpha=alpha)
    return spec, Predictor(net, variables, spec, obj_thresh=0.05,
                           iou_thresh=0.45, stem_mode=stem_mode)


@pytest.mark.parametrize("model", ["yolo_mobilev1", "yolo_mobilev2"])
def test_patches_stem_serving_matches_default(model):
    """End-to-end detections under stem_mode='patches' == default stem.

    Not bitwise: the patches dot_general contracts the 27 taps in
    (kh, kw, cin) order vs _StemConv's (cin, kh, kw) — fp32 reduction
    reordering at the ulp level, the same class of legitimate noise as the
    TP/SP psum tests, so the shared detection-set comparator applies."""
    _, base = _spec_and_pred("default", model=model)
    _, pats = _spec_and_pred("patches", model=model)

    rng = np.random.default_rng(0)
    B = 8
    canv = jnp.asarray(rng.integers(0, 256, (B, 128, 128, 3)).astype(np.uint8))
    hws = jnp.asarray(np.tile([100, 128], (B, 1)).astype(np.int32))

    a = base._run_batch(base.variables, canv, hws)
    b = pats._run_batch(pats.variables, canv, hws)
    n_a, n_b = assert_detections_close(a, b)
    assert n_a > 0  # non-vacuous: the low obj_thresh yields detections


def test_nativeconv_stem_matches_default():
    """nn.Conv stem == _StemConv im2col+matmul numerics (raw head outputs)."""
    _, base = _spec_and_pred("default")
    _, nat = _spec_and_pred("nativeconv")

    rng = np.random.default_rng(1)
    canv = jnp.asarray(rng.integers(0, 256, (4, 128, 128, 3)).astype(np.uint8))
    hws = jnp.asarray(np.tile([100, 128], (4, 1)).astype(np.int32))
    a = base._run_batch(base.variables, canv, hws)
    b = nat._run_batch(nat.variables, canv, hws)
    assert_detections_close(a, b)


def test_patches_stem_rejects_unsupported_builders_and_modes():
    anchors = np.array([[[0.7, 0.6], [0.5, 0.5], [0.4, 0.3]],
                        [[0.3, 0.3], [0.2, 0.2], [0.15, 0.15]]], np.float32)
    spec = YoloSpec.create((96, 96), ((3, 3), (6, 6)), 5, anchors)
    net, variables = shared.net_and_vars("tiny_yolo", spec.in_hw,
                                         spec.nanchors, spec.class_num)
    with pytest.raises(ValueError, match="stride-2 stem"):
        Predictor(net, variables, spec, stem_mode="patches")

    net1, var1 = shared.net_and_vars("yolo_mobilev1", spec.in_hw,
                                     spec.nanchors, spec.class_num, alpha=0.5)
    with pytest.raises(ValueError, match="quantize"):
        Predictor(net1, var1, spec, stem_mode="patches", quantize="int8_act")
    with pytest.raises(ValueError, match="unknown stem_mode"):
        Predictor(net1, var1, spec, stem_mode="bogus")


def test_native_stem_autotune_gate_and_parity():
    """The round-5 dispatch autotune (layers.ConvBN._native_stem_wins):
    nn.Conv replaces _StemConv ONLY for the measured-good family — eval
    path, stride-2 stem, batch 128 — and both dispatches compute the same
    function from the same checkpoint (identical "kernel" param)."""
    from k210_yolo_framework_tpu.models.layers import ConvBN, leaky_relu

    conv = ConvBN(features=8, kernel=(3, 3), strides=(2, 2),
                  explicit_pad=((1, 1), (1, 1)), act=leaky_relu(0.3))
    x128 = jnp.asarray(
        np.random.default_rng(4).integers(0, 256, (128, 16, 16, 3))
        .astype(np.float32))
    # gate boundary: exactly the measured shape families, nothing else
    assert conv._native_stem_wins(x128, train=False)
    assert not conv._native_stem_wins(x128, train=True)
    assert not conv._native_stem_wins(x128[:127], train=False)
    s1 = ConvBN(features=8, kernel=(3, 3), strides=(1, 1))
    assert s1._native_stem_wins(x128, train=False)      # tiny_yolo +9.5%
    assert not s1._native_stem_wins(x128[:64], train=False)  # s1@256/64 unmeasured

    variables = conv.init(jax.random.PRNGKey(0), x128[:4])  # _StemConv init
    y128 = conv.apply(variables, x128)          # nn.Conv dispatch (gate on)
    y64 = conv.apply(variables, x128[:64])      # _StemConv dispatch
    # conv vs im2col+matmul contract the 27 taps in different orders —
    # fp32 reduction reordering at the ulp level (measured max rel 1.7e-4
    # on 0..255-pixel inputs), the same legitimate-noise class as the
    # patches/TP-psum comparisons above
    np.testing.assert_allclose(np.asarray(y128[:64]), np.asarray(y64),
                               rtol=5e-4, atol=1e-3)


def test_native_stem_autotune_keeps_int8act_stem_wide():
    """Regression: the autotune fall-through must NOT hand the cin=3 stem to
    _Int8Conv under the int8-act modes — the stem stays WIDE by design
    (quantizing raw 0..255 pixels costs mAP).  Observable: _Int8Conv's
    static modes create an ``act_ranges`` collection; the stem scope must
    have none even at the autotuned batch-128 eval shape."""
    from k210_yolo_framework_tpu.models.layers import ConvBN, Int8Act, leaky_relu

    dt = Int8Act(static=True)
    stem = ConvBN(features=8, kernel=(3, 3), strides=(2, 2),
                  explicit_pad=((1, 1), (1, 1)), act=leaky_relu(0.3), dtype=dt)
    x128 = jnp.zeros((128, 16, 16, 3), jnp.float32)
    v = stem.init(jax.random.PRNGKey(0), x128)      # autotuned shape family
    assert "act_ranges" not in v, "int8-act stem was quantized by the autotune"

    # control: a non-stem dense conv under the same dtype DOES quantize
    body = ConvBN(features=8, kernel=(3, 3), strides=(2, 2),
                  explicit_pad=((1, 1), (1, 1)), act=leaky_relu(0.3), dtype=dt)
    vb = body.init(jax.random.PRNGKey(0), jnp.zeros((128, 16, 16, 8)))
    assert "act_ranges" in vb


def test_patches_stem_single_image_path():
    """predict_image under stem_mode='patches' (per-shape compile path)."""
    _, base = _spec_and_pred("default")
    _, pats = _spec_and_pred("patches")
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (100, 128, 3)).astype(np.uint8)
    a, b = base.predict_image(img), pats.predict_image(img)
    assert a.boxes.shape == b.boxes.shape
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a.boxes, b.boxes, rtol=1e-3, atol=1e-2)
