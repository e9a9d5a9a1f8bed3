"""int8 post-training quantization: roundtrip bounds + serving parity.

The reference's deployment path is a quantized int8 kmodel on the K210 KPU
(README.md:152-154, nncase); ``quantize.py`` is the TPU-native analogue.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import YoloSpec
from k210_yolo_framework_tpu.inference import Predictor
from k210_yolo_framework_tpu.quantize import (
    QTensor,
    dequantize_tree,
    fake_quant_tree,
    is_quantized,
    quantize_tree,
)

import shared

SPEC = YoloSpec.create(
    (64, 64), ((2, 2), (4, 4)), 4,
    np.array([[[0.7, 0.6], [0.5, 0.5], [0.4, 0.3]],
              [[0.3, 0.3], [0.2, 0.2], [0.1, 0.1]]]))


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    tree = {"a": {"kernel": jnp.asarray(rng.normal(0, 0.2, (3, 3, 8, 16)).astype(np.float32))},
            "b": {"bias": jnp.asarray(rng.normal(size=(16,)).astype(np.float32))}}
    q = quantize_tree(tree)
    assert isinstance(q["a"]["kernel"], QTensor)
    assert q["a"]["kernel"].q.dtype == jnp.int8
    assert q["a"]["kernel"].scale.shape == (1, 1, 1, 16)  # per-output-channel
    assert not isinstance(q["b"]["bias"], QTensor)        # 1-d stays fp32
    assert is_quantized(q) and not is_quantized(tree)

    deq = dequantize_tree(q)
    # symmetric int8 roundtrip error <= scale/2 per element
    err = np.abs(np.asarray(deq["a"]["kernel"]) - np.asarray(tree["a"]["kernel"]))
    bound = np.asarray(q["a"]["kernel"].scale) / 2 + 1e-7
    assert np.all(err <= bound)
    np.testing.assert_array_equal(np.asarray(deq["b"]["bias"]),
                                  np.asarray(tree["b"]["bias"]))


def _net_vars(seed=3):
    net, variables = shared.net_and_vars(
        "yolo_mobilev1", SPEC.in_hw, SPEC.nanchors, SPEC.class_num,
        alpha=0.25, seed=seed)
    return net, {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}


def _predictors():
    net, variables = _net_vars()
    # random-init logits are ~0 -> scores cluster near sigmoid^2 = 0.25;
    # threshold below that so the fp32 path produces detections
    kw = dict(obj_thresh=0.1, iou_thresh=0.3, max_out=10)
    return (Predictor(net, variables, SPEC, **kw),
            Predictor(net, variables, SPEC, quantize="int8", **kw))


def test_int8_serving_matches_fp32_boxes():
    fp32, int8 = _predictors()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (96, 128, 3)).astype(np.uint8)

    a = fp32.predict_image(img)
    b = int8.predict_image(img)
    assert len(a.boxes) > 0, "test needs at least one fp32 detection"

    # every fp32 box has an int8 counterpart: same class, IoU >= 0.7,
    # score within 0.1 (weight-only int8 perturbs logits slightly)
    def iou(x, y):
        ymin, xmin = max(x[0], y[0]), max(x[1], y[1])
        ymax, xmax = min(x[2], y[2]), min(x[3], y[3])
        inter = max(ymax - ymin, 0) * max(xmax - xmin, 0)
        ax = (x[2] - x[0]) * (x[3] - x[1])
        ay = (y[2] - y[0]) * (y[3] - y[1])
        return inter / max(ax + ay - inter, 1e-9)

    matched = 0
    for box, score, cls in zip(a.boxes, a.scores, a.classes):
        for box2, score2, cls2 in zip(b.boxes, b.scores, b.classes):
            if cls == cls2 and iou(box, box2) >= 0.7 and abs(score - score2) < 0.1:
                matched += 1
                break
    assert matched >= 0.8 * len(a.boxes), (matched, len(a.boxes))


@pytest.mark.parametrize("mode", [
    "int8_act",
    # symmetric scales: the max-throughput point; marked slow — same code
    # path as affine minus the zero point, covered unit-level above
    pytest.param("int8_act_sym", marks=pytest.mark.slow)])
def test_int8_act_serving_matches_fp32_boxes(mode):
    """quantize='int8_act' (int8 MXU conv compute, dynamic affine activation
    scales — models.layers.Int8Act) keeps detections close to fp32.
    Activation quantization adds more noise than weight-only int8, so the
    match criteria are looser but still bound the error."""
    net, variables = _net_vars()
    kw = dict(obj_thresh=0.1, iou_thresh=0.3, max_out=10)
    fp32 = Predictor(net, variables, SPEC, **kw)
    i8a = Predictor(net, variables, SPEC, quantize=mode, **kw)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (96, 128, 3)).astype(np.uint8)
    a = fp32.predict_image(img)
    b = i8a.predict_image(img)
    assert len(a.boxes) > 0, "test needs at least one fp32 detection"

    def iou(x, y):
        ymin, xmin = max(x[0], y[0]), max(x[1], y[1])
        ymax, xmax = min(x[2], y[2]), min(x[3], y[3])
        inter = max(ymax - ymin, 0) * max(xmax - xmin, 0)
        ax = (x[2] - x[0]) * (x[3] - x[1])
        ay = (y[2] - y[0]) * (y[3] - y[1])
        return inter / max(ax + ay - inter, 1e-9)

    matched = sum(
        any(cls == cls2 and iou(box, box2) >= 0.5 and abs(score - score2) < 0.15
            for box2, score2, cls2 in zip(b.boxes, b.scores, b.classes))
        for box, score, cls in zip(a.boxes, a.scores, a.classes))
    assert matched >= 0.7 * len(a.boxes), (matched, len(a.boxes))


def test_fake_quant_forward_close_to_fp32():
    net, variables = _net_vars(seed=1)
    fq = {"params": fake_quant_tree(variables["params"]),
          "batch_stats": variables["batch_stats"]}
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    apply = jax.jit(lambda v, x: net.apply(v, x, train=False))
    outs = apply(variables, x)
    outs_q = apply(fq, x)
    for o, oq in zip(outs, outs_q):
        # raw head logits stay close under weight-only int8
        assert float(jnp.max(jnp.abs(o - oq))) < 0.25
        rel = float(jnp.abs(o - oq).mean() / (jnp.abs(o).mean() + 1e-9))
        assert rel < 0.05, rel


def test_predictor_rejects_unknown_quantize_mode():
    net, variables = _net_vars()
    with pytest.raises(ValueError):
        Predictor(net, dict(variables), SPEC, quantize="int4")


def test_quantize_mode_cli_parse():
    from k210_yolo_framework_tpu.utils import quantize_mode
    assert quantize_mode("True") == "int8"
    assert quantize_mode("int8") == "int8"
    assert quantize_mode("int8_act") == "int8_act"
    assert quantize_mode("int8_act_sym") == "int8_act_sym"
    assert quantize_mode("False") is None


def test_int8_conv_affine_zero_point_folds_exactly():
    """The affine zero point must fold out of the int32 matmul EXACTLY:
    our int math == an fp32 conv over the dequantized activations
    (xdq = (xq - zp)*sx, with real-zero SAME padding — exact because the
    explicit zp padding dequantizes to 0).  Any border mistake in the
    zp-padding + per-channel correction shows up here as a factor-level
    error on the frame pixels."""
    from k210_yolo_framework_tpu.models.layers import _Int8Conv

    rng = np.random.default_rng(7)
    # skewed, non-centered input with a nonzero zero point
    x = jnp.asarray((rng.uniform(-0.2, 1.5, (2, 7, 9, 12))).astype(np.float32))
    for kern, pad, strides in [((3, 3), "SAME", (1, 1)),
                               ((1, 1), "SAME", (1, 1)),
                               ((3, 3), "VALID", (1, 1))]:
        m = _Int8Conv(features=6, kernel=kern, strides=strides, padding=pad,
                      out_dtype=jnp.float32, affine_act=True)
        v = m.init(jax.random.PRNGKey(0), x)
        got = m.apply(v, x)

        # rebuild the quantization exactly as the module does
        xf = np.asarray(x, np.float64)
        xmin = min(xf.min(), 0.0)
        xmax = max(xf.max(), 0.0)
        sx = max(xmax - xmin, 1e-6) / 254.0
        zp = np.clip(-127.0 - np.round(xmin / sx), -127.0, 127.0)
        xq = np.clip(np.round(np.float32(xf) / np.float32(sx)) + zp, -127, 127)
        kf = np.asarray(v["params"]["kernel"], np.float64)
        sw = np.maximum(np.abs(kf).max((0, 1, 2)), 1e-12) / 127.0
        kq = np.clip(np.round(kf / sw), -127, 127)
        xdq = ((xq - zp) * sx).astype(np.float32)          # exact dequant
        kdq = (kq * sw).astype(np.float32)
        want = jax.lax.conv_general_dilated(
            jnp.asarray(xdq), jnp.asarray(kdq), strides, pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_int8_conv_affine_tighter_than_symmetric_on_skewed_acts():
    """Post-LeakyReLU ranges are [-a/10, a]; the affine step is ~1.8x finer.
    Both modes share the SAME weight quantization, so compare against the
    conv over fp32 activations x QUANTIZED weights — isolating the
    activation-quantization error, where affine must win clearly."""
    from k210_yolo_framework_tpu.models.layers import _Int8Conv

    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 2.0, (2, 8, 8, 16))
    x = jnp.asarray(np.where(rng.uniform(size=pos.shape) > 0.5,
                             pos, -0.1 * pos).astype(np.float32))

    errs = {}
    for affine in (True, False):
        m = _Int8Conv(features=8, kernel=(3, 3), strides=(1, 1),
                      padding="SAME", out_dtype=jnp.float32,
                      affine_act=affine)
        v = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(v, x)
        kf = np.asarray(v["params"]["kernel"], np.float64)
        sw = np.maximum(np.abs(kf).max((0, 1, 2)), 1e-12) / 127.0
        kdq = (np.clip(np.round(kf / sw), -127, 127) * sw).astype(np.float32)
        yref = jax.lax.conv_general_dilated(
            x, jnp.asarray(kdq), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        errs[affine] = float(jnp.abs(y - yref).mean())
    assert errs[True] < 0.7 * errs[False], errs


def test_int8_act_guards():
    """Round-3 review findings: (a) Int8Act refuses train mode (round() has
    zero derivative — training would silently freeze the conv stack);
    (b) Predictor must not silently strip/override an Int8Act sentinel;
    (c) quantize_mode raises on typo'd modes instead of serving fp32."""
    from k210_yolo_framework_tpu.models import build_network
    from k210_yolo_framework_tpu.models.layers import Int8Act
    from k210_yolo_framework_tpu.utils import quantize_mode

    net = build_network("yolo_mobilev1", SPEC.in_hw, SPEC.nanchors,
                        SPEC.class_num, alpha=0.25, dtype=Int8Act())
    variables = shared.net_and_vars("yolo_mobilev1", SPEC.in_hw,
                                    SPEC.nanchors, SPEC.class_num,
                                    alpha=0.25, seed=3)[1]
    x = jnp.zeros((1, *SPEC.in_hw, 3), jnp.float32)
    with pytest.raises(NotImplementedError, match="serving-only"):
        net.apply(dict(variables), x, train=True)

    # an Int8Act-built net implies quantize='int8_act' (not silent bf16)
    p = Predictor(net, dict(variables), SPEC, obj_thresh=0.1)
    assert p.quantize == "int8_act"
    # explicit affine=False sentinel implies the _sym mode
    p2 = Predictor(net, dict(variables), SPEC, obj_thresh=0.1,
                   compute_dtype=Int8Act(affine=False))
    assert p2.quantize == "int8_act_sym"
    with pytest.raises(ValueError, match="conflicting"):
        Predictor(net, dict(variables), SPEC,
                  compute_dtype=Int8Act(affine=False), quantize="int8_act")

    with pytest.raises(ValueError, match="unknown --quantize"):
        quantize_mode("int8act")


def test_int8_conv_static_ranges_match_dynamic():
    """With act_ranges set to exactly the batch min/max, the static
    (calibrated) conv must be BIT-identical to the dynamic affine conv —
    the only difference is where the range comes from."""
    from k210_yolo_framework_tpu.models.layers import _Int8Conv

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-0.3, 1.2, (2, 8, 8, 12)).astype(np.float32))
    dyn = _Int8Conv(features=6, kernel=(3, 3), strides=(1, 1),
                    padding="SAME", out_dtype=jnp.float32, affine_act=True)
    v = dyn.init(jax.random.PRNGKey(0), x)
    y_dyn = dyn.apply(v, x)

    st = _Int8Conv(features=6, kernel=(3, 3), strides=(1, 1),
                   padding="SAME", out_dtype=jnp.float32, affine_act=True,
                   static_act=True)
    v_st = {"params": v["params"],
            "act_ranges": {"min": jnp.min(x), "max": jnp.max(x)}}
    y_st = st.apply(v_st, x)
    np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_st))


def test_int8_act_cal_predictor_flow():
    """quantize='int8_act_cal': serving before calibrate() raises; after
    calibrating on a representative batch the detections stay close to the
    fp32 predictor's (same criteria as the dynamic int8-act test)."""
    net, variables = _net_vars()
    kw = dict(obj_thresh=0.1, iou_thresh=0.3, max_out=10)
    fp32 = Predictor(net, variables, SPEC, **kw)
    cal = Predictor(net, variables, SPEC, quantize="int8_act_cal", **kw)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (96, 128, 3)).astype(np.uint8)

    with pytest.raises(RuntimeError, match="calibrate"):
        cal.predict_image(img)

    canv = rng.integers(0, 256, (4, 96, 128, 3)).astype(np.uint8)
    hws = np.tile([96, 128], (4, 1)).astype(np.int32)
    cal.calibrate(canv, hws)
    assert "act_ranges" in cal.variables
    # ranges must be real observations, not the zero placeholders
    leaves = jax.tree.leaves(cal.variables["act_ranges"])
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    a = fp32.predict_image(img)
    b = cal.predict_image(img)
    assert len(a.boxes) > 0

    def iou(x, y):
        ymin, xmin = max(x[0], y[0]), max(x[1], y[1])
        ymax, xmax = min(x[2], y[2]), min(x[3], y[3])
        inter = max(ymax - ymin, 0) * max(xmax - xmin, 0)
        ax = (x[2] - x[0]) * (x[3] - x[1])
        ay = (y[2] - y[0]) * (y[3] - y[1])
        return inter / max(ax + ay - inter, 1e-9)

    matched = sum(
        any(cls == cls2 and iou(box, box2) >= 0.5 and abs(score - score2) < 0.15
            for box2, score2, cls2 in zip(b.boxes, b.scores, b.classes))
        for box, score, cls in zip(a.boxes, a.scores, a.classes))
    assert matched >= 0.7 * len(a.boxes), (matched, len(a.boxes))


def test_int8_act_cal_zero_placeholder_ranges_rejected():
    """net.init() on a static-Int8Act net auto-creates act_ranges as ZERO
    placeholders; serving on those would silently saturate everything to
    garbage.  The guard must treat all-zero ranges as uncalibrated."""
    from k210_yolo_framework_tpu.models import build_network
    from k210_yolo_framework_tpu.models.layers import Int8Act

    net = build_network("yolo_mobilev1", SPEC.in_hw, SPEC.nanchors,
                        SPEC.class_num, alpha=0.25,
                        dtype=Int8Act(static=True))
    variables = net.init(jax.random.PRNGKey(0))   # contains zero act_ranges
    assert "act_ranges" in variables
    p = Predictor(net, dict(variables), SPEC, obj_thresh=0.1)
    assert p.quantize == "int8_act_cal"
    img = np.random.default_rng(0).integers(
        0, 256, (96, 128, 3)).astype(np.uint8)
    with pytest.raises(RuntimeError, match="calibrate"):
        p.predict_image(img)
    # after calibration the same predictor serves
    p.calibrate(img[None], np.asarray([[96, 128]], np.int32))
    p.predict_image(img)


def test_int8_act_sentinel_preserves_symmetric_static():
    """The mode strings cannot express symmetric+calibrated; an explicit
    Int8Act(affine=False, static=True) sentinel must survive Predictor
    construction instead of being silently flipped to affine."""
    from k210_yolo_framework_tpu.models.layers import Int8Act

    net, variables = _net_vars()
    p = Predictor(net, dict(variables), SPEC, obj_thresh=0.1,
                  compute_dtype=Int8Act(affine=False, static=True))
    assert p.quantize == "int8_act_cal"
    d = p.net.module.dtype
    assert isinstance(d, Int8Act) and d.static and not d.affine
