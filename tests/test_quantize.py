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
from k210_yolo_framework_tpu.models import build_network
from k210_yolo_framework_tpu.quantize import (
    QTensor,
    dequantize_tree,
    fake_quant_tree,
    is_quantized,
    quantize_tree,
)

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


def _predictors():
    net = build_network("yolo_mobilev1", SPEC.in_hw, SPEC.nanchors,
                        SPEC.class_num, alpha=0.25)
    variables = net.init(jax.random.PRNGKey(3))
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
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


def test_int8_act_serving_matches_fp32_boxes():
    """quantize='int8_act' (int8 MXU conv compute, dynamic activation
    scales — models.layers.Int8Act) keeps detections close to fp32.
    Activation quantization adds more noise than weight-only int8, so the
    match criteria are looser but still bound the error."""
    net = build_network("yolo_mobilev1", SPEC.in_hw, SPEC.nanchors,
                        SPEC.class_num, alpha=0.25)
    variables = net.init(jax.random.PRNGKey(3))
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    kw = dict(obj_thresh=0.1, iou_thresh=0.3, max_out=10)
    fp32 = Predictor(net, variables, SPEC, **kw)
    i8a = Predictor(net, variables, SPEC, quantize="int8_act", **kw)

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
    net = build_network("yolo_mobilev1", SPEC.in_hw, SPEC.nanchors,
                        SPEC.class_num, alpha=0.25)
    variables = net.init(jax.random.PRNGKey(1))
    fq = {"params": fake_quant_tree(variables["params"]),
          "batch_stats": variables["batch_stats"]}
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    outs = net.apply(variables, x, train=False)
    outs_q = net.apply(fq, x, train=False)
    for o, oq in zip(outs, outs_q):
        # raw head logits stay close under weight-only int8
        assert float(jnp.max(jnp.abs(o - oq))) < 0.25
        rel = float(jnp.abs(o - oq).mean() / (jnp.abs(o).mean() + 1e-9))
        assert rel < 0.05, rel


def test_predictor_rejects_unknown_quantize_mode():
    net = build_network("yolo_mobilev1", SPEC.in_hw, SPEC.nanchors,
                        SPEC.class_num, alpha=0.25)
    variables = net.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        Predictor(net, dict(variables), SPEC, quantize="int4")
