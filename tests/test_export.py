"""Export artifacts: StableHLO round-trips and executes; all 4 builders
survive one train step (grad/shape smoke across the whole zoo)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import TrainConfig, YoloSpec
from k210_yolo_framework_tpu.export import export_stablehlo
from k210_yolo_framework_tpu.models import build_network
from k210_yolo_framework_tpu.ops import codec as C
from k210_yolo_framework_tpu.training import train as T

import shared


def _tiny_spec(layers=2, classes=4):
    rng = np.random.default_rng(0)
    anchors = np.sort(rng.uniform(0.1, 0.8, (layers, 3, 2)).astype(np.float32))[:, ::-1]
    grids = ((3, 3), (6, 6), (12, 12))[:layers]
    return YoloSpec.create((96, 96), grids, classes, anchors)


def test_stablehlo_roundtrip_executes():
    spec = _tiny_spec()
    net, variables = shared.net_and_vars("yolo_mobilev1", spec.in_hw,
                                         spec.nanchors, spec.class_num,
                                         alpha=0.5)
    blob = export_stablehlo(net, variables, batch=2)
    assert len(blob) > 1000

    from jax import export as jexport
    restored = jexport.deserialize(bytearray(blob))
    x = jnp.zeros((2, 96, 96, 3), jnp.float32)
    outs = restored.call(x)
    want = net.apply_raw(variables, x)
    for o, w in zip(outs, want):
        np.testing.assert_allclose(np.asarray(o), np.asarray(w), rtol=1e-6)


def test_serving_stablehlo_roundtrip():
    """The uint8-in/boxes-out serving program exports and replays."""
    from k210_yolo_framework_tpu.export import export_serving_stablehlo
    from k210_yolo_framework_tpu.inference import Predictor

    spec = _tiny_spec()
    net, variables = shared.net_and_vars("yolo_mobilev1", spec.in_hw,
                                         spec.nanchors, spec.class_num,
                                         alpha=0.5)
    pred = Predictor(net, variables, spec, obj_thresh=0.05,
                     compute_dtype=jnp.float32)
    blob = export_serving_stablehlo(pred, batch=2)

    from jax import export as jexport
    restored = jexport.deserialize(bytearray(blob))
    rng = np.random.default_rng(0)
    canv = jnp.asarray(rng.integers(0, 256, (2, 96, 96, 3)).astype(np.uint8))
    hws = jnp.asarray(np.tile([80, 96], (2, 1)).astype(np.int32))
    boxes, scores, classes, valid = restored.call(canv, hws)
    # reference result from the same (XLA-NMS) math the artifact embeds;
    # the artifact now NMSes the FULL decoded candidate pool by default,
    # exactly like the live Predictor's Pallas kernel (ADVICE round 2).
    from k210_yolo_framework_tpu.ops import decode as D, letterbox as LB, nms as N
    def one(canvas, hw):
        img = LB.letterbox_image(canvas, hw, spec.in_hw, dtype=jnp.float32)
        return LB.normalize_image(img)
    imgs = jax.vmap(one)(canv, hws)
    preds = net.apply(pred.variables, imgs)
    b, s = jax.vmap(lambda p0, p1, hw: D.decode_outputs([p0, p1], spec, hw, False))(
        preds[0], preds[1], hws)
    full_k = sum(hw[0] * hw[1] * spec.nanchors for hw in spec.out_hws)
    want = N.batched_nms(b, s, 0.05, pred.iou_thresh, pred.max_out,
                         top_k=full_k)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(want.valid))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(want.scores),
                               rtol=1e-5, atol=1e-6)


def test_exported_artifact_matches_live_pallas_serving():
    """Low-threshold parity between the LIVE Predictor (Pallas fused
    decode+NMS) and the exported artifact (portable XLA NMS): with both
    paths now NMSing the FULL candidate pool, a dense 0.05-threshold scene
    must produce the same surviving detections (same valid mask, scores to
    fp tolerance) — the cross-implementation check the round-2 review asked
    for (advisor finding: parity was asserted only at default thresholds)."""
    from k210_yolo_framework_tpu.export import export_serving_stablehlo
    from k210_yolo_framework_tpu.inference import Predictor

    spec = _tiny_spec()
    net, variables = shared.net_and_vars("yolo_mobilev1", spec.in_hw,
                                         spec.nanchors, spec.class_num,
                                         alpha=0.5)
    pred = Predictor(net, variables, spec, obj_thresh=0.05, iou_thresh=0.45,
                     max_out=30, compute_dtype=jnp.float32)
    blob = export_serving_stablehlo(pred, batch=2)

    from jax import export as jexport
    restored = jexport.deserialize(bytearray(blob))
    rng = np.random.default_rng(3)
    canv = jnp.asarray(rng.integers(0, 256, (2, 96, 96, 3)).astype(np.uint8))
    hws = jnp.asarray(np.tile([80, 96], (2, 1)).astype(np.int32))
    boxes_a, scores_a, classes_a, valid_a = restored.call(canv, hws)

    live = pred._run_batch(pred.variables, canv, hws)
    np.testing.assert_array_equal(np.asarray(valid_a), np.asarray(live.valid))
    va = np.asarray(valid_a)
    np.testing.assert_allclose(np.asarray(scores_a)[va],
                               np.asarray(live.scores)[va],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(boxes_a)[va],
                               np.asarray(live.boxes)[va],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(classes_a)[va],
                                  np.asarray(live.classes)[va])


def test_serving_stablehlo_int8_keeps_quantized_weights():
    """A quantized Predictor's serving artifact embeds the INT8 kernels
    (dequant inside the program) — it must be much smaller than the fp32
    artifact and replay the quantized math exactly."""
    from k210_yolo_framework_tpu.export import export_serving_stablehlo
    from k210_yolo_framework_tpu.inference import Predictor
    from k210_yolo_framework_tpu.quantize import dequantize_tree

    spec = _tiny_spec()
    net, variables = shared.net_and_vars("yolo_mobilev1", spec.in_hw,
                                         spec.nanchors, spec.class_num,
                                         alpha=0.5)
    fp = Predictor(net, variables, spec, obj_thresh=0.05,
                   compute_dtype=jnp.float32)
    q = Predictor(net, variables, spec, obj_thresh=0.05,
                  compute_dtype=jnp.float32, quantize="int8")
    blob_fp = export_serving_stablehlo(fp, batch=2)
    blob_q = export_serving_stablehlo(q, batch=2)
    assert len(blob_q) < 0.6 * len(blob_fp), (
        f"int8 artifact {len(blob_q)} not much smaller than fp32 {len(blob_fp)}")

    from jax import export as jexport
    restored = jexport.deserialize(bytearray(blob_q))
    rng = np.random.default_rng(0)
    canv = jnp.asarray(rng.integers(0, 256, (2, 96, 96, 3)).astype(np.uint8))
    hws = jnp.asarray(np.tile([80, 96], (2, 1)).astype(np.int32))
    _, scores, _, valid = restored.call(canv, hws)
    # same math computed live from the dequantized tree (XLA-NMS flavor)
    from k210_yolo_framework_tpu.ops import decode as D, letterbox as LB, nms as N
    deq = {**q.variables, "params": dequantize_tree(q.variables["params"])}
    def one(canvas, hw):
        img = LB.letterbox_image(canvas, hw, spec.in_hw, dtype=jnp.float32)
        return LB.normalize_image(img)
    imgs = jax.vmap(one)(canv, hws)
    preds = net.apply(deq, imgs)
    b, s = jax.vmap(lambda p0, p1, hw: D.decode_outputs([p0, p1], spec, hw, False))(
        preds[0], preds[1], hws)
    full_k = sum(hw[0] * hw[1] * spec.nanchors for hw in spec.out_hws)
    want = N.batched_nms(b, s, 0.05, q.iou_thresh, q.max_out,
                         top_k=full_k)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(want.valid))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(want.scores),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "name,layers",
    [("yolo_mobilev1", 2),
     # v2's inverted-residual grad graph is the second-slowest compile in the
     # fast suite (~40 s); its train step is also covered by the config
     # matrix (test_config_matrix.py cfg3) — slow shard
     pytest.param("yolo_mobilev2", 2, marks=pytest.mark.slow),
     ("tiny_yolo", 2),
     # darknet53's grad compile is ~2 min alone on this 1-core rig — slow shard
     pytest.param("yolo", 3, marks=pytest.mark.slow)])
def test_all_builders_one_train_step(name, layers):
    spec = _tiny_spec(layers)
    cfg = TrainConfig(batch_size=2)
    net = build_network(name, spec.in_hw, spec.nanchors, spec.class_num,
                        alpha=0.75)
    state = T.create_train_state(net, cfg, jax.random.PRNGKey(0))
    step = T.make_train_step(net, spec, cfg, train_epoch_step=10)

    rng = np.random.default_rng(1)
    B = 2
    boxes = np.concatenate([
        rng.integers(0, spec.class_num, (B, 2, 1)).astype(np.float32),
        rng.uniform(0.3, 0.7, (B, 2, 2)), rng.uniform(0.1, 0.3, (B, 2, 2))],
        -1).astype(np.float32)
    labels = C.encode_labels_batch(jnp.asarray(boxes), jnp.ones((B, 2), bool), spec)
    images = jnp.asarray(rng.uniform(0, 1, (B, 96, 96, 3)).astype(np.float32))
    state, logs = step(state, images, labels)
    assert np.isfinite(float(logs["loss"]))


def test_serving_stablehlo_int8_act_roundtrip():
    """The int8-act (MXU int8 compute, affine zero-point activations)
    serving program must export to StableHLO and replay: the dynamic
    quantization is ordinary traced ops, so the artifact embeds the whole
    scheme (smoke: executes, shapes/dtypes right, scores thresholded)."""
    from k210_yolo_framework_tpu.export import export_serving_stablehlo
    from k210_yolo_framework_tpu.inference import Predictor

    spec = _tiny_spec()
    net, variables = shared.net_and_vars("yolo_mobilev1", spec.in_hw,
                                         spec.nanchors, spec.class_num,
                                         alpha=0.5)
    pred = Predictor(net, variables, spec, obj_thresh=0.05,
                     compute_dtype=jnp.float32, quantize="int8_act")
    blob = export_serving_stablehlo(pred, batch=2)

    from jax import export as jexport
    restored = jexport.deserialize(bytearray(blob))
    rng = np.random.default_rng(1)
    canv = jnp.asarray(rng.integers(0, 256, (2, 96, 96, 3)).astype(np.uint8))
    hws = jnp.asarray(np.tile([80, 96], (2, 1)).astype(np.int32))
    boxes, scores, classes, valid = restored.call(canv, hws)
    assert np.asarray(valid).dtype == np.bool_
    assert np.asarray(boxes).shape[0] == 2
    # scores of surviving detections are finite and thresholded
    v = np.asarray(valid)
    if v.any():
        s = np.asarray(scores)[v]
        assert np.isfinite(s).all() and (s >= 0.05 - 1e-6).all()
