"""Sharded serving over the virtual 8-device mesh == single-device.

Pure-DP meshes serve via shard_map (each chip runs the whole fused pipeline
on its batch shard); TP/SP meshes serve under GSPMD with the SAME sharding
rules as the sharded train step (parallel.mesh.param_shardings /
image_sharding) — both must reproduce the single-device detections."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import YoloSpec
from k210_yolo_framework_tpu.inference import Predictor
from k210_yolo_framework_tpu.parallel import make_mesh

import shared


def test_sharded_runner_matches_local():
    anchors = np.array([[[0.7, 0.6], [0.5, 0.5], [0.4, 0.3]],
                        [[0.3, 0.3], [0.2, 0.2], [0.15, 0.15]]], np.float32)
    spec = YoloSpec.create((96, 96), ((3, 3), (6, 6)), 5, anchors)
    net, variables = shared.net_and_vars("yolo_mobilev1", spec.in_hw,
                                         spec.nanchors, spec.class_num,
                                         alpha=0.5)
    pred = Predictor(net, variables, spec, obj_thresh=0.05, iou_thresh=0.45)

    rng = np.random.default_rng(0)
    B = 16
    canv = jnp.asarray(rng.integers(0, 256, (B, 128, 128, 3)).astype(np.uint8))
    hws = jnp.asarray(np.tile([100, 128], (B, 1)).astype(np.int32))

    local = pred._run_batch(pred.variables, canv, hws)

    mesh = make_mesh(dp=8, mp=1)
    runner = pred.make_sharded_runner(mesh)
    sharded = runner(canv, hws)

    np.testing.assert_array_equal(np.asarray(local.valid), np.asarray(sharded.valid))
    np.testing.assert_allclose(np.asarray(local.scores), np.asarray(sharded.scores),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(local.boxes), np.asarray(sharded.boxes),
                               rtol=1e-4, atol=1e-3)


def _iou(x, y):
    ymin, xmin = max(x[0], y[0]), max(x[1], y[1])
    ymax, xmax = min(x[2], y[2]), min(x[3], y[3])
    inter = max(ymax - ymin, 0) * max(xmax - xmin, 0)
    ax = (x[2] - x[0]) * (x[3] - x[1])
    ay = (y[2] - y[0]) * (y[3] - y[1])
    return inter / max(ax + ay - inter, 1e-9)


def _match_fraction(a, b, iou_min=0.5, score_tol=0.05):
    """Greedy class+IoU+score detection-set matching, a -> b."""
    va, vb = np.asarray(a.valid), np.asarray(b.valid)
    total = matched = 0
    for i in range(va.shape[0]):
        rows_b = list(zip(np.asarray(b.boxes)[i, vb[i]],
                          np.asarray(b.scores)[i, vb[i]],
                          np.asarray(b.classes)[i, vb[i]]))
        for box, score, cls in zip(np.asarray(a.boxes)[i, va[i]],
                                   np.asarray(a.scores)[i, va[i]],
                                   np.asarray(a.classes)[i, va[i]]):
            total += 1
            matched += any(
                cls == c2 and _iou(box, b2) >= iou_min
                and abs(score - s2) < score_tol
                for b2, s2, c2 in rows_b)
    return matched / max(total, 1), total


@pytest.mark.parametrize(
    "dp,mp,sp",
    [(4, 2, 1),
     pytest.param(4, 1, 2, marks=pytest.mark.slow),
     pytest.param(2, 2, 2, marks=pytest.mark.slow)],
    ids=["dp4tp2", "dp4sp2", "dp2tp2sp2"])
def test_model_axis_sharded_serving_matches_local(dp, mp, sp):
    """TP/SP-mesh serving equivalence (round-3 review item 5): the GSPMD
    serving program with channel-sharded kernels / H-sharded images must
    reproduce the single-device detections.  Bitwise parity is NOT the bar:
    channel/space sharding splits the NEXT conv's cin reduction into a psum,
    whose fp32 reordering moves activations at the ulp level — a
    score-tied/IoU-borderline NMS decision can then legitimately flip
    (measured: 2 of 1200 boxes on this seed).  Detection SETS must agree to
    >= 99% both directions, scores/valid near-exactly."""
    anchors = np.array([[[0.7, 0.6], [0.5, 0.5], [0.4, 0.3]],
                        [[0.3, 0.3], [0.2, 0.2], [0.15, 0.15]]], np.float32)
    spec = YoloSpec.create((96, 96), ((3, 3), (6, 6)), 5, anchors)
    net, variables = shared.net_and_vars("yolo_mobilev1", spec.in_hw,
                                         spec.nanchors, spec.class_num,
                                         alpha=1.0)  # alpha 1: channels >=128 exist to TP-shard
    pred = Predictor(net, variables, spec, obj_thresh=0.05, iou_thresh=0.45)

    rng = np.random.default_rng(1)
    B = 8
    canv = jnp.asarray(rng.integers(0, 256, (B, 128, 128, 3)).astype(np.uint8))
    hws = jnp.asarray(np.tile([100, 128], (B, 1)).astype(np.int32))

    local = pred._run_batch(pred.variables, canv, hws)

    mesh = make_mesh(dp=dp, mp=mp, sp=sp)
    if mp > 1:
        # this config genuinely exercises TP: at least one conv kernel is
        # wide enough for the channel-sharding rule to engage
        from k210_yolo_framework_tpu.parallel.mesh import param_shardings
        specs = jax.tree.leaves(param_shardings(variables["params"], mesh))
        assert any("model" in str(s.spec) for s in specs)
    runner = pred.make_sharded_runner(mesh)
    sharded = runner(canv, hws)

    np.testing.assert_array_equal(np.asarray(local.valid),
                                  np.asarray(sharded.valid))
    np.testing.assert_allclose(np.asarray(local.scores),
                               np.asarray(sharded.scores),
                               rtol=1e-4, atol=1e-5)
    f_ab, n_a = _match_fraction(local, sharded, score_tol=1e-3)
    f_ba, n_b = _match_fraction(sharded, local, score_tol=1e-3)
    assert n_a > 0
    assert f_ab >= 0.99, (f_ab, n_a)
    assert f_ba >= 0.99, (f_ba, n_b)


@pytest.mark.slow
def test_sharded_int8_act_runner_matches_local():
    """int8-act serving under DP sharding stays within quantization noise of
    the single-device program.  Bitwise parity is NOT achievable here: the
    sharded convs' fp32 reduction order differs at the ulp level, and a
    value sitting on a rounding boundary then flips a whole int8 quantum —
    so borderline detections may differ.  What must hold: the two programs
    run, and their detection SETS agree for the overwhelming majority
    (greedy class+IoU+score matching, both directions)."""
    anchors = np.array([[[0.7, 0.6], [0.5, 0.5], [0.4, 0.3]],
                        [[0.3, 0.3], [0.2, 0.2], [0.15, 0.15]]], np.float32)
    spec = YoloSpec.create((96, 96), ((3, 3), (6, 6)), 5, anchors)
    net, variables = shared.net_and_vars("yolo_mobilev1", spec.in_hw,
                                         spec.nanchors, spec.class_num,
                                         alpha=0.5)
    pred = Predictor(net, variables, spec, obj_thresh=0.05, iou_thresh=0.45,
                     quantize="int8_act", compute_dtype=jnp.float32)

    rng = np.random.default_rng(2)
    B = 16
    canv = jnp.asarray(rng.integers(0, 256, (B, 128, 128, 3)).astype(np.uint8))
    hws = jnp.asarray(np.tile([100, 128], (B, 1)).astype(np.int32))

    local = pred._run_batch(pred.variables, canv, hws)
    runner = pred.make_sharded_runner(make_mesh(dp=8, mp=1))
    sharded = runner(canv, hws)

    f_ab, n_a = _match_fraction(local, sharded)
    f_ba, n_b = _match_fraction(sharded, local)
    assert n_a > 0
    assert f_ab >= 0.9, (f_ab, n_a)
    assert f_ba >= 0.9, (f_ba, n_b)
