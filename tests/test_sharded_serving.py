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


from k210_yolo_framework_tpu.utils.detmatch import match_stats  # noqa: E402


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
    (measured: 2 of 1200 boxes on this seed).  The assert pins the MEASURED
    bound — at most 0.5% flipped detections either direction (6 of 1200; a
    real TP-sharding regression flipping 1% fails) — and score agreement to
    1e-3 on the geometrically matched set."""
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
    un_ab, n_a, ds_ab = match_stats(local, sharded)
    un_ba, n_b, ds_ba = match_stats(sharded, local)
    assert n_a > 0
    # measured flip rate is 2/1200 on this seed; allow <= 0.5%, never more
    assert un_ab <= max(1, int(np.ceil(0.005 * n_a))), (un_ab, n_a)
    assert un_ba <= max(1, int(np.ceil(0.005 * n_b))), (un_ba, n_b)
    # matched pairs must agree in score (the flip is geometric, not numeric)
    assert max(ds_ab, ds_ba) <= 1e-3, (ds_ab, ds_ba)


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

    un_ab, n_a, _ = match_stats(local, sharded, score_tol=0.05)
    un_ba, n_b, _ = match_stats(sharded, local, score_tol=0.05)
    assert n_a > 0
    assert un_ab / n_a <= 0.1, (un_ab, n_a)
    assert un_ba / max(n_b, 1) <= 0.1, (un_ba, n_b)
