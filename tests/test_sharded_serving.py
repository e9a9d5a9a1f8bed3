"""Data-parallel serving over the virtual 8-device mesh == single-device."""

import numpy as np

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
