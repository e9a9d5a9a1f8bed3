"""Fused decode+NMS kernel vs the two-stage (decode -> NMS) path."""

import numpy as np
import pytest

import jax.numpy as jnp

from k210_yolo_framework_tpu.config import YoloSpec
from k210_yolo_framework_tpu.ops import decode as D
from k210_yolo_framework_tpu.ops.nms_pallas import batched_nms_pallas
from k210_yolo_framework_tpu.ops.yolo_head_pallas import fused_decode_nms


def _spec(classes=6):
    rng = np.random.default_rng(2)
    anchors = np.sort(rng.uniform(0.05, 0.9, (2, 3, 2)).astype(np.float32))[:, ::-1]
    return YoloSpec.create((224, 320), ((7, 10), (14, 20)), classes, anchors)


@pytest.mark.parametrize("class_softmax", [False, True])
# seed 1 re-runs the same compiled programs on a second random tensor —
# extra NMS-pattern coverage, but not worth the fast-shard interpreter time
@pytest.mark.parametrize("seed", [0, pytest.param(1, marks=pytest.mark.slow)])
def test_fused_matches_two_stage(seed, class_softmax):
    spec = _spec()
    rng = np.random.default_rng(seed)
    B = 3
    preds = [jnp.asarray(rng.normal(0, 2, (B, h, w, 3, 5 + spec.class_num))
                         .astype(np.float32)) for h, w in spec.out_hws]
    img_hws = jnp.asarray(rng.integers(100, 512, (B, 2)).astype(np.int32))

    res_f = fused_decode_nms(preds, spec, img_hws, 0.3, 0.45, 30,
                             class_softmax=class_softmax)

    import jax
    def two_stage(pl0, pl1, hw):
        return D.decode_outputs([pl0, pl1], spec, hw, class_softmax)
    b, s = jax.vmap(two_stage)(preds[0], preds[1], img_hws)
    res_t = batched_nms_pallas(b, s, 0.3, 0.45, 30)

    np.testing.assert_array_equal(np.asarray(res_f.valid), np.asarray(res_t.valid))
    np.testing.assert_allclose(np.asarray(res_f.scores), np.asarray(res_t.scores),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_f.boxes), np.asarray(res_t.boxes),
                               rtol=1e-3, atol=0.05)


def test_fused_empty():
    spec = _spec()
    B = 2
    preds = [jnp.full((B, h, w, 3, 5 + spec.class_num), -10.0, jnp.float32)
             for h, w in spec.out_hws]
    img_hws = jnp.asarray(np.tile([300, 400], (B, 1)).astype(np.int32))
    res = fused_decode_nms(preds, spec, img_hws, 0.7, 0.3, 30)
    assert not np.asarray(res.valid).any()


@pytest.mark.slow
def test_fused_three_scale_adaptive_grouping():
    """darknet53-style 3-scale specs exceed the 8-images-per-program VMEM
    envelope (found on-chip: 4480 candidates x 8 images = 25.5 MB scoped
    VMEM vs the 16 MB limit); fused_decode_nms now scales images-per-program
    down with the candidate count.  This spec pads to 2304 candidates -> G=4;
    results must still match the two-stage path exactly."""
    rng = np.random.default_rng(5)
    anchors = np.sort(rng.uniform(0.05, 0.9, (3, 3, 2)).astype(np.float32))[:, ::-1]
    spec = YoloSpec.create((192, 192), ((6, 6), (12, 12), (24, 24)), 6, anchors)

    B = 6  # not a multiple of G=4: exercises the batch padding too
    preds = [jnp.asarray(rng.normal(0, 2, (B, h, w, 3, 5 + spec.class_num))
                         .astype(np.float32)) for h, w in spec.out_hws]
    img_hws = jnp.asarray(rng.integers(100, 512, (B, 2)).astype(np.int32))

    res_f = fused_decode_nms(preds, spec, img_hws, 0.3, 0.45, 30)

    import jax
    def two_stage(p0, p1, p2, hw):
        return D.decode_outputs([p0, p1, p2], spec, hw, False)
    b, s = jax.vmap(two_stage)(preds[0], preds[1], preds[2], img_hws)
    res_t = batched_nms_pallas(b, s, 0.3, 0.45, 30)

    np.testing.assert_array_equal(np.asarray(res_f.valid), np.asarray(res_t.valid))
    np.testing.assert_allclose(np.asarray(res_f.scores), np.asarray(res_t.scores),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_f.boxes), np.asarray(res_t.boxes),
                               rtol=1e-3, atol=0.05)


def test_fused_pallas_interpret_plumbing_matches_twin():
    """interpret='pallas' emulates the REAL fused-kernel plumbing (grid over
    G-image blocks, lbox [1, G, 8] reshape, BlockSpec index maps) off-TPU and
    must agree with the pure-jnp twin — covers the wiring the twin shares no
    code with, including the G-padding path (B=3 not a multiple of G)."""
    spec = _spec(classes=3)
    rng = np.random.default_rng(9)
    B = 3
    preds = [jnp.asarray(rng.normal(0, 2, (B, h, w, 3, 5 + spec.class_num))
                         .astype(np.float32)) for h, w in spec.out_hws]
    img_hws = jnp.asarray(rng.integers(100, 512, (B, 2)).astype(np.int32))

    res_t = fused_decode_nms(preds, spec, img_hws, 0.7, 0.3, 30,
                             interpret=True)
    res_p = fused_decode_nms(preds, spec, img_hws, 0.7, 0.3, 30,
                             interpret="pallas", images_per_program=2)
    np.testing.assert_array_equal(np.asarray(res_p.valid), np.asarray(res_t.valid))
    np.testing.assert_allclose(np.asarray(res_p.scores), np.asarray(res_t.scores),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res_p.boxes), np.asarray(res_t.boxes),
                               rtol=1e-5, atol=1e-4)
