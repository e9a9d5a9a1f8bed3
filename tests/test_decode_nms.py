"""Decode + per-class NMS vs golden math and greedy-NMS reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import voc_spec
from k210_yolo_framework_tpu.ops import decode as D
from k210_yolo_framework_tpu.ops import nms as N

import golden

SPEC = voc_spec()
IMAGE_HW = (375, 500)


def _preds(rng, batch=None):
    shapes = [(h, w, 3, 25) for h, w in SPEC.out_hws]
    if batch:
        shapes = [(batch,) + s for s in shapes]
    return [rng.normal(0, 1, s).astype(np.float32) for s in shapes]


def test_decode_layer_matches_golden():
    rng = np.random.default_rng(0)
    preds = _preds(rng)
    for l, p in enumerate(preds):
        boxes, scores = D.decode_layer(jnp.asarray(p), l, SPEC, IMAGE_HW)
        # golden: sigmoid cls * sigmoid conf; xywh_to_all; correct_box
        want_scores = (golden.sigmoid(p[..., 5:]) * golden.sigmoid(p[..., 4:5])).reshape(-1, 20)
        xy, wh = golden.xywh_to_all(p[..., 0:2], p[..., 2:4],
                                    SPEC.out_hws[l], SPEC.anchors_np()[l])
        want_boxes = golden.correct_box(xy, wh, SPEC.in_hw, IMAGE_HW).reshape(-1, 4)
        np.testing.assert_allclose(np.asarray(scores), want_scores, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(boxes), want_boxes, rtol=1e-3, atol=2e-3)


def test_decode_concat_order_and_count():
    rng = np.random.default_rng(1)
    preds = _preds(rng)
    boxes, scores = D.decode_outputs([jnp.asarray(p) for p in preds], SPEC, IMAGE_HW)
    assert boxes.shape == (D.num_candidates(SPEC), 4) == (1050, 4)
    assert scores.shape == (1050, 20)
    b0, _ = D.decode_layer(jnp.asarray(preds[0]), 0, SPEC, IMAGE_HW)
    np.testing.assert_allclose(np.asarray(boxes[:210]), np.asarray(b0), rtol=1e-6)


def test_softmax_variant_sums_to_conf():
    rng = np.random.default_rng(2)
    p = _preds(rng)[0]
    _, scores = D.decode_layer(jnp.asarray(p), 0, SPEC, IMAGE_HW, class_softmax=True)
    conf = golden.sigmoid(p[..., 4]).reshape(-1)
    np.testing.assert_allclose(np.asarray(scores).sum(-1), conf, rtol=1e-4, atol=1e-5)


def greedy_nms_ref(boxes, scores, score_thresh, iou_thresh, max_out):
    """Plain-python greedy NMS == tf.image.non_max_suppression semantics."""
    keep = []
    cand = [i for i in range(len(scores)) if scores[i] >= score_thresh]
    cand.sort(key=lambda i: -scores[i])
    for i in cand:
        ok = True
        for j in keep:
            yx1 = np.maximum(boxes[i, :2], boxes[j, :2])
            yx2 = np.minimum(boxes[i, 2:], boxes[j, 2:])
            inter = np.prod(np.maximum(yx2 - yx1, 0))
            a1 = np.prod(np.maximum(boxes[i, 2:] - boxes[i, :2], 0))
            a2 = np.prod(np.maximum(boxes[j, 2:] - boxes[j, :2], 0))
            union = a1 + a2 - inter
            if union > 0 and inter / union > iou_thresh:
                ok = False
                break
        if ok:
            keep.append(i)
            if len(keep) == max_out:
                break
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_per_class_nms_matches_greedy_reference(seed):
    rng = np.random.default_rng(seed)
    n, c = 60, 4
    # clustered boxes to force suppressions
    centers = rng.uniform(50, 300, (n, 2))
    sizes = rng.uniform(20, 80, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(np.float32)
    scores = rng.uniform(0, 1, (n, c)).astype(np.float32)

    res = N.per_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          score_thresh=0.5, iou_thresh=0.4, max_out=10)
    for cls in range(c):
        want = greedy_nms_ref(boxes, scores[:, cls], 0.5, 0.4, 10)
        sl = slice(cls * 10, (cls + 1) * 10)
        got_valid = np.asarray(res.valid[sl])
        got_boxes = np.asarray(res.boxes[sl])[got_valid]
        got_scores = np.asarray(res.scores[sl])[got_valid]
        assert len(got_boxes) == len(want)
        np.testing.assert_allclose(got_boxes, boxes[want], rtol=1e-5)
        np.testing.assert_allclose(got_scores, scores[want, cls], rtol=1e-5)
        assert np.all(np.asarray(res.classes[sl]) == cls)


def test_nms_empty_when_all_below_thresh():
    boxes = jnp.asarray(np.random.default_rng(0).uniform(0, 100, (20, 4)).astype(np.float32))
    scores = jnp.full((20, 3), 0.1, jnp.float32)
    res = N.per_class_nms(boxes, scores, score_thresh=0.7)
    assert not bool(np.asarray(res.valid).any())


def test_batched_nms_shape():
    rng = np.random.default_rng(4)
    boxes = jnp.asarray(rng.uniform(0, 300, (2, 50, 4)).astype(np.float32))
    scores = jnp.asarray(rng.uniform(0, 1, (2, 50, 20)).astype(np.float32))
    res = N.batched_nms(boxes, scores, max_out=30)
    assert res.boxes.shape == (2, 600, 4)
    assert res.valid.shape == (2, 600)
