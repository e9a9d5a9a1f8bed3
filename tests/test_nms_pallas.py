"""Pallas NMS kernel vs the XLA fallback vs a numpy greedy reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from k210_yolo_framework_tpu.ops.nms import batched_nms
from k210_yolo_framework_tpu.ops.nms_pallas import batched_nms_pallas


def _greedy_reference(boxes, scores, score_thresh, iou_thresh, max_out):
    """Plain-python per-class tf.image.non_max_suppression semantics."""
    out = []
    for c in range(scores.shape[1]):
        sc = scores[:, c]
        cand = [i for i in np.argsort(-sc, kind="stable") if sc[i] >= score_thresh]
        kept = []
        for i in cand:
            if len(kept) >= max_out:
                break
            ok = True
            for j in kept:
                ymin = max(boxes[i, 0], boxes[j, 0])
                xmin = max(boxes[i, 1], boxes[j, 1])
                ymax = min(boxes[i, 2], boxes[j, 2])
                xmax = min(boxes[i, 3], boxes[j, 3])
                inter = max(ymax - ymin, 0) * max(xmax - xmin, 0)
                a1 = max(boxes[i, 2] - boxes[i, 0], 0) * max(boxes[i, 3] - boxes[i, 1], 0)
                a2 = max(boxes[j, 2] - boxes[j, 0], 0) * max(boxes[j, 3] - boxes[j, 1], 0)
                union = a1 + a2 - inter
                if union > 0 and inter / union > iou_thresh:
                    ok = False
                    break
            if ok:
                kept.append(i)
        out.append([(i, sc[i]) for i in kept])
    return out


def _make_case(seed, n=200, c=6, sparse=True):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 180, (n, 2))
    wh = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)  # yxyx
    if sparse:
        scores = rng.uniform(0, 0.69, (n, c))
        hot = rng.uniform(0, 1, (n, c)) < 0.05
        scores = np.where(hot, rng.uniform(0.7, 1.0, (n, c)), scores)
    else:
        scores = rng.uniform(0, 1, (n, c))
    # distinct scores keep argsort ties away from float-equality edge cases
    scores = (scores + np.arange(n)[:, None] * 1e-6).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("seed,sparse", [(0, True), (1, True), (2, False), (3, False)])
def test_pallas_matches_greedy_reference(seed, sparse):
    boxes, scores = _make_case(seed, sparse=sparse)
    res = batched_nms_pallas(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                             0.7, 0.45, 30)
    ref = _greedy_reference(boxes, scores, 0.7, 0.45, 30)
    got_valid = np.asarray(res.valid[0])
    got_scores = np.asarray(res.scores[0])
    got_boxes = np.asarray(res.boxes[0])
    got_classes = np.asarray(res.classes[0])
    for c, kept in enumerate(ref):
        sel = got_valid & (got_classes == c)
        assert sel.sum() == len(kept), f"class {c}: {sel.sum()} vs {len(kept)}"
        np.testing.assert_allclose(
            np.sort(got_scores[sel]), np.sort([s for _, s in kept]), rtol=1e-6)
        want_boxes = np.sort(boxes[[i for i, _ in kept]], axis=0)
        np.testing.assert_allclose(np.sort(got_boxes[sel], axis=0), want_boxes,
                                   rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 5])
def test_pallas_matches_xla_fallback(seed):
    boxes, scores = _make_case(seed, n=300, c=8)
    b = jnp.asarray(boxes)[None]
    s = jnp.asarray(scores)[None]
    res_p = batched_nms_pallas(b, s, 0.7, 0.3, 30)
    res_x = batched_nms(b, s, 0.7, 0.3, 30, top_k=300)
    np.testing.assert_array_equal(np.asarray(res_p.valid), np.asarray(res_x.valid))
    np.testing.assert_allclose(np.asarray(res_p.scores), np.asarray(res_x.scores),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res_p.boxes), np.asarray(res_x.boxes),
                               rtol=1e-5)


def test_pallas_empty_input():
    boxes, scores = _make_case(7)
    scores = scores * 0.0 + 0.1  # everything below threshold
    res = batched_nms_pallas(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                             0.7, 0.3, 30)
    assert not np.asarray(res.valid).any()
    assert (np.asarray(res.scores) == 0).all()
