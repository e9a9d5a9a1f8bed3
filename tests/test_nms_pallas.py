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


@pytest.mark.parametrize("stop_below,case", [
    (0.7, "sparse"),   # typical serving: exits after a few steps
    (0.7, "empty"),    # everything sub-threshold: exits at step 0
    (0.01, "dense"),   # eval-style low threshold: runs near-full
])
def test_early_exit_while_matches_unroll(stop_below, case):
    """The TPU path's early-exit while_loop and the interpret path's static
    unroll must agree exactly on every slot a caller keeps (score >=
    stop_below); sub-threshold slots differ only in post-masked content."""
    from k210_yolo_framework_tpu.ops.nms_pallas import greedy_select_loop

    rng = np.random.default_rng(17)
    n, c = 64, 4
    xy = rng.uniform(0, 120, (n, 2))
    # dense: big mutually-overlapping boxes so suppression dominates
    lo, hi = (40, 80) if case == "dense" else (10, 60)
    wh = rng.uniform(lo, hi, (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0, 0.5 if case == "empty" else 1.0,
                         (c, n)).astype(np.float32)

    y0, x0, y1, x1 = (jnp.asarray(boxes[:, i])[None, :] for i in range(4))
    args = (jnp.asarray(scores), y0, x0, y1, x1, 128, 30, 0.3)
    res_w = greedy_select_loop(*args, stop_below=stop_below, unroll=False)
    res_u = greedy_select_loop(*args, stop_below=stop_below, unroll=True)

    keep_w = np.asarray(res_w[0]) >= stop_below
    keep_u = np.asarray(res_u[0]) >= stop_below
    np.testing.assert_array_equal(keep_w, keep_u)
    assert keep_w.any() == (case != "empty")
    for a, b in zip(res_w, res_u):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_array_equal(np.where(keep_w, a, 0),
                                      np.where(keep_u, b, 0))


def test_nan_scores_stay_row_local():
    """A NaN score (e.g. a diverged checkpoint) must not abort the early-exit
    loop for the OTHER rows sharing the program: `jnp.max` over the per-row
    maxima would propagate the NaN and exit at step 0 dropping every
    detection; the any-row condition keeps healthy rows selecting."""
    boxes, scores = _make_case(11, n=64, c=3)
    scores[:, 2] = np.nan                      # one poisoned class row
    res = batched_nms_pallas(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                             0.7, 0.45, 30)
    ref = _greedy_reference(boxes, scores[:, :2], 0.7, 0.45, 30)
    got_valid = np.asarray(res.valid[0])
    got_classes = np.asarray(res.classes[0])
    for c, kept in enumerate(ref):
        assert (got_valid & (got_classes == c)).sum() == len(kept)
    assert not (got_valid & (got_classes == 2)).any()  # NaN row yields nothing


def test_pallas_interpret_plumbing_matches_twin():
    """The real pallas_call plumbing (BlockSpecs, index maps, ref stores),
    emulated off-TPU via interpret='pallas', must agree with the pure-jnp
    twin the CPU suite normally runs — covers the TPU-only wiring that the
    twin shares no code with."""
    boxes, scores = _make_case(4, n=40, c=3)
    b = jnp.asarray(boxes)[None]
    s = jnp.asarray(scores)[None]
    res_t = batched_nms_pallas(b, s, 0.7, 0.3, 30, interpret=True)
    res_p = batched_nms_pallas(b, s, 0.7, 0.3, 30, interpret="pallas")
    np.testing.assert_array_equal(np.asarray(res_p.valid), np.asarray(res_t.valid))
    np.testing.assert_allclose(np.asarray(res_p.scores), np.asarray(res_t.scores),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res_p.boxes), np.asarray(res_t.boxes),
                               rtol=1e-6)


def test_pallas_empty_input():
    boxes, scores = _make_case(7)
    scores = scores * 0.0 + 0.1  # everything below threshold
    res = batched_nms_pallas(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                             0.7, 0.3, 30)
    assert not np.asarray(res.valid).any()
    assert (np.asarray(res.scores) == 0).all()
