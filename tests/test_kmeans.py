"""kmeans anchors: IoU distance, layer ordering, npy format, NaN behavior."""

import numpy as np

import jax.numpy as jnp

from k210_yolo_framework_tpu.anchors import generate_anchors, kmeans_iou, letterbox_correct_boxes


def _ann(n=40, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n):
        h, w = rng.integers(200, 500, 2)
        nb = rng.integers(1, 5)
        boxes = np.hstack([rng.integers(0, 20, (nb, 1)).astype(float),
                           rng.uniform(0.3, 0.7, (nb, 2)),
                           rng.uniform(0.05, 0.6, (nb, 2))])
        rows.append(np.array(["x.jpg", boxes, np.array([h, w])], dtype=object))
    return np.array(rows, dtype=object)


def test_letterbox_correct_matches_reference_math():
    ann = _ann(3)
    whs = letterbox_correct_boxes(ann, (224, 320))
    row = ann[0]
    img_wh = np.asarray(row[2], float)[::-1]
    in_wh = np.array([320, 224], float)
    scale = np.min(in_wh / img_wh)
    want = np.asarray(row[1])[:, 3:5] * img_wh * scale / in_wh
    np.testing.assert_allclose(whs[:len(want)], want, rtol=1e-9)


def test_kmeans_clusters_two_blobs():
    rng = np.random.default_rng(1)
    a = rng.normal([0.1, 0.1], 0.01, (100, 2))
    b = rng.normal([0.6, 0.6], 0.01, (100, 2))
    x = jnp.asarray(np.vstack([a, b]).astype(np.float32))
    init = jnp.asarray([[0.2, 0.2], [0.5, 0.5]], jnp.float32)
    cents, idx = kmeans_iou(x, init, iters=10)
    cents = np.asarray(cents)
    cents = cents[np.argsort(cents[:, 0])]
    np.testing.assert_allclose(cents[0], [0.1, 0.1], atol=0.02)
    np.testing.assert_allclose(cents[1], [0.6, 0.6], atol=0.02)


def test_generate_anchors_shape_and_order():
    ann = _ann(50, seed=2)
    anchors = generate_anchors(ann, (224, 320), layers=2, anchor_num=3, seed=5,
                               is_random=False)
    assert anchors.shape == (2, 3, 2)
    flat = anchors.reshape(-1, 2)
    # sorted descending by w: layer 0 gets the biggest (make_anchor_list.py:211-213)
    assert all(flat[i, 0] >= flat[i + 1, 0] for i in range(5))
    assert not np.any(np.isnan(anchors))
    # format round-trips through YoloSpec
    from k210_yolo_framework_tpu.config import YoloSpec
    spec = YoloSpec.create((224, 320), ((7, 10), (14, 20)), 20, anchors)
    assert spec.nanchors == 3


def test_empty_cluster_gives_nan_like_reference():
    x = jnp.asarray(np.full((10, 2), 0.5, np.float32))
    init = jnp.asarray([[0.5, 0.5], [99.0, 99.0]], jnp.float32)  # unreachable centroid
    cents, _ = kmeans_iou(x, init, iters=2)
    # an emptied cluster poisons the result with NaN -> the CLI warns
    # "please Rerun" exactly like make_anchor_list.py:216-217
    assert np.isnan(np.asarray(cents)).any()


def test_kmeans_history_and_sink():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0.05, 0.9, (60, 2)).astype(np.float32))
    init = jnp.asarray(rng.uniform(0.1, 0.8, (4, 2)).astype(np.float32))
    cents, _, hist = kmeans_iou(x, init, iters=7, return_history=True)
    assert hist.shape == (7, 4, 2)
    np.testing.assert_array_equal(np.asarray(hist[-1]), np.asarray(cents))

    ann = _ann(50, seed=2)
    sink = []
    anchors = generate_anchors(ann, (224, 320), layers=2, anchor_num=3, seed=5,
                               is_random=False, history_sink=sink)
    assert len(sink) == 1
    pts, hist = sink[0]
    assert pts.ndim == 2 and pts.shape[1] == 2
    assert hist.shape[1:] == (6, 2)
    # final history frame holds the (unsorted) winning centroids
    got = np.array(sorted(hist[-1].tolist()))
    want = np.array(sorted(anchors.reshape(-1, 2).tolist()))
    np.testing.assert_allclose(got, want, rtol=1e-6)
