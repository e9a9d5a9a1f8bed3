"""Codec parity: jnp encode/decode/transforms vs numpy golden reference math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import voc_spec, YoloSpec
from k210_yolo_framework_tpu.ops import boxes as B
from k210_yolo_framework_tpu.ops import codec as C

import golden


def random_boxes(rng, n):
    """[n, 5] (class, x, y, w, h) with xywh in sane [0,1] ranges."""
    cls = rng.integers(0, 20, n)
    wh = rng.uniform(0.05, 0.9, (n, 2))
    xy = rng.uniform(0.05, 0.95, (n, 2))
    return np.concatenate([cls[:, None], xy, wh], axis=1).astype(np.float32)


SPEC = voc_spec()


def test_centered_iou_matches_golden():
    rng = np.random.default_rng(0)
    a = rng.uniform(0.01, 1, (17, 2)).astype(np.float32)
    got = np.asarray(B.centered_iou(jnp.asarray(a)[:, None, None, :],
                                    jnp.asarray(SPEC.anchors_np())[None]))
    want = golden.fake_iou(a[:, None, None, :], SPEC.anchors_np()[None])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_iou_xywh_matches_golden():
    rng = np.random.default_rng(1)
    pxy = rng.uniform(0, 1, (7, 10, 3, 2))
    pwh = rng.uniform(0.01, 1, (7, 10, 3, 2))
    vxy = rng.uniform(0, 1, (5, 2))
    vwh = rng.uniform(0.01, 1, (5, 2))
    got = np.asarray(B.iou_xywh(jnp.asarray(pxy), jnp.asarray(pwh),
                                jnp.asarray(vxy), jnp.asarray(vwh)))
    want = golden.iou_xywh(pxy, pwh, vxy, vwh)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("seed,n", [(0, 1), (1, 5), (2, 23), (3, 0)])
def test_encode_labels_matches_golden(seed, n):
    rng = np.random.default_rng(seed)
    bx = random_boxes(rng, n)
    want = golden.box_to_label(bx, SPEC.anchors_np(), SPEC.out_hws, SPEC.class_num)

    padded, valid = C.pad_boxes(bx)
    got = jax.jit(lambda b, v: C.encode_labels(b, v, SPEC))(padded, valid)
    for l in range(SPEC.nlayers):
        np.testing.assert_allclose(np.asarray(got[l]), want[l], atol=1e-6)


def test_encode_overwrite_order_matches_reference():
    """Two boxes landing in the same (cell, anchor): the LAST one wins, like
    the reference's sequential loop (utils.py:222-228)."""
    b1 = np.array([[3, 0.51, 0.51, 0.4, 0.4], [7, 0.52, 0.52, 0.41, 0.41]], np.float32)
    want = golden.box_to_label(b1, SPEC.anchors_np(), SPEC.out_hws, SPEC.class_num)
    padded, valid = C.pad_boxes(b1)
    got = C.encode_labels(jnp.asarray(padded), jnp.asarray(valid), SPEC)
    for l in range(SPEC.nlayers):
        np.testing.assert_allclose(np.asarray(got[l]), want[l], atol=1e-6)


def test_encode_edge_box_does_not_alias_other_cells():
    """x == 1.0 puts a box at column idx == w (dropped, as in the reference
    loop).  Its FLATTENED slot id must not alias cell (idy+1, 0) and mark a
    real box there as overwritten (regression for the vectorized encode)."""
    anchors = SPEC.anchors_np()
    # pick anchor (layer, a) for a given wh by running the assigner once
    wh = np.array([0.3, 0.3], np.float32)
    li, ai = C.assign_anchor(jnp.asarray(wh)[None], jnp.asarray(anchors))
    l, a = int(li[0]), int(ai[0])
    h, w = SPEC.out_hws[l]
    # box A: valid, at cell (2, 0); box B LATER with x=1.0 at row 1 -> its
    # slot id (1*w + w)*na + a would alias A's (2*w + 0)*na + a
    ax = 0.5 / w
    ay = 2.5 / h
    bx = 1.0
    by = 1.5 / h
    boxes = np.array([[3, ax, ay, wh[0], wh[1]],
                      [7, bx, by, wh[0], wh[1]]], np.float32)
    padded, valid = C.pad_boxes(boxes)
    got = C.encode_labels(jnp.asarray(padded), jnp.asarray(valid), SPEC)
    cell = np.asarray(got[l][2, 0, a])
    assert cell[4] == 1.0, "edge box aliased away a real box's label"
    assert cell[5 + 3] == 1.0 and cell[5 + 7] == 0.0


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(7)
    bx = random_boxes(rng, 6)
    padded, valid = C.pad_boxes(bx)
    labels = C.encode_labels(jnp.asarray(padded), jnp.asarray(valid), SPEC)
    out, out_valid = C.decode_labels(labels, SPEC, thresh=0.7)
    got = np.asarray(out)[np.asarray(out_valid)]
    # Round trip recovers (class, clipped xywh) for every distinct cell.
    want = set()
    lab = golden.box_to_label(bx, SPEC.anchors_np(), SPEC.out_hws, SPEC.class_num)
    for l in lab:
        ys, xs, ns = np.where(l[..., 4] > 0.7)
        for y, x, n in zip(ys, xs, ns):
            row = l[y, x, n]
            want.add((int(np.argmax(row[5:])), *np.round(row[:4], 5)))
    got_set = {(int(r[0]), *np.round(r[1:], 5)) for r in got}
    assert got_set == want


def test_grid_transforms_roundtrip_and_match_golden():
    rng = np.random.default_rng(3)
    for l in range(SPEC.nlayers):
        h, w = SPEC.out_hws[l]
        gxy = rng.normal(size=(h, w, 3, 2)).astype(np.float32)
        gwh = rng.normal(size=(h, w, 3, 2)).astype(np.float32) * 0.5
        axy, awh = C.xywh_grid_to_all(jnp.asarray(gxy), jnp.asarray(gwh), l, SPEC)
        wxy, wwh = golden.xywh_to_all(gxy, gwh, SPEC.out_hws[l], SPEC.anchors_np()[l])
        np.testing.assert_allclose(np.asarray(axy), wxy, rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(awh), wwh, rtol=2e-5, atol=1e-6)
        # inverse: all -> grid recovers wh exactly; xy recovers too
        bxy, bwh = C.xywh_all_to_grid(axy, awh, l, SPEC)
        np.testing.assert_allclose(np.asarray(bwh), gwh, rtol=1e-3, atol=5e-4)
        gt = golden.xywh_to_grid(np.asarray(axy, np.float64), np.asarray(awh, np.float64),
                                 SPEC.out_hws[l], SPEC.anchors_np()[l])
        np.testing.assert_allclose(np.asarray(bxy), gt[0], rtol=1e-3, atol=5e-4)


def test_center_corner_roundtrip():
    rng = np.random.default_rng(9)
    xywh = rng.uniform(0.1, 0.8, (11, 4)).astype(np.float32)
    corner = B.center_to_corner(jnp.asarray(xywh), in_hw=SPEC.in_hw)
    back = B.corner_to_center(corner, in_hw=SPEC.in_hw)
    np.testing.assert_allclose(np.asarray(back), xywh, rtol=1e-5, atol=1e-6)


def test_spec_construction():
    s = YoloSpec.create((224, 320), (7, 10, 14, 20), 20, SPEC.anchors_np())
    assert s.out_hws == ((7, 10), (14, 20))
    assert s.nlayers == 2 and s.nanchors == 3 and s.nchannels == 25
    assert s.xy_offset(0).shape == (7, 10, 1, 2)
    assert s.xy_offset(1)[3, 5, 0].tolist() == [5.0, 3.0]
    np.testing.assert_allclose(s.grid_wh(0), [1 / 10, 1 / 7], rtol=1e-6)
    assert hash(voc_spec()) == hash(voc_spec())  # usable as a jit static arg
    assert hash(s) == hash(YoloSpec.create((224, 320), (7, 10, 14, 20), 20, SPEC.anchors_np()))
