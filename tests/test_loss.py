"""Loss parity with the numpy golden transliteration (incl. zero-gt images)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import voc_spec
from k210_yolo_framework_tpu.ops import codec as C
from k210_yolo_framework_tpu.training import loss as L

import functools

import golden

SPEC = voc_spec()
HP = dict(obj_thresh=0.7, iou_thresh=0.3, obj_weight=5.0, noobj_weight=0.5, wh_weight=0.5)


@functools.lru_cache(maxsize=None)
def _jit_layer_loss(l, batch):
    """Jitted per (layer, batch): eager-mode ignore-mask IoU over the full
    VOC grids costs seconds per call on 1-core XLA:CPU; the compiled form
    rides the persistent cache across runs."""
    return jax.jit(lambda t, p: L.yolo_layer_loss(t, p, l, SPEC, batch, **HP))


@functools.lru_cache(maxsize=None)
def _jit_total_loss(batch):
    return jax.jit(lambda ts, ps: L.yolo_loss(ts, ps, SPEC, batch, **HP))


def make_batch(rng, batch, boxes_per_img):
    """Random labels via the (already golden-verified) encoder + random preds."""
    y_trues = [np.zeros((batch, *SPEC.out_hws[l], 3, 25), np.float32)
               for l in range(SPEC.nlayers)]
    for b in range(batch):
        n = boxes_per_img[b]
        cls = rng.integers(0, 20, n)
        wh = rng.uniform(0.05, 0.9, (n, 2))
        xy = rng.uniform(0.05, 0.95, (n, 2))
        bx = np.concatenate([cls[:, None], xy, wh], 1).astype(np.float32)
        lab = golden.box_to_label(bx, SPEC.anchors_np(), SPEC.out_hws, SPEC.class_num)
        for l in range(SPEC.nlayers):
            y_trues[l][b] = lab[l]
    y_preds = [rng.normal(0, 1, yt.shape).astype(np.float32) * 0.5 for yt in y_trues]
    return y_trues, y_preds


@pytest.mark.parametrize("boxes_per_img", [[3, 1, 5, 2], [0, 4, 0, 7], [0, 0, 0, 0]])
def test_layer_loss_matches_golden(boxes_per_img):
    rng = np.random.default_rng(42)
    batch = len(boxes_per_img)
    y_trues, y_preds = make_batch(rng, batch, boxes_per_img)

    for l in range(SPEC.nlayers):
        want = golden.yolo_loss(y_trues[l], y_preds[l], SPEC.out_hws[l],
                                SPEC.anchors_np()[l], batch, **HP)
        got = _jit_layer_loss(l, batch)(jnp.asarray(y_trues[l]),
                                        jnp.asarray(y_preds[l]))
        np.testing.assert_allclose(float(got), want, rtol=2e-4)


def test_total_loss_is_sum_of_layers():
    rng = np.random.default_rng(3)
    y_trues, y_preds = make_batch(rng, 2, [2, 3])
    total = _jit_total_loss(2)([jnp.asarray(y) for y in y_trues],
                               [jnp.asarray(y) for y in y_preds])
    parts = sum(_jit_layer_loss(l, 2)(jnp.asarray(y_trues[l]),
                                      jnp.asarray(y_preds[l]))
                for l in range(SPEC.nlayers))
    np.testing.assert_allclose(float(total), float(parts), rtol=1e-6)


def test_loss_is_differentiable_and_finite():
    rng = np.random.default_rng(5)
    y_trues, y_preds = make_batch(rng, 2, [1, 0])

    def f(preds):
        return L.yolo_loss([jnp.asarray(t) for t in y_trues], preds, SPEC, 2, **HP)

    g = jax.jit(jax.grad(f))([jnp.asarray(p) for p in y_preds])
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()


def test_ignore_mask_zero_gt_all_ones():
    """Empty gt: reference reduce_max over empty -> -inf -> mask all 1."""
    y_true = jnp.zeros((7, 10, 3, 25))
    pxy = jnp.full((7, 10, 3, 2), 0.5)
    pwh = jnp.full((7, 10, 3, 2), 0.3)
    m = L.calc_ignore_mask(y_true, pxy, pwh, 0.7, 0.3)
    assert np.asarray(m).min() == 1.0


def test_ignore_mask_suppresses_overlapping_preds():
    rng = np.random.default_rng(11)
    bx = np.array([[2, 0.5, 0.5, 0.3, 0.3]], np.float32)
    lab = golden.box_to_label(bx, SPEC.anchors_np(), SPEC.out_hws, SPEC.class_num)
    l = int(np.argmax([la[..., 4].sum() for la in lab]))
    y_true = lab[l]
    # predictions exactly on the gt box everywhere -> IoU 1 -> mask 0
    pxy = jnp.full(y_true.shape[:-1] + (2,), 0.5)
    pwh = jnp.full(y_true.shape[:-1] + (2,), 0.3)
    m = L.calc_ignore_mask(jnp.asarray(y_true), pxy, pwh, 0.7, 0.3)
    assert np.asarray(m).max() == 0.0


def test_l2_penalty_targets_darknet_convs_only():
    k = jnp.ones((3, 3, 4, 8))
    params = {
        "head": {"y1_conv": {"dark_conv_bn": {"conv": {"kernel": k}}}},
        "backbone": {"block_1": {"pw": {"conv": {"kernel": k}}}},
    }
    got = float(L.l2_penalty(params))
    np.testing.assert_allclose(got, 5e-4 * float(jnp.sum(k ** 2)), rtol=1e-6)
