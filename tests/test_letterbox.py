"""Letterbox warp + inverse parity with the golden numpy affine warp."""

import numpy as np
import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.ops import letterbox as L

import golden


def test_letterbox_params_truncation():
    scale, trans = L.letterbox_params(jnp.asarray([375, 500]), (224, 320))
    # scale = min(320/500, 224/375) = 0.5973..., translation truncated to int
    assert abs(float(scale) - min(320 / 500, 224 / 375)) < 1e-6
    want_t = ((np.array([320, 224]) - np.array([500, 375]) * float(scale)) / 2).astype(int)
    np.testing.assert_array_equal(np.asarray(trans), want_t)


def test_letterbox_image_matches_golden_warp():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    in_hw = (28, 40)
    got = np.asarray(L.letterbox_image(jnp.asarray(img), jnp.asarray(img.shape[:2]), in_hw))
    want = golden.letterbox_warp(img, in_hw)
    # bilinear resampling agrees to rounding of the final trunc
    assert (np.abs(got - want) <= 1.0).mean() > 0.995
    assert np.abs(got - want).max() <= 2.0


def test_letterbox_image_from_staging_canvas():
    """The warp must give identical output when the image is staged inside a
    larger zero canvas (the fixed-shape pipeline path)."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    canvas = np.zeros((64, 64, 3), np.uint8)
    canvas[:37, :53] = img
    in_hw = (28, 40)
    a = np.asarray(L.letterbox_image(jnp.asarray(img), jnp.asarray([37, 53]), in_hw))
    b = np.asarray(L.letterbox_image(jnp.asarray(canvas), jnp.asarray([37, 53]), in_hw))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_letterbox_boxes():
    img_hw = np.array([375, 500])
    boxes = np.array([[0, 0.5, 0.5, 0.2, 0.4]], np.float32)
    got = np.asarray(L.letterbox_boxes(jnp.asarray(boxes), jnp.asarray(img_hw), (224, 320)))
    scale = min(320 / 500, 224 / 375)
    t = ((np.array([320, 224]) - np.array([500, 375]) * scale) / 2).astype(int)
    want_xy = (boxes[0, 1:3] * [500, 375] * scale + t) / [320, 224]
    want_wh = boxes[0, 3:5] * [500, 375] * scale / [320, 224]
    np.testing.assert_allclose(got[0, 1:3], want_xy, rtol=1e-5)
    np.testing.assert_allclose(got[0, 3:5], want_wh, rtol=1e-5)


def test_normalize_is_per_image_max():
    img = jnp.asarray([[[10.0, 20.0, 200.0]]])
    out = np.asarray(L.normalize_image(img))
    np.testing.assert_allclose(out, [[[0.05, 0.1, 1.0]]], rtol=1e-6)


def test_correct_boxes_matches_golden():
    rng = np.random.default_rng(2)
    xy = rng.uniform(0, 1, (50, 2)).astype(np.float32)
    wh = rng.uniform(0.01, 1, (50, 2)).astype(np.float32)
    got = np.asarray(L.correct_boxes(jnp.asarray(xy), jnp.asarray(wh), (224, 320), (375, 500)))
    want = golden.correct_box(xy.astype(np.float64), wh.astype(np.float64), (224, 320), (375, 500))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_letterbox_jits_with_traced_size():
    """One compiled kernel handles any original size (traced img_hw)."""
    f = jax.jit(lambda c, hw: L.letterbox_image(c, hw, (28, 40)))
    rng = np.random.default_rng(3)
    canvas = jnp.asarray(rng.integers(0, 256, (64, 64, 3)).astype(np.uint8))
    o1 = f(canvas, jnp.asarray([37, 53]))
    o2 = f(canvas, jnp.asarray([64, 20]))
    assert o1.shape == o2.shape == (28, 40, 3)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_degenerate_aspect_yields_finite_boxes():
    """A 4000x8 strip rounds one letterbox extent to 0; the inverse must
    clamp (region_layer.cpp does) instead of emitting inf/NaN boxes."""
    from k210_yolo_framework_tpu.ops.yolo_head_pallas import \
        letterbox_inverse_params

    xy = jnp.asarray(np.full((4, 2), 0.5, np.float32))
    wh = jnp.asarray(np.full((4, 2), 0.1, np.float32))
    out = np.asarray(L.correct_boxes(xy, wh, (224, 320), (4000, 8)))
    assert np.isfinite(out).all()

    p = np.asarray(letterbox_inverse_params(
        jnp.asarray([[4000, 8], [375, 500]], jnp.int32), (224, 320)))
    assert np.isfinite(p).all()


def test_weightmat_resample_matches_public_scale_and_translate():
    """letterbox_image's explicit weight-mat resample (fp32 coords, dtype
    pixels) must match the public fp32 scale_and_translate bit-close in
    fp32 and within blend rounding in bf16."""
    rng = np.random.default_rng(7)
    canvas = jnp.asarray(rng.integers(0, 256, (96, 128, 3)).astype(np.uint8))
    for hw in ([77, 101], [96, 40], [30, 128]):
        got32 = L.letterbox_image(canvas, jnp.asarray(hw), (64, 80))
        # public-API oracle with identical convention
        from k210_yolo_framework_tpu.ops.letterbox import letterbox_params
        scale, tr = letterbox_params(jnp.asarray(hw), (64, 80))
        adj = 0.5 * (1.0 - scale)
        want = jax.image.scale_and_translate(
            canvas.astype(jnp.float32), shape=(64, 80, 3), spatial_dims=(0, 1),
            scale=jnp.stack([scale, scale]),
            translation=jnp.stack([tr[1] + adj, tr[0] + adj]),
            method="linear", antialias=False)
        want = jnp.clip(jnp.trunc(want), 0.0, 255.0)
        np.testing.assert_allclose(np.asarray(got32), np.asarray(want), atol=1e-3)

        got16 = L.letterbox_image(canvas, jnp.asarray(hw), (64, 80),
                                  dtype=jnp.bfloat16)
        # same sample positions; only the 2-tap blend rounds (then trunc)
        diff = np.abs(np.asarray(got16, np.float32) - np.asarray(want))
        assert diff.max() <= 2.0, f"bf16 blend drifted {diff.max()} at {hw}"
