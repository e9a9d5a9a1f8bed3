"""Host loader + fused on-device preprocessing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import voc_spec
from k210_yolo_framework_tpu.data import annotations as ANN
from k210_yolo_framework_tpu.data import pipeline as PL

SPEC = voc_spec()


@pytest.fixture(scope="module")
def ann(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    return PL.synthetic_ann_list(str(d), n=12, seed=0)


def test_synthetic_ann_format(ann):
    assert ann.shape[0] == 12
    path, boxes, hw = ann[0]
    assert boxes.ndim == 2 and boxes.shape[1] == 5
    assert len(hw) == 2
    img = ANN.read_image(str(path))
    assert img.dtype == np.uint8 and img.shape[:2] == tuple(hw)


def test_split_train_test(ann):
    tr, te = ANN.split_train_test(ann, 0.25)
    assert len(te) == 3 and len(tr) == 9
    # reference split: FIRST n rows are test (utils.py:64-69)
    assert te[0][0] == ann[0][0]


def test_host_batches_fixed_shapes(ann):
    pipe = PL.DataPipeline(ann, batch_size=4, seed=3, num_workers=2, prefetch=1)
    assert pipe.epoch_step == 3
    it = iter(pipe)
    hb = next(it)
    assert hb.canvases.shape == (4, 512, 512, 3) and hb.canvases.dtype == np.uint8
    assert hb.img_hws.shape == (4, 2)
    assert hb.boxes.shape == (4, 64, 5)
    assert hb.valid.shape == (4, 64)
    hb2 = next(it)
    assert not np.array_equal(hb.img_hws, hb2.img_hws) or \
        not np.array_equal(hb.canvases, hb2.canvases)


def test_seeded_pipeline_deterministic(ann):
    a = next(iter(PL.DataPipeline(ann, 4, seed=7, num_workers=2, prefetch=1)))
    b = next(iter(PL.DataPipeline(ann, 4, seed=7, num_workers=2, prefetch=1)))
    np.testing.assert_array_equal(a.canvases, b.canvases)
    np.testing.assert_array_equal(a.boxes, b.boxes)


def test_preprocess_eval_mode(ann):
    pipe = PL.DataPipeline(ann, batch_size=4, seed=3, num_workers=2, prefetch=1)
    hb = next(iter(pipe))
    pp = PL.make_preprocess_fn(SPEC, is_training=False)
    imgs, labels = pp(jnp.asarray(hb.canvases), jnp.asarray(hb.img_hws),
                      jnp.asarray(hb.boxes), jnp.asarray(hb.valid),
                      jax.random.PRNGKey(0))
    assert imgs.shape == (4, 224, 320, 3)
    # per-image /max normalization -> max == 1 per image
    m = np.asarray(imgs).reshape(4, -1).max(1)
    np.testing.assert_allclose(m, 1.0, atol=1e-5)
    assert len(labels) == 2
    assert labels[0].shape == (4, 7, 10, 3, 25)
    assert labels[1].shape == (4, 14, 20, 3, 25)
    # every image had >= 1 box; encode must land >= 1 positive cell
    conf = sum(np.asarray(l[..., 4]).reshape(4, -1).sum(1) for l in labels)
    assert (conf >= 1).all()


def test_preprocess_train_mode_augments(ann):
    pipe = PL.DataPipeline(ann, batch_size=4, seed=3, num_workers=2, prefetch=1)
    hb = next(iter(pipe))
    pp = PL.make_preprocess_fn(SPEC, is_training=True)
    args = (jnp.asarray(hb.canvases), jnp.asarray(hb.img_hws),
            jnp.asarray(hb.boxes), jnp.asarray(hb.valid))
    i1, l1 = pp(*args, jax.random.PRNGKey(1))
    i2, l2 = pp(*args, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(i1), np.asarray(i2))
    i1b, _ = pp(*args, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i1b))


def test_preprocess_bf16_pixels_fp32_labels(ann):
    """dtype=bf16 speeds the pixel path; label/box math must stay fp32 and
    EXACTLY match the fp32 pipeline's labels."""
    pipe = PL.DataPipeline(ann, batch_size=4, seed=3, num_workers=2, prefetch=1)
    hb = next(iter(pipe))
    args = (jnp.asarray(hb.canvases), jnp.asarray(hb.img_hws),
            jnp.asarray(hb.boxes), jnp.asarray(hb.valid), jax.random.PRNGKey(1))
    i32, l32 = PL.make_preprocess_fn(SPEC, is_training=True)(*args)
    i16, l16 = PL.make_preprocess_fn(SPEC, is_training=True,
                                     dtype=jnp.bfloat16)(*args)
    assert i16.dtype == jnp.bfloat16 and i32.dtype == jnp.float32
    for a, b in zip(l32, l16):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # pixels equal to bf16 resolution (same math, lower precision)
    np.testing.assert_allclose(np.asarray(i16, dtype=np.float32),
                               np.asarray(i32), atol=0.02)


def test_oversized_image_staged(ann, tmp_path):
    big = PL.synthetic_ann_list(str(tmp_path), n=1, seed=1)
    # fake an oversized source by staging manually
    img = np.zeros((900, 700, 3), np.uint8)
    canvas, hw = PL.stage_image(img, (512, 512))
    assert canvas.shape == (512, 512, 3)
    assert hw[0] <= 512 and hw[1] <= 512
    assert abs(hw[0] / hw[1] - 900 / 700) < 0.01  # aspect preserved
