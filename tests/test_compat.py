"""compat.Helper: the reference's Helper API surface on our stack."""

import numpy as np
import pytest

from k210_yolo_framework_tpu.compat import Helper


@pytest.fixture(scope="module")
def helper():
    return Helper("data/synth_img_ann.npy", 20, "data/synth_anchor.npy",
                  (224, 320), np.array([[7, 10], [14, 20]]),
                  validation_split=0.2)


def test_split_like_reference(helper):
    n = len(helper.train_list) + len(helper.test_list)
    assert len(helper.test_list) == int(n * 0.2)


def test_box_label_roundtrip(helper):
    boxes = np.array([[3.0, 0.4, 0.5, 0.2, 0.3],
                      [11.0, 0.7, 0.3, 0.1, 0.15]], np.float32)
    labels = helper.box_to_label(boxes)
    assert labels[0].shape == (7, 10, 3, 25)
    assert labels[1].shape == (14, 20, 3, 25)
    back = helper.label_to_box(labels)
    assert back.shape[0] == 2
    got = back[np.argsort(back[:, 0])]
    want = boxes[np.argsort(boxes[:, 0])]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_process_img(helper):
    img = helper._read_img(str(helper.train_list[0][0]))
    out, boxes = helper._process_img(img, np.copy(helper.train_list[0][1]),
                                     is_training=False, is_resize=True)
    assert out.shape == (224, 320, 3)
    assert 0.99 <= out.max() <= 1.0  # img / max(img), utils.py:404-405
    assert boxes is not None and boxes.shape[1] == 5


def test_datasets(helper):
    helper.set_dataset(batch_size=4, rand_seed=1, is_training=False)
    imgs, labels = next(helper.train_dataset)
    assert imgs.shape == (4, 224, 320, 3)
    assert labels[0].shape == (4, 7, 10, 3, 25)
    assert helper.train_epoch_step == len(helper.train_list) // 4


def test_draw_box_and_transforms(helper):
    img = np.zeros((100, 200, 3), np.uint8)
    tb = np.array([[0.0, 0.5, 0.5, 0.3, 0.4]], np.float32)
    out = helper.draw_box(img, tb)
    assert out.shape == img.shape and out.any()

    xywh = np.array([[0.5, 0.5, 0.2, 0.4]], np.float32)
    corner = helper.center_to_corner(xywh, to_all_scale=True)
    np.testing.assert_allclose(corner, [[0.4 * 320, 0.3 * 224,
                                         0.6 * 320, 0.7 * 224]], rtol=1e-6)
    back = helper.corner_to_center(corner, from_all_scale=True)
    np.testing.assert_allclose(back, xywh, rtol=1e-6)
