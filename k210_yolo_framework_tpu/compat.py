"""``Helper`` — migration facade with the reference's API surface.

The reference's central object is ``tools.utils.Helper``
(/root/reference/tools/utils.py:53-521): constructed from the annotation
npy + anchor npy, it owns the train/test split, the label codec, the image
pipeline, and drawing.  Code written against it migrates by switching the
import; each method delegates to this framework's pure functional pieces
(config.YoloSpec, ops.codec, ops.letterbox, data.pipeline).

Method-for-method parity notes are in each docstring; device-side batching
(``set_dataset``/``train_dataset``) yields numpy-convertible batches like
the reference's tf.data datasets did.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import YoloSpec
from k210_yolo_framework_tpu.data import annotations as ANN
from k210_yolo_framework_tpu.data import pipeline as PL
from k210_yolo_framework_tpu.ops import codec as C
from k210_yolo_framework_tpu.ops import letterbox as LB

__all__ = ["Helper"]


class Helper:
    """Reference-compatible facade (utils.py:54-105 constructor contract)."""

    def __init__(self, image_ann: Optional[str], class_num: int,
                 anchors: Optional[str], in_hw: Tuple[int, int],
                 out_hw, validation_split: float = 0.1):
        self.class_num = class_num
        self.validation_split = validation_split
        if np.ndim(out_hw) == 2:  # [[h, w], ...] — any number of layers
            out_hws = tuple(tuple(int(v) for v in row) for row in np.asarray(out_hw))
        else:  # flat [h0, w0, h1, w1, ...]
            flat = [int(v) for v in np.asarray(out_hw).ravel()]
            out_hws = tuple(zip(flat[0::2], flat[1::2]))
        if anchors is not None:
            self.spec = YoloSpec.from_files(anchors, in_hw=tuple(in_hw),
                                            out_hws=tuple(out_hws),
                                            class_num=class_num)
            self.anchors = self.spec.anchors_np()
        else:
            self.spec = None
            self.anchors = None
        self.in_hw = tuple(in_hw)

        self.train_list: Optional[np.ndarray] = None
        self.test_list: Optional[np.ndarray] = None
        if image_ann is not None:
            ann = ANN.load_ann_list(image_ann)
            # reference split: first n = test, rest = train (utils.py:64-69)
            self.train_list, self.test_list = ANN.split_train_test(
                ann, validation_split)

        self.train_dataset: Optional[Iterator] = None
        self.test_dataset: Optional[Iterator] = None
        self.train_epoch_step = 0
        self.test_epoch_step = 0

    # ------------------------------------------------------- label codec --

    def box_to_label(self, true_box: np.ndarray) -> List[np.ndarray]:
        """[n, 5] normalized (class, x, y, w, h) -> per-layer grid labels
        (utils.py:207-230)."""
        boxes, valid = C.pad_boxes(np.asarray(true_box, np.float32))
        labels = C.encode_labels(jnp.asarray(boxes), jnp.asarray(valid), self.spec)
        return [np.asarray(l) for l in labels]

    def label_to_box(self, labels, thresh: float = 0.7) -> np.ndarray:
        """Inverse of box_to_label (utils.py:293-307): returns [n, 5]."""
        rows, valid = C.decode_labels(
            [jnp.asarray(l) for l in labels], self.spec, thresh)
        return np.asarray(rows)[np.asarray(valid)]

    # ----------------------------------------------------- image pipeline --

    def _read_img(self, path: str) -> np.ndarray:
        """skimage-equivalent read: uint8 RGB, alpha dropped, gray promoted
        (utils.py:339-355)."""
        return ANN.read_image(path)

    def _process_img(self, img: np.ndarray, true_box: Optional[np.ndarray] = None,
                     is_training: bool = False, is_resize: bool = True,
                     rng: Optional[jax.Array] = None):
        """Letterbox (+ augment when training) + /max normalize
        (utils.py:357-406).  Returns (img f32 [in_h, in_w, 3], boxes)."""
        hw = jnp.asarray(img.shape[:2], jnp.int32)
        out = img
        boxes = None if true_box is None else np.asarray(true_box, np.float32)
        if is_resize:
            out = LB.letterbox_image(jnp.asarray(img), hw, self.in_hw)
            if boxes is not None:
                boxes = np.asarray(LB.letterbox_boxes(
                    jnp.asarray(boxes), hw, self.in_hw))
        if is_training:
            from k210_yolo_framework_tpu.ops import augment as A
            if rng is None:
                # fresh key per call — the reference randomized through
                # imgaug's global RNG; a constant key here would silently
                # apply ONE fixed transform to every image
                if not hasattr(self, "_aug_key"):
                    self._aug_key = jax.random.PRNGKey(
                        int(np.random.SeedSequence().entropy % (2 ** 31)))
                self._aug_key, rng = jax.random.split(self._aug_key)
            padded, valid = C.pad_boxes(boxes if boxes is not None
                                        else np.zeros((0, 5), np.float32))
            out, padded, valid = A.augment_image_and_boxes(
                rng, jnp.asarray(out), jnp.asarray(padded), jnp.asarray(valid))
            boxes = np.asarray(padded)[np.asarray(valid)]
        out = LB.normalize_image(jnp.asarray(out, jnp.float32))
        return np.asarray(out), boxes

    # ---------------------------------------------------------- datasets --

    def set_dataset(self, batch_size: int, rand_seed: int = 0,
                    is_training: bool = True):
        """Build infinite (images, labels) iterators like utils.py:445-450."""
        def make(ann_list, training):
            pipe = PL.DataPipeline(ann_list, batch_size, rand_seed)
            pp = PL.make_preprocess_fn(self.spec, is_training=training)
            key = jax.random.PRNGKey(rand_seed)

            def gen(key=key):
                for hb in pipe:
                    key, k = jax.random.split(key)
                    imgs, labels = pp(jnp.asarray(hb.canvases),
                                      jnp.asarray(hb.img_hws),
                                      jnp.asarray(hb.boxes),
                                      jnp.asarray(hb.valid), k)
                    yield imgs, labels
            return gen(), pipe.epoch_step

        self.batch_size = batch_size
        self.train_dataset, self.train_epoch_step = make(self.train_list, is_training)
        # the reference repeat()s before batching, so even a test list
        # smaller than one batch yields full batches forever — only an
        # EMPTY list has no dataset
        if self.test_list is not None and len(self.test_list) > 0:
            self.test_dataset, self.test_epoch_step = make(self.test_list, False)

    # ------------------------------------------------------------- drawing --

    def draw_box(self, img: np.ndarray, true_box: np.ndarray) -> np.ndarray:
        """Rectangles + class ids on the image (utils.py:458-491); boxes are
        normalized (class, x, y, w, h).  Returns the drawn copy (the
        reference mutated in place and showed a window)."""
        from k210_yolo_framework_tpu.inference import Detections, draw_detections
        h, w = img.shape[:2]
        tb = np.asarray(true_box, np.float32)
        cy, cx = tb[:, 2] * h, tb[:, 1] * w
        bh, bw = tb[:, 4] * h, tb[:, 3] * w
        boxes = np.stack([cy - bh / 2, cx - bw / 2, cy + bh / 2, cx + bw / 2], 1)
        det = Detections(boxes, np.ones(len(tb)), tb[:, 0].astype(int))
        return draw_detections(img, det)

    # --------------------------------------------------- coord transforms --

    def center_to_corner(self, boxes: np.ndarray,
                         to_all_scale: bool = True) -> np.ndarray:
        """(x, y, w, h) -> (x1, y1, x2, y2), scaled to pixels when
        ``to_all_scale`` (utils.py:493-506)."""
        from k210_yolo_framework_tpu.ops.boxes import center_to_corner as f
        return np.asarray(f(jnp.asarray(boxes, jnp.float32),
                            in_hw=self.in_hw if to_all_scale else None))

    def corner_to_center(self, boxes: np.ndarray,
                         from_all_scale: bool = True) -> np.ndarray:
        """(x1, y1, x2, y2) -> (x, y, w, h) (utils.py:508-521)."""
        from k210_yolo_framework_tpu.ops.boxes import corner_to_center as f
        return np.asarray(f(jnp.asarray(boxes, jnp.float32),
                            in_hw=self.in_hw if from_all_scale else None))
