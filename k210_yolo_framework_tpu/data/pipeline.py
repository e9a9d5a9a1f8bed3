"""Input pipeline: threaded host JPEG decode + one fused on-device step.

The reference keeps ALL per-sample work (letterbox warp, imgaug, /max
normalize, label gridding) in a GIL-bound ``py_function`` numpy parser
(/root/reference/tools/utils.py:417-443).  TPU-first redesign:

  host threads:   JPEG decode only -> fixed-size zero canvas + true (h, w)
                  + padded gt boxes.  No resampling, no augment on host.
  device (jit):   ONE batched fused function does letterbox (traced-size
                  scale_and_translate), OneOf augmentation, per-image /max
                  normalization and the grid label encode — all under one
                  XLA program per batch.

Shuffle/repeat semantics mirror utils.py:432-441: infinite pass over the
list with a seeded shuffle each epoch, ``drop_remainder`` batching.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from k210_yolo_framework_tpu.config import YoloSpec
from k210_yolo_framework_tpu.data.annotations import read_image
from k210_yolo_framework_tpu.ops import augment as A
from k210_yolo_framework_tpu.ops import codec as C
from k210_yolo_framework_tpu.ops import letterbox as LB

__all__ = ["HostBatch", "make_preprocess_fn", "stage_image", "DataPipeline",
           "synthetic_ann_list"]

# Staging canvas: must cover the raw dataset (VOC images are <= 500px/side).
CANVAS_HW = (512, 512)


class HostBatch(NamedTuple):
    """What the host hands the device, all fixed-shape."""

    canvases: np.ndarray  # [B, canvas_h, canvas_w, 3] uint8
    img_hws: np.ndarray   # [B, 2] int32 true (h, w)
    boxes: np.ndarray     # [B, MAX_BOXES, 5] float32 (class, x, y, w, h)
    valid: np.ndarray     # [B, MAX_BOXES] bool


def stage_image(img: np.ndarray, canvas_hw: Tuple[int, int]):
    """Top-left place into a zero canvas; oversized images are pre-shrunk on
    host (bilinear) to fit — only metadata changes, the device letterbox
    still sees one consistent (image, true size) pair."""
    h, w = img.shape[:2]
    ch, cw = canvas_hw
    if h > ch or w > cw:
        s = min(ch / h, cw / w)
        nh, nw = max(1, int(h * s)), max(1, int(w * s))
        img = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
        h, w = nh, nw
    canvas = np.zeros((ch, cw, 3), np.uint8)
    canvas[:h, :w] = img
    return canvas, np.array([h, w], np.int32)


def make_preprocess_fn(spec: YoloSpec, is_training: bool, canvas_hw=CANVAS_HW,
                       dtype=None):
    """Build the fused on-device preprocessing function.

    (canvases u8 [B,Ch,Cw,3], img_hws [B,2], boxes [B,N,5], valid [B,N], key)
      -> (images [B,in_h,in_w,3], labels tuple per layer)

    Order matches ``Helper._process_img`` (utils.py:357-406): letterbox ->
    augment (train only) -> /max normalize; then ``box_to_label``.

    ``dtype`` sets the image pixel dtype handed to augment/normalize
    (default fp32).  Pass ``jnp.bfloat16`` when the net computes in bf16:
    letterboxed pixels are integers (exact in bf16) and the augment shears
    run 2.3x faster.  The letterbox's coordinate math is always fp32 (see
    its docstring), and all box/label math stays fp32.
    """
    dtype = dtype or jnp.float32

    def letterbox_one(canvas, img_hw, boxes):
        img = LB.letterbox_image(canvas, img_hw, spec.in_hw, dtype=dtype)
        return img, LB.letterbox_boxes(boxes, img_hw, spec.in_hw)

    def encode_one(img, boxes, valid):
        return LB.normalize_image(img), tuple(C.encode_labels(boxes, valid, spec))

    def batched(canvases, img_hws, boxes, valid, key):
        imgs, boxes = jax.vmap(letterbox_one)(canvases, img_hws, boxes)
        if is_training:
            # batch-level: the stratified OneOf splits the batch into
            # static per-branch slices (see augment_batch docstring)
            imgs, boxes, valid = A.augment_batch(key, imgs, boxes, valid)
        return jax.vmap(encode_one)(imgs, boxes, valid)

    return jax.jit(batched)


class DataPipeline:
    """Seeded, infinite, threaded loader over an annotation list.

    ``__iter__`` yields :class:`HostBatch`; call the jitted preprocess fn on
    the result (the train loop owns device placement/sharding).
    """

    def __init__(self, ann_list: np.ndarray, batch_size: int, seed: int,
                 canvas_hw=CANVAS_HW, num_workers: Optional[int] = None,
                 prefetch: int = 4, use_native: Optional[bool] = None):
        if len(ann_list) == 0:
            raise ValueError("empty annotation list")
        if num_workers is None:
            # decode is CPU-bound: more threads than cores only adds
            # context-switch thrash (this rig has a single visible core)
            import os
            num_workers = min(8, max(2, os.cpu_count() or 1))
        self.ann_list = ann_list
        self.batch_size = batch_size
        self.seed = seed
        self.canvas_hw = canvas_hw
        self.num_workers = num_workers
        self.prefetch = prefetch
        # steps per epoch == total // batch (utils.py:449-450)
        self.epoch_step = len(ann_list) // batch_size
        if use_native is None:  # auto: C++ loader when the lib builds
            from k210_yolo_framework_tpu import native
            use_native = native.available()
        self.use_native = use_native

    def _load_one(self, row) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        path, boxes, _hw = row
        img = read_image(str(path))
        canvas, img_hw = stage_image(img, self.canvas_hw)
        padded, valid = C.pad_boxes(np.copy(boxes))
        return canvas, img_hw, padded, valid

    def _index_stream(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed)
        while True:
            order = rng.permutation(len(self.ann_list))
            for i in order:
                yield int(i)

    def _iter_native(self) -> Iterator[HostBatch]:
        """C++ loader path: decode/stage in native worker threads (GIL-free);
        only the tiny gt-box padding stays host-Python."""
        from k210_yolo_framework_tpu.native import NativeLoader

        loader = NativeLoader([str(r[0]) for r in self.ann_list],
                              self.canvas_hw, self.batch_size, self.seed,
                              self.num_workers, self.prefetch)
        try:
            while True:
                canvases, hws, idxs = loader.next()
                padded, valid = zip(*(C.pad_boxes(np.copy(self.ann_list[i][1]))
                                      for i in idxs))
                yield HostBatch(canvases, hws, np.stack(padded), np.stack(valid))
        finally:
            loader.close()

    def __iter__(self) -> Iterator[HostBatch]:
        if self.use_native:
            yield from self._iter_native()
            return
        stream = self._index_stream()
        # no context manager: when the consumer drops an infinite generator,
        # __exit__'s blocking join would run during GeneratorExit/interpreter
        # teardown and die noisily — shut down non-blocking instead
        pool = ThreadPoolExecutor(self.num_workers)
        try:
            pending = []
            def submit_batch():
                idxs = [next(stream) for _ in range(self.batch_size)]
                return [pool.submit(self._load_one, self.ann_list[i]) for i in idxs]

            for _ in range(self.prefetch):
                pending.append(submit_batch())
            while True:
                futs = pending.pop(0)
                pending.append(submit_batch())
                items = [f.result() for f in futs]
                canvases, img_hws, boxes, valid = (np.stack(x) for x in zip(*items))
                yield HostBatch(canvases, img_hws, boxes, valid)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


def synthetic_ann_list(tmpdir: str, n: int = 24, class_num: int = 20,
                       seed: int = 0) -> np.ndarray:
    """Tiny self-contained dataset for tests/benches: random JPEG-ish images
    on disk + random boxes, in the exact npy row format."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h = int(rng.integers(200, 500))
        w = int(rng.integers(200, 500))
        # photo-like content (smooth fields + mild noise), NOT uniform noise:
        # noise JPEGs are a Huffman-decode worst case ~3x slower than real
        # photos, which would skew any loader benchmark pessimistic
        yy = np.linspace(0, 3 * np.pi, h)[:, None]
        xx = np.linspace(0, 3 * np.pi, w)[None, :]
        phase = rng.uniform(0, np.pi, (3,))
        base = np.stack([np.sin(yy + p) * np.cos(xx - p) for p in phase], -1)
        img = ((base * 0.5 + 0.5) * 220 + rng.normal(0, 6, (h, w, 3)))
        img = np.clip(img, 0, 255).astype(np.uint8)
        path = f"{tmpdir}/img_{i}.jpg"
        Image.fromarray(img).save(path, quality=90)
        nb = int(rng.integers(1, 6))
        cls = rng.integers(0, class_num, (nb, 1)).astype(float)
        xy = rng.uniform(0.2, 0.8, (nb, 2))
        wh = rng.uniform(0.1, 0.4, (nb, 2))
        rows.append(np.array([path, np.hstack([cls, xy, wh]), np.array([h, w])], dtype=object))
    return np.array(rows, dtype=object)
