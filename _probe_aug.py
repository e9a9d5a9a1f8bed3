"""One-off: time the fused train-preprocess program (letterbox + OneOf
augment + /max + encode) alone, across batch sizes and augment variants —
chasing the round-4 anomaly: preprocess (fused - bare) is 31 us/img at
batch 64 but 73.5 us/img at batch 128.

Usage: python _probe_aug.py [variant ...]   (default: stratified at 64/128/256)
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import voc_spec
from k210_yolo_framework_tpu.data import pipeline as PL
from k210_yolo_framework_tpu.ops import augment as A

spec = voc_spec()


def time_pp(batch, mode="stratified", radix=None, iters=30, stages="all",
            tag="", rotate_impl=None):
    old_radix = A._SHEAR_RADIX
    old_rot = A.ROTATE_IMPL
    if radix is not None:
        A._SHEAR_RADIX = radix
    if rotate_impl is not None:
        A.ROTATE_IMPL = rotate_impl
    try:
        pp_raw = PL.make_preprocess_fn(spec, is_training=True,
                                       dtype=jnp.bfloat16)
        # rebuild with explicit mode by wrapping augment_batch
        def batched(canvases, img_hws, boxes, valid, key):
            from k210_yolo_framework_tpu.ops import codec as C
            from k210_yolo_framework_tpu.ops import letterbox as LB

            def letterbox_one(canvas, img_hw, bx):
                img = LB.letterbox_image(canvas, img_hw, spec.in_hw,
                                         dtype=jnp.bfloat16)
                return img, LB.letterbox_boxes(bx, img_hw, spec.in_hw)

            def encode_one(img, bx, vl):
                return LB.normalize_image(img), tuple(
                    C.encode_labels(bx, vl, spec))

            imgs, boxes2 = jax.vmap(letterbox_one)(canvases, img_hws, boxes)
            if stages == "letterbox":
                return imgs, ()
            if stages in ("all", "augment"):
                imgs, boxes2, valid2 = A.augment_batch(key, imgs, boxes2,
                                                       valid, mode=mode)
            else:
                valid2 = valid
            if stages == "augment":
                return imgs, ()
            return jax.vmap(encode_one)(imgs, boxes2, valid2)

        rng = np.random.default_rng(0)
        canv0 = rng.integers(0, 256, (batch, 512, 512, 3)).astype(np.uint8)
        hws = jnp.asarray(np.tile([360, 480], (batch, 1)).astype(np.int32))
        boxes = jnp.asarray(np.concatenate([
            rng.integers(0, 20, (batch, 64, 1)).astype(np.float32),
            rng.uniform(0.2, 0.8, (batch, 64, 2)),
            rng.uniform(0.1, 0.4, (batch, 64, 2))], -1).astype(np.float32))
        valid = jnp.asarray(np.zeros((batch, 64), bool)).at[:, :4].set(True)

        @jax.jit
        def step(canv, key):
            imgs, labels = batched(canv, hws, boxes, valid, key)
            s = imgs.astype(jnp.float32).sum()
            for l in labels:
                s = s + l.sum()
            # chain through the KEY (cheap), not a full canvas copy
            return jax.random.fold_in(key, (s > 0).astype(jnp.int32)), s

        canv = jnp.asarray(canv0)
        key, out = step(canv, jax.random.PRNGKey(0))
        _ = float(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                key, out = step(canv, key)
            _ = float(out)
            best = min(best, time.perf_counter() - t0)
        ms = best / iters * 1e3
        print(f"batch {batch:4d} mode {mode:11s} radix "
              f"{radix or A._SHEAR_RADIX:2d} stages {stages:9s} {tag}: "
              f"{ms:7.2f} ms/batch  {ms * 1e3 / batch:6.1f} us/img", flush=True)
        return ms
    finally:
        A._SHEAR_RADIX = old_radix
        A.ROTATE_IMPL = old_rot


if __name__ == "__main__":
    variants = sys.argv[1:] or ["base"]
    for v in variants:
        if v == "base":
            for b in (64, 128, 256):
                time_pp(b)
        elif v == "stages":
            for st in ("letterbox", "augment", "noaug", "all"):
                for b in (64, 128):
                    time_pp(b, stages=st)
        elif v == "iid":
            for b in (64, 128):
                time_pp(b, mode="iid", stages="augment")
        elif v == "rot":
            # round-5 Pallas fused-rotation kernel A/B (ops/rotate_pallas.py)
            for impl in ("slice", "pallas"):
                for b in (64, 128):
                    time_pp(b, stages="augment", rotate_impl=impl, tag=impl)
            for impl in ("slice", "pallas"):
                for b in (64, 128):
                    time_pp(b, stages="all", rotate_impl=impl, tag=impl)
        elif v.startswith("radix"):
            r = int(v[len("radix"):])
            for b in (64, 128):
                time_pp(b, radix=r, stages="augment")
        else:
            raise SystemExit(f"unknown variant {v}")
