"""ctypes bindings for the native (C++) runtime components.

Two shared libraries built from ``csrc/`` (see csrc/Makefile):
  * ``libyolo_loader.so`` — multithreaded JPEG/PNG decode + canvas staging
    (the reference's host image path, tools/utils.py:339-406, rebuilt
    GIL-free; see csrc/loader.cpp);
  * ``libyolo_region.so`` — host-side region layer: decode + per-class NMS
    (region_layer.c:84-283 semantics, canonical TF math; see
    csrc/region_layer.cpp).

Libraries auto-build on first use (``g++`` ships in the image); every
entry point degrades gracefully — ``available()`` gates callers so the
pure-JAX paths remain the fallback everywhere.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["available", "build", "NativeLoader", "decode_image",
           "region_layer_run"]

_NATIVE_DIR = Path(__file__).parent / "_native"
_CSRC_DIR = Path(__file__).parent.parent / "csrc"
_lock = threading.Lock()
_libs: dict = {}


def build(force: bool = False) -> bool:
    """Compile the native libs (no-op if current). Returns success."""
    try:
        res = subprocess.run(
            ["make", "-s"] + (["-B"] if force else []),
            cwd=str(_CSRC_DIR), capture_output=True, text=True, timeout=300)
        return res.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _lib(name: str) -> Optional[ctypes.CDLL]:
    with _lock:
        if name in _libs:
            return _libs[name]
        # always run make (mtime no-op when current) so edits to csrc/
        # cannot silently keep serving a stale binary
        build()
        path = _NATIVE_DIR / f"lib{name}.so"
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            lib = None
        _libs[name] = lib
        return lib


def available() -> bool:
    return _lib("yolo_loader") is not None and _lib("yolo_region") is not None


# ------------------------------------------------------------- loader ----

def decode_image(path: str, canvas_hw: Tuple[int, int]) -> Tuple[np.ndarray, np.ndarray]:
    """One-shot native decode into a zeroed canvas. Returns (canvas, hw)."""
    lib = _lib("yolo_loader")
    if lib is None:
        raise RuntimeError("native loader unavailable")
    ch, cw = canvas_hw
    canvas = np.empty((ch, cw, 3), np.uint8)
    hw = np.empty((2,), np.int32)
    rc = lib.yl_decode_image(
        path.encode(), ctypes.c_int(ch), ctypes.c_int(cw),
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise IOError(f"native decode failed: {path}")
    return canvas, hw


class NativeLoader:
    """Threaded epoch-shuffled batch producer living entirely in C++.

    Yields (canvases [B,ch,cw,3] u8, hws [B,2] i32, indices [B] i32); the
    indices map each slot back to the annotation row so the caller attaches
    gt boxes host-side (they are tiny).
    """

    def __init__(self, paths: Sequence[str], canvas_hw: Tuple[int, int],
                 batch_size: int, seed: int, num_workers: int = 8,
                 prefetch: int = 4):
        lib = _lib("yolo_loader")
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self.canvas_hw = canvas_hw
        self.batch_size = batch_size
        self._paths = list(paths)
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        lib.yl_loader_create.restype = ctypes.c_void_p
        self._handle = lib.yl_loader_create(
            arr, ctypes.c_int(len(paths)),
            ctypes.c_int(canvas_hw[0]), ctypes.c_int(canvas_hw[1]),
            ctypes.c_int(batch_size), ctypes.c_int(num_workers),
            ctypes.c_int(prefetch), ctypes.c_uint64(seed))
        if not self._handle:
            raise RuntimeError("native loader creation failed")
        # pre-bind for close(): at interpreter shutdown the ctypes module
        # globals may already be torn down when a generator finalizes us
        self._handle_obj = ctypes.c_void_p(self._handle)
        self._destroy = lib.yl_loader_destroy

    def next(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        ch, cw = self.canvas_hw
        canvases = np.empty((self.batch_size, ch, cw, 3), np.uint8)
        hws = np.empty((self.batch_size, 2), np.int32)
        idxs = np.empty((self.batch_size,), np.int32)
        rc = self._lib.yl_loader_next(
            ctypes.c_void_p(self._handle),
            canvases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            hws.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 0:
            raise RuntimeError("native loader stopped")
        if (idxs < 0).any():  # decode failure: idx encoded as -(i+1)
            bad = int(-(idxs[idxs < 0][0]) - 1)
            raise IOError(f"native decode failed for sample index {bad} "
                          f"({self._paths[bad]})")
        return canvases, hws, idxs

    def close(self):
        if getattr(self, "_handle", None):
            self._destroy(self._handle_obj)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ------------------------------------------------------- region layer ----

def region_layer_run(preds: List[np.ndarray], anchors: np.ndarray,
                     in_hw: Tuple[int, int], img_hw: Tuple[int, int],
                     obj_thresh: float = 0.7, iou_thresh: float = 0.3,
                     max_out: int = 30, class_softmax: bool = False):
    """Host-side decode+NMS for ONE image.

    preds: per layer [h, w, a, 5+C] float32 raw logits.
    anchors: [layers, a, 2] normalized (w, h).
    Returns (boxes [C*max_out, 4] yxyx px, scores, classes, valid).
    """
    lib = _lib("yolo_region")
    if lib is None:
        raise RuntimeError("native region layer unavailable")
    n_layers = len(preds)
    a = preds[0].shape[2]
    classes = preds[0].shape[3] - 5
    preds32 = [np.ascontiguousarray(p, np.float32) for p in preds]
    ptrs = (ctypes.POINTER(ctypes.c_float) * n_layers)(
        *[p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for p in preds32])
    grid_hw = np.array([p.shape[:2] for p in preds32], np.int32).ravel()
    anchors32 = np.ascontiguousarray(anchors, np.float32)

    n_out = classes * max_out
    out_boxes = np.empty((n_out, 4), np.float32)
    out_scores = np.empty((n_out,), np.float32)
    out_classes = np.empty((n_out,), np.int32)
    out_valid = np.empty((n_out,), np.uint8)
    lib.yl_region_layer_run(
        ptrs, grid_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(n_layers), ctypes.c_int(a), ctypes.c_int(classes),
        anchors32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(in_hw[0]), ctypes.c_int(in_hw[1]),
        ctypes.c_int(img_hw[0]), ctypes.c_int(img_hw[1]),
        ctypes.c_float(obj_thresh), ctypes.c_float(iou_thresh),
        ctypes.c_int(max_out), ctypes.c_int(int(class_softmax)),
        out_boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_classes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out_boxes, out_scores, out_classes, out_valid.astype(bool)
