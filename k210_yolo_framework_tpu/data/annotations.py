"""The reference's ``.npy`` annotation format, kept verbatim.

``{name}_img_ann.npy`` is an object array of per-image rows
``[image_path, boxes[n, 5], (h, w)]`` where boxes are darknet-voc
``[class, x, y, w, h]`` normalized to the original image
(/root/reference/make_voc_list.py:19-26).  Label files are found by the same
path rewrite: ``JPEGImages -> labels``, ``.jpg -> .txt``
(make_voc_list.py:16-17).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image

__all__ = ["read_image", "build_ann_list", "load_ann_list", "split_train_test"]


def read_image(path: str) -> np.ndarray:
    """RGB uint8 [h, w, 3]; grayscale promoted, alpha dropped — mirrors
    ``Helper._read_img`` (/root/reference/tools/utils.py:339-355)."""
    img = np.asarray(Image.open(path).convert("RGB"))
    return img


def build_ann_list(train_file: str, output_file: str) -> np.ndarray:
    """``make_voc_list.py`` equivalent: train.txt -> {name}_img_ann.npy."""
    image_paths: List[str] = [ln.strip() for ln in Path(train_file).read_text().splitlines()
                              if ln.strip()]
    rows = []
    for p in image_paths:
        label_path = re.sub(r"JPEGImages", "labels", p)
        label_path = re.sub(r"\.jpg$", ".txt", label_path)
        boxes = np.loadtxt(label_path, dtype=float, ndmin=2)
        with Image.open(p) as im:
            w, h = im.size
        rows.append(np.array([p, boxes, np.array([h, w])], dtype=object))
    arr = np.array(rows, dtype=object)
    Path(output_file).parent.mkdir(parents=True, exist_ok=True)
    np.save(output_file, arr)
    return arr


def load_ann_list(path: str) -> np.ndarray:
    return np.load(path, allow_pickle=True)


def split_train_test(ann_list: np.ndarray, validation_split: float) -> Tuple[np.ndarray, np.ndarray]:
    """First ``n`` rows are test, rest train — the reference's exact split
    (/root/reference/tools/utils.py:64-69)."""
    n = int(len(ann_list) * validation_split)
    return ann_list[n:], ann_list[:n]
