"""make_voc_list / build_ann_list: darknet layout -> {name}_img_ann.npy."""

import numpy as np
from PIL import Image

from k210_yolo_framework_tpu.data.annotations import (build_ann_list,
                                                      load_ann_list)


def test_build_ann_list_darknet_layout(tmp_path):
    # darknet VOC layout: JPEGImages/x.jpg + labels/x.txt (make_voc_list.py:9-26)
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w, nb) in enumerate([(120, 160, 2), (90, 200, 1)]):
        p = tmp_path / "JPEGImages" / f"img_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)).save(p)
        boxes = np.hstack([rng.integers(0, 5, (nb, 1)).astype(float),
                           rng.uniform(0.3, 0.7, (nb, 4))])
        np.savetxt(tmp_path / "labels" / f"img_{i}.txt", boxes)
        paths.append(str(p))
    train = tmp_path / "train.txt"
    train.write_text("\n".join(paths) + "\n")

    out = tmp_path / "voc_img_ann.npy"
    arr = build_ann_list(str(train), str(out))
    assert len(arr) == 2
    loaded = load_ann_list(str(out))
    assert str(loaded[0][0]) == paths[0]
    assert np.asarray(loaded[0][1]).shape == (2, 5)   # ndmin=2 like the ref
    assert np.asarray(loaded[1][1]).shape == (1, 5)   # single-box file too
    assert tuple(loaded[0][2]) == (120, 160)          # (h, w)
