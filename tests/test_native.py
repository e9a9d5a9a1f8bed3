"""Native (C++) runtime components vs the pure-Python/JAX paths."""

import numpy as np
import pytest

import jax.numpy as jnp

from k210_yolo_framework_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native libs failed to build")


@pytest.fixture(scope="module")
def synth_paths(tmp_path_factory):
    from k210_yolo_framework_tpu.data.pipeline import synthetic_ann_list
    d = tmp_path_factory.mktemp("imgs")
    ann = synthetic_ann_list(str(d), n=12, seed=3)
    return ann


def test_decode_image_matches_pil(synth_paths):
    from k210_yolo_framework_tpu.data.annotations import read_image
    path = str(synth_paths[0][0])
    canvas, hw = native.decode_image(path, (512, 512))
    ref = read_image(path)
    assert tuple(hw) == ref.shape[:2]
    got = canvas[:hw[0], :hw[1]].astype(np.int16)
    # different libjpeg builds may round IDCT differently; stay close
    assert np.mean(np.abs(got - ref.astype(np.int16))) < 2.0
    assert np.all(canvas[hw[0]:] == 0) and np.all(canvas[:, hw[1]:] == 0)


def test_native_loader_batches_and_coverage(synth_paths):
    paths = [str(r[0]) for r in synth_paths]
    loader = native.NativeLoader(paths, (512, 512), batch_size=4, seed=7,
                                 num_workers=4, prefetch=2)
    seen = []
    try:
        for _ in range(6):  # 2 epochs of 12 imgs at batch 4
            canvases, hws, idxs = loader.next()
            assert canvases.shape == (4, 512, 512, 3)
            assert hws.shape == (4, 2)
            assert np.all((idxs >= 0) & (idxs < len(paths)))
            for k, i in enumerate(idxs):
                want_hw = synth_paths[i][2]
                assert tuple(hws[k]) == tuple(want_hw)
            seen.extend(idxs.tolist())
    finally:
        loader.close()
    # every image visited exactly twice over two epochs (epoch shuffle)
    counts = np.bincount(seen, minlength=len(paths))
    assert np.all(counts == 2)


def test_pipeline_native_path(synth_paths):
    from k210_yolo_framework_tpu.data.pipeline import DataPipeline
    pipe = DataPipeline(synth_paths, batch_size=4, seed=1, use_native=True)
    it = iter(pipe)
    b = next(it)
    assert b.canvases.shape == (4, 512, 512, 3)
    assert b.boxes.shape[0] == 4 and b.valid.shape[0] == 4
    assert b.valid.any()


def test_decode_oversized_image_shrinks_to_fit(tmp_path):
    """Exercises the JPEG DCT prescale + bilinear fit (loader.cpp decode_any):
    a 700x900 image must land inside a 512x512 canvas with aspect kept."""
    from PIL import Image
    rng = np.random.default_rng(9)
    big = rng.integers(0, 256, (700, 900, 3)).astype(np.uint8)
    path = str(tmp_path / "big.jpg")
    Image.fromarray(big).save(path, quality=92)

    canvas, hw = native.decode_image(path, (512, 512))
    s = min(512 / 700, 512 / 900)
    assert tuple(hw) == (int(700 * s), int(900 * s))
    assert hw[0] <= 512 and hw[1] <= 512
    # content in-bounds, zero padding outside
    assert canvas[:hw[0], :hw[1]].mean() > 50
    assert np.all(canvas[hw[0]:] == 0) and np.all(canvas[:, hw[1]:] == 0)
    # resample should roughly match PIL's bilinear shrink of the DECODED jpeg
    dec = np.asarray(Image.open(path).convert("RGB"))
    ref = np.asarray(Image.fromarray(dec).resize((int(hw[1]), int(hw[0])),
                                                 Image.BILINEAR), dtype=np.int16)
    got = canvas[:hw[0], :hw[1]].astype(np.int16)
    assert np.mean(np.abs(got - ref)) < 30  # DCT prescale differs from direct bilinear


def test_corrupt_file_raises(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0 this is not really a jpeg")
    with pytest.raises(IOError):
        native.decode_image(str(bad), (64, 64))
    loader = native.NativeLoader([str(bad)], (64, 64), batch_size=1, seed=0,
                                 num_workers=1, prefetch=1)
    try:
        with pytest.raises(IOError, match="bad.jpg"):
            loader.next()
    finally:
        loader.close()


@pytest.mark.parametrize("class_softmax", [False, True])
def test_region_layer_matches_jax(class_softmax):
    """C++ decode+NMS == jnp decode + pallas NMS on random logits."""
    from k210_yolo_framework_tpu.config import YoloSpec
    from k210_yolo_framework_tpu.ops import decode as D
    from k210_yolo_framework_tpu.ops.nms_pallas import batched_nms_pallas

    rng = np.random.default_rng(11)
    anchors = np.sort(rng.uniform(0.05, 0.9, (2, 3, 2)).astype(np.float32))[:, ::-1]
    spec = YoloSpec.create((224, 320), ((7, 10), (14, 20)), 6, anchors)
    preds = [rng.normal(0, 2, (h, w, 3, 5 + 6)).astype(np.float32)
             for h, w in spec.out_hws]
    img_hw = (375, 500)

    # jax path (single image)
    jb, js = D.decode_outputs([jnp.asarray(p) for p in preds], spec,
                              jnp.asarray(img_hw, jnp.int32), class_softmax)
    res = batched_nms_pallas(jb[None], js[None], 0.3, 0.45, 30)
    jvalid = np.asarray(res.valid[0])
    jscores = np.asarray(res.scores[0])[jvalid]
    jboxes = np.asarray(res.boxes[0])[jvalid]
    jclasses = np.asarray(res.classes[0])[jvalid]

    nb, ns, nc, nv = native.region_layer_run(
        preds, anchors, (224, 320), img_hw, 0.3, 0.45, 30, class_softmax)
    assert nv.sum() == jvalid.sum()
    for arr_j, arr_n, tol in ((jscores, ns[nv], 1e-5), (jboxes, nb[nv], 1e-2)):
        o_j = np.lexsort(np.atleast_2d(arr_j.reshape(len(arr_j), -1).T))
        o_n = np.lexsort(np.atleast_2d(arr_n.reshape(len(arr_n), -1).T))
        np.testing.assert_allclose(arr_j[o_j], arr_n[o_n], rtol=tol, atol=tol)
    assert sorted(jclasses.tolist()) == sorted(nc[nv].tolist())
