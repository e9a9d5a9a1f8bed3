"""Reference Keras .h5 weight porting: synthetic keras-style files."""

import h5py
import numpy as np
import pytest

import jax

from k210_yolo_framework_tpu.port import (
    mobilev1_layer_map,
    mobilev2_layer_map,
    port_reference_h5,
    tiny_yolo_layer_map,
    yolo_layer_map,
)

import shared


def _template(alpha=0.75, model="yolo_mobilev1", in_hw=(224, 320)):
    net, v = shared.net_and_vars(model, in_hw, 3, 20, alpha=alpha)
    return net, {"params": v["params"], "batch_stats": v["batch_stats"]}


def _apply(net, out, x):
    # jitted one-shot forward: rides the persistent compile cache
    return jax.jit(lambda v, x: net.apply(v, x, train=False))(
        {"params": out["params"], "batch_stats": out["batch_stats"]}, x)


def _leaf(tree, path):
    node = tree
    for k in path.split("/"):
        node = node[k]
    return np.asarray(node)


def _write_keras_h5(path, template, table, wrap_model_weights=True, skip=()):
    """Build a keras-layout h5 whose every weight is a unique constant."""
    const = {}
    i = 0
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights") if wrap_model_weights else f
        for layer, module_path, weights in table:
            if layer in skip:
                continue
            g = root.create_group(layer).create_group(layer)
            for spec in weights:
                wname, coll, leaf = spec[0], spec[1], spec[2]
                ours = _leaf(template[coll], f"{module_path}/{leaf}")
                shape = ours.shape
                if wname == "depthwise_kernel:0":
                    shape = (shape[0], shape[1], shape[3], shape[2])
                i += 1
                g.create_dataset(wname, data=np.full(shape, float(i), np.float32))
                const[(coll, f"{module_path}/{leaf}")] = float(i)
    return const


def test_port_full_model(tmp_path):
    net, template = _template()
    table = mobilev1_layer_map()
    path = str(tmp_path / "ref.h5")
    const = _write_keras_h5(path, template, table)

    out, missing = port_reference_h5(path, "yolo_mobilev1", template)
    assert missing == []
    for (coll, leafpath), want in const.items():
        got = _leaf(out[coll], leafpath)
        assert np.all(got == want), (coll, leafpath)
    # ported variables must run through the model
    import jax.numpy as jnp
    outs = _apply(net, out, jnp.zeros((1, 224, 320, 3)))
    assert outs[0].shape == (1, 7, 10, 3, 25)


def test_port_backbone_only(tmp_path):
    _, template = _template()
    table = [row for row in mobilev1_layer_map()
             if row[0].startswith(("conv1", "conv_dw", "conv_pw"))]
    path = str(tmp_path / "base.h5")
    const = _write_keras_h5(path, template, table, wrap_model_weights=False)

    out, missing = port_reference_h5(path, "yolo_mobilev1", template, allow_missing=True)
    assert len(missing) == 8  # the head layers
    for (coll, leafpath), want in const.items():
        assert np.all(_leaf(out[coll], leafpath) == want)
    # head untouched = template values
    np.testing.assert_array_equal(
        _leaf(out["params"], "head/y1_out/dark_conv_out/bias"),
        _leaf(template["params"], "head/y1_out/dark_conv_out/bias"))
    with pytest.raises(KeyError):
        port_reference_h5(path, "yolo_mobilev1", template, allow_missing=False)


def test_port_mobilev2_full_model(tmp_path):
    net, template = _template(alpha=0.75, model="yolo_mobilev2", in_hw=(96, 128))
    table = mobilev2_layer_map()
    path = str(tmp_path / "v2.h5")
    const = _write_keras_h5(path, template, table)

    out, missing = port_reference_h5(path, "yolo_mobilev2", template)
    assert missing == []
    for (coll, leafpath), want in const.items():
        assert np.all(_leaf(out[coll], leafpath) == want), (coll, leafpath)
    import jax.numpy as jnp
    outs = _apply(net, out, jnp.zeros((1, 96, 128, 3)))
    assert outs[0].shape == (1, 3, 4, 3, 25)


def test_port_mobilev2_map_covers_every_param():
    """Every conv/bn leaf in our v2 tree must appear in the map (no silently
    unported weights)."""
    _, template = _template(alpha=0.75, model="yolo_mobilev2", in_hw=(96, 128))
    mapped = {module_path for _, module_path, _ in mobilev2_layer_map()}
    paths = set()
    from jax.tree_util import tree_flatten_with_path
    for coll in ("params", "batch_stats"):
        flat, _ = tree_flatten_with_path(template[coll])
        for kp, _leaf_v in flat:
            keys = [getattr(k, "key", str(k)) for k in kp]
            paths.add("/".join(keys[:-1]))
    assert paths == mapped


def test_port_tiny_yolo_coco_head_slice(tmp_path):
    """The reference slices a 255-channel COCO head down to a*(5+C)
    (yolonet.py:146-156): first 75 output channels win."""
    net, template = _template(model="tiny_yolo", in_hw=(96, 128))
    table = tiny_yolo_layer_map()
    path = str(tmp_path / "tiny_coco.h5")

    rng = np.random.default_rng(0)
    donors = {}
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights")
        for layer, module_path, weights in table:
            g = root.create_group(layer).create_group(layer)
            for spec in weights:
                wname, coll, leaf = spec[0], spec[1], spec[2]
                shape = list(_leaf(template[coll], f"{module_path}/{leaf}").shape)
                if "_out" in module_path:  # head conv: donor is 255-channel COCO
                    shape[-1] = 255
                arr = rng.normal(size=shape).astype(np.float32)
                g.create_dataset(wname, data=arr)
                donors[(coll, f"{module_path}/{leaf}")] = arr

    out, missing = port_reference_h5(path, "tiny_yolo", template)
    assert missing == []
    for (coll, leafpath), donor in donors.items():
        got = _leaf(out[coll], leafpath)
        np.testing.assert_array_equal(got, donor[..., :got.shape[-1]], err_msg=leafpath)
    import jax.numpy as jnp
    outs = _apply(net, out, jnp.zeros((1, 96, 128, 3)))
    assert outs[0].shape == (1, 3, 4, 3, 25)


@pytest.mark.slow  # darknet53 build+apply ~40s alone on the 1-core rig
def test_port_yolo_min_shape_transplant(tmp_path):
    """darknet53 partial transplant (yolonet.py:182-189): the overlapping
    min-shape block is copied, our init survives outside it."""
    net, template = _template(model="yolo", in_hw=(96, 96))
    table = yolo_layer_map()
    path = str(tmp_path / "yolo_coco.h5")

    rng = np.random.default_rng(1)
    donors = {}
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights")
        for layer, module_path, weights in table:
            g = root.create_group(layer).create_group(layer)
            for spec in weights:
                wname, coll, leaf = spec[0], spec[1], spec[2]
                shape = list(_leaf(template[coll], f"{module_path}/{leaf}").shape)
                if "_out" in module_path:  # COCO head: 255 channels
                    shape[-1] = 255
                arr = rng.normal(size=shape).astype(np.float32)
                g.create_dataset(wname, data=arr)
                donors[(coll, f"{module_path}/{leaf}")] = arr

    out, missing = port_reference_h5(path, "yolo", template)
    assert missing == []
    # exact-shape weights: full copy
    k = ("params", "backbone/stage_3/res_0_1x1/dark_conv_bn/conv/kernel")
    np.testing.assert_array_equal(_leaf(out["params"], k[1]), donors[k])
    # 255-channel head kernel: overlap from donor, rest untouched template
    k = ("params", "y1_out/dark_conv_out/kernel")
    got, donor = _leaf(out["params"], k[1]), donors[k]
    np.testing.assert_array_equal(got, donor[..., :got.shape[-1]])
    k = ("params", "y1_out/dark_conv_out/bias")
    got, donor = _leaf(out["params"], k[1]), donors[k]
    np.testing.assert_array_equal(got, donor[:got.shape[0]])


def test_port_yolo_map_covers_every_param():
    _, template = _template(model="yolo", in_hw=(96, 96))
    mapped = {module_path for _, module_path, _ in yolo_layer_map()}
    paths = set()
    from jax.tree_util import tree_flatten_with_path
    for coll in ("params", "batch_stats"):
        flat, _ = tree_flatten_with_path(template[coll])
        for kp, _leaf_v in flat:
            keys = [getattr(k, "key", str(k)) for k in kp]
            paths.add("/".join(keys[:-1]))
    assert paths == mapped


def test_port_shape_mismatch_raises(tmp_path):
    _, template = _template(alpha=0.75)
    table = mobilev1_layer_map()
    path = str(tmp_path / "bad.h5")
    _write_keras_h5(path, template, table)
    # template for a DIFFERENT alpha -> shapes disagree
    _, template_10 = _template(alpha=1.0)
    with pytest.raises(ValueError):
        port_reference_h5(path, "yolo_mobilev1", template_10)
