"""Reverse checkpoint interchange: ours -> reference-layout Keras ``.h5``.

``port.save_reference_h5`` inverts the port maps so a model trained HERE can
be opened by the reference's own scripts via stock ``load_weights``
(/root/reference/keras_train.py:52-57, keras_inference.py:77-81) and fed to
its TFLite/nncase toolchain (keras_freeze.py:15-23).  Two proof layers:

  * bit round-trip (no TF): ours -> h5 -> ``port_reference_h5`` -> ours is
    exact (float32 written/read, depthwise transpose is an involution);
  * ground truth (TF): the exported file loads into the genuine tf.keras
    reference graphs (tests/tf_oracle.py) with STOCK positional
    ``load_weights`` — the loader the reference actually calls — and the tf
    forward then matches our forward to ~1e-4.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.models import build_network
from k210_yolo_framework_tpu.port import port_reference_h5, save_reference_h5


def _randomize_variables(variables, seed=0):
    """Seeded random values over our pytree (BN var positive, kernels
    fan-in-scaled — mirrors tests.tf_oracle.randomize_weights so darknet53's
    75-layer stack keeps O(1) activations)."""
    rng = np.random.default_rng(seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    out = []
    for path, leaf in flat:
        name = str(getattr(path[-1], "key", path[-1]))
        shape = np.shape(leaf)
        if name == "var":
            v = 0.5 + rng.uniform(0.0, 1.0, shape)
        elif name == "scale":
            v = 1.0 + 0.2 * rng.standard_normal(shape)
        elif name == "kernel" and len(shape) == 4:
            # ours: depthwise kernels are [kh, kw, 1, C]
            fan_in = shape[0] * shape[1] if shape[2] == 1 else int(np.prod(shape[:3]))
            v = (1.6 / np.sqrt(fan_in)) * rng.standard_normal(shape)
        else:
            v = 0.1 * rng.standard_normal(shape)
        out.append(np.asarray(v, np.float32))
    return jax.tree_util.tree_unflatten(treedef, out)


def _trim(variables):
    return {"params": variables["params"], "batch_stats": variables["batch_stats"]}


def _roundtrip_bits(model_def, in_hw, tmp_path, alpha=1.0):
    net = build_network(model_def, in_hw, 3, 20, alpha=alpha)
    variables = _trim(jax.device_get(net.init(jax.random.PRNGKey(0))))
    variables = _randomize_variables(variables, seed=11)
    h5 = str(tmp_path / f"{model_def}_ref.h5")
    save_reference_h5(h5, variables, model_def)

    template = jax.tree.map(np.zeros_like, variables)
    back, missing = port_reference_h5(h5, model_def, template,
                                      allow_missing=False)
    assert missing == []
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(
        {k: back[k] for k in ("params", "batch_stats")}))
    assert len(flat_a) == len(flat_b)
    for path, a in flat_a:
        np.testing.assert_array_equal(a, flat_b[tuple(path)],
                                      err_msg=str(path))


def test_roundtrip_bits_mobilev1(tmp_path):
    _roundtrip_bits("yolo_mobilev1", (96, 128), tmp_path, alpha=0.75)


def test_roundtrip_bits_tiny_yolo(tmp_path):
    _roundtrip_bits("tiny_yolo", (96, 128), tmp_path)


@pytest.mark.slow
def test_roundtrip_bits_mobilev2(tmp_path):
    _roundtrip_bits("yolo_mobilev2", (96, 128), tmp_path, alpha=0.75)


@pytest.mark.slow
def test_roundtrip_bits_yolo(tmp_path):
    _roundtrip_bits("yolo", (96, 96), tmp_path)


# --------------------------------------------------- tf.keras ground truth

def _export_and_load_in_keras(model_def, in_hw, tmp_path, alpha=1.0,
                              build_oracle=None):
    tf = pytest.importorskip("tensorflow")  # noqa: F841
    from tests import tf_oracle

    net = build_network(model_def, in_hw, 3, 20, alpha=alpha)
    variables = _trim(jax.device_get(net.init(jax.random.PRNGKey(0))))
    variables = _randomize_variables(variables, seed=23)
    h5 = str(tmp_path / f"{model_def}_ref.h5")
    save_reference_h5(h5, variables, model_def)

    tf_model = build_oracle()
    # STOCK positional load — exactly what the reference's entry scripts
    # call on a user checkpoint (keras_train.py:52-57)
    tf_model.load_weights(h5)

    rng = np.random.default_rng(3)
    x = rng.uniform(0.0, 1.0, (2, in_hw[0], in_hw[1], 3)).astype(np.float32)
    tf_outs = tf_model(x, training=False)
    ours = net.apply_raw(variables, jnp.asarray(x), train=False)
    assert len(tf_outs) == len(ours)
    for i, (a, b) in enumerate(zip(tf_outs, ours)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, (i, a.shape, b.shape)
        # TF(oneDNN) vs XLA:CPU fp32 accumulation-order noise, amplified by
        # random BN stats through the deep stacks (mobilev2's 17 residual
        # blocks measured ~4e-4 relative worst-case); a wrong export map is
        # O(1) relative — garbage, not 1e-3s.
        atol = 3e-4 * max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, atol=atol, rtol=3e-3,
                                   err_msg=f"output layer {i}")


@pytest.mark.slow
def test_keras_loads_export_mobilev1(tmp_path):
    from tests import tf_oracle
    _export_and_load_in_keras(
        "yolo_mobilev1", (96, 128), tmp_path, alpha=0.75,
        build_oracle=lambda: tf_oracle.build_mobilev1((96, 128), alpha=0.75))


@pytest.mark.slow
def test_keras_loads_export_mobilev2(tmp_path):
    from tests import tf_oracle
    _export_and_load_in_keras(
        "yolo_mobilev2", (96, 128), tmp_path, alpha=0.75,
        build_oracle=lambda: tf_oracle.build_mobilev2((96, 128), alpha=0.75))


@pytest.mark.slow
def test_keras_loads_export_tiny_yolo(tmp_path):
    from tests import tf_oracle
    _export_and_load_in_keras(
        "tiny_yolo", (96, 128), tmp_path,
        build_oracle=lambda: tf_oracle.build_tiny_yolo((96, 128)))


@pytest.mark.slow
def test_keras_loads_export_yolo(tmp_path):
    from tests import tf_oracle
    _export_and_load_in_keras(
        "yolo", (96, 96), tmp_path,
        build_oracle=lambda: tf_oracle.build_yolo((96, 96)))


# ------------------------------------------- literal TFLite toolchain hand-off

@pytest.mark.slow
def test_tflite_toolchain_handoff(tmp_path):
    """The last inch of the interchange story: run the reference's OWN
    device-freeze flow — ``.h5 -> tf.keras graph -> TFLiteConverter ->
    interpreter`` (/root/reference/keras_freeze.py:15-23, README.md:144-154)
    — on a graph loaded from OUR exported reference-layout ``.h5``, and
    compare the resulting interpreter outputs against our own ``export_tflite``
    artifact AND our jax forward.

    Passing means a reference user can take a model trained here through
    their unchanged TFLite/nncase pipeline and get the same network."""
    tf = pytest.importorskip("tensorflow")
    from tests import tf_oracle

    from k210_yolo_framework_tpu.export import export_tflite

    in_hw, alpha = (96, 128), 0.75
    net = build_network("yolo_mobilev1", in_hw, 3, 20, alpha=alpha)
    variables = _trim(jax.device_get(net.init(jax.random.PRNGKey(0))))
    variables = _randomize_variables(variables, seed=31)

    # (1) the reference flow on OUR h5
    h5 = str(tmp_path / "ours_ref.h5")
    save_reference_h5(h5, variables, "yolo_mobilev1")
    tf_model = tf_oracle.build_mobilev1(in_hw, alpha=alpha)
    tf_model.load_weights(h5)   # stock positional load (keras_train.py:52-57)
    conv = tf.lite.TFLiteConverter.from_keras_model(tf_model)
    ref_flow_tfl = conv.convert()

    # (2) our own export path on the same weights
    ours_tfl = export_tflite(net, variables, batch=1)

    rng = np.random.default_rng(7)
    x = rng.uniform(0.0, 1.0, (1, in_hw[0], in_hw[1], 3)).astype(np.float32)
    jax_outs = [np.asarray(o) for o in
                net.apply_raw(variables, jnp.asarray(x), train=False)]

    def run_interpreter(flatbuffer):
        it = tf.lite.Interpreter(model_content=flatbuffer)
        it.allocate_tensors()
        (inp,) = it.get_input_details()
        it.set_tensor(inp["index"], x)
        it.invoke()
        outs = [it.get_tensor(d["index"]) for d in it.get_output_details()]
        # interpreter output order is not guaranteed: match by shape
        # (the two output layers have distinct grid sizes)
        return sorted(outs, key=lambda o: o.shape[1])

    ref_outs = run_interpreter(ref_flow_tfl)
    our_outs = run_interpreter(ours_tfl)
    want = sorted(jax_outs, key=lambda o: o.shape[1])
    assert len(ref_outs) == len(our_outs) == len(want)
    for i, (r, o, w) in enumerate(zip(ref_outs, our_outs, want)):
        assert r.shape == o.shape == w.shape, (i, r.shape, o.shape, w.shape)
        scale = max(1.0, float(np.abs(w).max()))
        np.testing.assert_allclose(r, o, atol=1e-3 * scale, rtol=1e-3,
                                   err_msg=f"ref-flow vs our tflite, out {i}")
        np.testing.assert_allclose(r, w, atol=1e-3 * scale, rtol=1e-3,
                                   err_msg=f"ref-flow tflite vs jax, out {i}")
    sizes = {"reference_h5_kb": len(open(h5, "rb").read()) // 1024,
             "ref_flow_tflite_kb": len(ref_flow_tfl) // 1024,
             "our_tflite_kb": len(ours_tfl) // 1024}
    print(f"\nartifact sizes: {sizes}")
