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
