"""Real .tflite export (the reference's freeze product, keras_freeze.py:15-23).

TF is an export-time-only dependency; these tests skip cleanly if absent.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.models import build_network

tf = pytest.importorskip("tensorflow")


def _tiny():
    net = build_network("yolo_mobilev1", (96, 128), 3, 4, alpha=0.25)
    variables = net.init(jax.random.PRNGKey(0))
    return net, variables


def _invoke(tfl: bytes, x: np.ndarray):
    interp = tf.lite.Interpreter(model_content=tfl)
    interp.allocate_tensors()
    interp.set_tensor(interp.get_input_details()[0]["index"], x)
    interp.invoke()
    return [interp.get_tensor(o["index"]) for o in interp.get_output_details()]


@pytest.mark.slow
def test_tflite_matches_jax_forward():
    from k210_yolo_framework_tpu.export import export_tflite

    net, variables = _tiny()
    x = np.random.default_rng(0).uniform(0, 1, (1, 96, 128, 3)).astype(np.float32)
    want = [np.asarray(o) for o in net.apply_raw(variables, jnp.asarray(x))]

    tfl = export_tflite(net, variables, batch=1)
    assert tfl[4:8] == b"TFL3"  # flatbuffer file identifier
    got = _invoke(tfl, x)
    for w in want:
        m = [g for g in got if g.shape == w.shape]
        assert m, f"no tflite output with shape {w.shape}"
        np.testing.assert_allclose(m[0], w, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_tflite_full_int8_with_representative_dataset():
    """Full-int8 PTQ (calibration images -> TFLITE_BUILTINS_INT8) — the
    reference's `ncc --dataset` kmodel recipe (README.md:152-154)."""
    from k210_yolo_framework_tpu.export import export_tflite

    net, variables = _tiny()
    # flax random init leaves the head outputs at ~1e-5 — below int8
    # resolution by design.  Give the heads O(1) dynamic range (random
    # biases) so calibration has a real range to capture.
    rng = np.random.default_rng(2)

    def spice(path, leaf):
        if path[-1].key == "bias" and leaf.shape[-1] == 27:
            return jnp.asarray(rng.normal(0, 1, leaf.shape), jnp.float32)
        return leaf

    import jax as _jax
    variables = {**variables, "params": _jax.tree_util.tree_map_with_path(
        spice, variables["params"])}

    rep = rng.uniform(0, 1, (8, 96, 128, 3)).astype(np.float32)
    x = rep[:1]
    want = [np.asarray(o) for o in net.apply_raw(variables, jnp.asarray(x))]

    tfl = export_tflite(net, variables, batch=1, int8=True, rep_images=rep)
    assert tfl[4:8] == b"TFL3"
    # every conv in the graph must actually be int8-quantized: the flatbuffer
    # shrinks ~4x vs fp32 and carries int8 tensor types
    fp = export_tflite(net, variables, batch=1)
    assert len(tfl) < 0.5 * len(fp)
    got = _invoke(tfl, x.copy())
    for w in want:
        m = [g for g in got if g.shape == w.shape]
        assert m, f"no tflite output with shape {w.shape}"
        assert float(np.std(m[0])) > 0.1, "int8 output collapsed to constant"
        span = float(w.max() - w.min())
        err = float(np.abs(m[0] - w).max())
        assert err < 0.05 * span, f"full-int8 error {err:.4f} vs span {span:.3f}"


@pytest.mark.slow
def test_tflite_int8_dynamic_range():
    from k210_yolo_framework_tpu.export import export_tflite

    net, variables = _tiny()
    x = np.random.default_rng(1).uniform(0, 1, (1, 96, 128, 3)).astype(np.float32)
    want = [np.asarray(o) for o in net.apply_raw(variables, jnp.asarray(x))]

    tfl = export_tflite(net, variables, batch=1, int8=True)
    fp = export_tflite(net, variables, batch=1)
    assert len(tfl) < 0.6 * len(fp), "int8 flatbuffer should be much smaller"
    got = _invoke(tfl, x)
    for w in want:
        m = [g for g in got if g.shape == w.shape]
        assert m
        # weights-only int8: logits close but not exact
        assert float(np.abs(m[0] - w).max()) < 0.3
