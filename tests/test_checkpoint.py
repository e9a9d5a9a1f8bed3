"""Checkpoint round-trips: orbax state, .h5 weights, args.txt."""

import numpy as np

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import voc_spec
from k210_yolo_framework_tpu.training import checkpoint as CK

import shared

SPEC = voc_spec()


def _state():
    # cached per-process; the state is an immutable pytree — read-only use
    return shared.net_and_train_state("yolo_mobilev1", SPEC.in_hw, 3, 20,
                                      alpha=0.5)


def test_h5_roundtrip(tmp_path):
    net, state = _state()
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    p = str(tmp_path / "m.h5")
    CK.save_h5(p, variables)
    # perturb template to prove load overwrites
    tmpl = jax.tree.map(lambda x: np.zeros_like(x), variables)
    loaded = CK.load_h5(p, tmpl)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_h5_shape_mismatch_raises(tmp_path):
    net, state = _state()
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    p = str(tmp_path / "m.h5")
    CK.save_h5(p, variables)
    other, st2 = shared.net_and_train_state("yolo_mobilev1", SPEC.in_hw, 3, 20,
                                            alpha=1.0)
    tmpl = {"params": jax.device_get(st2.params),
            "batch_stats": jax.device_get(st2.batch_stats)}
    import pytest
    with pytest.raises(ValueError):
        CK.load_h5(p, tmpl)


def test_orbax_state_roundtrip(tmp_path):
    net, state = _state()
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    CK.save_state(str(tmp_path / "ckpt"), state)
    restored = CK.restore_state(str(tmp_path / "ckpt"), jax.device_get(state))
    assert int(restored.step) == 42
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_args_txt(tmp_path):
    p = tmp_path / "args.txt"
    CK.write_args_txt({"model_def": "yolo_mobilev1", "batch_size": 16}, str(p))
    txt = p.read_text()
    assert "model_def: yolo_mobilev1\n" in txt and "batch_size: 16\n" in txt


def test_load_h5_rejects_foreign_layout(tmp_path):
    """An .h5 with no native groups must raise (silent {} would surface as
    a cryptic flax error far from the cause)."""
    import h5py
    import pytest

    p = str(tmp_path / "foreign.h5")
    with h5py.File(p, "w") as f:
        f.create_group("model_weights")
    net, state = _state()
    tmpl = {"params": state.params, "batch_stats": state.batch_stats}
    with pytest.raises(ValueError, match="no native groups"):
        CK.load_h5(p, tmpl)


def test_load_variables_handles_all_three_formats(tmp_path):
    """Native h5, reference Keras h5 (ported), and orbax dir all load
    through the one CLI entry point."""
    net, state = _state()
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}

    p_native = str(tmp_path / "native.h5")
    CK.save_h5(p_native, variables)
    out = CK.load_variables(p_native, "yolo_mobilev1", state)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(out["params"])[0]),
        np.asarray(jax.tree.leaves(variables["params"])[0]))

    p_orbax = str(tmp_path / "orbax_ckpt")
    CK.save_state(p_orbax, state)
    out = CK.load_variables(p_orbax, "yolo_mobilev1", state)
    assert "params" in out and "batch_stats" in out

    # reference Keras layout: route through port (synthesized minimal file
    # -> everything missing, left at init, but MUST NOT raise)
    import h5py
    p_ref = str(tmp_path / "ref.h5")
    with h5py.File(p_ref, "w") as f:
        f.create_group("model_weights")
    out = CK.load_variables(p_ref, "yolo_mobilev1", state)
    assert "params" in out
