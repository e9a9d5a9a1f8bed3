"""Checkpoint / resume.

Reference behavior replaced (/root/reference/keras_train.py:36-41, 52-57,
102-111): full-model ``.h5`` save at end of training (or on Ctrl-C), resume
via ``--pre_ckpt``, per-run ``args.txt`` config snapshot.

Here: orbax for the native TrainState checkpoint (params + batch_stats +
opt_state + pruning masks + step), plus an ``.h5`` weights export/import
(h5py, flattened slash-joined paths) so the export surface keeps an
h5-shaped artifact like the reference's ``yolo_model.h5``/
``yolo_prune_model.h5``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import h5py
import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_state", "restore_state", "save_h5", "load_h5",
           "load_variables", "write_args_txt"]


def save_state(path: str, state) -> None:
    """Orbax checkpoint of the full TrainState pytree."""
    p = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(p, jax.device_get(state), force=True)


def restore_state(path: str, target):
    """Restore into the structure of ``target`` (an abstract or concrete
    TrainState)."""
    p = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(p, target)


def _path_key(path) -> str:
    """Slash-joined h5 dataset key for one tree_flatten_with_path path."""
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _flatten(tree) -> Dict[str, np.ndarray]:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[_path_key(path)] = np.asarray(leaf)
    return out


def save_h5(path: str, variables: Dict[str, Any]) -> None:
    """Weights-only ``.h5`` export (params + batch_stats), the analogue of
    ``keras.models.save_model(yolo_model, ...)`` (keras_train.py:109)."""
    with h5py.File(path, "w") as f:
        for group in ("params", "batch_stats"):
            if group in variables:
                g = f.create_group(group)
                for k, v in _flatten(variables[group]).items():
                    g.create_dataset(k, data=v)


def load_h5(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Load an ``.h5`` export back into the structure of ``template``.

    Raises on an ``.h5`` carrying none of the template's groups (e.g. a
    reference Keras file with only ``model_weights``) — a silent partial
    dict would surface as a cryptic flax missing-params error much later.
    """
    out = {}
    with h5py.File(path, "r") as f:
        for group in ("params", "batch_stats"):
            if group not in template or group not in f:
                continue
            flat = jax.tree_util.tree_flatten_with_path(template[group])
            leaves = []
            for path_keys, leaf in flat[0]:
                key = _path_key(path_keys)
                data = np.asarray(f[group][key])
                if data.shape != leaf.shape:
                    raise ValueError(f"{group}/{key}: shape {data.shape} != {leaf.shape}")
                leaves.append(data.astype(leaf.dtype))
            out[group] = jax.tree_util.tree_unflatten(flat[1], leaves)
        if not out:
            raise ValueError(
                f"{path}: no native groups (params/batch_stats) found — "
                f"top-level keys {list(f.keys())}; a reference Keras .h5 "
                "should go through port.port_reference_h5 / load_variables")
    return out


def load_variables(path: str, model_def: str, state) -> Dict[str, Any]:
    """One-stop checkpoint load for the inference/eval/freeze surfaces.

    ``path`` may be a native ``.h5`` (params/batch_stats groups), a
    reference Keras ``.h5`` (``model_weights`` layout — routed through
    ``port.port_reference_h5``), or an orbax TrainState directory.
    ``state`` is a freshly created TrainState used as structure template
    and init fallback.  Returns ``{"params", "batch_stats"}``.
    """
    template = {"params": state.params, "batch_stats": state.batch_stats}
    if str(path).endswith(".h5"):
        with h5py.File(path, "r") as f:
            is_native = "params" in f
        if is_native:
            return load_h5(path, template)
        from k210_yolo_framework_tpu.port import port_reference_h5
        loaded, missing = port_reference_h5(path, model_def, template)
        if missing:
            print(f"NOTE: ported reference Keras weights from {path} "
                  f"({len(missing)} layers absent, left at init)")
        return loaded
    restored = restore_state(path, jax.device_get(state))
    return {"params": restored.params, "batch_stats": restored.batch_stats}


def write_args_txt(args: Dict[str, Any], path: str) -> None:
    """'%s: %s' per line (keras_train.py:23-26)."""
    with open(path, "w") as f:
        for k, v in args.items():
            f.write(f"{k}: {v}\n")
