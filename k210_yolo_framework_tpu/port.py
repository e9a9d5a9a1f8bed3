"""Port reference Keras ``.h5`` weights into this framework's pytrees.

The reference trains with TF1 Keras and ships/loads weights as ``.h5``
(backbone files ``data/mobilenet_v1_base_{5,7,10}.h5``, full models
``yolo_model.h5`` — /root/reference/models/yolonet.py:16-21,
keras_train.py:52-57).  This shim maps those layer names onto our flax
param/batch-stats tree so existing checkpoints can be reused and decode
parity can be checked against real weights.

Keras-side names (keras_mobilenet.py:343-436, head order from
yolonet.py:27-38 — Keras auto-numbers layers in creation order):

  conv1 / conv1_bn, conv_dw_N / conv_dw_N_bn, conv_pw_N / conv_pw_N_bn
  conv2d               -> head y1 3x3 DarknetConv2D_BN_Leaky
  batch_normalization  -> its BN
  conv2d_1             -> head y1 1x1 output conv (bias)
  conv2d_2 / batch_normalization_1 -> upsample-branch 1x1 conv
  conv2d_3 / batch_normalization_2 -> y2 3x3 conv
  conv2d_4             -> y2 1x1 output conv (bias)

Weight-array transforms: Keras depthwise kernels are [kh, kw, C, 1] while
flax grouped convs use [kh, kw, 1, C]; dense kernels are both HWIO.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

__all__ = ["mobilev1_layer_map", "port_reference_h5"]

_BN_WEIGHTS = [("gamma:0", "params", "scale"), ("beta:0", "params", "bias"),
               ("moving_mean:0", "batch_stats", "mean"),
               ("moving_variance:0", "batch_stats", "var")]


def _dw_transpose(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (0, 1, 3, 2))


def mobilev1_layer_map() -> List[Tuple[str, str, List]]:
    """[(keras_layer, our_module_path, weight specs)] for yolo_mobilev1.

    Weight spec: (keras_weight_name, collection, our_leaf_name[, transform]).
    """
    table: List[Tuple[str, str, List]] = [
        ("conv1", "backbone/stem/conv", [("kernel:0", "params", "kernel")]),
        ("conv1_bn", "backbone/stem/bn", list(_BN_WEIGHTS)),
    ]
    for n in range(1, 14):
        table += [
            (f"conv_dw_{n}", f"backbone/block_{n}/dw/conv",
             [("depthwise_kernel:0", "params", "kernel", _dw_transpose)]),
            (f"conv_dw_{n}_bn", f"backbone/block_{n}/dw/bn", list(_BN_WEIGHTS)),
            (f"conv_pw_{n}", f"backbone/block_{n}/pw/conv",
             [("kernel:0", "params", "kernel")]),
            (f"conv_pw_{n}_bn", f"backbone/block_{n}/pw/bn", list(_BN_WEIGHTS)),
        ]
    table += [
        ("conv2d", "head/y1_conv/dark_conv_bn/conv",
         [("kernel:0", "params", "kernel")]),
        ("batch_normalization", "head/y1_conv/dark_conv_bn/bn", list(_BN_WEIGHTS)),
        ("conv2d_1", "head/y1_out/dark_conv_out",
         [("kernel:0", "params", "kernel"), ("bias:0", "params", "bias")]),
        ("conv2d_2", "head/up_conv/dark_conv_bn/conv",
         [("kernel:0", "params", "kernel")]),
        ("batch_normalization_1", "head/up_conv/dark_conv_bn/bn", list(_BN_WEIGHTS)),
        ("conv2d_3", "head/y2_conv/dark_conv_bn/conv",
         [("kernel:0", "params", "kernel")]),
        ("batch_normalization_2", "head/y2_conv/dark_conv_bn/bn", list(_BN_WEIGHTS)),
        ("conv2d_4", "head/y2_out/dark_conv_out",
         [("kernel:0", "params", "kernel"), ("bias:0", "params", "bias")]),
    ]
    return table


_LAYER_MAPS = {"yolo_mobilev1": mobilev1_layer_map}


def _find_layer_group(f, layer: str):
    """Keras h5 stores weights under model_weights/<layer>/<layer>/<w> (full
    saves) or <layer>/<layer>/<w> (save_weights)."""
    root = f["model_weights"] if "model_weights" in f else f
    if layer not in root:
        return None
    g = root[layer]
    return g[layer] if layer in g else g


def _set_leaf(tree: Dict, path: str, value: np.ndarray):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    leaf = node[keys[-1]]
    if tuple(leaf.shape) != tuple(value.shape):
        raise ValueError(f"{path}: reference weight shape {value.shape} "
                         f"!= ours {tuple(leaf.shape)}")
    node[keys[-1]] = value.astype(np.asarray(leaf).dtype)


def port_reference_h5(h5_path: str, model_def: str, template: Dict[str, Any],
                      allow_missing: bool = True) -> Dict[str, Any]:
    """Load a reference Keras ``.h5`` into the structure of ``template``
    (``{"params": ..., "batch_stats": ...}``).

    ``allow_missing=True`` skips absent layers (e.g. backbone-only files
    like ``mobilenet_v1_base_7.h5``, which carry no head weights).

    Returns ``(variables, missing)`` — the layer names NOT found in the
    file, so a partially-ported model (head left at init) is visible to
    the caller instead of silently producing garbage decodes.
    """
    import h5py
    import jax

    if model_def not in _LAYER_MAPS:
        raise KeyError(f"no reference layer map for {model_def!r}; "
                       f"have {sorted(_LAYER_MAPS)}")
    table = _LAYER_MAPS[model_def]()

    out = jax.tree.map(np.asarray, jax.device_get(template))
    # unfreeze to plain nested dicts
    out = jax.tree_util.tree_map(lambda x: x, out)
    import copy

    def to_mutable(d):
        if isinstance(d, dict) or hasattr(d, "items"):
            return {k: to_mutable(v) for k, v in d.items()}
        return d
    out = to_mutable(out)

    missing: List[str] = []
    with h5py.File(h5_path, "r") as f:
        for layer, module_path, weights in table:
            g = _find_layer_group(f, layer)
            if g is None:
                missing.append(layer)
                continue
            for spec in weights:
                wname, coll, leaf = spec[0], spec[1], spec[2]
                transform = spec[3] if len(spec) > 3 else None
                arr = np.asarray(g[wname])
                if transform is not None:
                    arr = transform(arr)
                _set_leaf(out[coll], f"{module_path}/{leaf}", arr)
    if missing and not allow_missing:
        raise KeyError(f"layers missing from {h5_path}: {missing}")
    return out, missing
