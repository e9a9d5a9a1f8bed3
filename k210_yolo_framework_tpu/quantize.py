"""Post-training quantization — the TPU-native analogue of the reference's
int8 device story.

The reference's deployment path quantizes the exported model to an int8
kmodel for the K210 KPU (README.md:152-154: ``ncc ... --inference-type
uint8`` via nncase); the firmware then runs the whole conv stack in int8.
On TPU the equivalent capability is serving from int8 weights:

  * conv kernels [kh, kw, i, o] -> symmetric per-output-channel int8 +
    one fp32 scale per channel (the standard PTQ recipe nncase also uses);
  * 1-d params (head biases, BatchNorm terms and statistics) stay fp32 —
    the KPU likewise folds bias/BN into higher-precision per-channel terms.

Weights live on device as int8 (half/quarter the HBM of bf16/fp32) and are
dequantized inside the jitted serving program — one fused multiply that XLA
folds into the conv epilogue's weight load, so the cost is bandwidth saved,
not compute added.

``fake_quant_tree`` gives the quantize->dequantize view for accuracy
experiments without changing the serving program's input tree.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["QTensor", "quantize_tree", "dequantize_tree", "fake_quant_tree",
           "is_quantized"]


class QTensor(NamedTuple):
    """Symmetric int8 tensor: ``dequant = q.astype(f32) * scale``.

    ``scale`` broadcasts against ``q`` (per-channel: shape [1, 1, 1, O] for
    conv kernels; per-tensor: scalar).  NamedTuple => a native pytree node,
    so QTensor trees flow through jit/device_put unchanged.
    """

    q: jnp.ndarray      # int8
    scale: jnp.ndarray  # fp32


def _quantize_leaf(w: jnp.ndarray) -> QTensor:
    w = jnp.asarray(w, jnp.float32)
    if w.ndim >= 2:  # conv/dense kernel [..., O]: per-output-channel
        amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    else:
        amax = jnp.max(jnp.abs(w))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale.astype(jnp.float32))


def _should_quantize(path, leaf) -> bool:
    # Quantize only conv/dense KERNELS, identified by the param path name
    # (pruning.is_prunable uses the same gate) — biases, BN scale/bias and
    # statistics stay fp32 (they fold the conv epilogue, where precision
    # matters; the KPU likewise keeps per-channel bias terms wide).
    # jnp.issubdtype, NOT np's: np.issubdtype(bfloat16, np.floating) is
    # False, which would silently skip bf16 param trees.
    names = [str(getattr(p, "key", "")) for p in path]
    if "kernel" not in names:
        return False
    if not hasattr(leaf, "ndim") or leaf.ndim < 2:
        return False
    dtype = leaf.dtype if hasattr(leaf, "dtype") else np.asarray(leaf).dtype
    return jnp.issubdtype(dtype, jnp.floating)


def quantize_tree(tree: Any) -> Any:
    """params pytree -> same tree with every conv kernel as a QTensor."""
    return jax.tree_util.tree_map_with_path(
        lambda p, w: _quantize_leaf(w) if _should_quantize(p, w) else w, tree)


def dequantize_tree(tree: Any, dtype=jnp.float32) -> Any:
    """QTensor leaves -> dense arrays (traceable; runs inside jit)."""
    return jax.tree.map(
        lambda x: (x.q.astype(dtype) * x.scale.astype(dtype)
                   if isinstance(x, QTensor) else x),
        tree, is_leaf=lambda x: isinstance(x, QTensor))


def fake_quant_tree(tree: Any) -> Any:
    """Quantize -> dequantize in place: fp32 tree carrying int8 information."""
    return dequantize_tree(quantize_tree(tree))


def is_quantized(tree: Any) -> bool:
    found = []
    jax.tree.map(lambda x: found.append(isinstance(x, QTensor)) or x, tree,
                 is_leaf=lambda x: isinstance(x, QTensor))
    return any(found)
