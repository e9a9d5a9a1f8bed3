"""Device mesh construction and sharding rules.

The reference is strictly single-GPU (/root/reference/keras_train.py:17-20;
SURVEY.md §2 parallelism rows) — there is nothing to translate.  This module
is the TPU-native scaling design instead:

  * a 2-axis ``Mesh``: ``data`` (batch/data parallel over ICI) x ``model``
    (tensor parallel over conv output channels for the wide trunk layers);
  * batch arrays sharded ``P('data', ...)``;
  * conv kernels ``[kh, kw, in, out]`` sharded on ``out`` over ``model``
    when the channel count divides evenly and is large enough to matter —
    XLA GSPMD then inserts the all-gathers/psums (gradients ride a psum over
    ``data`` automatically from sharding propagation);
  * everything else replicated.

No pmap, no manual collectives: one ``jax.jit`` program, shardings attached
via NamedSharding, exactly the "pick a mesh, annotate, let XLA insert
collectives" recipe.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "param_shardings", "replicated"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: Optional[int] = None, mp: int = 1, devices=None) -> Mesh:
    """Mesh of shape (dp, mp); dp defaults to n_devices // mp."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if dp is None:
        dp = n // mp
    if dp * mp != n:
        raise ValueError(f"dp*mp = {dp}*{mp} != {n} devices")
    return Mesh(devices.reshape(dp, mp), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh, min_channels: int = 128):
    """Per-leaf NamedSharding for a params pytree.

    Conv kernels [kh, kw, cin, cout] with cout divisible by the model-axis
    size and >= ``min_channels`` get P(None, None, None, 'model'); everything
    else is replicated.  With mp == 1 this degrades to pure DP.
    """
    mp = mesh.shape[MODEL_AXIS]

    def rule(leaf):
        if (mp > 1 and hasattr(leaf, "ndim") and leaf.ndim == 4
                and leaf.shape[-1] % mp == 0 and leaf.shape[-1] >= min_channels):
            return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)
