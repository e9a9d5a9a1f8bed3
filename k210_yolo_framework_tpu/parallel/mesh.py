"""Device mesh construction and sharding rules.

The reference is strictly single-GPU (/root/reference/keras_train.py:17-20;
SURVEY.md §2 parallelism rows) — there is nothing to translate.  This module
is the TPU-native scaling design instead:

  * a 3-axis ``Mesh``: ``data`` (batch/data parallel over ICI) x ``model``
    (tensor parallel over conv output channels for the wide trunk layers) x
    ``space`` (spatial partitioning: activation H sharded across chips —
    GSPMD inserts the halo exchanges convolutions need at shard edges);
  * batch arrays sharded ``P('data', ...)``; images additionally sharded
    ``P('data', 'space')`` on H (``image_sharding``) — label grids are tiny
    (7..20 rows) and stay data-sharded only;
  * conv kernels ``[kh, kw, in, out]`` sharded on ``out`` over ``model``
    when the channel count divides evenly and is large enough to matter —
    XLA GSPMD then inserts the all-gathers/psums (gradients ride a psum over
    ``data``/``space`` automatically from sharding propagation);
  * everything else replicated.

Spatial partitioning is the TPU recipe for images too large for one chip's
HBM (large-canvas training/serving); for the 224x320 demo net it is a
correctness-tested capability, not a speedup.

No pmap, no manual collectives: one ``jax.jit`` program, shardings attached
via NamedSharding, exactly the "pick a mesh, annotate, let XLA insert
collectives" recipe.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "image_sharding", "param_shardings",
           "replicated"]

DATA_AXIS = "data"
MODEL_AXIS = "model"
SPACE_AXIS = "space"


def make_mesh(dp: Optional[int] = None, mp: int = 1, sp: int = 1,
              devices=None) -> Mesh:
    """Mesh of shape (dp, mp, sp); dp defaults to n_devices // (mp * sp)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if dp is None:
        dp = n // (mp * sp)
    if dp * mp * sp != n:
        raise ValueError(f"dp*mp*sp = {dp}*{mp}*{sp} != {n} devices")
    return Mesh(devices.reshape(dp, mp, sp), (DATA_AXIS, MODEL_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC image sharding: batch over ``data``, H over ``space`` (spatial
    partitioning; GSPMD adds conv halo exchanges).  With sp == 1 this is
    exactly ``batch_sharding``."""
    if SPACE_AXIS not in mesh.shape or mesh.shape[SPACE_AXIS] == 1:
        return batch_sharding(mesh)
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))


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
