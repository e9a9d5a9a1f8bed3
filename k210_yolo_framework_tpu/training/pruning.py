"""Magnitude pruning inside the train step.

Replaces the reference's tfmot integration
(/root/reference/keras_train.py:60-71, 87-90, 102-107):

  * ``PolynomialDecay(initial, final, begin=0, end_step, frequency)``
    sparsity schedule (cubic ramp, tfmot semantics);
  * masks recomputed every ``frequency`` steps from weight magnitudes
    (per-kernel quantile threshold);
  * masks re-applied to the params after EVERY optimizer update so Adam
    momentum cannot revive pruned weights (tfmot does the same via its
    UpdatePruningStep callback);
  * ``strip_pruning`` equivalent: the saved params are already masked —
    saving them IS the strip (keras_train.py:102-107 saves the unwrapped
    model).

Everything is branchless jnp (``lax.cond`` on the step counter), so pruning
lives inside the jitted train step rather than a host callback.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = ["polynomial_sparsity", "init_masks", "update_masks", "apply_masks",
           "is_prunable", "sparsity_of"]


def polynomial_sparsity(step: jnp.ndarray, initial: float, final: float,
                        begin_step: int, end_step: int, power: int = 3) -> jnp.ndarray:
    """tfmot PolynomialDecay: s(t) = final + (initial-final)*(1 - p)^power,
    p = clip((t - begin)/(end - begin), 0, 1)."""
    span = max(end_step - begin_step, 1)
    p = jnp.clip((step - begin_step) / span, 0.0, 1.0)
    return final + (initial - final) * jnp.power(1.0 - p, power)


def is_prunable(path, leaf) -> bool:
    """Prune conv/dense kernels (4D or 2D 'kernel' leaves) — what tfmot's
    prune_low_magnitude wraps on the reference's conv-only models."""
    names = [str(getattr(p, "key", "")) for p in path]
    return "kernel" in names and getattr(leaf, "ndim", 0) in (2, 4)


def init_masks(params) -> Any:
    """All-ones masks over prunable leaves; scalar 1.0 elsewhere (broadcasts)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = [jnp.ones_like(l) if is_prunable(p, l) else jnp.ones((), l.dtype)
              for p, l in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def update_masks(params, masks, sparsity: jnp.ndarray):
    """Recompute per-kernel magnitude masks at the given sparsity."""
    flat_p = jax.tree_util.tree_flatten_with_path(params)
    flat_m = jax.tree_util.tree_flatten(masks)

    new_leaves = []
    for (path, w), m in zip(flat_p[0], flat_m[0]):
        if is_prunable(path, w):
            mag = jnp.abs(w).ravel()
            thr = jnp.quantile(mag, jnp.clip(sparsity, 0.0, 1.0))
            # >= keeps threshold ties (tfmot's keep-top-k semantics): a
            # strict > would prune the min-magnitude weight even at
            # sparsity 0, and overshoot the target on ties
            new_leaves.append((jnp.abs(w) >= thr).astype(w.dtype))
        else:
            new_leaves.append(m)
    return jax.tree_util.tree_unflatten(flat_m[1], new_leaves)


def apply_masks(params, masks):
    return jax.tree.map(lambda w, m: w * m, params, masks)


def sparsity_of(params, masks) -> jnp.ndarray:
    """Achieved sparsity over prunable leaves (for logging/tests)."""
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_m = jax.tree_util.tree_flatten(masks)[0]
    zeros = jnp.zeros(())
    total = jnp.zeros(())
    for (path, w), m in zip(flat_p, flat_m):
        if is_prunable(path, w):
            zeros = zeros + jnp.sum(1.0 - m)
            total = total + m.size
    return zeros / jnp.maximum(total, 1.0)
