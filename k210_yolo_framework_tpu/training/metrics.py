"""Streaming confidence-channel precision/recall.

Functional port of ``Yolo_Precision`` / ``Yolo_Recall``
(/root/reference/tools/custom.py:13-75): TP/FP/FN counted on the confidence
channel only, thresholded, accumulated across steps, ``div_no_nan`` results.

Reference quirk (SURVEY.md §7): custom.py computes
``sigmoid(pred_confidence)`` (lines 31, 63) but then thresholds the RAW
LOGITS (lines 33, 37, 65, 69).  The fixed behavior (threshold the sigmoid) is
the default here; ``compat_logits=True`` reproduces the reference bit-for-bit.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

__all__ = ["init_pr_state", "update_pr_state", "pr_results",
           "pr_results_per_layer"]


def init_pr_state(n_layers: int = 1) -> Dict[str, jnp.ndarray]:
    """Per-output-layer TP/FP/FN counters ([n_layers] each) — the reference
    attaches one Yolo_Precision/Yolo_Recall metric pair per output
    (keras_train.py:79), so per-layer visibility is part of the UX."""
    # three DISTINCT arrays: sharing one buffer breaks donation (the train
    # step donates the whole state; XLA rejects donating one buffer twice)
    return {k: jnp.zeros((n_layers,), jnp.float32) for k in ("tp", "fp", "fn")}


def update_pr_state(state: Dict[str, jnp.ndarray],
                    y_trues: Sequence[jnp.ndarray], y_preds: Sequence[jnp.ndarray],
                    thresh: float = 0.7, compat_logits: bool = False) -> Dict[str, jnp.ndarray]:
    """Accumulate per-layer TP/FP/FN over one batch's output layers."""
    tps, fps, fns = [], [], []
    for yt, yp in zip(y_trues, y_preds):
        true_conf = yt[..., 4]
        pred_conf = yp[..., 4].astype(jnp.float32)
        if not compat_logits:
            pred_conf = jax.nn.sigmoid(pred_conf)
        t = true_conf > thresh
        p = pred_conf > thresh
        tps.append(jnp.sum((t & p).astype(jnp.float32)))
        fps.append(jnp.sum((~t & p).astype(jnp.float32)))
        fns.append(jnp.sum((t & ~p).astype(jnp.float32)))
    return {"tp": state["tp"] + jnp.stack(tps),
            "fp": state["fp"] + jnp.stack(fps),
            "fn": state["fn"] + jnp.stack(fns)}


def _div_no_nan(a, b):
    return jnp.where(b == 0, 0.0, a / jnp.where(b == 0, 1.0, b))


def pr_results(state: Dict[str, jnp.ndarray]):
    """Aggregate (precision, recall) over all layers, div_no_nan semantics
    (custom.py:43, 75)."""
    tp = jnp.sum(state["tp"])
    fp = jnp.sum(state["fp"])
    fn = jnp.sum(state["fn"])
    return _div_no_nan(tp, tp + fp), _div_no_nan(tp, tp + fn)


def pr_results_per_layer(state: Dict[str, jnp.ndarray]):
    """([n_layers] precision, [n_layers] recall) — the reference's
    ``l1_precision_N``/``l1_recall_N`` progress-bar columns."""
    precision = _div_no_nan(state["tp"], state["tp"] + state["fp"])
    recall = _div_no_nan(state["tp"], state["tp"] + state["fn"])
    return precision, recall
