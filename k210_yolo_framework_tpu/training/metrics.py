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

__all__ = ["init_pr_state", "update_pr_state", "pr_results"]


def init_pr_state() -> Dict[str, jnp.ndarray]:
    return {
        "tp": jnp.zeros((), jnp.float32),
        "fp": jnp.zeros((), jnp.float32),
        "fn": jnp.zeros((), jnp.float32),
    }


def update_pr_state(state: Dict[str, jnp.ndarray],
                    y_trues: Sequence[jnp.ndarray], y_preds: Sequence[jnp.ndarray],
                    thresh: float = 0.7, compat_logits: bool = False) -> Dict[str, jnp.ndarray]:
    """Accumulate TP/FP/FN over all output layers of one batch."""
    tp = state["tp"]
    fp = state["fp"]
    fn = state["fn"]
    for yt, yp in zip(y_trues, y_preds):
        true_conf = yt[..., 4]
        pred_conf = yp[..., 4].astype(jnp.float32)
        if not compat_logits:
            pred_conf = jax.nn.sigmoid(pred_conf)
        t = true_conf > thresh
        p = pred_conf > thresh
        tp = tp + jnp.sum((t & p).astype(jnp.float32))
        fp = fp + jnp.sum((~t & p).astype(jnp.float32))
        fn = fn + jnp.sum((t & ~p).astype(jnp.float32))
    return {"tp": tp, "fp": fp, "fn": fn}


def pr_results(state: Dict[str, jnp.ndarray]):
    """(precision, recall) with div_no_nan semantics (custom.py:43, 75)."""
    def div_no_nan(a, b):
        return jnp.where(b == 0, 0.0, a / jnp.where(b == 0, 1.0, b))

    precision = div_no_nan(state["tp"], state["tp"] + state["fp"])
    recall = div_no_nan(state["tp"], state["tp"] + state["fn"])
    return precision, recall
