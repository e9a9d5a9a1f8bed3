"""Streaming precision/recall semantics (incl. the compat_logits quirk)."""

import numpy as np
import jax.numpy as jnp

from k210_yolo_framework_tpu.training import metrics as M


def _batches():
    # conf channel only matters; craft y[..., 4]
    yt = np.zeros((2, 2, 2, 1, 25), np.float32)
    yp = np.zeros((2, 2, 2, 1, 25), np.float32)
    yt[0, 0, 0, 0, 4] = 1.0   # positive
    yp[0, 0, 0, 0, 4] = 4.0   # sigmoid ~0.982 > 0.7 -> TP
    yt[0, 1, 1, 0, 4] = 1.0   # positive
    yp[0, 1, 1, 0, 4] = -4.0  # sigmoid ~0.018 -> FN
    yp[1, 0, 1, 0, 4] = 4.0   # no truth -> FP
    return [jnp.asarray(yt)], [jnp.asarray(yp)]


def test_precision_recall_fixed_semantics():
    yts, yps = _batches()
    s = M.update_pr_state(M.init_pr_state(), yts, yps, thresh=0.7)
    p, r = M.pr_results(s)
    assert float(s["tp"][0]) == 1 and float(s["fp"][0]) == 1 and float(s["fn"][0]) == 1
    assert abs(float(p) - 0.5) < 1e-6 and abs(float(r) - 0.5) < 1e-6


def test_compat_logits_reproduces_reference_bug():
    """Reference thresholds raw logits (custom.py:33): logit 0.71 > 0.7 counts
    as predicted-positive even though sigmoid(0.71) ~ 0.67 < 0.7."""
    yt = np.zeros((1, 1, 1, 1, 25), np.float32)
    yp = np.zeros((1, 1, 1, 1, 25), np.float32)
    yt[..., 4] = 1.0
    yp[..., 4] = 0.71
    fixed = M.update_pr_state(M.init_pr_state(), [jnp.asarray(yt)], [jnp.asarray(yp)], 0.7)
    compat = M.update_pr_state(M.init_pr_state(), [jnp.asarray(yt)], [jnp.asarray(yp)], 0.7,
                               compat_logits=True)
    assert float(fixed["tp"][0]) == 0 and float(fixed["fn"][0]) == 1
    assert float(compat["tp"][0]) == 1 and float(compat["fn"][0]) == 0


def test_div_no_nan_on_empty():
    p, r = M.pr_results(M.init_pr_state())
    assert float(p) == 0.0 and float(r) == 0.0


def test_streaming_accumulates():
    yts, yps = _batches()
    s = M.init_pr_state()
    s = M.update_pr_state(s, yts, yps, 0.7)
    s = M.update_pr_state(s, yts, yps, 0.7)
    assert float(s["tp"][0]) == 2 and float(s["fp"][0]) == 2 and float(s["fn"][0]) == 2


def test_per_layer_pr_isolation():
    """Layer counters are independent: a TP on layer 1 and an FP on layer 2
    must land in their own rows (the reference's per-output metric pairs,
    keras_train.py:79)."""
    yt1 = np.zeros((1, 2, 2, 1, 25), np.float32)
    yp1 = np.zeros((1, 2, 2, 1, 25), np.float32)
    yt1[0, 0, 0, 0, 4] = 1.0
    yp1[0, 0, 0, 0, 4] = 4.0   # layer-1 TP
    yt2 = np.zeros((1, 4, 4, 1, 25), np.float32)
    yp2 = np.zeros((1, 4, 4, 1, 25), np.float32)
    yp2[0, 1, 1, 0, 4] = 4.0   # layer-2 FP
    s = M.update_pr_state(M.init_pr_state(2),
                          [jnp.asarray(yt1), jnp.asarray(yt2)],
                          [jnp.asarray(yp1), jnp.asarray(yp2)], 0.7)
    assert list(np.asarray(s["tp"])) == [1.0, 0.0]
    assert list(np.asarray(s["fp"])) == [0.0, 1.0]
    p_l, r_l = M.pr_results_per_layer(s)
    assert float(p_l[0]) == 1.0 and float(p_l[1]) == 0.0
    p, r = M.pr_results(s)  # aggregate pools the counters
    assert abs(float(p) - 0.5) < 1e-6
