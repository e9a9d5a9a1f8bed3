"""kmeans anchor generation with 1-IoU distance (jnp, on-device).

Reference: /root/reference/make_anchor_list.py.
  * every gt box is letterbox-corrected to net scale first (lines 187-199,
    same affine as the image pipeline including integer truncation);
  * distance = 1 - IoU with centers aligned (``tf_fake_iou``, lines 10-39);
  * assignment on device, means per cluster (lines 42-82); an empty cluster
    yields NaN means — the reference detects NaN and asks for a rerun
    (lines 216-217), behavior kept;
  * centroids sorted DESCENDING by w so layer 0 gets the biggest anchors
    (lines 211-213), reshaped to [layers, anchor_num, 2].

The assignment/means loop is a jitted ``lax.fori_loop``: distances [m, k]
via broadcast, means via one-hot matmul (MXU) — no host round-trips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from k210_yolo_framework_tpu.ops.boxes import centered_iou

__all__ = ["letterbox_correct_boxes", "kmeans_iou", "generate_anchors"]


def letterbox_correct_boxes(ann_list: np.ndarray, in_hw: Tuple[int, int]) -> np.ndarray:
    """All gt wh pairs, letterbox-corrected to net scale
    (make_anchor_list.py:187-202).  Returns [n, 2] float64."""
    in_wh = np.array(in_hw[::-1], dtype=np.float64)
    whs = []
    for row in ann_list:
        boxes = np.array(row[1], dtype=np.float64, copy=True)
        img_wh = np.asarray(row[2], dtype=np.float64)[::-1]
        scale = np.min(in_wh / img_wh)
        whs.append(boxes[:, 3:5] * img_wh * scale / in_wh)
    return np.vstack(whs)


def kmeans_iou(x: jnp.ndarray, init_centroids: jnp.ndarray, iters: int = 10,
               keep_empty: bool = False, return_history: bool = False):
    """kmeans with d = 1 - centered IoU.  Returns (centroids, assignment),
    plus the per-iteration centroid history [iters, k, 2] when
    ``return_history`` (the reference's iteration plot data,
    make_anchor_list.py:85-103, 142-177).

    Empty clusters produce NaN centroids (reference parity; the reference
    CLI then asks the user to rerun).  With ``keep_empty=True`` an emptied
    cluster instead retains its previous centroid — the standard robust
    fix — so a run always yields finite anchors."""
    k = init_centroids.shape[0]

    def one_iter(carry, _):
        cents, _ = carry
        d = 1.0 - centered_iou(x[:, None, :], cents[None, :, :])  # [m, k]
        idx = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(idx, k, dtype=x.dtype)             # [m, k]
        sums = onehot.T @ x                                        # [k, 2]
        counts = onehot.sum(axis=0)[:, None]                       # [k, 1]
        if keep_empty:
            new_cents = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), cents)
        else:
            new_cents = sums / counts                              # NaN when empty
        return (new_cents, idx), new_cents

    (cents, idx), history = jax.lax.scan(
        one_iter, (init_centroids, jnp.zeros((x.shape[0],), jnp.int32)),
        length=iters)
    if return_history:
        return cents, idx, history
    return cents, idx


def generate_anchors(ann_list: np.ndarray, in_hw: Tuple[int, int],
                     layers: int, anchor_num: int, max_iters: int = 10,
                     is_random: bool = True, low=(0.0, 0.0), high=(1.0, 1.0),
                     seed: Optional[int] = None, retries: int = 10,
                     history_sink: Optional[list] = None) -> np.ndarray:
    """Full flow of make_anchor_list.main (lines 180-220).

    Returns [layers, anchor_num, 2] normalized anchors.  A cluster that
    empties mid-run yields NaN centroids; the reference tells the user to
    rerun (lines 216-217) — here random inits automatically retry up to
    ``retries`` times, then fall back to empty-cluster-preserving kmeans
    so the call always converges to finite anchors.

    Runs pinned to host CPU: the working set is a few dozen wh pairs, far
    below the latency of shipping the loop to an accelerator.

    ``history_sink``: a list; when given it receives (wh_points [n, 2],
    centroid_history [iters, k, 2]) for the winning run — the data behind
    the reference's kmeans progress plot (make_anchor_list.py:85-103).
    """
    x = letterbox_correct_boxes(ann_list, in_hw).astype(np.float32)
    k = layers * anchor_num
    rng = np.random.default_rng(seed)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:  # cpu backend unavailable (unusual) — use default
        cpu = None
    fit_jit = jax.jit(kmeans_iou,
                      static_argnames=("iters", "keep_empty", "return_history"))

    def fit(x, init, **kw):
        # host-scale work pinned to CPU via input placement (jit's device=
        # parameter is deprecated); outputs follow the inputs' device
        if cpu is not None:
            x = jax.device_put(x, cpu)
            init = jax.device_put(init, cpu)
        return fit_jit(x, init, **kw)

    def make_init():
        if is_random:
            return np.hstack([
                rng.uniform(low[0], high[0], (k, 1)),
                rng.uniform(low[1], high[1], (k, 1)),
            ]).astype(np.float32)
        return np.vstack([np.linspace(0.05, 0.3, num=k),
                          np.linspace(0.05, 0.5, num=k)]).T.astype(np.float32)

    want_hist = history_sink is not None
    history = None
    for attempt in range(max(1, retries) if is_random else 1):
        init = make_init()
        out = fit(jnp.asarray(x), jnp.asarray(init), iters=max_iters,
                  return_history=want_hist)
        cents, history = np.asarray(out[0]), (np.asarray(out[2]) if want_hist else None)
        if not np.any(np.isnan(cents)):
            break
    if np.any(np.isnan(cents)):
        # robust fallback: empty clusters keep their previous centroid
        out = fit(jnp.asarray(x), jnp.asarray(make_init()),
                  iters=max_iters, keep_empty=True, return_history=want_hist)
        cents, history = np.asarray(out[0]), (np.asarray(out[2]) if want_hist else None)
    if want_hist:
        history_sink.append((x, history))
    # sort by -w: layer 0 gets the biggest anchors (lines 211-213)
    cents = np.array(sorted(cents, key=lambda c: -c[0]))
    return cents.reshape(layers, anchor_num, 2)
