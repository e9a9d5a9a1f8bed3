#!/usr/bin/env python3
"""Benchmark: end-to-end serving throughput on the demo config.

Measures imgs/sec/chip for the FULL pipeline — uint8 frames in, final
NMS'd detections out (letterbox + normalize + yolo_mobilev1-0.75 forward
in bf16 + decode + per-class Pallas NMS), batch-parallel on one chip at
224x320 — the BASELINE.md north-star metric (target >= 10,000
imgs/sec/chip on v5e).

Methodology: each iteration's input depends on the previous iteration's
output (a data-dependent +0/+1 bump), so the timed loop forms a true
on-device dependency chain; blocking on the last result therefore times
ALL iterations.  (Plain ``block_until_ready`` does not serialize prior
dispatches on every platform, which inflates async-enqueue timings.)

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from k210_yolo_framework_tpu.config import voc_spec
    from k210_yolo_framework_tpu.inference import Predictor
    from k210_yolo_framework_tpu.models import build_network

    spec = voc_spec()
    net = build_network("yolo_mobilev1", spec.in_hw, spec.nanchors,
                        spec.class_num, alpha=0.75)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0))

    pred = Predictor(net, variables, spec, obj_thresh=0.7, iou_thresh=0.3,
                     compute_dtype=jnp.bfloat16)

    batch = 256
    rng = np.random.default_rng(0)
    # fixed-size camera-style frames; letterbox runs on device
    canvases = jnp.asarray(rng.integers(0, 256, (batch, 240, 320, 3)).astype(np.uint8))
    img_hws = jnp.asarray(np.tile([240, 320], (batch, 1)).astype(np.int32))

    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def step(canv):
        res = pred._run_batch(pred.variables, canv, img_hws)
        # data-dependent bump chains the next iteration to this result
        bump = (res.scores.sum() > 1e9).astype(jnp.uint8)
        return canv + bump, res.scores.sum()

    canv, out = step(jnp.copy(canvases))  # warmup/compile
    jax.block_until_ready(out)

    # best of 3 rounds: the dispatch path adds run-to-run noise that only
    # inflates times, so min is the faithful steady-state estimate
    iters, best = 50, float("inf")
    for _ in range(3):
        canv = jnp.copy(canvases)         # fresh donatable buffer per round
        t0 = time.perf_counter()
        for _ in range(iters):
            canv, out = step(canv)
        _ = float(out)                    # host fetch = hard completion barrier
        best = min(best, time.perf_counter() - t0)

    imgs_per_sec = batch * iters / best
    baseline = 10000.0  # north-star target (BASELINE.md)
    print(json.dumps({
        "metric": "e2e_infer_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 1),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / baseline, 4),
    }))


if __name__ == "__main__":
    main()
