"""One-off: the FUSED train step (preprocess + fwd/bwd/update, one jit) with
and without the preprocess/step optimization_barrier, across batch sizes —
chasing the round-4 anomaly: (fused - bare) preprocess cost per image doubles
at batch 128 while standalone preprocess scales linearly.

Usage: python _probe_fused.py [batch ...]   (default: 64 128 256)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import TrainConfig, voc_spec
from k210_yolo_framework_tpu.data import pipeline as PL
from k210_yolo_framework_tpu.models import build_network
from k210_yolo_framework_tpu.training import train as T

spec = voc_spec()


def time_fused(batch, barrier, iters=30):
    cfg = TrainConfig(batch_size=batch)
    net = build_network("yolo_mobilev1", spec.in_hw, spec.nanchors,
                        spec.class_num, alpha=0.75, dtype=jnp.bfloat16,
                        safe_dw_grad=False)
    state = T.create_train_state(net, cfg, jax.random.PRNGKey(0))
    pp = PL.make_preprocess_fn(spec, is_training=True, dtype=jnp.bfloat16)
    step = T.make_fused_train_step(net, spec, cfg, train_epoch_step=100,
                                   preprocess=pp, barrier=barrier)

    rng = np.random.default_rng(0)
    canv = jnp.asarray(rng.integers(0, 256, (batch, 512, 512, 3)
                                    ).astype(np.uint8))
    hws = jnp.asarray(np.tile([360, 480], (batch, 1)).astype(np.int32))
    boxes = jnp.asarray(np.concatenate([
        rng.integers(0, 20, (batch, 64, 1)).astype(np.float32),
        rng.uniform(0.2, 0.8, (batch, 64, 2)),
        rng.uniform(0.1, 0.4, (batch, 64, 2))], -1).astype(np.float32))
    valid = jnp.asarray(np.zeros((batch, 64), bool)).at[:, :4].set(True)

    def one_step(state, key):
        key, sk = jax.random.split(key)
        state, logs = step(state, canv, hws, boxes, valid, sk)
        return state, logs, key

    key = jax.random.PRNGKey(1)
    state, logs, key = one_step(state, key)
    jax.block_until_ready(logs["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, logs, key = one_step(state, key)
        _ = float(logs["loss"])
        best = min(best, time.perf_counter() - t0)
    ms = best / iters * 1e3
    print(f"batch {batch:4d} barrier {str(barrier):5s}: {ms:7.2f} ms/step "
          f"{batch / best * iters:8.1f} imgs/sec", flush=True)
    return ms


if __name__ == "__main__":
    from k210_yolo_framework_tpu.ops import augment as A
    args = sys.argv[1:]
    impls = [a for a in args if a in ("slice", "pallas", "auto")]
    batches = [int(b) for b in args if b.isdigit()] or [64, 128, 256]
    for impl in impls or [None]:
        if impl is not None:
            A.ROTATE_IMPL = impl
            print(f"# rotate_impl={impl}", flush=True)
        for b in batches:
            time_fused(b, True)
