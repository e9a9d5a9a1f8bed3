"""One-off: profile the fused train step (demo config) on the TPU.

Usage: python _profile_r3.py [batch]   (default 64; trace -> /tmp/trace_r3b)
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import TrainConfig, voc_spec
from k210_yolo_framework_tpu.data import pipeline as PL
from k210_yolo_framework_tpu.models import build_network
from k210_yolo_framework_tpu.training import train as T

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
spec = voc_spec()
cfg = TrainConfig(batch_size=batch)
net = build_network("yolo_mobilev1", spec.in_hw, spec.nanchors,
                    spec.class_num, alpha=0.75, dtype=jnp.bfloat16,
                    safe_dw_grad=False)
state = T.create_train_state(net, cfg, jax.random.PRNGKey(0))
pp = PL.make_preprocess_fn(spec, is_training=True, dtype=jnp.bfloat16)
step = T.make_fused_train_step(net, spec, cfg, train_epoch_step=100,
                               preprocess=pp)

rng = np.random.default_rng(0)
canv = jnp.asarray(rng.integers(0, 256, (batch, 512, 512, 3)).astype(np.uint8))
hws = jnp.asarray(np.tile([360, 480], (batch, 1)).astype(np.int32))
boxes = jnp.asarray(np.concatenate([
    rng.integers(0, 20, (batch, 64, 1)).astype(np.float32),
    rng.uniform(0.2, 0.8, (batch, 64, 2)),
    rng.uniform(0.1, 0.4, (batch, 64, 2))], -1).astype(np.float32))
valid = jnp.asarray(np.zeros((batch, 64), bool)).at[:, :4].set(True)

key = jax.random.PRNGKey(1)
for _ in range(3):  # warmup + compile
    key, sk = jax.random.split(key)
    state, logs = step(state, canv, hws, boxes, valid, sk)
jax.block_until_ready(logs["loss"])

jax.profiler.start_trace("/tmp/trace_r3b")
for _ in range(4):
    key, sk = jax.random.split(key)
    state, logs = step(state, canv, hws, boxes, valid, sk)
jax.block_until_ready(logs["loss"])
jax.profiler.stop_trace()
print("profile done")
