"""One-off: profile the serving program on the TPU.

Usage: python _profile_serve.py [quantize_mode] [batch] [model_def] [alpha]
       (defaults: bf16 weights, batch 128, the demo yolo_mobilev1-0.75;
        pass 'none' for quantize_mode to skip it positionally)
Then distill with: python _mine_trace.py /tmp/trace_serve 4
"""
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import bench as B

quantize = sys.argv[1] if len(sys.argv) > 1 else None
if quantize in ("none", ""):
    quantize = None
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
if len(sys.argv) > 3:
    B.MODEL_DEF = sys.argv[3]
if len(sys.argv) > 4:
    B.ALPHA = float(sys.argv[4])
canvas_hw = (240, 320)

_, pred = B._demo_predictor(quantize=quantize)
rng = np.random.default_rng(0)
canvases = jnp.asarray(
    rng.integers(0, 256, (batch, *canvas_hw, 3)).astype(np.uint8))
img_hws = jnp.asarray(np.tile(canvas_hw, (batch, 1)).astype(np.int32))
if quantize == "int8_act_cal":
    pred.calibrate(canvases, img_hws)


@partial(jax.jit, donate_argnums=(0,))
def step(canv):
    res = pred._run_batch(pred.variables, canv, img_hws)
    bump = (res.scores.sum() > 1e9).astype(jnp.uint8)
    return canv + bump, res.scores.sum()


canv, out = step(jnp.copy(canvases))
jax.block_until_ready(out)
for _ in range(3):
    canv, out = step(canv)
jax.block_until_ready(out)

jax.profiler.start_trace("/tmp/trace_serve")
for _ in range(4):
    canv, out = step(canv)
jax.block_until_ready(out)
jax.profiler.stop_trace()
print("trace written to /tmp/trace_serve")
