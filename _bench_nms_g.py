"""One-off: time fused_decode_nms alone at various images-per-program G.

Chained-dependency timing, batch 256, VOC demo spec (1050 candidates).
"""
from functools import partial
import time

import numpy as np
import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import voc_spec
from k210_yolo_framework_tpu.ops.yolo_head_pallas import fused_decode_nms

spec = voc_spec()
batch = 256
rng = np.random.default_rng(0)
preds = [jnp.asarray(rng.normal(0, 1, (batch, h, w, spec.nanchors,
                                       5 + spec.class_num)).astype(np.float32))
         for (h, w) in spec.out_hws]
img_hws = jnp.asarray(np.tile([240, 320], (batch, 1)).astype(np.int32))

for G in (None, 4, 8, 16, 32, 64):
    @partial(jax.jit, donate_argnums=(0,))
    def step(p0, p1):
        res = fused_decode_nms([p0, p1], spec, img_hws,
                               images_per_program=G)
        bump = (res.scores.sum() > 1e9).astype(jnp.float32)
        return p0 + bump, p1 + bump, res.scores.sum()

    try:
        p0, p1, out = step(jnp.copy(preds[0]), jnp.copy(preds[1]))
        jax.block_until_ready(out)
        iters, best = 100, float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                p0, p1, out = step(p0, p1)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"G={G}: {best*1e3:.3f} ms/batch "
              f"({batch/best:.0f} imgs/sec kernel-only)")
    except Exception as e:
        print(f"G={G}: FAILED {type(e).__name__}: {str(e)[:200]}")
