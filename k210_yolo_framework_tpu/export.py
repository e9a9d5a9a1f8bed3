"""Model export (the reference's freeze stage).

The reference freezes ``.h5 -> .tflite`` via TFLiteConverter and hands off to
nncase for ``.kmodel`` (/root/reference/keras_freeze.py:15-23; README.md:
144-154).  The TPU-native deliverable is the serving program itself:

  * the RAW-output model (``[B, h, w, a*(5+C)]`` heads, the reference's
    ``yolo_model`` export view) serialized as StableHLO via ``jax.export``
    — a portable, compiler-consumable artifact (the ``.tflite`` analogue);
  * an ``.h5`` weights file (the ``yolo_model.h5`` analogue);
  * printed input/output "node" names + shapes (keras_freeze.py:21-23 UX).

TFLite itself requires a TF installation, and kmodel requires nncase +
K210 hardware — both out of scope on this image (documented, not stubbed).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from k210_yolo_framework_tpu.config import YoloSpec
from k210_yolo_framework_tpu.models.yolonet import YoloNet
from k210_yolo_framework_tpu.training import checkpoint as CK

__all__ = ["export_stablehlo", "freeze"]


def export_stablehlo(net: YoloNet, variables: Dict, batch: int = 1) -> bytes:
    """Serialize the raw-output forward as StableHLO."""
    from jax import export as jexport

    def forward(x):
        return tuple(net.apply_raw(variables, x, train=False))

    x_spec = jax.ShapeDtypeStruct((batch, net.in_hw[0], net.in_hw[1], 3), jnp.float32)
    exported = jexport.export(jax.jit(forward))(x_spec)
    return exported.serialize()


def freeze(net: YoloNet, variables: Dict, spec: YoloSpec, out_dir: str,
           batch: int = 1) -> Dict[str, str]:
    """Write all export artifacts; returns {artifact: path}."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    hlo_path = out / "yolo_model.stablehlo"
    hlo_path.write_bytes(export_stablehlo(net, variables, batch))

    h5_path = out / "yolo_model.h5"
    CK.save_h5(str(h5_path), variables)

    print("Model Inputs Node:  image:0",
          (batch, net.in_hw[0], net.in_hw[1], 3), "float32")
    for l, hw in enumerate(spec.out_hws):
        print(f"Model Outputs Node: l{l + 1}/raw:0",
              (batch, hw[0], hw[1], spec.nanchors * spec.nchannels), "float32")

    return {"stablehlo": str(hlo_path), "h5": str(h5_path)}
