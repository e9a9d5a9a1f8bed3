"""TPU-native YOLOv3 framework.

A brand-new JAX/XLA/Pallas re-design of the K210_Yolo_framework reference
(anchor-based YOLOv3 detectors with n output layers x m anchors, K210-modified
MobileNetV1/V2 / tiny-yolo / full-yolo backbones, kmeans anchor generation,
magnitude pruning, and a fused decode + per-class NMS serving path).

Layout:
    config      frozen specs (grids, anchors, train hyperparams)
    ops         pure jnp geometry/codec/augment/decode/NMS ops (+ pallas kernels)
    models      flax.linen model zoo
    training    loss, metrics, train step, pruning, checkpointing
    data        annotation format + input pipeline
    anchors     kmeans anchor generation (1-IoU distance)
    parallel    device mesh + sharding rules
    inference   Predictor (single image, batched, mesh-sharded serving)
    eval        VOC mAP harness
    export      StableHLO / weights artifacts
    native      ctypes bindings for the C++ loader + region layer (csrc/)
    compat      reference-compatible ``Helper`` migration facade
    port        reference Keras .h5 -> flax pytree weight porting
"""

__version__ = "0.1.0"

from k210_yolo_framework_tpu.config import TrainConfig, YoloSpec  # noqa: F401
