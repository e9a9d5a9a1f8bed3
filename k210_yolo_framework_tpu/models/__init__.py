"""Model zoo registry.

Mirrors the reference's string-selected builders
(/root/reference/keras_train.py:49 ``eval(model_def)``) minus the ``eval``:
``build_network('yolo_mobilev1', ...)``.
"""

from k210_yolo_framework_tpu.models.yolonet import (  # noqa: F401
    NETWORKS,
    YoloNet,
    build_network,
)
