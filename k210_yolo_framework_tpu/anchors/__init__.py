"""Anchor generation (kmeans with 1-IoU distance)."""

from k210_yolo_framework_tpu.anchors.kmeans import (  # noqa: F401
    generate_anchors,
    kmeans_iou,
    letterbox_correct_boxes,
)
