"""Misc utilities: colormap, console log prefixes."""

from k210_yolo_framework_tpu.utils.console import ERROR, INFO, NOTE  # noqa: F401
