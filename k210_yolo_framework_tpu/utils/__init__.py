"""Misc utilities: colormap, console log prefixes, CLI flag parsing."""

from typing import Optional

from k210_yolo_framework_tpu.utils.console import ERROR, INFO, NOTE  # noqa: F401


def quantize_mode(flag: str) -> Optional[str]:
    """Parse the CLI ``--quantize`` string (reference-style string booleans,
    keras_train.py:46): 'true'/'int8' -> int8 weight storage; 'int8_act' ->
    int8 MXU conv compute with dynamic activation quantization (fp32 weight
    masters, quantized inside the program); anything else -> None."""
    v = str(flag).lower()
    if v in ("true", "int8"):
        return "int8"
    # _sym = symmetric act scales, _cal = static calibrated ranges
    if v in ("int8_act", "int8_act_sym", "int8_act_cal"):
        return v
    if v in ("false", "none", "", "0", "no"):
        return None
    # a typo'd mode must NOT silently serve fp32 and report it as quantized
    raise ValueError(
        f"unknown --quantize value {flag!r}; expected one of "
        "True/int8, int8_act, int8_act_sym, int8_act_cal, False")
