"""Device mesh + sharding rules (jax.sharding / GSPMD)."""

from k210_yolo_framework_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    image_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
