"""Test config: run everything on a virtual 8-device CPU mesh.

The host image preloads jax via /root/.axon_site/sitecustomize.py (the axon
TPU PJRT plugin) before this file runs, so env vars like JAX_PLATFORMS /
XLA_FLAGS are snapshotted too early to help — use jax.config instead, which
takes effect as long as no backend has been initialized yet.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compile cache: the suite is dominated by repeated XLA:CPU
# compiles of the same model graphs — cache them across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
