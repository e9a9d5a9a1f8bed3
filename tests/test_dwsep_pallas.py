"""Fused dw-separable block kernel vs the pure-XLA oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.ops import dwsep_pallas as F


def _case(b, h, w, c, cout, seed, dtype):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32)).astype(dtype)
    dw_k = jnp.asarray(rng.normal(0, 0.3, (3, 3, c)).astype(np.float32))
    pw_k = jnp.asarray(rng.normal(0, 0.1, (c, cout)).astype(np.float32))
    # folded-BN style scales around 1, biases around 0
    dw_mul = jnp.asarray(rng.uniform(0.5, 1.5, (c,)).astype(np.float32))
    dw_add = jnp.asarray(rng.normal(0, 0.2, (c,)).astype(np.float32))
    pw_mul = jnp.asarray(rng.uniform(0.5, 1.5, (cout,)).astype(np.float32))
    pw_add = jnp.asarray(rng.normal(0, 0.2, (cout,)).astype(np.float32))
    return x, dw_k, dw_mul, dw_add, pw_k, pw_mul, pw_add


@pytest.mark.parametrize("shape", [
    (2, 14, 20, 48, 96),      # deep-layer scale
    (1, 7, 10, 96, 96),       # smallest grid
    (2, 28, 40, 24, 48),      # mid
    (1, 9, 13, 16, 24),       # odd, non-tile-aligned sizes
], ids=["d14x20", "d7x10", "d28x40", "odd9x13"])
def test_kernel_matches_oracle_f32(shape):
    b, h, w, c, cout = shape
    args = _case(b, h, w, c, cout, 0, jnp.float32)
    got = F.fused_dwsep(*args, interpret=True)
    want = F.fused_dwsep_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_matches_oracle_bf16():
    args = _case(2, 14, 20, 64, 96, 1, jnp.bfloat16)
    got = F.fused_dwsep(*args, interpret=True)
    want = F.fused_dwsep_reference(*args)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05)  # bf16 mantissa; both paths accumulate fp32


def test_fold_bn_matches_batchnorm_eval():
    rng = np.random.default_rng(2)
    c = 24
    x = jnp.asarray(rng.normal(0, 1, (2, 5, 5, c)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 1, (c,)).astype(np.float32))
    mean = jnp.asarray(rng.normal(0, 1, (c,)).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.3, 2.0, (c,)).astype(np.float32))
    eps = 1e-3
    mul, add = F.fold_bn(scale, bias, mean, var, eps)
    got = x * mul + add
    want = scale * (x - mean) / jnp.sqrt(var + eps) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)
