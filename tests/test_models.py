"""Model zoo: output shapes, dual raw/reshaped contract, K210 width mods."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.models import build_network

import shared

IN_HW = (224, 320)


def _count_params(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


@pytest.mark.parametrize("name,nlayers", [
    ("yolo_mobilev1", 2),
    ("yolo_mobilev2", 2),
    ("tiny_yolo", 2),
])
def test_two_scale_shapes(name, nlayers):
    # shape-only assertions: eval_shape traces without compiling/computing
    net = build_network(name, IN_HW, anchor_num=3, class_num=20, alpha=0.75)
    variables = jax.eval_shape(net.init, jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct((2, *IN_HW, 3), jnp.float32)
    raw = jax.eval_shape(net.apply_raw, variables, x)
    assert len(raw) == nlayers
    # layer 0 coarsest (7x10), layer 1 finer (14x20) @ 224x320 (yolonet.py:40-41)
    assert raw[0].shape == (2, 7, 10, 75)
    assert raw[1].shape == (2, 14, 20, 75)
    wrapped = jax.eval_shape(net.apply, variables, x)
    assert wrapped[0].shape == (2, 7, 10, 3, 25)
    assert wrapped[1].shape == (2, 14, 20, 3, 25)


def test_full_yolo_three_scales():
    # shape-only -> eval_shape (no darknet53 compile; its numerics run in
    # the config-matrix slow tests); strides 32/16/8 unchanged
    net = build_network("yolo", (96, 96), anchor_num=3, class_num=20)
    variables = jax.eval_shape(net.init, jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct((1, 96, 96, 3), jnp.float32)
    raw = jax.eval_shape(net.apply_raw, variables, x)
    assert [o.shape for o in raw] == [(1, 3, 3, 75), (1, 6, 6, 75), (1, 12, 12, 75)]


def test_input_scale_fold_matches_explicit_divide():
    """Serving folds the reference's per-image /max normalisation
    (utils.py:404-405) past the linear stem conv: apply(x, input_scale=1/s)
    must match apply(x/s) — conv is linear, so only rounding differs."""
    net, variables = shared.net_and_vars("yolo_mobilev1", (96, 128), 3, 20,
                                         alpha=0.75)
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (2, 96, 128, 3)).astype(np.float32)
    s = x.reshape(2, -1).max(axis=1)
    want = net.apply(variables, jnp.asarray(x / s[:, None, None, None]))
    got = net.apply(variables, jnp.asarray(x.astype(np.uint8)),
                    input_scale=jnp.asarray(1.0 / s))
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_custom_anchor_num():
    """ANCNUM=5 stresses n-layer/m-anchor generality (BASELINE.json configs)."""
    net = build_network("yolo", (96, 96), anchor_num=5, class_num=20)
    variables = jax.eval_shape(net.init, jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct((1, 96, 96, 3), jnp.float32)
    raw = jax.eval_shape(net.apply_raw, variables, x)
    assert raw[0].shape == (1, 3, 3, 5 * 25)
    wrapped = jax.eval_shape(net.apply, variables, x)
    assert wrapped[2].shape == (1, 12, 12, 5, 25)


def test_mobilenet_v1_k210_block1_mod():
    """Block-1 pointwise: 40 if alpha==1 else 64 (keras_mobilenet.py:217)."""
    for alpha, want in [(1.0, 40), (0.75, int(64 * 0.75)), (0.5, 32)]:
        net = build_network("yolo_mobilev1", IN_HW, 3, 20, alpha=alpha)
        v = jax.eval_shape(net.init, jax.random.PRNGKey(0))
        k = v["params"]["backbone"]["block_1"]["pw"]["conv"]["kernel"]
        assert k.shape[-1] == want, (alpha, k.shape)


def test_mobilenet_v2_k210_expand_mods():
    """Blocks 1/2 expansion clamped to 48/124 when alpha > .6, stem fixed 32
    (keras_mobilenet_v2.py:313, 329-331)."""
    net = build_network("yolo_mobilev2", IN_HW, 3, 20, alpha=1.0)
    v = jax.eval_shape(net.init, jax.random.PRNGKey(0))
    p = v["params"]["backbone"]
    assert p["stem"]["conv"]["kernel"].shape[-1] == 32
    assert p["block_1"]["expand"]["conv"]["kernel"].shape[-1] == 48
    assert p["block_2"]["expand"]["conv"]["kernel"].shape[-1] == 124
    # alpha=0.5: no override; block_1 expands 6 * in_channels
    net = build_network("yolo_mobilev2", IN_HW, 3, 20, alpha=0.5)
    v = jax.eval_shape(net.init, jax.random.PRNGKey(1))
    p = v["params"]["backbone"]
    in_ch = p["block_0"]["project"]["conv"]["kernel"].shape[-1]
    assert p["block_1"]["expand"]["conv"]["kernel"].shape[-1] == 6 * in_ch


def test_head_width_rules():
    """v1: y1 128 if alpha>0.8 else 192 (yolonet.py:28); v2: both 128 if
    alpha>0.7 else 192 (yolonet.py:87, 95)."""
    def y1_width(name, alpha):
        net = build_network(name, IN_HW, 3, 20, alpha=alpha)
        v = jax.eval_shape(net.init, jax.random.PRNGKey(0))
        return v["params"]["head"]["y1_conv"]["dark_conv_bn"]["conv"]["kernel"].shape[-1]

    assert y1_width("yolo_mobilev1", 1.0) == 128
    assert y1_width("yolo_mobilev1", 0.75) == 192
    assert y1_width("yolo_mobilev2", 0.75) == 128
    assert y1_width("yolo_mobilev2", 0.5) == 192


def test_train_mode_updates_batch_stats():
    # small spatial size: BN update semantics don't depend on image size
    net, variables = shared.net_and_vars("tiny_yolo", (96, 96), 3, 20)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 96, 3))
    outs, updates = jax.jit(lambda v, x: net.apply(v, x, train=True))(variables, x)
    assert "batch_stats" in updates
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))
