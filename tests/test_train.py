"""Train step: loss decreases, pruning schedule, DP/TP mesh execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import TrainConfig, YoloSpec
from k210_yolo_framework_tpu.ops import codec as C
from k210_yolo_framework_tpu.parallel import make_mesh, batch_sharding
from k210_yolo_framework_tpu.training import pruning as P
from k210_yolo_framework_tpu.training import train as T

import shared

# small spec (96x96 -> 3x3/6x6 grids, 6 classes): full VOC-sized tiny_yolo
# on the CPU test mesh costs minutes of XLA compile for no extra coverage
SPEC = YoloSpec.create(
    (96, 96), ((3, 3), (6, 6)), 6,
    np.array([[[0.7, 0.6], [0.5, 0.5], [0.4, 0.3]],
              [[0.3, 0.3], [0.2, 0.2], [0.1, 0.1]]]))


def _net_state(cfg):
    # per-process cache keyed on the (frozen, hashable) TrainConfig; the
    # initial TrainState is an immutable pytree -> safe to share across tests
    return shared.net_and_train_state("tiny_yolo", SPEC.in_hw, SPEC.nanchors,
                                      SPEC.class_num, cfg=cfg)


def _batch(rng, batch=4):
    boxes = np.concatenate([
        rng.integers(0, SPEC.class_num, (batch, 4, 1)).astype(np.float32),
        rng.uniform(0.2, 0.8, (batch, 4, 2)),
        rng.uniform(0.1, 0.4, (batch, 4, 2))], -1).astype(np.float32)
    valid = np.ones((batch, 4), bool)
    labels = C.encode_labels_batch(jnp.asarray(boxes), jnp.asarray(valid), SPEC)
    images = jnp.asarray(rng.uniform(0, 1, (batch, *SPEC.in_hw, 3)).astype(np.float32))
    return images, tuple(labels)


def test_train_step_decreases_loss():
    cfg = TrainConfig(batch_size=4, init_learning_rate=1e-3)
    net, state = _net_state(cfg)
    step = T.make_train_step(net, SPEC, cfg, train_epoch_step=10)
    rng = np.random.default_rng(0)
    images, labels = _batch(rng)
    losses = []
    for _ in range(8):
        state, logs = step(state, images, labels)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses
    assert int(state.step) == 8


def test_train_step_per_layer_telemetry():
    """The reference streams one loss + P/R pair PER output layer
    (keras_train.py:73-79): per-layer keys must exist and the layer losses
    must sum to the total."""
    cfg = TrainConfig(batch_size=4)
    net, state = _net_state(cfg)
    step = T.make_train_step(net, SPEC, cfg, train_epoch_step=10)
    rng = np.random.default_rng(5)
    images, labels = _batch(rng)
    state, logs = step(state, images, labels)
    for l in range(net.n_out_layers):
        for k in (f"l{l + 1}_loss", f"l{l + 1}_p", f"l{l + 1}_r"):
            assert k in logs, k
    total = sum(float(logs[f"l{l + 1}_loss"]) for l in range(net.n_out_layers))
    assert abs(total - float(logs["loss"])) < 1e-4 * max(1.0, abs(total))
    # aggregate P/R must be consistent with the per-layer counters
    from k210_yolo_framework_tpu.training import metrics as M
    p, r = M.pr_results(state.pr)
    assert abs(float(p) - float(logs["p"])) < 1e-6
    assert abs(float(r) - float(logs["r"])) < 1e-6


def test_keras_adam_decay_schedule():
    s = T.keras_adam_schedule(0.001, 0.1)
    assert abs(s(0) - 0.001) < 1e-9
    assert abs(s(10) - 0.001 / 2.0) < 1e-9


def test_eval_step_runs_and_accumulates():
    cfg = TrainConfig(batch_size=4)
    net, state = _net_state(cfg)
    ev = T.make_eval_step(net, SPEC, cfg)
    rng = np.random.default_rng(1)
    images, labels = _batch(rng)
    from k210_yolo_framework_tpu.training import metrics as M
    pr, logs = ev(state.params, state.batch_stats,
                  M.init_pr_state(net.n_out_layers), images, labels)
    assert np.isfinite(float(logs["val_loss"]))
    # per-layer validation telemetry mirrors the train step's
    assert np.isfinite(float(logs["val_l1_loss"]))
    assert np.isfinite(float(logs["val_l2_loss"]))
    pr2, _ = ev(state.params, state.batch_stats, pr, images, labels)
    assert float(np.sum(pr2["fn"])) >= float(np.sum(pr["fn"]))


def test_pruning_schedule_and_masks():
    s0 = P.polynomial_sparsity(jnp.asarray(0.0), 0.5, 0.9, 0, 100)
    s_end = P.polynomial_sparsity(jnp.asarray(100.0), 0.5, 0.9, 0, 100)
    s_half = P.polynomial_sparsity(jnp.asarray(50.0), 0.5, 0.9, 0, 100)
    assert abs(float(s0) - 0.5) < 1e-6
    assert abs(float(s_end) - 0.9) < 1e-6
    assert 0.5 < float(s_half) < 0.9
    # cubic: s(50) = 0.9 - 0.4 * 0.5^3 = 0.85
    assert abs(float(s_half) - 0.85) < 1e-6

    rng = np.random.default_rng(0)
    params = {"a": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))},
              "b": {"bias": jnp.zeros((16,))}}
    masks = P.init_masks(params)
    masks = P.update_masks(params, masks, jnp.asarray(0.75))
    frac = float(masks["a"]["kernel"].mean())
    assert abs(frac - 0.25) < 0.02
    assert masks["b"]["bias"].shape == ()  # non-prunable left scalar

    pruned = P.apply_masks(params, masks)
    assert float((np.asarray(pruned["a"]["kernel"]) == 0).mean()) >= 0.73
    sp = P.sparsity_of(pruned, masks)
    assert abs(float(sp) - 0.75) < 0.02


def test_pruned_training_reaches_target_sparsity():
    cfg = TrainConfig(batch_size=4, is_prune=True, prune_initial_sparsity=0.3,
                      prune_final_sparsity=0.8, prune_end_epoch=1, prune_frequency=2)
    net, state = _net_state(cfg)
    step = T.make_train_step(net, SPEC, cfg, train_epoch_step=6)  # end_step=6
    rng = np.random.default_rng(2)
    images, labels = _batch(rng)
    logs = {}
    for _ in range(8):
        state, logs = step(state, images, labels)
    assert float(logs["sparsity"]) > 0.7
    # Adam momentum must not revive pruned weights
    k = np.asarray(state.params["backbone"]["conv_0"]["dark_conv_bn"]["conv"]["kernel"])
    m = np.asarray(state.masks["backbone"]["conv_0"]["dark_conv_bn"]["conv"]["kernel"])
    assert np.all(k[m == 0] == 0)


def test_train_step_on_8dev_mesh():
    """DP x TP on the virtual 8-CPU mesh: (data=4, model=2)."""
    assert jax.device_count() == 8
    mesh = make_mesh(dp=4, mp=2)
    cfg = TrainConfig(batch_size=8)
    net, state = _net_state(cfg)
    state = T.shard_state(state, mesh)
    step = T.make_train_step(net, SPEC, cfg, train_epoch_step=10)
    rng = np.random.default_rng(3)
    images, labels = _batch(rng, batch=8)
    bs = batch_sharding(mesh)
    images = jax.device_put(images, bs)
    labels = tuple(jax.device_put(l, bs) for l in labels)
    losses = []
    for _ in range(5):
        state, logs = step(state, images, labels)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # TP actually sharded something: find a channel-sharded kernel
    sharded = [p.sharding for p in jax.tree.leaves(state.params)
               if hasattr(p, "sharding") and "model" in str(p.sharding.spec)]
    assert sharded, "expected at least one tensor-parallel kernel"
