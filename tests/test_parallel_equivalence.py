"""Sharded training must compute the SAME math as single-device training.

The reference has no distributed code (SURVEY.md §2 parallelism rows), so
this is the rebuild's own scaling claim and carries its own proof.

What "same" can mean here was measured, not assumed: recompiling the
single-device grad program is BIT-identical, but merely permuting the batch
(which only reorders the BatchNorm/grad batch reductions) moves grads by
~0.9% median / ~2% max relL1 at init — stacked train-mode BNs amplify fp32
reduction-order noise.  GSPMD sharding reorders those same reductions, so
per-element grad parity tighter than that is unattainable for ANY correct
implementation.  The test therefore self-calibrates: the sharded-vs-single
divergence must stay within a small multiple of the batch-permutation
control, while a real sharding-rule bug (wrong axis, missing/double
reduction, mask misapplication) produces factor-level errors far outside
it.  Forward parity is still asserted tightly via the step-1 loss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import TrainConfig, YoloSpec
from k210_yolo_framework_tpu.models import build_network
from k210_yolo_framework_tpu.ops import codec as C
from k210_yolo_framework_tpu.parallel import batch_sharding, image_sharding, \
    make_mesh
from k210_yolo_framework_tpu.training import loss as L
from k210_yolo_framework_tpu.training import train as T

# tiny shapes: 64x64 input -> 2x2 / 4x4 grids (strides 32/16 preserved)
SPEC = YoloSpec.create(
    (64, 64), ((2, 2), (4, 4)), 4,
    np.array([[[0.7, 0.6], [0.5, 0.5], [0.4, 0.3]],
              [[0.3, 0.3], [0.2, 0.2], [0.1, 0.1]]]))
BATCH = 8
NSTEPS = 3
LR = 1e-3


def _cfg(prune=False):
    return TrainConfig(batch_size=BATCH, init_learning_rate=LR,
                       is_prune=prune, prune_initial_sparsity=0.2,
                       prune_final_sparsity=0.6, prune_end_epoch=1,
                       prune_frequency=1)


def _net(safe_dw_grad=True):
    return build_network("yolo_mobilev1", SPEC.in_hw, SPEC.nanchors,
                         SPEC.class_num, alpha=0.25,
                         safe_dw_grad=safe_dw_grad)


def _batch():
    rng = np.random.default_rng(0)
    boxes = np.concatenate([
        rng.integers(0, 4, (BATCH, 2, 1)).astype(np.float32),
        rng.uniform(0.2, 0.8, (BATCH, 2, 2)),
        rng.uniform(0.2, 0.5, (BATCH, 2, 2))], -1).astype(np.float32)
    labels = C.encode_labels_batch(jnp.asarray(boxes),
                                   jnp.ones((BATCH, 2), bool), SPEC)
    images = jnp.asarray(
        rng.uniform(0, 1, (BATCH, 64, 64, 3)).astype(np.float32))
    return images, tuple(labels)


def _loss_fn(net, cfg):
    def loss_fn(params, batch_stats, images, labels):
        outs, _ = net.apply({"params": params, "batch_stats": batch_stats},
                            images, train=True)
        main = L.yolo_loss(labels, outs, SPEC, BATCH, cfg.obj_thresh,
                           cfg.iou_thresh, cfg.obj_weight, cfg.noobj_weight,
                           cfg.wh_weight)
        return main + L.l2_penalty(params)
    return loss_fn


def _run(prune, mesh=None, permute=False, safe_dw_grad=True):
    """Returns (init grads, params after NSTEPS, per-step losses)."""
    cfg = _cfg(prune)
    net = _net(safe_dw_grad)
    state = T.create_train_state(net, cfg, jax.random.PRNGKey(0))
    if mesh is not None:
        state = T.shard_state(state, mesh)
    images, labels = _batch()
    if permute:  # reduction-reorder control: same samples, different order
        perm = np.concatenate([np.arange(BATCH // 2, BATCH),
                               np.arange(0, BATCH // 2)])
        images = images[perm]
        labels = tuple(l[perm] for l in labels)
    if mesh is not None:
        bs = batch_sharding(mesh)
        images = jax.device_put(images, image_sharding(mesh))
        labels = tuple(jax.device_put(l, bs) for l in labels)

    grads = jax.jit(jax.grad(_loss_fn(net, cfg)))(
        state.params, state.batch_stats, images, labels)
    grads = jax.device_get(grads)

    step = T.make_train_step(net, SPEC, cfg, train_epoch_step=NSTEPS)
    losses = []
    for _ in range(NSTEPS):
        state, logs = step(state, images, labels)
        losses.append(float(logs["loss"]))
    return grads, jax.device_get(state.params), losses


_CACHE = {}


def _cached(key, prune, **kw):
    if key not in _CACHE:
        _CACHE[key] = _run(prune, **kw)
    return _CACHE[key]


def _rel_l1(a, b):
    """Per-leaf sum|x-y| / sum|y|; returns the worst leaf."""
    flat_a, treedef_a = jax.tree.flatten(a)
    flat_b, treedef_b = jax.tree.flatten(b)
    assert treedef_a == treedef_b
    worst = 0.0
    for x, y in zip(flat_a, flat_b):
        x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
        worst = max(worst, np.abs(x - y).sum() / (np.abs(y).sum() + 1e-12))
    return worst


@pytest.mark.parametrize(
    "dp,mp,sp,prune",
    # fast shard keeps one variant per sharding MECHANISM (TP, SP, all-3);
    # pure-DP and the pruning overlay move to the slow shard — dp8 is the
    # trivial case of dp4sp2/dp2tp2sp2's data axis, and pruning's mask
    # semantics are pinned separately in test_train.py (suite wall time,
    # round-2 review item 7)
    [pytest.param(8, 1, 1, False, marks=pytest.mark.slow),
     (4, 2, 1, False),
     pytest.param(4, 2, 1, True, marks=pytest.mark.slow),
     (4, 1, 2, False), (2, 2, 2, False)],
    ids=["dp8", "dp4tp2", "dp4tp2-prune", "dp4sp2", "dp2tp2sp2"])
def test_sharded_step_matches_single_device(dp, mp, sp, prune):
    assert jax.device_count() == 8
    ref_grads, ref_params, ref_losses = _cached(("single", prune), prune)
    got_grads, got_params, got_losses = _run(
        prune, mesh=make_mesh(dp=dp, mp=mp, sp=sp))

    # forward parity: step-1 loss to reduction-reorder noise
    np.testing.assert_allclose(got_losses[0], ref_losses[0], rtol=1e-5)

    # reduction-reorder control: how far grads/params legitimately move when
    # batch sums are merely reordered on ONE device
    ctl_grads, ctl_params, ctl_losses = _cached(("control", prune), prune,
                                                permute=True)
    g_floor = max(_rel_l1(ctl_grads, ref_grads), 1e-6)
    p_floor = max(_rel_l1(ctl_params, ref_params), 1e-6)

    g_err = _rel_l1(got_grads, ref_grads)
    assert g_err < 10 * g_floor, (
        f"init grads diverge {g_err:.4f} vs reorder-noise floor {g_floor:.4f}")
    p_err = _rel_l1(got_params, ref_params)
    assert p_err < 10 * p_floor, (
        f"params after {NSTEPS} steps diverge {p_err:.4f} vs floor {p_floor:.4f}")
    # loss trajectory tracks through all steps, within the control's own
    # deviation (pruning recomputes magnitude masks each step — a knife-edge
    # percentile threshold, so reorder noise legitimately flips masks and
    # moves later losses by a few percent; the control experiences the same)
    ctl_dev = float(np.max(np.abs(np.asarray(ctl_losses) - np.asarray(ref_losses))
                           / np.asarray(ref_losses)))
    np.testing.assert_allclose(got_losses, ref_losses,
                               rtol=max(5e-3, 10 * ctl_dev))


def test_stock_dw_grad_correct_on_pure_sp_mesh():
    """keras_train gates the partitioner-safe depthwise gradient to TP
    meshes only; spatial partitioning shards the dw-conv OPERANDS, so the
    stock gradient's psum over 'space' must come out unscaled.  This pins
    that gating decision against the XLA partitioner bug (see
    models/layers.py depthwise custom VJP)."""
    assert jax.device_count() == 8
    ref_grads, _, ref_losses = _cached(("single-stock", False), False,
                                       safe_dw_grad=False)
    got_grads, _, got_losses = _run(False, mesh=make_mesh(dp=4, sp=2),
                                    safe_dw_grad=False)
    np.testing.assert_allclose(got_losses[0], ref_losses[0], rtol=1e-5)
    ctl_grads, _, _ = _cached(("control", False), False, permute=True)
    sref_grads, _, _ = _cached(("single", False), False)
    g_floor = max(_rel_l1(ctl_grads, sref_grads), 1e-6)
    g_err = _rel_l1(got_grads, ref_grads)
    assert g_err < 10 * g_floor, (
        f"stock dw grad diverges on sp mesh: {g_err:.4f} vs floor {g_floor:.4f}"
        " — a factor-level error here means the partitioner bug also applies"
        " to the space axis and keras_train must gate safe_dw_grad on sp")
