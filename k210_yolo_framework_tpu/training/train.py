"""The jitted train/eval steps and the epoch loop.

Reference surface being replaced (/root/reference/keras_train.py:73-111):
Adam with keras ``decay`` semantics (lr_t = lr / (1 + decay * t)), per-output
5-term loss, streaming P/R metrics in the progress line, TensorBoard-style
scalar logging, KeyboardInterrupt-tolerant save, optional magnitude pruning.

TPU design: ONE ``jax.jit`` program per step — forward (bf16-capable), loss,
grads, Adam update, pruning mask maintenance and metric accumulation all
fused; state is donated so params update in place.  Multi-chip: shard the
state/batch with ``parallel.mesh`` helpers before calling — gradient psums
come from GSPMD sharding propagation, not hand-written collectives.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from k210_yolo_framework_tpu.config import TrainConfig, YoloSpec
from k210_yolo_framework_tpu.models.yolonet import YoloNet
from k210_yolo_framework_tpu.parallel import mesh as pmesh
from k210_yolo_framework_tpu.training import loss as L
from k210_yolo_framework_tpu.training import metrics as M
from k210_yolo_framework_tpu.training import pruning as P

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_fused_train_step", "make_eval_step", "make_fused_eval_step",
           "fit"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    masks: Any
    pr: Dict[str, jnp.ndarray]


def keras_adam_schedule(init_lr: float, decay: float) -> Callable:
    """keras ``Adam(lr, decay)``: lr_t = lr / (1 + decay * iterations)
    (keras_train.py:74-76)."""
    def schedule(count):
        return init_lr / (1.0 + decay * count)
    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(learning_rate=keras_adam_schedule(
        cfg.init_learning_rate, cfg.learning_rate_decay_factor))


def create_train_state(net: YoloNet, cfg: TrainConfig, rng: jax.Array) -> TrainState:
    variables = net.init(rng)
    tx = make_optimizer(cfg)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
        masks=P.init_masks(params),
        pr=M.init_pr_state(net.n_out_layers),
    )


def make_step_fn(net: YoloNet, spec: YoloSpec, cfg: TrainConfig,
                 train_epoch_step: int):
    """The UNjitted train step body: (state, images, labels) -> (state, logs).

    Callers jit it directly (``make_train_step``) or compose it with
    on-device preprocessing under ONE jit (``fit``'s fused path — the
    reference likewise runs preprocessing and step as one graph,
    keras_train.py:96-98)."""
    tx = make_optimizer(cfg)
    prune_end = max(train_epoch_step * cfg.prune_end_epoch, 1)

    def loss_fn(params, batch_stats, images, labels):
        outs, updates = net.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=True)
        layer_losses = L.yolo_loss_layers(
            labels, outs, spec, images.shape[0], cfg.obj_thresh, cfg.iou_thresh,
            cfg.obj_weight, cfg.noobj_weight, cfg.wh_weight)
        main = sum(layer_losses[1:], layer_losses[0])
        reg = L.l2_penalty(params)
        return main + reg, (outs, updates["batch_stats"], main, layer_losses)

    def step_fn(state: TrainState, images: jnp.ndarray, labels: Tuple[jnp.ndarray, ...]):
        (_, (outs, new_stats, main_loss, layer_losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, images, labels)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        masks = state.masks
        if cfg.is_prune:
            sparsity = P.polynomial_sparsity(
                state.step.astype(jnp.float32), cfg.prune_initial_sparsity,
                cfg.prune_final_sparsity, 0, prune_end)
            due = (state.step % cfg.prune_frequency == 0) & (state.step <= prune_end)
            masks = jax.lax.cond(
                due, lambda: P.update_masks(params, state.masks, sparsity),
                lambda: state.masks)
            params = P.apply_masks(params, masks)

        pr = M.update_pr_state(state.pr, labels, outs, cfg.obj_thresh)
        precision, recall = M.pr_results(pr)
        logs = {"loss": main_loss, "p": precision, "r": recall,
                "lr": keras_adam_schedule(cfg.init_learning_rate,
                                          cfg.learning_rate_decay_factor)(state.step)}
        # per-output-layer telemetry: the reference streams l1_loss/l2_loss +
        # per-layer p/r in its progress bar (keras_train.py:73-79) — one scale
        # collapsing during training is visible only at this granularity
        p_l, r_l = M.pr_results_per_layer(pr)
        for l, ll in enumerate(layer_losses):
            logs[f"l{l + 1}_loss"] = ll
            logs[f"l{l + 1}_p"] = p_l[l]
            logs[f"l{l + 1}_r"] = r_l[l]
        if cfg.is_prune:
            logs["sparsity"] = P.sparsity_of(params, masks)

        return TrainState(step=state.step + 1, params=params, batch_stats=new_stats,
                          opt_state=new_opt, masks=masks, pr=pr), logs

    return step_fn


def make_train_step(net: YoloNet, spec: YoloSpec, cfg: TrainConfig,
                    train_epoch_step: int):
    """Build the donated, jitted train step: (state, images, labels) ->
    (state, logs)."""
    return jax.jit(make_step_fn(net, spec, cfg, train_epoch_step),
                   donate_argnums=(0,))


def make_fused_train_step(net: YoloNet, spec: YoloSpec, cfg: TrainConfig,
                          train_epoch_step: int, preprocess, mesh=None,
                          barrier: bool = True):
    """ONE jitted program: on-device preprocess (letterbox + augment + /max +
    label encode) -> forward/backward/update.

    (state, canvases u8, img_hws, boxes, valid, key) -> (state, logs).

    Matches the reference's single-graph step (keras_train.py:96-98) — two
    separate dispatches hide preprocess latency poorly.
    ``preprocess`` is a (possibly jitted) ``make_preprocess_fn`` product;
    jit-of-jit inlines, so passing the jitted one costs nothing.

    ``barrier`` inserts ``lax.optimization_barrier`` between preprocess and
    the step: still ONE program (one dispatch), but XLA may not fuse or
    co-layout across the seam.  This resolved the round-4 anomaly where the
    fused program's preprocess share DOUBLED per image at exactly the
    lane-width batch (fused - bare: 1.98 ms @64 but 9.41 ms @128, vs
    2.8/5.9 ms standalone preprocess — the augment select-chains were being
    scheduled/laid out against the conv stack's batch-128 tiling).  Measured
    on v5e (round 5, `_probe_fused.py`, ms/step without -> with barrier):
    batch 64 16.84 -> 16.69, batch 128 29.33 -> **25.58** (+15%, 5.0k
    imgs/sec), batch 256 55.66 -> 53.91.  With the barrier the fused step
    equals bare + standalone-preprocess at every batch and inherits the
    bare step's batch-128 optimum.  Default ON.
    """
    step_fn = make_step_fn(net, spec, cfg, train_epoch_step)

    def fused(state, canvases, img_hws, boxes, valid, key):
        images, labels = preprocess(canvases, img_hws, boxes, valid, key)
        if barrier:
            images, labels = jax.lax.optimization_barrier((images, labels))
        if mesh is not None:
            images = jax.lax.with_sharding_constraint(
                images, pmesh.image_sharding(mesh))
            labels = tuple(jax.lax.with_sharding_constraint(
                l, pmesh.batch_sharding(mesh)) for l in labels)
        return step_fn(state, images, labels)

    return jax.jit(fused, donate_argnums=(0,))


def make_eval_step_fn(net: YoloNet, spec: YoloSpec, cfg: TrainConfig):
    """UNjitted eval body: (params, batch_stats, pr, images, labels) ->
    (pr, logs); BN frozen."""
    def step_fn(params, batch_stats, pr, images, labels):
        outs = net.apply({"params": params, "batch_stats": batch_stats},
                         images, train=False)
        layer_losses = L.yolo_loss_layers(
            labels, outs, spec, images.shape[0], cfg.obj_thresh, cfg.iou_thresh,
            cfg.obj_weight, cfg.noobj_weight, cfg.wh_weight)
        loss = sum(layer_losses[1:], layer_losses[0])
        pr = M.update_pr_state(pr, labels, outs, cfg.obj_thresh)
        p, r = M.pr_results(pr)
        logs = {"val_loss": loss, "val_p": p, "val_r": r}
        p_l, r_l = M.pr_results_per_layer(pr)
        for l, ll in enumerate(layer_losses):
            logs[f"val_l{l + 1}_loss"] = ll
            logs[f"val_l{l + 1}_p"] = p_l[l]
            logs[f"val_l{l + 1}_r"] = r_l[l]
        return pr, logs

    return step_fn


def make_eval_step(net: YoloNet, spec: YoloSpec, cfg: TrainConfig):
    """(params, batch_stats, pr, images, labels) -> (pr, logs); BN frozen."""
    return jax.jit(make_eval_step_fn(net, spec, cfg))


def make_fused_eval_step(net: YoloNet, spec: YoloSpec, cfg: TrainConfig,
                         preprocess):
    """Eval-path analogue of :func:`make_fused_train_step`: preprocess +
    forward + metric accumulation as one jitted program."""
    step_fn = make_eval_step_fn(net, spec, cfg)

    def fused(params, batch_stats, pr, canvases, img_hws, boxes, valid, key):
        images, labels = preprocess(canvases, img_hws, boxes, valid, key)
        return step_fn(params, batch_stats, pr, images, labels)

    return jax.jit(fused)


def recalibrate_batch_stats(net: YoloNet, params, batch_stats,
                            batches: Iterator, preprocess, rng: jax.Array,
                            num_batches: int = 50):
    """Replace EMA BatchNorm statistics with ARITHMETIC means over fresh
    training batches (the SWA ``update_bn`` recipe).

    EMA running averages lag the statistics heavily-overfit weights depend
    on — especially on small datasets, where eval-mode activations can
    drift far from train-mode ones.  Each mutable apply returns
    ``new = m*old + (1-m)*batch``; a one-time probe (same batch applied
    from zeros- and ones-stats: their difference is exactly ``m`` per
    leaf, valid for ANY per-layer momentum) lets the exact per-batch
    moments be recovered and averaged uniformly.
    """
    @jax.jit
    def ema_update(bs, images):
        _, upd = net.apply({"params": params, "batch_stats": bs},
                           images, train=True)
        return upd["batch_stats"]

    zeros = jax.tree.map(jnp.zeros_like, batch_stats)
    ones = jax.tree.map(jnp.ones_like, batch_stats)
    momentum = None  # per-leaf, probed on the first batch

    total = None
    for i in range(num_batches):
        hb = next(batches)
        rng, k = jax.random.split(rng)
        images, _ = preprocess(jnp.asarray(hb.canvases), jnp.asarray(hb.img_hws),
                               jnp.asarray(hb.boxes), jnp.asarray(hb.valid), k)
        from_zero = ema_update(zeros, images)           # (1-m) * batch
        if momentum is None:
            from_one = ema_update(ones, images)         # m + (1-m) * batch
            momentum = jax.tree.map(lambda a, b: b - a, from_zero, from_one)
        m = jax.tree.map(lambda fz, mo: fz / jnp.maximum(1.0 - mo, 1e-6),
                         from_zero, momentum)
        total = m if total is None else jax.tree.map(jnp.add, total, m)
    return jax.tree.map(lambda t: t / num_batches, total)


def shard_state(state: TrainState, mesh) -> TrainState:
    """Place params per mesh rules (DP: replicated; +model axis: channel TP)."""
    shardings = TrainState(
        step=pmesh.replicated(mesh),
        params=pmesh.param_shardings(state.params, mesh),
        batch_stats=jax.tree.map(lambda _: pmesh.replicated(mesh), state.batch_stats),
        opt_state=jax.tree.map(lambda _: pmesh.replicated(mesh), state.opt_state),
        masks=jax.tree.map(lambda _: pmesh.replicated(mesh), state.masks),
        pr=jax.tree.map(lambda _: pmesh.replicated(mesh), state.pr),
    )
    return jax.device_put(state, shardings)


def _flush_scalars(scalar_logger, pending_logs) -> None:
    """Drain buffered (step, device-scalar logs) in ONE host transfer —
    per-scalar float() would issue one blocking round-trip each."""
    if scalar_logger is not None and pending_logs:
        fetched = jax.device_get([lg for _, lg in pending_logs])
        for (s, _), lg in zip(pending_logs, fetched):
            scalar_logger(s, {k: float(v) for k, v in lg.items()})
    pending_logs.clear()


def fit(net: YoloNet, spec: YoloSpec, cfg: TrainConfig,
        train_batches: Iterator, test_batches: Optional[Iterator],
        preprocess_train, preprocess_test,
        train_epoch_step: int, test_epoch_step: int,
        rng: jax.Array, mesh=None,
        log_fn: Callable[[str], None] = print,
        scalar_logger=None,
        state: Optional[TrainState] = None,
        profile_dir: str = "", profile_step: int = 3) -> TrainState:
    """Epoch loop with the reference's UX: per-step loss/p/r line, one
    validation pass per epoch, Ctrl-C saves instead of crashing
    (keras_train.py:95-100).  Returns the final state (caller saves it).
    """
    # Ctrl-C / SIGTERM save the run instead of losing it (reference behavior,
    # keras_train.py:95-100; schedulers send SIGTERM on preemption).  The
    # train step DONATES the state buffers, so raising mid-call would leave
    # `state` pointing at deleted arrays and crash the very save this exists
    # for — handlers therefore only set a flag, checked at step boundaries
    # where the state is whole.  Installed right before the try/finally that
    # restores them (a setup error in between would leak the no-op handlers
    # and make the process uninterruptible); jit compilation is lazy, so the
    # first-step compile inside the loop is still covered.
    import signal

    if state is None:
        state = create_train_state(net, cfg, rng)
    if mesh is not None:
        state = shard_state(state, mesh)
    # preprocess + step fused under ONE jit — the reference's single-graph
    # step (keras_train.py:96-98); two dispatches would serialize the
    # VPU-heavy preprocess against the MXU-heavy convs
    train_step = make_fused_train_step(net, spec, cfg, train_epoch_step,
                                       preprocess_train, mesh=mesh)
    eval_step = make_fused_eval_step(net, spec, cfg, preprocess_test)
    data_rng = jax.random.PRNGKey(cfg.rand_seed)
    host_step = int(state.step)  # mirrors state.step without device syncs
    pending_logs = []

    stop_requested = {"flag": False}

    def _request_stop(_sig, _frm):
        stop_requested["flag"] = True

    prev_handlers = []
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers.append((sig, signal.signal(sig, _request_stop)))
        except ValueError:  # not the main thread
            pass
    try:
        for epoch in range(cfg.max_epochs):
            state = state.replace(pr=jax.tree.map(jnp.zeros_like, state.pr))
            t0 = time.time()
            logs = {}
            for i in range(train_epoch_step):
                # one-step profiler trace, the reference's TensorBoard
                # profile_batch=3 (keras_train.py:92); view in xprof/perfetto.
                tracing = profile_dir and host_step + 1 == profile_step
                if tracing:
                    try:
                        jax.profiler.start_trace(profile_dir)
                    except Exception as e:  # platform may not support tracing
                        log_fn(f"profiler unavailable: {e}")
                        tracing = False
                hb = next(train_batches)
                data_rng, k = jax.random.split(data_rng)
                host_args = (jnp.asarray(hb.canvases), jnp.asarray(hb.img_hws),
                             jnp.asarray(hb.boxes), jnp.asarray(hb.valid))
                if mesh is not None:
                    bs = pmesh.batch_sharding(mesh)
                    host_args = tuple(jax.device_put(a, bs) for a in host_args)
                state, logs = train_step(state, *host_args, k)
                if tracing:
                    jax.block_until_ready(logs["loss"])
                    jax.profiler.stop_trace()
                    log_fn(f"profiler trace written to {profile_dir}")
                # Scalars stay on device until the 10-step print boundary:
                # float() per step is a host sync that serializes dispatch
                # against the tunnel/host latency every single step.
                host_step += 1
                pending_logs.append((host_step, logs))
                if i % 10 == 0 or i == train_epoch_step - 1:
                    _flush_scalars(scalar_logger, pending_logs)
                    # per-layer columns, the reference progress-bar shape
                    # (keras_train.py:73-79: l1_loss l2_loss l1_p l1_r ...)
                    per_layer = " ".join(
                        f"l{l + 1}_loss {float(logs[f'l{l + 1}_loss']):.4f} "
                        f"l{l + 1}_p {float(logs[f'l{l + 1}_p']):.3f} "
                        f"l{l + 1}_r {float(logs[f'l{l + 1}_r']):.3f}"
                        for l in range(net.n_out_layers))
                    log_fn(f"epoch {epoch + 1}/{cfg.max_epochs} step {i + 1}/{train_epoch_step} "
                           f"loss {float(logs['loss']):.4f} p {float(logs['p']):.4f} "
                           f"r {float(logs['r']):.4f} {per_layer}")
                if stop_requested["flag"]:
                    raise KeyboardInterrupt
            dt = time.time() - t0

            if test_batches is not None and test_epoch_step > 0:
                pr = M.init_pr_state(net.n_out_layers)
                vloss_sum, vlogs = 0.0, {}
                for _ in range(test_epoch_step):
                    hb = next(test_batches)
                    data_rng, k = jax.random.split(data_rng)
                    pr, vlogs = eval_step(
                        state.params, state.batch_stats, pr,
                        jnp.asarray(hb.canvases), jnp.asarray(hb.img_hws),
                        jnp.asarray(hb.boxes), jnp.asarray(hb.valid), k)
                    vloss_sum += float(vlogs["val_loss"])
                rate = train_epoch_step * cfg.batch_size / max(dt, 1e-9)
                log_fn(f"epoch {epoch + 1} done in {dt:.1f}s ({rate:.0f} img/s)  "
                       f"val_loss {vloss_sum / test_epoch_step:.4f} "
                       f"val_p {float(vlogs['val_p']):.4f} val_r {float(vlogs['val_r']):.4f}")
            else:
                rate = train_epoch_step * cfg.batch_size / max(dt, 1e-9)
                log_fn(f"epoch {epoch + 1} done in {dt:.1f}s ({rate:.0f} img/s) "
                       f"loss {float(logs['loss']):.4f}")
            if stop_requested["flag"]:
                raise KeyboardInterrupt
    except KeyboardInterrupt:
        log_fn("interrupted — saving current weights (keras_train.py:99-100 behavior)")
    finally:
        # scalars buffered since the last 10-step boundary would otherwise
        # end before the saved checkpoint's step
        _flush_scalars(scalar_logger, pending_logs)
        for sig, prev in prev_handlers:
            signal.signal(sig, prev)

    return state
