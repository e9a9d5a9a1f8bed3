"""SIGTERM mid-training returns a saveable state (preemption safety)."""

import os
import signal
import threading

import numpy as np

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import TrainConfig, YoloSpec
from k210_yolo_framework_tpu.data import pipeline as PL
from k210_yolo_framework_tpu.models import build_network
from k210_yolo_framework_tpu.training import train as T


def test_sigterm_returns_intact_state(tmp_path):
    ann = PL.synthetic_ann_list(str(tmp_path), n=8, class_num=4, seed=2)
    anchors = np.array([[[0.7, 0.6], [0.5, 0.5], [0.4, 0.3]],
                        [[0.3, 0.3], [0.2, 0.2], [0.15, 0.15]]], np.float32)
    spec = YoloSpec.create((96, 96), ((3, 3), (6, 6)), 4, anchors)
    cfg = TrainConfig(batch_size=4, max_epochs=10_000)  # would run forever
    net = build_network("yolo_mobilev1", spec.in_hw, spec.nanchors,
                        spec.class_num, alpha=0.5)
    pipe = PL.DataPipeline(ann, 4, seed=0, use_native=False)
    pp = PL.make_preprocess_fn(spec, is_training=False)

    # fire SIGTERM shortly after training starts
    timer = threading.Timer(8.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        state = T.fit(net, spec, cfg, iter(pipe), None, pp, pp,
                      pipe.epoch_step, 0, jax.random.PRNGKey(0),
                      log_fn=lambda *_: None)
    finally:
        timer.cancel()

    # the returned state must be whole (not donated-away) and saveable
    host = jax.device_get(state.params)
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(host))
    assert int(state.step) >= 1
    # handlers restored
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL
