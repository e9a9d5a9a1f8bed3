"""Per-round quality tracking for the WHOLE model zoo + pruning.

Round-3 review: the synthetic overfit->BN-recal->mAP regression covered only
yolo_mobilev1 (tests/test_end_to_end.py) and tiny_yolo
(tests/test_config_matrix.py); ``yolo_mobilev2`` and the full darknet53
``yolo`` — both BASELINE.json configs, both trained by the reference
(/root/reference/models/yolonet.py:49-104, 161-191) — had no tracked quality
number, and sparsity-vs-mAP was never quantified.  This file closes both:
one overfit->recalibrate->mAP row per remaining builder, plus a PRUNE=True
row (magnitude schedule to ~50% sparsity, then recovery) with its sparsity
and mAP printed for BASELINE.md's per-round table.

VOC itself is unavailable on this zero-egress image (BASELINE.md), so these
synthetic floors are the per-round quality regression for every builder.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.config import TrainConfig, YoloSpec
from k210_yolo_framework_tpu.data import pipeline as PL
from k210_yolo_framework_tpu.eval import evaluate_map
from k210_yolo_framework_tpu.inference import Predictor
from k210_yolo_framework_tpu.models import build_network
from k210_yolo_framework_tpu.training import pruning as P
from k210_yolo_framework_tpu.training import train as T

pytestmark = pytest.mark.slow


def _spec2(classes, in_hw=(96, 96)):
    anchors = np.array([[[0.7, 0.6], [0.5, 0.5], [0.4, 0.3]],
                        [[0.3, 0.3], [0.2, 0.2], [0.15, 0.15]]], np.float32)
    g = (in_hw[0] // 32, in_hw[1] // 32)
    return YoloSpec.create(in_hw, (g, (g[0] * 2, g[1] * 2)), classes, anchors)


def _spec3(classes, in_hw=(64, 64)):
    anchors = np.array([[[0.7, 0.6], [0.5, 0.5], [0.4, 0.3]],
                        [[0.35, 0.35], [0.25, 0.25], [0.2, 0.2]],
                        [[0.15, 0.15], [0.1, 0.1], [0.07, 0.07]]], np.float32)
    g = (in_hw[0] // 32, in_hw[1] // 32)
    return YoloSpec.create(
        in_hw, (g, (g[0] * 2, g[1] * 2), (g[0] * 4, g[1] * 4)), classes, anchors)


def _overfit_recal_map(net, spec, tmp_path, *, n_img=6, steps=250, lr=2e-3,
                       cfg=None, seed=5):
    """The shared regression flow (same shape as test_end_to_end.py): overfit
    a tiny synthetic set on ONE fixed batch, exact-mean BN recalibration,
    then the full Predictor->decode->NMS->VOC-matching eval.  Returns
    (map, final_state, ann)."""
    classes = spec.class_num
    ann = PL.synthetic_ann_list(str(tmp_path), n=n_img, class_num=classes,
                                seed=seed)
    cfg = cfg or TrainConfig(batch_size=n_img, obj_thresh=0.7, iou_thresh=0.5,
                             init_learning_rate=lr)
    pipe = PL.DataPipeline(ann, n_img, seed=1, use_native=False,
                           canvas_hw=(512, 512))
    pp = PL.make_preprocess_fn(spec, is_training=False)

    state = T.create_train_state(net, cfg, jax.random.PRNGKey(0))
    step = T.make_train_step(net, spec, cfg, train_epoch_step=1)
    hb = next(iter(pipe))
    images, labels = pp(jnp.asarray(hb.canvases), jnp.asarray(hb.img_hws),
                        jnp.asarray(hb.boxes), jnp.asarray(hb.valid),
                        jax.random.PRNGKey(0))
    first = None
    for i in range(steps):
        state, logs = step(state, images, labels)
        if i == 0:
            first = float(logs["loss"])
    last = float(logs["loss"])
    assert last < first * 0.2, f"did not overfit: {first} -> {last}"

    params = (P.apply_masks(state.params, state.masks) if cfg.is_prune
              else state.params)
    new_bs = T.recalibrate_batch_stats(net, params,
                                       jax.device_get(state.batch_stats),
                                       iter(pipe), pp, jax.random.PRNGKey(3),
                                       num_batches=4)
    pred = Predictor(net, {"params": params, "batch_stats": new_bs}, spec,
                     obj_thresh=0.1, iou_thresh=0.45, max_out=20)
    res = evaluate_map(pred, ann, classes, batch_size=n_img)
    return float(res["map"]), state, ann


def test_mobilev2_synthetic_map(tmp_path):
    """yolo_mobilev2 alpha=1.0 (BASELINE.json config 3's builder)."""
    spec = _spec2(classes=4)
    net = build_network("yolo_mobilev2", spec.in_hw, spec.nanchors,
                        spec.class_num, alpha=1.0)
    m, _, _ = _overfit_recal_map(net, spec, tmp_path)
    assert m > 0.8, f"yolo_mobilev2 synthetic mAP = {m}"
    print(f"\n[mAP] yolo_mobilev2 synthetic overfit = {m:.4f}")


def test_full_yolo_synthetic_map(tmp_path):
    """Full darknet53 'yolo', 3 output scales (BASELINE.json config 4's
    builder; reference yolonet.py:161-191).  Smaller canvas/batch than the
    2-scale rows — darknet53 fwd+bwd on the 1-core CPU mesh is ~10x the
    mobilenet cost per step."""
    spec = _spec3(classes=4)
    net = build_network("yolo", spec.in_hw, spec.nanchors, spec.class_num)
    m, _, _ = _overfit_recal_map(net, spec, tmp_path, n_img=4, steps=150)
    assert m > 0.75, f"full yolo synthetic mAP = {m}"
    print(f"\n[mAP] yolo (darknet53) synthetic overfit = {m:.4f}")


def test_prune_sparsity_vs_map(tmp_path):
    """PRUNE=True quality row: magnitude-prune yolo_mobilev1-0.5 to ~50%
    sparsity during the overfit (polynomial schedule over the first 150
    steps, then 100 recovery steps with masks frozen), and measure the mAP
    of the PRUNED (masked) weights — quantifying the sparsity/quality trade
    the reference's tfmot flow (keras_train.py:60-71) never measured."""
    spec = _spec2(classes=4)
    cfg = TrainConfig(batch_size=6, obj_thresh=0.7, iou_thresh=0.5,
                      init_learning_rate=2e-3, is_prune=True,
                      prune_initial_sparsity=0.25, prune_final_sparsity=0.5,
                      prune_end_epoch=150, prune_frequency=10)
    net = build_network("yolo_mobilev1", spec.in_hw, spec.nanchors,
                        spec.class_num, alpha=0.5)
    m, state, _ = _overfit_recal_map(net, spec, tmp_path, cfg=cfg, steps=250)
    sp = float(P.sparsity_of(state.params, state.masks))
    assert sp > 0.45, f"prune schedule fell short: sparsity={sp}"
    assert m > 0.75, f"pruned (sparsity={sp:.3f}) synthetic mAP = {m}"
    print(f"\n[mAP] yolo_mobilev1-0.5 pruned sparsity={sp:.3f} mAP={m:.4f}")
