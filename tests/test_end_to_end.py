"""Full-loop integration: overfit tiny data -> BN recalibration -> save/load
-> batched inference -> decode+NMS -> VOC mAP.

This is the regression test for the small-dataset BatchNorm pathology: EMA
running stats lag the statistics overfit weights rely on, collapsing
eval-mode confidence; exact arithmetic-mean recalibration
(training.train.recalibrate_batch_stats) restores train-mode behavior.
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
from k210_yolo_framework_tpu.training import checkpoint as CK
from k210_yolo_framework_tpu.training import train as T


@pytest.mark.slow
def test_overfit_recalibrate_map(tmp_path):
    rng = np.random.default_rng(5)
    n_img, classes = 6, 4
    ann = PL.synthetic_ann_list(str(tmp_path), n=n_img, class_num=classes, seed=5)

    anchors = np.array([[[0.7, 0.6], [0.5, 0.5], [0.4, 0.3]],
                        [[0.3, 0.3], [0.2, 0.2], [0.15, 0.15]]], np.float32)
    spec = YoloSpec.create((96, 96), ((3, 3), (6, 6)), classes, anchors)
    cfg = TrainConfig(batch_size=n_img, obj_thresh=0.7, iou_thresh=0.5,
                      init_learning_rate=2e-3)

    net = build_network("yolo_mobilev1", spec.in_hw, spec.nanchors,
                        spec.class_num, alpha=0.5)
    pipe = PL.DataPipeline(ann, n_img, seed=1, use_native=False,
                           canvas_hw=(512, 512))
    pp = PL.make_preprocess_fn(spec, is_training=False)

    state = T.create_train_state(net, cfg, jax.random.PRNGKey(0))
    step = T.make_train_step(net, spec, cfg, train_epoch_step=1)
    it = iter(pipe)
    hb = next(it)
    key = jax.random.PRNGKey(0)
    images, labels = pp(jnp.asarray(hb.canvases), jnp.asarray(hb.img_hws),
                        jnp.asarray(hb.boxes), jnp.asarray(hb.valid), key)
    first = last = None
    for i in range(250):
        state, logs = step(state, images, labels)
        if i == 0:
            first = float(logs["loss"])
    last = float(logs["loss"])
    assert last < first * 0.2, f"did not overfit: {first} -> {last}"

    new_bs = T.recalibrate_batch_stats(net, state.params,
                                       jax.device_get(state.batch_stats),
                                       iter(pipe), pp, jax.random.PRNGKey(3),
                                       num_batches=4)

    # h5 round-trip like the CLI
    path = str(tmp_path / "m.h5")
    CK.save_h5(path, {"params": jax.device_get(state.params),
                      "batch_stats": jax.device_get(new_bs)})
    template = {"params": state.params, "batch_stats": state.batch_stats}
    variables = CK.load_h5(path, template)

    pred = Predictor(net, variables, spec, obj_thresh=0.1, iou_thresh=0.45,
                     max_out=20)
    res = evaluate_map(pred, ann, classes, batch_size=n_img)
    # pinned regression floor — measured 0.91 in round 1; the floor leaves
    # seed/backend headroom but catches any real quality regression
    assert res["map"] > 0.8, f"mAP after overfit+recalibrate = {res['map']}"

    # quantized-serving mAP deltas on the same checkpoint (the KPU uint8
    # analogue question: what does int8 cost in accuracy?) — recorded per
    # round in BASELINE.md's mAP table
    deltas = {}
    for mode in ("int8", "int8_act", "int8_act_cal"):
        qpred = Predictor(net, variables, spec, obj_thresh=0.1,
                          iou_thresh=0.45, max_out=20, quantize=mode)
        if mode == "int8_act_cal":
            qpred.calibrate(jnp.asarray(hb.canvases),
                            jnp.asarray(hb.img_hws))
        qres = evaluate_map(qpred, ann, classes, batch_size=n_img)
        deltas[mode] = qres["map"] - res["map"]
        assert qres["map"] > 0.75, \
            f"{mode} serving collapsed mAP: {res['map']} -> {qres['map']}"
    print(f"\n[mAP] fp32={res['map']:.4f} "
          + " ".join(f"{m}_delta={d:+.4f}" for m, d in deltas.items()))
