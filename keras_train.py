#!/usr/bin/env python3
"""Training entry point — CLI-compatible with the reference's keras_train.py
(/root/reference/keras_train.py:114-154: same flags, same defaults, string
booleans accepted), re-implemented on the TPU-native JAX stack.

Differences, per SURVEY.md §7 "quirks" decisions:
  * ``validation_steps`` uses the full test epoch (the reference multiplied
    by the split a second time — keras_train.py:98 — a bug, fixed);
  * checkpoints are orbax dirs + an ``.h5`` weights export (the reference's
    ``yolo_model.h5`` role).
"""

import argparse
import sys
from datetime import datetime
from pathlib import Path

import numpy as np


def str2bool(v) -> bool:
    """The reference passes booleans as 'True'/'False' strings
    (keras_train.py:121, 136) — accept both."""
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("true", "1", "yes")


def main(args):
    import jax

    from k210_yolo_framework_tpu.config import TrainConfig, YoloSpec
    from k210_yolo_framework_tpu.data import annotations as ANN
    from k210_yolo_framework_tpu.data import pipeline as PL
    from k210_yolo_framework_tpu.models import build_network
    from k210_yolo_framework_tpu.training import checkpoint as CK
    from k210_yolo_framework_tpu.training import train as T
    from k210_yolo_framework_tpu.utils import INFO, NOTE

    log_dir = Path(args.log_dir) / datetime.now().strftime("%Y%m%d-%H%M%S")
    log_dir.mkdir(parents=True, exist_ok=True)
    CK.write_args_txt(vars(args), str(log_dir / "args.txt"))

    spec = YoloSpec.from_files(
        f"data/{args.train_set}_anchor.npy",
        in_hw=tuple(args.image_size),
        out_hws=tuple(args.output_size),
        class_num=args.class_num)

    cfg = TrainConfig(
        batch_size=args.batch_size,
        max_epochs=args.max_nrof_epochs,
        init_learning_rate=args.init_learning_rate,
        learning_rate_decay_factor=args.learning_rate_decay_factor,
        obj_weight=args.obj_weight,
        noobj_weight=args.noobj_weight,
        wh_weight=args.wh_weight,
        obj_thresh=args.obj_thresh,
        iou_thresh=args.iou_thresh,
        validation_split=args.vaildation_split,
        rand_seed=args.rand_seed,
        augment=str2bool(args.augmenter),
        is_prune=str2bool(args.is_prune),
        prune_initial_sparsity=args.prune_initial_sparsity,
        prune_final_sparsity=args.prune_final_sparsity,
        prune_end_epoch=args.prune_end_epoch,
        prune_frequency=args.prune_frequency,
    )

    ann = ANN.load_ann_list(f"data/{args.train_set}_img_ann.npy")
    train_list, test_list = ANN.split_train_test(ann, cfg.validation_split)
    train_pipe = PL.DataPipeline(train_list, cfg.batch_size, cfg.rand_seed)
    if train_pipe.epoch_step == 0:
        raise SystemExit(
            f"train set has {len(train_list)} images < batch_size "
            f"{cfg.batch_size}: zero steps per epoch (drop_remainder "
            "batching, utils.py:449-450) — lower --batch_size")
    test_pipe = (PL.DataPipeline(test_list, cfg.batch_size, cfg.rand_seed)
                 if len(test_list) >= cfg.batch_size else None)

    import jax.numpy as jnp
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.compute_dtype]
    # the partitioner-safe depthwise kernel gradient is only needed when a
    # model/TP mesh axis exists (see models.layers.DepthwiseConv); single
    # device and pure DP use the cheaper stock gradient
    # sp (3rd axis) shards the dw-conv operands themselves, so the stock
    # gradient reduces correctly there; only a >1 model/TP axis needs the
    # partitioner-safe gradient
    mesh_dims = [int(x) for x in args.mesh.split(",")] \
        if args.mesh and args.mesh != "auto" else []
    if len(mesh_dims) > 3:
        raise SystemExit(f"--mesh {args.mesh!r}: format is 'dp,mp[,sp]' "
                         "or 'auto' (at most 3 axes)")
    uses_tp = len(mesh_dims) > 1 and mesh_dims[1] > 1
    net = build_network(args.model_def, spec.in_hw, spec.nanchors,
                        spec.class_num, alpha=args.depth_multiplier,
                        dtype=dtype, safe_dw_grad=uses_tp)
    state = T.create_train_state(net, cfg, jax.random.PRNGKey(cfg.rand_seed))

    if args.pre_ckpt and args.pre_ckpt not in ("None", ""):
        if args.pre_ckpt.endswith(".h5"):
            template = {"params": state.params, "batch_stats": state.batch_stats}
            import h5py
            with h5py.File(args.pre_ckpt, "r") as f:
                is_native = "params" in f
            if is_native:
                loaded = CK.load_h5(args.pre_ckpt, template)
            else:  # reference Keras layout (model_weights/<layer>/...)
                from k210_yolo_framework_tpu.port import port_reference_h5
                loaded, missing = port_reference_h5(args.pre_ckpt, args.model_def,
                                                    template)
                print(NOTE, f"ported reference Keras weights from {args.pre_ckpt}"
                      + (f" ({len(missing)} layers absent, left at init: "
                         f"{missing[:4]}...)" if missing else ""))
            state = state.replace(params=loaded["params"],
                                  batch_stats=loaded["batch_stats"])
        else:
            state = CK.restore_state(args.pre_ckpt, jax.device_get(state))
        print(INFO, f"Load CKPT {args.pre_ckpt}")

    # pixel pipeline rides the compute dtype (bf16 default: 2.3x faster
    # augment shears; box/label math stays fp32 inside)
    pp_train = PL.make_preprocess_fn(spec, is_training=cfg.augment, dtype=dtype)
    pp_test = PL.make_preprocess_fn(spec, is_training=False, dtype=dtype)

    # per-batch scalars: jsonl + TensorBoard event file (the reference's
    # TensorBoard(update_freq='batch') callback, keras_train.py:92)
    from k210_yolo_framework_tpu.utils.tboard import SummaryWriter
    scalar_log = open(log_dir / "scalars.jsonl", "a")
    tb = SummaryWriter(str(log_dir))

    def scalar_logger(step, logs):
        import json
        scalar_log.write(json.dumps({"step": step, **logs}) + "\n")
        scalar_log.flush()  # tail survives SIGKILL/OOM
        tb.add_scalars(list(logs.items()), step)

    mesh = None
    if args.mesh:  # "dp,mp[,sp]" over jax.devices(); "auto" = all-DP
        from k210_yolo_framework_tpu.parallel import make_mesh
        if args.mesh == "auto":
            mesh = make_mesh()
        else:
            dp, mp, sp = mesh_dims + [1] * (3 - len(mesh_dims))
            mesh = make_mesh(dp=dp, mp=mp, sp=sp)
        print(INFO, f"mesh {dict(mesh.shape)} over {len(jax.devices())} devices")

    state = T.fit(
        net, spec, cfg,
        iter(train_pipe), iter(test_pipe) if test_pipe else None,
        pp_train, pp_test,
        train_pipe.epoch_step, test_pipe.epoch_step if test_pipe else 0,
        jax.random.PRNGKey(cfg.rand_seed),
        mesh=mesh,
        scalar_logger=scalar_logger,
        state=state,
        profile_dir=str(log_dir / "profile") if str2bool(args.profile) else "")
    scalar_log.close()
    tb.close()

    if args.bn_recalibrate > 0:
        print(INFO, f"recalibrating BN statistics over {args.bn_recalibrate} batches")
        new_bs = T.recalibrate_batch_stats(
            net, state.params, jax.device_get(state.batch_stats),
            iter(train_pipe), pp_test, jax.random.PRNGKey(cfg.rand_seed + 1),
            num_batches=args.bn_recalibrate)
        state = state.replace(batch_stats=new_bs)

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    if cfg.is_prune:
        h5_path = log_dir / "yolo_prune_model.h5"   # keras_train.py:104
    else:
        h5_path = log_dir / "yolo_model.h5"         # keras_train.py:38
    CK.save_h5(str(h5_path), variables)
    CK.save_state(str(log_dir / "ckpt"), state)
    print(INFO, f"Save Model as {h5_path}")


def parse_args(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_set", type=str, default="voc")
    parser.add_argument("--class_num", type=int, default=20)
    parser.add_argument("--pre_ckpt", type=str, default="None")
    parser.add_argument("--model_def", type=str, default="yolo_mobilev2")
    parser.add_argument("--depth_multiplier", type=float,
                        choices=[0.5, 0.75, 1.0], default=1.0)
    parser.add_argument("--augmenter", type=str, default="True")
    parser.add_argument("--image_size", type=int, default=(224, 320), nargs="+")
    parser.add_argument("--output_size", type=int, default=(7, 10, 14, 20), nargs="+")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--rand_seed", type=int, default=6)
    parser.add_argument("--max_nrof_epochs", type=int, default=10)
    parser.add_argument("--init_learning_rate", type=float, default=0.001)
    parser.add_argument("--learning_rate_decay_factor", type=float, default=0)
    parser.add_argument("--obj_weight", type=float, default=5.0)
    parser.add_argument("--noobj_weight", type=float, default=0.5)
    parser.add_argument("--wh_weight", type=float, default=0.5)
    parser.add_argument("--obj_thresh", type=float, default=0.7)
    parser.add_argument("--iou_thresh", type=float, default=0.3)
    parser.add_argument("--vaildation_split", type=float, default=0.1)
    parser.add_argument("--log_dir", type=str, default="log")
    parser.add_argument("--is_prune", type=str, default="False")
    parser.add_argument("--prune_initial_sparsity", type=float, default=0.5)
    parser.add_argument("--prune_final_sparsity", type=float, default=0.9)
    parser.add_argument("--prune_end_epoch", type=int, default=5)
    parser.add_argument("--prune_frequency", type=int, default=100)
    parser.add_argument("--profile", type=str, default="False",
                        help="trace one train step (step 3) with "
                             "jax.profiler into <log_dir>/profile — the "
                             "reference's TensorBoard profile_batch=3")
    parser.add_argument("--bn_recalibrate", type=int, default=0,
                        help="after training, replace BatchNorm EMA stats "
                             "with arithmetic means over N train batches "
                             "(SWA update_bn recipe; helps small datasets)")
    parser.add_argument("--mesh", type=str, default="",
                        help="'dp,mp[,sp]' or 'auto' — shard training over a "
                             "device mesh (DP batch + channel TP + spatial "
                             "partitioning of image H)")
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="conv-stack compute dtype (params/loss stay "
                             "fp32; bf16 is ~14x faster on the MXU)")
    return parser.parse_args(argv)


if __name__ == "__main__":
    main(parse_args(sys.argv[1:]))
