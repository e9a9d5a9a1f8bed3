"""End-to-end inference: uint8 image in -> drawn boxes out.

Replaces /root/reference/keras_inference.py:75-176 (single-image eval) and
the C region-layer serving path (region_layer.c:378-404), as ONE jitted TPU
program per input shape: letterbox -> normalize -> conv stack -> decode ->
per-class NMS.  Unlike the K210 (which decodes on the CPU after the KPU),
decode+NMS stay on the accelerator.

Also provides the batched fixed-canvas path used for throughput serving and
``bench.py``.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from k210_yolo_framework_tpu.config import YoloSpec
from k210_yolo_framework_tpu.models.yolonet import YoloNet
from k210_yolo_framework_tpu.ops import decode as D
from k210_yolo_framework_tpu.ops import letterbox as LB
from k210_yolo_framework_tpu.ops import nms as N

__all__ = ["Detections", "Predictor", "VOC_LABELS"]

# 20-class VOC label table (yolo3_frame_test_public/main.c:140-148).
VOC_LABELS = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


class Detections(NamedTuple):
    boxes: np.ndarray    # [n, 4] yxyx pixels in the ORIGINAL image
    scores: np.ndarray   # [n]
    classes: np.ndarray  # [n] int


class Predictor:
    """Holds a built network + weights and serves jitted predictions.

    Configuration (obj_thresh / iou_thresh / max_out / class_softmax /
    compute_dtype / quantize) is FROZEN at construction: the jitted runners
    take ``self`` as a static argument, so the thresholds are baked into
    the compiled program and attribute mutation after the first prediction
    is silently ignored by the cache.  Build a new Predictor to change
    them (weights are shared by reference; rebuilding is cheap)."""

    def __init__(self, net: YoloNet, variables, spec: YoloSpec,
                 obj_thresh: float = 0.7, iou_thresh: float = 0.3,
                 class_softmax: bool = False, max_out: int = 30,
                 compute_dtype=None, quantize: Optional[str] = None,
                 stem_mode: str = "default"):
        """``compute_dtype`` sets the conv-stack compute dtype by rebuilding
        the module tree (builders thread ``dtype`` down); params stay fp32
        master copies, decode/NMS stay fp32.  ``None`` keeps the net's own
        dtype (no silent numerics change); pass ``jnp.bfloat16`` for serving
        — fp32 convs are 3x slower per op and catastrophically slow for
        some shapes on TPU.

        ``quantize='int8'`` serves from per-channel int8 conv kernels (the
        reference's kmodel device story, see ``quantize.py``): weights are
        stored int8 on device and dequantized inside the jitted program.

        ``quantize='int8_act'`` additionally computes the dense convs
        int8 x int8 -> int32 ON the MXU (models.layers.Int8Act) — the full
        KPU-style uint8-end-to-end analogue; weights stay fp32 masters,
        quantized inside the program (dynamic affine activation scales, no
        calibration pass; mAP-neutral on the synthetic eval).
        ``quantize='int8_act_sym'`` keeps symmetric activation scales — the
        max-throughput point (~+7% over affine) at a measured accuracy cost
        (PARITY.md table).
        ``quantize='int8_act_cal'`` uses STATIC calibrated activation ranges
        (the nncase ``ncc --dataset`` scheme): call :meth:`calibrate` with a
        representative batch before serving.  The quantize then fuses into
        each producer's epilogue — the dynamic scheme's extra activation
        passes (a measured loss on large-activation nets) disappear.
        """
        import dataclasses

        from k210_yolo_framework_tpu.models.layers import Int8Act
        if compute_dtype is None:
            compute_dtype = getattr(net.module, "dtype", jnp.float32)
        if isinstance(compute_dtype, Int8Act):
            # an Int8Act sentinel (passed directly, or baked into the net by
            # build_network(dtype=Int8Act(...))) IS a quantize request — do
            # not silently strip it back to a float dtype, and keep its
            # affine choice unless the quantize string explicitly conflicts
            act = compute_dtype
            implied = "int8_act_cal" if act.static else (
                "int8_act" if act.affine else "int8_act_sym")
            if quantize is None:
                quantize = implied
            elif quantize != implied:
                raise ValueError(
                    f"conflicting quantize modes: compute_dtype={act!r} "
                    f"implies {implied!r} but quantize={quantize!r}")
            compute_dtype = act.out_dtype
            # the sentinel's own affine/static bits win (the mode strings
            # cannot express symmetric+calibrated; the sentinel can)
            module_dtype = Int8Act(compute_dtype, affine=act.affine,
                                   static=act.static)
        elif quantize in ("int8_act", "int8_act_sym", "int8_act_cal"):
            module_dtype = Int8Act(compute_dtype,
                                   affine=quantize != "int8_act_sym",
                                   static=quantize == "int8_act_cal")
        else:
            module_dtype = compute_dtype
        if stem_mode not in ("default", "patches", "nativeconv"):
            raise ValueError(f"unknown stem_mode {stem_mode!r}")
        if stem_mode != "default":
            # "patches" feeds the stem conv pre-extracted im2col patches that
            # the letterbox einsum emits DIRECTLY (no NHWC canvas, no u8
            # relayout copy — BASELINE.md batch-128 profile's #2 cost);
            # gated to the batch serving path of the stride-2-stem mobilenet
            # builders, fp32/bf16/int8-weight serving only (the int8-act
            # modes keep the canvas for their own quantize chain).
            if not hasattr(net.module, "stem_mode"):
                raise ValueError(
                    f"stem_mode={stem_mode!r} unsupported by "
                    f"{type(net.module).__name__}")
            if (stem_mode == "patches"
                    and type(net.module).__name__ not in ("YoloMobileV1",
                                                          "YoloMobileV2")):
                raise ValueError(
                    f"stem_mode='patches' needs a builder with a stride-2 "
                    f"stem (yolo_mobilev1/yolo_mobilev2); "
                    f"{type(net.module).__name__}'s stride-1 stem would "
                    f"inflate pixel traffic ~9x")
            if stem_mode == "patches" and quantize not in (None, "int8"):
                raise ValueError(
                    "stem_mode='patches' supports quantize=None or 'int8'")
            net = dataclasses.replace(
                net, module=net.module.clone(stem_mode=stem_mode))
        self.stem_mode = stem_mode
        if getattr(net.module, "dtype", None) != module_dtype:
            net = dataclasses.replace(
                net, module=net.module.clone(dtype=module_dtype))
        self.net = net
        if quantize not in (None, "int8", "int8_act", "int8_act_sym",
                            "int8_act_cal"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.quantize = quantize
        if quantize == "int8":
            from k210_yolo_framework_tpu.quantize import quantize_tree
            variables = dict(variables)
            variables["params"] = jax.device_put(
                jax.jit(quantize_tree)(variables["params"]))
        self.variables = variables
        self.spec = spec
        self.obj_thresh = obj_thresh
        self.iou_thresh = iou_thresh
        self.class_softmax = class_softmax
        self.max_out = max_out
        self.compute_dtype = compute_dtype
        self._cal_checked = False   # see _require_calibrated
        self._cal_run = None        # cached jitted calibration forward

    def _materialize(self, variables):
        """Traceable: int8 QTensor kernels -> dense fp32 (inside jit)."""
        if self.quantize != "int8":  # int8_act* keep fp32 masters
            return variables
        from k210_yolo_framework_tpu.quantize import dequantize_tree
        return {**variables, "params": dequantize_tree(variables["params"])}

    def calibrate(self, canvases, img_hws) -> "Predictor":
        """Record per-conv activation ranges for ``quantize='int8_act_cal'``
        from a representative batch (the ``ncc --dataset`` calibration step,
        reference README.md:152-154).  The recording forward runs
        UNquantized — ranges must reflect the float net — and ranges widen
        monotonically across repeated calls.  Returns self."""
        if self.quantize != "int8_act_cal":
            raise ValueError(
                "calibrate() only applies to quantize='int8_act_cal'")
        import dataclasses

        from k210_yolo_framework_tpu.models.layers import Int8Act
        if self._cal_run is None:
            cal_mod = self.net.module.clone(
                dtype=Int8Act(self.compute_dtype,
                              affine=getattr(self.net.module.dtype, "affine",
                                             True),
                              static=True, calibrate=True))

            @jax.jit
            def run(variables, canv, hws):
                def one(canvas, hw):
                    img = LB.letterbox_image(canvas, hw, self.spec.in_hw,
                                             dtype=self.compute_dtype)
                    return LB.normalize_image(img).astype(self.compute_dtype)

                imgs = jax.vmap(one)(canv, hws)
                _, upd = cal_mod.apply(variables, imgs, train=False,
                                       mutable=["act_ranges"])
                return upd["act_ranges"]

            self._cal_run = run
        ranges = self._cal_run(self.variables, jnp.asarray(canvases),
                               jnp.asarray(img_hws))
        self.variables = {**self.variables, "act_ranges": ranges}
        self._cal_checked = False  # re-validate on next serve
        return self

    def _require_calibrated(self):
        if self.quantize != "int8_act_cal" or self._cal_checked:
            return
        # "present" is not enough: net.init() auto-creates act_ranges as
        # ZERO placeholders, and serving on those silently saturates every
        # activation to garbage — treat all-zero ranges as uncalibrated
        ranges = self.variables.get("act_ranges")
        if ranges is not None:
            leaves = jax.tree.leaves(ranges)
            if leaves and any(float(jnp.abs(l).max()) > 0 for l in leaves):
                self._cal_checked = True
                return
        raise RuntimeError(
            "quantize='int8_act_cal' serves from calibrated activation "
            "ranges: call calibrate(canvases, img_hws) with a "
            "representative batch first")

    # ---- single image (per-shape compile, like a CLI tool) ---------------

    def _letterbox_for_stem(self, img_or_canvas, hw, dtype):
        """One image -> the net's input under the active stem_mode: uint8
        letterboxed canvas, or the stem's im2col patches (whose max equals
        the canvas max — every canvas pixel appears in some patch — so the
        folded /max normalisation is unchanged)."""
        if self.stem_mode == "patches":
            return LB.letterbox_stem_patches(
                img_or_canvas, hw, self.spec.in_hw,
                dtype=dtype).astype(jnp.uint8)
        return LB.letterbox_image(img_or_canvas, hw, self.spec.in_hw,
                                  dtype=dtype).astype(jnp.uint8)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _run_single(self, variables, img_u8: jnp.ndarray, img_hw: jnp.ndarray):
        variables = self._materialize(variables)
        img = self._letterbox_for_stem(img_u8, img_hw, jnp.float32)
        inv_scale = 1.0 / jnp.maximum(jnp.max(img).astype(jnp.float32), 1e-12)
        preds = self.net.apply(variables, img[None], input_scale=inv_scale[None])
        # same fused full-candidate-set NMS as the batch path (the XLA
        # per_class_nms top-k prefilter would silently truncate when a low
        # obj_thresh leaves >64 candidates per class, e.g. during mAP eval)
        from k210_yolo_framework_tpu.ops.yolo_head_pallas import fused_decode_nms
        return fused_decode_nms([p.astype(jnp.float32) for p in preds],
                                self.spec, img_hw[None], self.obj_thresh,
                                self.iou_thresh, self.max_out,
                                self.class_softmax)

    def predict_image(self, img: np.ndarray) -> Detections:
        """img: [h, w, 3] uint8 original image."""
        self._require_calibrated()
        hw = jnp.asarray(img.shape[:2], jnp.int32)
        res = self._run_single(self.variables, jnp.asarray(img), hw)
        valid = np.asarray(res.valid[0])
        return Detections(
            boxes=np.asarray(res.boxes[0])[valid],
            scores=np.asarray(res.scores[0])[valid],
            classes=np.asarray(res.classes[0])[valid],
        )

    # ---- batched serving path (fixed canvas, one compile) -----------------

    @functools.partial(jax.jit, static_argnums=(0,))
    def _run_batch(self, variables, canvases_u8: jnp.ndarray, img_hws: jnp.ndarray):
        variables = self._materialize(variables)

        def one(canvas, hw):
            # uint8 letterbox store (exact: values are trunc'd integers); the
            # reference's per-image /max normalisation (utils.py:404-405) is
            # folded past the linear stem conv via input_scale, saving a
            # full-resolution divide pass + the layout copy it forced.
            # (Round-4 re-probes of this seam: a bf16 store loses 9% e2e
            # (24.8k) and a batch-last letterbox loses 1.5% (26.9k) — the
            # u8 relayout copy into the conv's batch-in-lanes tiling is ugly
            # in the profile (0.66 ms @ 167 GB/s) but both alternatives that
            # remove it cost more elsewhere.  stem_mode='patches' is the
            # round-5 producer-side attack: the letterbox einsum emits the
            # stem's im2col patches directly, so the canvas never exists.)
            return self._letterbox_for_stem(canvas, hw, self.compute_dtype)

        imgs = jax.vmap(one)(canvases_u8, img_hws)
        inv_scale = 1.0 / jnp.maximum(
            jnp.max(imgs, axis=tuple(range(1, imgs.ndim))).astype(jnp.float32),
            1e-12)
        preds = self.net.apply(variables, imgs, input_scale=inv_scale)
        # decode + per-class NMS fused into one Pallas kernel
        from k210_yolo_framework_tpu.ops.yolo_head_pallas import fused_decode_nms
        return fused_decode_nms([p.astype(jnp.float32) for p in preds],
                                self.spec, img_hws, self.obj_thresh,
                                self.iou_thresh, self.max_out,
                                self.class_softmax)

    # ---- multi-chip data-parallel serving --------------------------------

    def make_sharded_runner(self, mesh):
        """Multi-chip serving over a device mesh.  Returns a jitted
        ``(canvases [B,...], img_hws [B,2]) -> NmsResult`` with B divisible
        by the mesh's data axis.

        On a pure-DP mesh every chip runs the full fused pipeline —
        letterbox/forward/decode/NMS — on its batch shard via ``shard_map``
        (no collectives needed; params replicated once here).  On a mesh
        with a model (TP) or space (SP) axis the program instead runs under
        GSPMD: wide conv kernels are channel-sharded over ``model`` /
        image H over ``space`` (the same rules as the sharded train step,
        parallel.mesh.param_shardings), and XLA inserts the collectives.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from k210_yolo_framework_tpu.parallel.mesh import (
            DATA_AXIS, MODEL_AXIS, SPACE_AXIS, batch_sharding, image_sharding,
            param_shardings)

        self._require_calibrated()
        pure_dp = (mesh.shape.get(MODEL_AXIS, 1) == 1
                   and mesh.shape.get(SPACE_AXIS, 1) == 1)
        if not pure_dp:
            shardings = {
                coll: (param_shardings(tree, mesh) if coll == "params"
                       else jax.tree.map(
                           lambda _: NamedSharding(mesh, P()), tree))
                for coll, tree in self.variables.items()}
            variables = jax.device_put(self.variables, shardings)
            return jax.jit(
                lambda canvases, img_hws: self._run_batch(
                    variables, canvases, img_hws),
                in_shardings=(image_sharding(mesh), batch_sharding(mesh)))

        variables = jax.device_put(self.variables, NamedSharding(mesh, P()))

        def local(canvases, img_hws):
            return self._run_batch(variables, canvases, img_hws)

        # jax.shard_map (>= 0.9: keyword-only, check_vma); fall back to the
        # experimental module with its older check_rep spelling
        try:
            sharded = jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
                check_vma=False)
        except (AttributeError, TypeError):
            from jax.experimental.shard_map import shard_map
            sharded = shard_map(
                local, mesh=mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
                check_rep=False)
        return jax.jit(sharded)

    def predict_batch(self, canvases: np.ndarray, img_hws: np.ndarray) -> List[Detections]:
        self._require_calibrated()
        res = self._run_batch(self.variables, jnp.asarray(canvases),
                              jnp.asarray(img_hws, jnp.int32))
        out = []
        for b in range(canvases.shape[0]):
            valid = np.asarray(res.valid[b])
            out.append(Detections(np.asarray(res.boxes[b])[valid],
                                  np.asarray(res.scores[b])[valid],
                                  np.asarray(res.classes[b])[valid]))
        return out


def draw_detections(img: np.ndarray, det: Detections,
                    labels: Optional[List[str]] = None,
                    colormap: Optional[List[Tuple[int, int, int]]] = None) -> np.ndarray:
    """PIL box/label rendering, visual parity with keras_inference.py:137-174."""
    from PIL import Image, ImageDraw

    from k210_yolo_framework_tpu.utils.colormap import COLORMAP

    colormap = colormap or COLORMAP
    labels = labels or VOC_LABELS
    pil = Image.fromarray(img)
    drawer = ImageDraw.Draw(pil)
    thickness = (img.shape[0] + img.shape[1]) // 300
    for box, score, cls in zip(det.boxes, det.scores, det.classes):
        # untrained/garbage weights can decode exp(wh) to inf — clamp to the
        # image frame BEFORE the int conversion instead of crashing
        box = np.nan_to_num(np.asarray(box, np.float64),
                            posinf=max(img.shape[:2]) * 2.0, neginf=-1.0)
        top, left, bottom, right = box
        top = max(0, int(np.floor(top + 0.5)))
        left = max(0, int(np.floor(left + 0.5)))
        bottom = min(img.shape[0], int(np.floor(bottom + 0.5)))
        right = min(img.shape[1], int(np.floor(right + 0.5)))
        color = tuple(colormap[int(cls) % len(colormap)])
        for j in range(max(thickness, 1)):
            drawer.rectangle([left + j, top + j, right - j, bottom - j], outline=color)
        name = labels[int(cls)] if int(cls) < len(labels) else str(int(cls))
        drawer.text((left, max(top - 12, 0)), f"{name} {score:.2f}", fill=color)
    return np.asarray(pil)
