"""Shared conv building blocks (flax.linen).

Semantics cloned from the reference layer configurations:

  * ``DarknetConv2D`` / ``DarknetConv2D_BN_Leaky``
    (/root/reference/models/yolonet.py:244-260): l2(5e-4) on kernels,
    'valid' padding with explicit top/left zero-pad when stride 2, BN with
    keras defaults (momentum .99, eps 1e-3), LeakyReLU alpha=0.1.
  * MobileNetV1 blocks (/root/reference/models/keras_mobilenet.py:291-436):
    stride-2 convs use explicit ((1,1),(1,1)) pad + valid (K210 KPU
    requirement), depthwise ReLU (unbounded) + pointwise LeakyReLU
    (keras default alpha=0.3).
  * MobileNetV2 blocks (/root/reference/models/keras_mobilenet_v2.py:426-485):
    BN momentum .999 eps 1e-3, ReLU6 activations.

TPU notes: convs run in ``dtype`` (bfloat16 by default under training config)
with f32 params and f32 BN statistics; XLA fuses BN + activation into the
conv epilogue, so no hand-fused kernel is needed for the dense convs — the
MXU-bound convs dominate.  Weight layout is HWIO (XLA native).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "ConvBN",
    "DarknetConvBN",
    "DepthwiseConv",
    "Int8Act",
    "darknet_head_conv",
    "depthwise_conv",
    "leaky_relu",
    "relu6",
    "upsample2x",
]


class Int8Act:
    """Compute-dtype sentinel: run the DENSE convs int8 x int8 -> int32 on
    the MXU (v5e int8 peak is 2x bf16), dequantizing into ``out_dtype``.

    The KPU analogue of uint8 end-to-end serving (reference README.md:152-154
    — nncase quantizes activations too).  Activations are quantized
    dynamically per tensor (min/max inside the program — no calibration
    pass), weights per output channel; depthwise convs, the 3-channel stem
    and the bias-carrying head 1x1 stay in ``out_dtype`` (they are
    VPU/precision work, not MXU volume).  Thread it anywhere a builder
    accepts ``dtype``: ``build_network(..., dtype=Int8Act())`` or
    ``Predictor(..., quantize="int8_act")``.

    ``affine`` (default): activations quantize with a per-tensor zero point
    — post-LeakyReLU tensors are skewed (negative tail is 0.1x the positive
    range), so a symmetric scale wastes nearly half the int8 range; the
    zero-point variant recovers it with one exact per-channel correction
    term (see ``_Int8Conv``).  ``affine=False`` keeps the symmetric scheme
    for comparison (measured table in PARITY.md).

    ``static`` reads each conv's activation range from the ``act_ranges``
    variable collection instead of reducing it in-graph — nncase's own
    calibration scheme (``ncc --dataset``, README.md:152-154).  The scale
    no longer depends on a full reduction of x, so XLA can fuse the
    quantize into the producing op's epilogue: the dynamic scheme's two
    extra full-activation passes (min/max reduce + quantize) disappear —
    they are what made dynamic int8-act a measured LOSS on darknet53's
    large activations.  ``calibrate`` (with ``static``) makes the conv
    RECORD batch min/max into ``act_ranges`` (run with
    ``mutable=["act_ranges"]``; ranges widen monotonically over batches).
    """

    def __init__(self, out_dtype: Any = jnp.bfloat16, affine: bool = True,
                 static: bool = False, calibrate: bool = False):
        self.out_dtype = out_dtype
        self.affine = affine
        self.static = static
        self.calibrate = calibrate

    # modules hash their attributes for the jit cache key
    def __hash__(self):
        return hash((Int8Act, jnp.dtype(self.out_dtype).name, self.affine,
                     self.static, self.calibrate))

    def __eq__(self, other):
        return (isinstance(other, Int8Act)
                and jnp.dtype(self.out_dtype) == jnp.dtype(other.out_dtype)
                and (self.affine, self.static, self.calibrate)
                == (other.affine, other.static, other.calibrate))

    def __repr__(self):
        return (f"Int8Act({jnp.dtype(self.out_dtype).name}, "
                f"affine={self.affine}, static={self.static}, "
                f"calibrate={self.calibrate})")


def _split_dtype(dtype):
    """(compute dtype for VPU/precision paths, Int8Act sentinel or None)
    from a ``dtype`` attribute that may be the :class:`Int8Act` sentinel."""
    if isinstance(dtype, Int8Act):
        return dtype.out_dtype, dtype
    return dtype, None

# Marker prefix for conv kernels carrying the reference's l2(5e-4)
# regularizer (yolonet.py:247); training.loss.l2_penalty scans for it.
DARKNET_CONV_PREFIX = "dark_conv"


def leaky_relu(alpha: float) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """LeakyReLU with a max-form forward and a sign-mask backward.

    Forward ``max(x, alpha*x)`` is bit-identical to the
    ``where(x >= 0, x, alpha*x)`` form for ``0 <= alpha <= 1`` (incl.
    NaN/±0) but predicate-free: the ``where`` form makes XLA materialise
    the sign mask as a bit-packed u32 side output per block in the
    forward-only serving program (shift-left + reduce-OR over H,
    ~0.9 ms/step at batch 256; serving 23.3k → 25.4k imgs/sec removed).

    The tangent is pinned to ``where(x >= 0, t, alpha*t)`` via custom_jvp:
    ``maximum``'s own VJP compares both branches (full pre-activation
    traffic, +2 ms on the 17 ms train step) and splits the tie at x == 0,
    while the reference's TF LeakyReLU gradient is slope 1 there."""
    assert 0.0 <= alpha <= 1.0

    @jax.custom_jvp
    def _leaky(x):
        return jnp.maximum(x, x * jnp.asarray(alpha, x.dtype))

    @_leaky.defjvp
    def _leaky_jvp(primals, tangents):
        (x,), (t,) = primals, tangents
        return _leaky(x), jnp.where(x >= 0, t, t * jnp.asarray(alpha, t.dtype))

    return _leaky


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(nn.relu(x), 6.0)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample == keras ``UpSampling2D(2)``
    (yolonet.py:33)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _pad_for(strides: Tuple[int, int], explicit: Optional[Tuple] = None):
    if explicit is not None:
        return explicit
    return "SAME" if strides == (1, 1) else "VALID"


class _StemConv(nn.Module):
    """im2col + matmul replacement for convs with tiny input channel counts.

    The few-input-channel stem conv (RGB -> 24/32) hits a pathological
    lowering on some TPU runtimes (measured ~700 ms for one bf16 3->24
    3x3 at batch 256 vs ~0.5 ms for every other conv in the net); patch
    extraction (cheap, VPU) followed by an MXU matmul of the [kh*kw*cin,
    cout] kernel sidesteps it.  Param name/shape match nn.Conv exactly so
    checkpoints are interchangeable.
    """

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, cin, self.features))
        import jax as _jax
        patches = _jax.lax.conv_general_dilated_patches(
            x.astype(self.dtype), (kh, kw), self.strides, "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # patches features are ordered (cin, kh, kw) slowest-to-fastest:
        # transpose the kernel to match before flattening.
        k2 = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(-1, self.features)
        return patches @ k2.astype(self.dtype)


class _StemPatchesConv(nn.Module):
    """Stem conv over PRE-EXTRACTED im2col patches.

    Consumes ``[N, Ho, kh, Wo, kw, C]`` produced by
    ``ops.letterbox.letterbox_stem_patches`` (the resample einsum emits the
    patches directly, so the NHWC canvas — and the 0.54 ms/batch relayout
    copy it forced into the stem conv's tiling, BASELINE.md batch-128
    profile — never exists in the program).  Pure dot_general; param
    name/shape match nn.Conv exactly so checkpoints are interchangeable
    with the default stem.
    """

    features: int
    kernel: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel
        assert x.ndim == 6 and x.shape[2] == kh and x.shape[4] == kw, (
            f"stem_mode='patches' expects [N, Ho, {kh}, Wo, {kw}, C] patches "
            f"from letterbox_stem_patches, got {x.shape}")
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, cin, self.features))
        return jax.lax.dot_general(
            x.astype(self.dtype), kernel.astype(self.dtype),
            dimension_numbers=(((2, 4, 5), (0, 1, 2)), ((), ())))


class _Int8Conv(nn.Module):
    """Dense conv computed int8 x int8 -> int32 on the MXU.

    Param name/shape/init match ``nn.Conv`` exactly (fp32 master kernel), so
    checkpoints are interchangeable with the bf16 path; quantization happens
    inside the program each call: dynamic per-tensor activation scale,
    per-output-channel weight scale, round-to-nearest, int32 accumulation,
    fp32 rescale.  Scale math runs fp32 (bf16 spacing at +-127 is 0.5 — half
    a quantum of avoidable noise).

    ``affine_act`` (default): per-tensor zero-point activation quantization
    — ``x ≈ (q − zp)·sx`` with ``sx = (max−min)/254``.  Post-LeakyReLU
    activations live in ``[−a/10, a]``, so the symmetric scheme spends
    nearly half its codes on values that never occur; the affine scheme's
    step is ~1.8× finer.  The zero point folds out of the int32 matmul
    EXACTLY: ``Σ (q−zp)·kq = Σ q·kq − zp·Σ kq`` — one per-output-channel
    correction vector — provided every tap reads a zp-offset value, which
    SAME padding would violate (XLA pads q=0 ≡ real −zp·sx, not 0).  The
    conv therefore pads explicitly with ``zp`` and runs VALID.  This is the
    KPU's own scheme: nncase emits affine uint8 with zero-point padding.
    """

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Any
    out_dtype: Any = jnp.bfloat16
    affine_act: bool = True
    static_act: bool = False
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, x.shape[-1], self.features))
        xf = x.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
        kq = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)

        if self.static_act:
            # calibrated per-tensor range (the nncase scheme): the scale no
            # longer depends on a reduction of x, so the quantize fuses
            # into the producer's epilogue — no extra activation passes
            rmin = self.variable("act_ranges", "min",
                                 lambda: jnp.zeros((), jnp.float32))
            rmax = self.variable("act_ranges", "max",
                                 lambda: jnp.zeros((), jnp.float32))
            if self.calibrate:
                rmin.value = jnp.minimum(rmin.value, jnp.min(xf))
                rmax.value = jnp.maximum(rmax.value, jnp.max(xf))
                # calibration forward runs UNquantized: ranges must reflect
                # the float net's activations, not a half-calibrated
                # quantized one (layer N's input would otherwise depend on
                # layer N-1's still-collapsing ranges)
                y = jax.lax.conv_general_dilated(
                    xf, kf, tuple(self.strides), self.padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return y.astype(self.out_dtype)
            xmin = jnp.minimum(rmin.value, 0.0)
            xmax = jnp.maximum(rmax.value, 0.0)
        elif self.affine_act:
            xmin = jnp.minimum(jnp.min(xf), 0.0)
            xmax = jnp.maximum(jnp.max(xf), 0.0)
        else:
            # dynamic symmetric: ONE fused abs-max reduction (two sibling
            # min/max reduces may compile to two full activation passes)
            amax = jnp.max(jnp.abs(xf))
            xmin, xmax = -amax, amax

        if not self.affine_act:
            sx = jnp.maximum(jnp.maximum(-xmin, xmax), 1e-6) / 127.0
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, kq, tuple(self.strides), self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * (sx * sw)).astype(self.out_dtype)

        # affine: zp chosen so min -> -127, max -> +127, and 0 is exactly
        # representable (min<=0<=max is forced so ReLU-family zeros and the
        # zp padding are exact); under static ranges an out-of-range
        # activation saturates via the clip, as on the KPU
        sx = jnp.maximum(xmax - xmin, 1e-6) / 254.0
        zp = jnp.clip(-127.0 - jnp.round(xmin / sx), -127.0, 127.0)
        xq = jnp.clip(jnp.round(xf / sx) + zp, -127.0, 127.0).astype(jnp.int8)

        if (kh, kw) != (1, 1) and self.padding == "SAME":
            # explicit zp padding + VALID (dense SAME convs in this zoo are
            # stride-1 head 3x3s; the general formula covers strides anyway)
            pads = [(0, 0, 0)]
            for dim, ksz, s in ((1, kh, self.strides[0]),
                                (2, kw, self.strides[1])):
                n = x.shape[dim]
                total = max((-(-n // s) - 1) * s + ksz - n, 0)
                pads.append((total // 2, total - total // 2, 0))
            pads.append((0, 0, 0))
            xq = jax.lax.pad(xq, zp.astype(jnp.int8), pads)
            conv_pad = "VALID"
        else:
            conv_pad = self.padding

        y = jax.lax.conv_general_dilated(
            xq, kq, tuple(self.strides), conv_pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        k1 = jnp.sum(kq.astype(jnp.int32), axis=(0, 1, 2))      # [cout]
        y = y - zp.astype(jnp.int32) * k1
        return (y.astype(jnp.float32) * (sx * sw)).astype(self.out_dtype)


def _dw_conv(x: jnp.ndarray, kernel: jnp.ndarray, strides: Tuple[int, int],
             padding: str) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, kernel, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def _same_pads(size: int, k: int, s: int) -> Tuple[int, int]:
    out = -(-size // s)  # ceil
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                   strides: Tuple[int, int], padding: str) -> jnp.ndarray:
    """Grouped (depthwise) conv with a GSPMD-safe kernel gradient.

    XLA's partitioner mis-scales the grouped-convolution KERNEL gradient by
    the size of any mesh axis the operands are not sharded over (measured:
    dk exactly mp x too large for a replicated [kh,kw,1,C] kernel with the
    input batch-sharded on a (dp, mp) mesh, jax 0.9.0, both GSPMD and
    shardy; dx and the forward are unaffected).  The backward-wrt-kernel
    conv uses batch_group_count, whose partial results get summed over the
    unused axis instead of being deduplicated.

    This custom VJP keeps the fast grouped conv forward and the standard
    (correct) transposed conv for dx, but computes dk as kh*kw tap-wise
    multiply-reduces — pure elementwise ops + reductions, which every
    partitioner handles correctly — so training math is placement-invariant.
    """
    return _dw_conv(x, kernel, strides, padding)


def _dw_fwd(x, kernel, strides, padding):
    return _dw_conv(x, kernel, strides, padding), (x, kernel)


def _dw_bwd(strides, padding, res, dy):
    x, kernel = res
    _, vjp_x = jax.vjp(lambda xx: _dw_conv(xx, kernel, strides, padding), x)
    dx, = vjp_x(dy)

    kh, kw, _, c = kernel.shape
    sh, sw = strides
    if padding == "SAME":
        ph, pw = _same_pads(x.shape[1], kh, sh), _same_pads(x.shape[2], kw, sw)
    else:  # VALID (explicit pads are applied by the caller before the conv)
        ph = pw = (0, 0)
    xp = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
    ho, wo = dy.shape[1], dy.shape[2]
    rows = []
    for a in range(kh):
        cols = []
        for b in range(kw):
            xs = jax.lax.slice(
                xp, (0, a, b, 0),
                (xp.shape[0], a + sh * (ho - 1) + 1, b + sw * (wo - 1) + 1, c),
                (1, sh, sw, 1))
            # multiply in the native (bf16) dtype, accumulate fp32 — same
            # recipe XLA's own conv grad uses, half the HBM traffic of an
            # fp32 upcast before the product
            cols.append(jnp.sum(xs * dy, axis=(0, 1, 2), dtype=jnp.float32))
        rows.append(jnp.stack(cols))
    dk = jnp.stack(rows)[:, :, None, :].astype(kernel.dtype)
    return dx, dk


depthwise_conv.defvjp(_dw_fwd, _dw_bwd)


class DepthwiseConv(nn.Module):
    """Depthwise conv module using :func:`depthwise_conv`.

    Param name/shape/init match ``nn.Conv(feature_group_count=C)`` exactly
    ([kh, kw, 1, C], lecun_normal), so checkpoints are interchangeable.

    ``safe_grad`` selects the partitioner-safe kernel gradient (default).
    The stock XLA gradient is provably correct on a single device and on
    meshes whose every >1-sized axis shards the operands (pure DP) — pass
    ``safe_grad=False`` there to skip the tap-loop's extra HBM reads; KEEP
    the default whenever a model/TP axis exists.
    """

    kernel: Tuple[int, int]
    strides: Tuple[int, int]
    padding: str
    dtype: Any = jnp.float32
    safe_grad: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel[0], self.kernel[1], 1, c))
        if not self.safe_grad:
            return _dw_conv(x.astype(self.dtype), k.astype(self.dtype),
                            tuple(self.strides), self.padding)
        return depthwise_conv(x.astype(self.dtype), k.astype(self.dtype),
                              tuple(self.strides), self.padding)


class ConvBN(nn.Module):
    """Conv (+ optional depthwise) -> BN -> activation.

    ``explicit_pad``: ((top, bottom), (left, right)) zero-padding applied
    before a VALID conv — how the reference expresses every stride-2 conv.
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    explicit_pad: Optional[Tuple] = None
    act: Optional[Callable] = None
    depthwise: bool = False
    safe_dw_grad: bool = True
    use_bias: bool = False
    bn: bool = True
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32
    # Serving-path stem variants (see PARITY.md / BASELINE.md batch-128
    # profile).  "default": cin<=4 convs go through _StemConv (im2col +
    # matmul), EXCEPT the measured-good eval/stride-2/batch-128 family where
    # plain nn.Conv wins ~1.5% (see _native_stem_wins — checkpoint-identical:
    # both store the same hwio "kernel" param).  "patches": the input x is
    # ALREADY the im2col patches tensor
    # [N, Ho, kh, Wo, kw, C] from letterbox_stem_patches — the letterbox
    # einsum emitted it directly and the relayout copy never happens.
    # "nativeconv": force nn.Conv even for cin<=4 (probe of the pathological
    # small-cin conv lowering that motivated _StemConv).
    stem_mode: str = "default"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 post_conv_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        dtype, int8_act = _split_dtype(self.dtype)
        if int8_act and train:
            # jnp.round has zero derivative: kernel gradients through the
            # int8 path are silently dead (no straight-through estimator /
            # QAT here) — refuse rather than "train" a frozen conv stack
            raise NotImplementedError(
                "Int8Act is a serving-only compute mode; build the training "
                "net with a float dtype (train with bf16/fp32, serve with "
                "quantize='int8_act')")
        if self.stem_mode == "patches":
            # x is the pre-extracted patches tensor; padding already encoded
            # in the letterbox weight matrices (zero columns)
            assert not (self.depthwise or self.use_bias) and int8_act is None
            x = _StemPatchesConv(features=self.features, kernel=self.kernel,
                                 dtype=dtype, name="conv")(x)
            return self._epilogue(x, train, post_conv_scale)
        pad = _pad_for(self.strides, self.explicit_pad)
        if self.explicit_pad is not None:
            x = jnp.pad(x, ((0, 0),) + tuple(self.explicit_pad) + ((0, 0),))
            pad = "VALID"
        if self.depthwise:
            assert not self.use_bias, "depthwise path is bias-free in this zoo"
            # Measured dead end (round 3): a calibrated QDQ pair here (int8
            # STORAGE of the dw input, wide compute — the KPU stores uint8
            # between every layer) regressed int8_act_cal serving 26.1k ->
            # 19.4k imgs/sec: TPU conv fusions take epilogues but not lhs
            # prologues, so the dequantized wide operand materialises in conv
            # layout anyway and the QDQ only ADDS a full-resolution pass.
            # int8 inter-layer storage needs a conv that CONSUMES int8
            # (the dense _Int8Conv path) — not a wide dw conv.
            x = DepthwiseConv(
                kernel=self.kernel,
                strides=self.strides,
                padding=pad,
                dtype=dtype,
                safe_grad=self.safe_dw_grad,
                name="conv",
            )(x)
        elif (x.shape[-1] <= 4 and not self.use_bias
              and self.stem_mode != "nativeconv"
              and not (int8_act is None
                       and self._native_stem_wins(x, train))):
            # int8_act nets must NOT take the autotune fall-through: the
            # dispatch order below would hand the stem to _Int8Conv, and the
            # stem stays WIDE by design in the int8-act modes (quantization
            # noise on raw 0..255 pixels costs mAP; see BASELINE int8 rows)
            if pad == "SAME":  # stems in this zoo are explicit-pad/VALID
                ph = ((self.kernel[0] - 1) // 2, self.kernel[0] // 2)
                pw = ((self.kernel[1] - 1) // 2, self.kernel[1] // 2)
                x = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
            x = _StemConv(
                features=self.features,
                kernel=self.kernel,
                strides=self.strides,
                dtype=dtype,
                name="conv",
            )(x)
        elif int8_act and not self.use_bias:
            # biased dense convs (none in this zoo) would need the bias added
            # post-rescale under the "conv" scope — keep them on nn.Conv
            x = _Int8Conv(
                features=self.features,
                kernel=self.kernel,
                strides=self.strides,
                padding=pad,
                out_dtype=dtype,
                affine_act=int8_act.affine,
                static_act=int8_act.static,
                calibrate=int8_act.calibrate,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=self.kernel,
                strides=self.strides,
                padding=pad,
                use_bias=self.use_bias,
                dtype=dtype,
                name="conv",
            )(x)
        return self._epilogue(x, train, post_conv_scale)

    def _native_stem_wins(self, x, train) -> bool:
        """Trace-time autotune of the cin<=4 stem dispatch (round 5).

        ``_StemConv`` exists because nn.Conv's small-cin lowering once
        measured ~700 ms/op at batch 256 on this rig.  A round-5 re-probe
        shows that pathology is GONE on the current runtime, and at the
        lane-width serving batch nn.Conv now BEATS _StemConv: back-to-back
        reps measured device 4.12/4.15 ms vs 4.20/4.21 (~+1.5%, 30.5k ->
        30.9k imgs/sec); at batch 256 it is parity-or-better (27.6k vs the
        round-4 default 27.3k).  The STRIDE-1 stems win far more — there
        _StemConv's im2col patches tensor is ~9x the canvas bytes:
        tiny_yolo 27.1k -> 29.6k (+9.5%, device 4.725 -> 4.317 ms);
        darknet53 parity (4.97k vs 4.95k, the stem is negligible in its
        25.7 ms step).  The dispatch is keyed to exactly the measured-good
        shape families below; the train path and other batches are
        unmeasured and stay on the proven _StemConv.  Shapes are static
        under jit, so this is a compile-time choice, not a runtime branch.
        """
        if self.stem_mode != "default" or train or x.ndim != 4:
            return False
        if self.strides == (2, 2):
            return x.shape[0] in (128, 256)
        return self.strides == (1, 1) and x.shape[0] == 128

    def _epilogue(self, x, train, post_conv_scale):
        if post_conv_scale is not None:
            # Per-image scalar folded in AFTER the conv: conv(x*s) == conv(x)*s,
            # so the serving path can feed raw 0..255 letterbox pixels and
            # apply the reference's per-image /max normalisation
            # (utils.py:404-405) here, where it fuses into the BN epilogue
            # instead of costing a full-resolution divide pass + layout copy.
            # The identity needs a bias-free conv ((Wx+b)*s != W(xs)+b).
            assert not self.use_bias, \
                "post_conv_scale requires a bias-free conv (the fold identity" \
                " conv(x*s) == conv(x)*s does not hold past a bias)"
            s = jnp.asarray(post_conv_scale, x.dtype)
            x = x * s.reshape(s.shape + (1,) * (x.ndim - s.ndim))
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                dtype=jnp.float32,
                name="bn",
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DarknetConvBN(nn.Module):
    """``DarknetConv2D_BN_Leaky`` (yolonet.py:253-260): no bias, BN, leaky 0.1.

    Stride-2 variant pads top/left only (yolonet.py:197, 248).
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32
    stem_mode: str = "default"  # see ConvBN.stem_mode ("patches" unsupported:
    # these stems are stride-1, where the patch tensor would inflate pixel
    # traffic ~9x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 post_conv_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        explicit = ((1, 0), (1, 0)) if self.strides == (2, 2) else None
        return ConvBN(
            features=self.features,
            kernel=self.kernel,
            strides=self.strides,
            explicit_pad=explicit,
            act=leaky_relu(0.1),
            dtype=self.dtype,
            stem_mode=self.stem_mode,
            name=f"{DARKNET_CONV_PREFIX}_bn",
        )(x, train, post_conv_scale)


class darknet_head_conv(nn.Module):
    """Final 1x1 ``DarknetConv2D`` with bias, no BN/act (yolonet.py:29, 244-250)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # under Int8Act the head 1x1 stays in the wide dtype: its output IS
        # the decode surface, where quantization noise costs box accuracy
        dtype, _ = _split_dtype(self.dtype)
        return nn.Conv(
            features=self.features,
            kernel_size=(1, 1),
            padding="SAME",
            use_bias=True,
            dtype=dtype,
            name=f"{DARKNET_CONV_PREFIX}_out",
        )(x)
