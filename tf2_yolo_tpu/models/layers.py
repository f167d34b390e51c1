"""Building-block layers for all YOLO versions (Flax linen, NHWC).

TPU-first notes:
  - convs run in a configurable compute dtype (bf16 on TPU) with f32
    params and f32 BatchNorm statistics; XLA fuses BN+activation into
    the conv epilogue.
  - Darknet's stride-2 convs use an explicit asymmetric ((1,0),(1,0))
    top/left zero-pad + VALID conv (reference
    yolov3/models/backbone.py:58-63, yolov4/models/backbone.py:130) —
    this must match exactly or feature maps shift by one pixel
    (SURVEY.md §7.4 hard part 5).
  - BatchNorm uses tf.keras defaults (momentum 0.99, eps 1e-3) for
    weight-transfer parity, and can sync statistics across a mesh axis
    (``bn_axis_name``) for multi-chip training.
  - conv kernels init per the reference's own per-family recipe:
    he_normal for the v1.5/v2/v3 families (set explicitly at reference
    yolov1_5/models/backbone.py:13, yolov2/models/backbone.py:15-37,
    yolov3/models/backbone.py:30) and RandomNormal(0.0, 0.02) for every
    v4 DarknetConv2D (reference yolov4/models/backbone.py:68 forces it).
    ConvBN's ``kernel_init=None`` resolves to HE_NORMAL; the v4 modules
    pass DARKNET_NORMAL explicitly. The resnet/mobilenet backbones and
    Dense classifier tops use glorot_uniform — the tf.keras default
    their keras.applications counterparts are built with. (The round-4
    "glorot ~2x he_normal" seed-matrix A/B was confounded: it moved
    Adam eps 1e-8 -> 1e-7 in the same arm and compared v4 against
    he_normal, which the reference never uses for v4 — see the
    corrected round-5 matrix in BASELINE.md.)
"""

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas.conv_bn_kernel import conv1x1_stats, conv3x3_stats

# Reference per-family conv kernel initializers (see module docstring).
# Both match tf.keras semantics: he_normal is a fan_in-scaled TRUNCATED
# normal in keras and jax alike; DARKNET_NORMAL is the plain
# RandomNormal(0, 0.02) the v4 DarknetConv2D forces.
HE_NORMAL = nn.initializers.he_normal()
DARKNET_NORMAL = nn.initializers.normal(stddev=0.02)

# Default for ConvBN.fused (see set_fused_convbn). Module-global so the
# whole model zoo switches without threading a flag through every
# constructor; read at trace time, so set it BEFORE building/jitting.
FUSED_CONVBN = False


def set_fused_convbn(on):
    """Enable/disable the fused Pallas conv+BN-statistics path globally
    (per-module override: ``ConvBN(fused=...)``). The fused path removes
    the separate BN train-statistics read pass (the measured 441->500
    img/s gap, BASELINE.md ablations). Single-device only for now — the
    pallas_call is not partitionable under pjit meshes; ``bn_axis_name``
    stat sync works under shard_map/pmap axes.
    """
    global FUSED_CONVBN
    FUSED_CONVBN = bool(on)


# Default for ConvBN.bn_stats_sg (see set_bn_stats_stop_gradient).
BN_STATS_SG = False
BN_STATS_SG_SCOPE = None       # optional module-name filter

# Fused-GEMM backbone execution (models/packed_region.py): in train
# mode the CSPDarknet-53 stages run with their 1x1 convs as fused
# Pallas prologue-GEMMs (producer BN+mish applied in the consumer's
# input read — the normalize pass XLA always materializes). Stages
# 3-5 (C >= 128, lanes already full) run unpacked; PACKED_P2
# additionally runs stem/stage1/stage2 batch-packed on [B/2,H,W,2C]
# tensors (block-diag weights — measured net-negative so far, kept
# as an explicit knob). Exact math, identical parameter tree;
# single-device only (pallas_call is not pjit-partitionable). Read
# at trace time.
PACKED_EARLY = False
PACKED_P2 = False
PACKED_P3 = False


def set_packed_early(on, p2=False, p3=False):
    """Enable/disable the fused-GEMM backbone path globally
    (BENCH_PACKED=1 in bench.py). ``p2`` additionally batch-packs the
    sub-128-channel stem/stage1/stage2 with their 3x3s on XLA
    (BENCH_PACKED=2); ``p3`` runs those stages entirely in Pallas —
    3x3/stride-2 convs as fused 9-tap GEMMs, residual chains as
    sum-GEMM term lists (BENCH_PACKED=3, takes precedence over p2).
    See models/packed_region.py."""
    global PACKED_EARLY, PACKED_P2, PACKED_P3
    PACKED_EARLY = bool(on)
    PACKED_P2 = bool(p2)
    PACKED_P3 = bool(p3)

# Channel gate for the static-scale int8 inference path (see
# set_int8_min_channels). 0 = quantize every calibrated ConvBN.
INT8_MIN_CHANNELS = 0


def set_int8_min_channels(n):
    """Keep ConvBN layers with min(Cin, Cout) below ``n`` on the
    bf16 path even when calibrated int8 scales are present.

    Rationale: the s8xs8->s32 MXU rate only beats bf16 when the
    contraction actually fills the 128-lane registers; below that the
    layer pays the activation quantize/dequantize VPU passes for no
    MXU gain (the measured reason int8 loses at small batches —
    BASELINE.md int8 boundary). Read at trace time — set BEFORE
    building/jitting the serving program; calibration (absmax sow) is
    unaffected, so one calibration serves any gate value.
    """
    global INT8_MIN_CHANNELS
    INT8_MIN_CHANNELS = int(n)


def set_bn_stats_stop_gradient(on, scope=None):
    """Treat BatchNorm batch statistics as CONSTANTS in the backward
    pass (module-global; per-module override ``ConvBN(bn_stats_sg=)``).

    The forward is unchanged — normalization still uses the exact
    current-batch mean/var, so loss values and running-stat updates are
    identical to standard BN. Only the gradient drops the term that
    backpropagates through mean/var. That term is the reduction pass
    the round-2 ablations identified as the whole 441->501 img/s gap
    (BASELINE.md: BN in inference mode saves 34 ms/step — the cost is
    the stat-coupled backward reductions re-reading every activation);
    with stats stopped, XLA's backward needs no per-channel reductions
    of dy and dy*xhat.

    Accuracy: this is the frozen-statistics backward — an
    APPROXIMATION, not a perturbation. The dropped term subtracts the
    cotangent's per-channel batch mean and its xhat-projection; since
    cotangents correlate with xhat through activation derivatives, the
    gradient direction changes by an O(1) fraction (measured ~1.1-1.5
    relative norm on random stacks at any batch size). What makes it
    usable must be established empirically per config — see the
    measured convergence rows in BASELINE.md before enabling. Opt-in
    only; exact BN gradients remain the default. Applies to ConvBN
    blocks (every darknet-family backbone/neck); the v2-UNet ConvActBN
    keeps exact BN. Set BEFORE building/jitting (read at trace time).

    ``scope``: optional module-name filter — a name (or tuple of
    names) that must appear in the ConvBN's flax module path for the
    knob to apply, e.g. ``scope="backbone"`` freezes statistics
    gradients only in the backbone (its large-M layers) while the
    neck/head layers keep exact BN backward.
    """
    global BN_STATS_SG, BN_STATS_SG_SCOPE
    BN_STATS_SG = bool(on)
    if scope is None:
        BN_STATS_SG_SCOPE = None
    else:
        BN_STATS_SG_SCOPE = ((scope,) if isinstance(scope, str)
                             else tuple(scope))


from contextlib import contextmanager     # noqa: E402


@contextmanager
def bn_stats_sg_ctx(on, scope=None):
    """Scoped (set/restore) form of :func:`set_bn_stats_stop_gradient`.

    The knob is read at TRACE time, so wrapping the code that traces a
    train step (a ``jit``-ed step body, or an explicit ``.lower()``)
    pins the setting to THAT program without leaking process-wide
    state — the safe form ``Model.compile(bn_stats_sg_scope=...)`` and
    bench.py build on."""
    prev = (BN_STATS_SG, BN_STATS_SG_SCOPE)
    set_bn_stats_stop_gradient(on, scope)
    try:
        yield
    finally:
        set_bn_stats_stop_gradient(prev[0])
        globals()["BN_STATS_SG_SCOPE"] = prev[1]


def mish(x):
    """Mish activation x * tanh(softplus(x))
    (reference yolov4/models/backbone.py:22-37) — training-mode form.

    Computed as ``x * (1 - 2 / ((1 + e^x)^2 + 1))`` — algebraically
    identical (tanh(log(u)) = (u^2-1)/(u^2+1) with u = 1+e^x). The
    input to exp is clamped at 20: beyond that the formula is exactly
    x in f32/bf16 (correction < 1e-17) and the clamp keeps (1+e^x)^2
    finite, avoiding inf*0 NaNs in the backward pass.

    Measured on v5e: this form wins for TRAINING (the reused e^x makes
    the fused backward cheaper — 441 vs 432 img/s YOLOv4@416 b128) but
    LOSES badly in eval-mode forward (53 vs 29 ms @b32 — XLA lowers
    tanh/softplus to fast VPU approximations while the exact exp +
    divide chain vectorizes worse), so ConvBN picks per mode."""
    u = jnp.exp(jnp.minimum(x, 20.0))
    return x * (1.0 - 2.0 / ((1.0 + u) * (1.0 + u) + 1.0))


def mish_eval(x):
    """Eval-mode mish: the direct x * tanh(softplus(x)) form — ~2x
    faster forward-only on v5e (see ``mish``); same function."""
    return x * jnp.tanh(jax.nn.softplus(x))


_ACTS = {
    "leaky": lambda x: nn.leaky_relu(x, negative_slope=0.1),
    "mish": mish,
    "relu": nn.relu,
    "linear": lambda x: x,
}

_ACTS_EVAL = dict(_ACTS, mish=mish_eval)


class _ConvKernel(nn.Module):
    """Parameter-only stand-in for nn.Conv — identical names/shapes
    (kernel (kh,kw,ci,co), bias (co,)) so fused and unfused ConvBN
    share one checkpoint tree."""
    features: int
    kernel: int
    use_bias: bool
    kernel_init: Any = None               # None -> HE_NORMAL

    @nn.compact
    def __call__(self, ci):
        k = self.param("kernel", self.kernel_init or HE_NORMAL,
                       (self.kernel, self.kernel, ci, self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32) \
            if self.use_bias else None
        return k, b


class _BNState(nn.Module):
    """Parameter/variable-only stand-in for nn.BatchNorm (same tree:
    params scale/bias, batch_stats mean/var)."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, ra_mean, ra_var


class ConvBN(nn.Module):
    """Conv2D (+ optional BatchNorm) + activation.

    ``darknet_pad=True`` reproduces the Darknet stride-2 padding
    (asymmetric top/left + VALID); otherwise keras-style SAME.
    ``use_bn=False`` gives a plain biased conv (used by heads).
    ``fused`` (default: the module-global set by set_fused_convbn)
    routes supported shapes through the Pallas conv+BN-statistics
    kernels, eliminating the separate statistics read pass in
    training; parameters are tree-identical either way.
    """
    features: int
    kernel: int = 3
    strides: int = 1
    act: str = "leaky"
    use_bn: bool = True
    use_bias: Optional[bool] = None       # default: not use_bn
    darknet_pad: bool = True
    bn_axis_name: Optional[str] = None
    fused: Optional[bool] = None
    bn_stats_sg: Optional[bool] = None    # see set_bn_stats_stop_gradient
    dtype: Any = jnp.float32
    kernel_init: Any = None               # None -> HE_NORMAL (v1-v3 ref)

    def _bn_sg_active(self):
        if self.bn_stats_sg is not None:
            return self.bn_stats_sg
        if not BN_STATS_SG:
            return False
        if BN_STATS_SG_SCOPE is None:
            return True
        return any(s in self.path for s in BN_STATS_SG_SCOPE)

    def _fusable(self, x):
        fused = FUSED_CONVBN if self.fused is None else self.fused
        if not (fused and self.use_bn):
            return False
        # Lane-width gate (global default only — an explicit
        # ``fused=True`` forces the kernel, e.g. CPU parity tests):
        # below 128 channels the VMEM tiles half-fill the 128-lane
        # registers and the kernel runs ~3.6x slower than XLA's conv
        # (measured 13.9 vs 3.8 ms on 208^2x64); at >=128 channels it
        # is ~35% FASTER (3.7 vs 5.8 ms on the same-byte 104^2x128
        # shape). XLA keeps the sub-128-channel layers.
        if self.fused is None and (x.shape[-1] < 128
                                   or self.features < 128):
            return False
        # Mosaic sublane tiling: partial-block stores need the W
        # extent 8-aligned ("Slice shape along dimension 2 must be
        # aligned to tiling (8)") — the 52^2/26^2/13^2 stages of a
        # 416^2 net stay on XLA until masked stores land.
        if self.fused is None and (x.shape[2] % 8
                                   or (x.shape[2] // self.strides) % 8):
            return False
        if self.kernel == 1 and self.strides == 1:
            return True
        if self.kernel == 3 and x.shape[1] >= 5 and x.shape[2] >= 5:
            if self.strides == 1:
                return True
            # stride 2: Mosaic cannot lower the kernel's stride-2
            # row/column vector slices (vector.extract_strided_slice
            # with stride 2 fails to legalize on v5e) — these five
            # downsample convs stay on XLA unless explicitly forced
            # (CPU interpret-mode tests still cover the kernel).
            if self.strides == 2 and self.fused is not None \
                    and self.darknet_pad \
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                return True
        return False

    def _fused_call(self, x, train):
        use_bias = (not self.use_bn) if self.use_bias is None \
            else self.use_bias
        k, b = _ConvKernel(self.features, self.kernel, use_bias,
                           self.kernel_init, name="conv")(x.shape[-1])
        scale, bias, ra_mean, ra_var = _BNState(
            self.features, name="bn")()
        dt = self.dtype
        xc = x.astype(dt)
        bc = (b if b is not None
              else jnp.zeros((self.features,), jnp.float32)).astype(dt)
        if self.kernel == 1:
            y, s1, s2 = conv1x1_stats(xc, k.astype(dt), bc)
        else:
            y, s1, s2 = conv3x3_stats(xc, k.astype(dt), bc,
                                      self.strides)
        if train:
            m = float(y.shape[0] * y.shape[1] * y.shape[2])
            if self.bn_axis_name is not None:
                s1 = jax.lax.psum(s1, self.bn_axis_name)
                s2 = jax.lax.psum(s2, self.bn_axis_name)
                m = m * jax.lax.axis_size(self.bn_axis_name)
            mean = s1 / m
            var = s2 / m - mean * mean
            if self._bn_sg_active():
                mean = jax.lax.stop_gradient(mean)
                var = jax.lax.stop_gradient(var)
            if not self.is_initializing():
                ra_mean.value = (0.99 * ra_mean.value
                                 + 0.01 * jax.lax.stop_gradient(mean))
                ra_var.value = (0.99 * ra_var.value
                                + 0.01 * jax.lax.stop_gradient(var))
        else:
            mean, var = ra_mean.value, ra_var.value
        out = ((y - mean.astype(dt))
               * jax.lax.rsqrt(var.astype(dt) + jnp.asarray(1e-3, dt))
               * scale.astype(dt) + bias.astype(dt))
        return (_ACTS if train else _ACTS_EVAL)[self.act](out)

    def _quant_call(self, x):
        """Static-scale int8 inference path (eval only): the input is
        quantized with the CALIBRATED per-layer scale (no per-batch
        max passes — the round-2 dynamic-quant dead end, BASELINE.md),
        weights with per-output-channel scales folded at trace time,
        and the conv runs s8 x s8 -> s32 on the MXU (~2x the bf16
        rate). Dequant + BN (running stats) + bias collapse into one
        per-channel affine epilogue; the activation stays bf16/f32.
        Symmetric quantization, so SAME zero-padding is exact."""
        use_bias = (not self.use_bn) if self.use_bias is None \
            else self.use_bias
        k, b = _ConvKernel(self.features, self.kernel, use_bias,
                           self.kernel_init, name="conv")(x.shape[-1])
        scale, bias, ra_mean, ra_var = _BNState(
            self.features, name="bn")()
        sx = self.get_variable("quant", "in_scale")
        kf = k.astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)),
                         1e-8) / 127.0
        wq = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        if self.strides == 2 and self.darknet_pad:
            xq = jnp.pad(xq, ((0, 0), (1, 0), (1, 0), (0, 0)))
            padding = "VALID"
        else:
            padding = "SAME"
        yi = jax.lax.conv_general_dilated(
            xq, wq, (self.strides, self.strides), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        s_bn = scale * jax.lax.rsqrt(ra_var.value + 1e-3)
        t_bn = bias - ra_mean.value * s_bn
        out = yi.astype(jnp.float32) * (sx * sw * s_bn) + t_bn
        if b is not None:
            out = out + b * s_bn
        return _ACTS_EVAL[self.act](out.astype(self.dtype))

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train and self.use_bn:
            # calibration capture (no-op unless the caller passes
            # mutable=["quant_calib"]) and the static-scale int8 path
            # (active when a calibrated "quant" collection is given)
            self.sow("quant_calib", "in_absmax",
                     jnp.max(jnp.abs(x)).astype(jnp.float32),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.zeros((), jnp.float32))
            if self.has_variable("quant", "in_scale") \
                    and min(x.shape[-1],
                            self.features) >= INT8_MIN_CHANNELS:
                return self._quant_call(x)
        if self._fusable(x):
            return self._fused_call(x, train)

        use_bias = (not self.use_bn) if self.use_bias is None \
            else self.use_bias

        if self.strides == 2 and self.darknet_pad:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
            padding = "VALID"
        else:
            padding = "SAME"

        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=padding,
            use_bias=use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init or HE_NORMAL,
            name="conv")(x)

        if self.use_bn:
            if train and self._bn_sg_active():
                x = self._sg_batch_norm(x)
            else:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.99,
                    epsilon=1e-3,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    axis_name=self.bn_axis_name if train else None,
                    name="bn")(x)

        return (_ACTS if train else _ACTS_EVAL)[self.act](x)

    def _sg_batch_norm(self, x):
        """Train-mode BatchNorm whose statistics are stop_gradient
        constants in the backward (set_bn_stats_stop_gradient).
        Forward math mirrors flax.linen.BatchNorm (f32 fast-variance
        statistics, momentum 0.99, eps 1e-3, optional cross-replica
        pmean) on the SAME variable tree (_BNState == nn.BatchNorm
        names/shapes), so checkpoints and the eval path are unaffected."""
        scale, bias, ra_mean, ra_var = _BNState(
            self.features, name="bn")()
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        m2 = jnp.mean(xf * xf, axis=(0, 1, 2))
        if self.bn_axis_name is not None:
            mean = jax.lax.pmean(mean, self.bn_axis_name)
            m2 = jax.lax.pmean(m2, self.bn_axis_name)
        var = m2 - mean * mean
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)
        if not self.is_initializing():
            ra_mean.value = 0.99 * ra_mean.value + 0.01 * mean
            ra_var.value = 0.99 * ra_var.value + 0.01 * var
        dt = self.dtype
        mul = (scale * jax.lax.rsqrt(var + 1e-3)).astype(dt)
        return (x.astype(dt) - mean.astype(dt)) * mul + bias.astype(dt)


class ConvActBN(nn.Module):
    """Conv + activation + BatchNorm (the v2 UNet block order,
    reference yolov2/models/backbone.py:21-28)."""
    features: int
    kernel: int = 3
    act: str = "relu"
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding="SAME", use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=HE_NORMAL,
                    name="conv")(x)
        x = _ACTS[self.act](x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=0.99, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="bn")(x)
        return x


def max_pool(x, window=2, strides=None, padding="VALID"):
    strides = strides or window
    return nn.max_pool(x, (window, window), (strides, strides), padding)


def upsample2x(x):
    """Nearest-neighbor 2x upsample (keras UpSampling2D equivalent)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def space_to_depth(x, block=2):
    """NHWC space-to-depth matching tf.nn.space_to_depth channel order
    (used by the v2 passthrough, reference yolov2/models/darknet.py:47)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, block * block * c)


class SPP(nn.Module):
    """Spatial pyramid pooling: stride-1 SAME maxpools (13/9/5) concat
    with identity (reference yolov4/models/backbone.py:176-185).

    Computed as a CASCADE of 5x5 stride-1 pools: max over a 5x5 window
    of 5x5-maxes covers a 9x9 window (5+5-1), and a third pass covers
    13x13 — bit-identical to direct 13/9/5 pooling (max is idempotent
    and associative over window composition) but with far less window
    work and a much cheaper select_and_scatter backward (profiling
    showed the direct 13x13 pool + backward as a top op-time block).
    """
    pool_sizes: Sequence[int] = (13, 9, 5)

    @nn.compact
    def __call__(self, x):
        if tuple(self.pool_sizes) == (13, 9, 5):
            p5 = nn.max_pool(x, (5, 5), (1, 1), "SAME")
            p9 = nn.max_pool(p5, (5, 5), (1, 1), "SAME")
            p13 = nn.max_pool(p9, (5, 5), (1, 1), "SAME")
            return jnp.concatenate([p13, p9, p5, x], axis=-1)
        pools = [nn.max_pool(x, (p, p), (1, 1), "SAME")
                 for p in self.pool_sizes]
        return jnp.concatenate([*pools, x], axis=-1)
