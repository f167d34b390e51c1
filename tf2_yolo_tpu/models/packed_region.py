"""Batch-packed early-stage execution for the CSPDarknet-53 backbone.

The round-3 profile (tools/parse_tpu_profile.py) shows the sub-128-
channel stages of YOLOv4@416 — stem (416^2x32), stage1 (208^2x64) and
stage2 (104^2x128-with-64-ch-internals) — burn ~46%% of the train
step, bandwidth-bound, with XLA emitting a separate BN-normalize+mish
pass per layer per direction. This module re-executes that region
(train mode, single device) in a *batch-packed* layout:

    [B, H, W, C]  ->  [B/2, H, W, 2C]      (p = 2)

a pure relabeling of the batch axis, so every convolution is exact
under block-diagonally expanded weights diag(w, w). In this layout:

  - every 1x1 ConvBN becomes one fused Pallas GEMM
    (ops/pallas/packed_gemm.py): the producer's BN affine + mish is
    applied in the consumer's input read (prologue) and the raw
    output's channel sums come out of the epilogue — the separate
    normalize pass disappears, and channel-concat consumers read
    their two operands directly (no concat materialization);
  - 3x3 / stride-2 convolutions stay on XLA (measured faster there:
    packed XLA conv is 1.1-1.3x the unpacked one, but the Pallas GEMM
    replacement only wins for channel GEMMs — tools/bench_packed_probe
    .py), consuming explicitly activated tensors like today;
  - BatchNorm statistics are computed per REAL channel by folding the
    p packed groups, so means/vars/running stats match the unpacked
    model exactly (up to summation order).

The packed modules mirror the normal module tree NAME-FOR-NAME
(conv/bn children via the same _ConvKernel/_BNState stand-ins ConvBN
uses for its fused path), so checkpoints, weight conversion and the
eval/serving paths are untouched; the packed wiring only ever runs
when models.layers.PACKED_EARLY is on, train=True, and the batch is
even. Single-device only (pallas_call is not partitionable under
pjit meshes) — like the FUSED_CONVBN knob.

No reference counterpart: the reference runs stock TF kernels
(SURVEY.md §2.2); this is this repo's own bandwidth engineering.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import DARKNET_NORMAL

from ..ops.pallas.packed_conv3x3 import fused_conv3x3
from ..ops.pallas.packed_gemm import fused_gemm

P = 2                       # packing factor (two images per lane row)
_BN_EPS = 1e-3
_BN_MOM = 0.99


def pack_batch(x, p=P):
    """[B,H,W,C] -> [B/p,H,W,p*C]: fold p consecutive images into the
    channel axis (exactness: convs/BN-folds commute with this
    relabeling)."""
    b, h, w, c = x.shape
    return (x.reshape(b // p, p, h, w, c)
            .transpose(0, 2, 3, 1, 4)
            .reshape(b // p, h, w, p * c))


def unpack_batch(x, p=P):
    """Inverse of :func:`pack_batch`."""
    bp, h, w, pc = x.shape
    return (x.reshape(bp, h, w, p, pc // p)
            .transpose(0, 3, 1, 2, 4)
            .reshape(bp * p, h, w, pc // p))


def _block_diag(w, p=P):
    """[..., Ci, Co] -> [..., p*Ci, p*Co] with w on the diagonal."""
    eye = jnp.eye(p, dtype=w.dtype)
    shape = w.shape[:-2]
    expand = jnp.einsum("...io,pq->...piqo", w, eye)
    return expand.reshape(*shape, p * w.shape[-2], p * w.shape[-1])


def bn_affine(mean, var, scale, bias, p=P):
    """Fold BN (normalize · scale + shift) into one per-channel affine
    (a, b), tiled across the p packed groups, f32."""
    a = scale * jax.lax.rsqrt(var + _BN_EPS)
    b = bias - mean * a
    return jnp.tile(a, p).reshape(1, -1), jnp.tile(b, p).reshape(1, -1)


def _activate_fn(y, a, b, act, dtype):
    z = y.astype(jnp.float32) * a.reshape(-1) + b.reshape(-1)
    if act == "mish":
        u = jnp.exp(jnp.minimum(z, 20.0))
        z = z * (1.0 - 2.0 / ((1.0 + u) * (1.0 + u) + 1.0))
    elif act == "leaky":
        z = jnp.where(z >= 0, z, z * 0.1)
    elif act != "linear":
        raise ValueError(act)
    return z.astype(dtype)


def activate(y, affine, act, dtype):
    """Materialize normalize+activation for consumers that cannot fuse
    the prologue (XLA convs, residual adds). f32 math, cast to the
    compute dtype — the same semantics as the fused prologue.

    jax.checkpoint: without it autodiff SAVES the f32 intermediates
    (z/u) as residuals — full-size f32 HBM writes at every activate
    site (profiled: a 19 ms f32[64,416,416,64] store on the stem
    alone). Recomputing the elementwise chain in backward fuses it
    into the surrounding gradient fusions instead."""
    a, b = affine
    return jax.checkpoint(
        lambda y, a, b: _activate_fn(y, a, b, act, dtype))(y, a, b)


def rows_of(y4):
    """[B/p,H,W,pC] -> [H*W*B/p, pC] rows in (h,w,b)-major order —
    the 2D operand view for the Pallas GEMMs. (h,w,b)-major matches
    the {3,0,2,1} layout XLA assigns to the in-region conv tensors,
    so the transpose+reshape folds to a zero-cost bitcast instead of
    the relayout copy the (b,h,w)-major view forces (profiled at
    4.2 ms per boundary)."""
    bq, h, w, pc = y4.shape
    return y4.transpose(1, 2, 0, 3).reshape(h * w * bq, pc)


def rows_to(y2, bq, h, w):
    """Inverse of :func:`rows_of`."""
    return y2.reshape(h, w, bq, y2.shape[-1]).transpose(2, 0, 1, 3)


def rows_of_packed(x4, p):
    """[B,H,W,C] -> [H*W*(B/p), p*C] packed rows DIRECTLY — the fused
    composition of pack_batch + rows_of. Written as one transpose
    whose result is bitcast-identical to the {3,0,2,1} layout XLA
    assigns conv tensors (C minor, then B: consecutive images' channel
    blocks are already adjacent), so layout assignment folds it to
    zero-cost. The two-step pack_batch∘rows_of spelling goes through
    5D intermediates XLA fails to fold — profiled as 1.4 GB relayout
    copies + a [32,1664,416,32] pad fusion at the P3 stem boundary."""
    b, h, w, c = x4.shape
    return x4.transpose(1, 2, 0, 3).reshape(h * w * (b // p), p * c)


def rows_to_unpacked(y2, b, h, w, p):
    """Inverse of :func:`rows_of_packed`: [H*W*(B/p), p*C] packed
    rows -> [B,H,W,C], again via one {3,0,2,1}-foldable transpose."""
    c = y2.shape[-1] // p
    return (y2.reshape(h, w, b, c)
            .transpose(2, 0, 1, 3))


class PackedConvBN3x3(nn.Module):
    """3x3 (or stride-2 darknet-pad) ConvBN on packed tensors via an
    XLA conv with block-diagonal weights. Consumes an ACTIVATED packed
    tensor, returns (raw conv output, BN affine for consumers).
    Parameter tree == ConvBN's (conv/kernel, bn/{scale,bias,mean,var})."""
    features: int
    kernel: int = 3
    strides: int = 1
    act: str = "mish"
    darknet_pad: bool = True
    bn_axis_name: Optional[str] = None
    p: int = P
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from .layers import _BNState, _ConvKernel
        k, _ = _ConvKernel(self.features, self.kernel, False,
                           DARKNET_NORMAL,
                           name="conv")(x.shape[-1] // self.p)
        scale, bias, ra_mean, ra_var = _BNState(
            self.features, name="bn")()
        w2 = (k if self.p == 1
              else _block_diag(k, self.p)).astype(self.dtype)
        xc = x.astype(self.dtype)
        if self.strides == 2 and self.darknet_pad:
            xc = jnp.pad(xc, ((0, 0), (1, 0), (1, 0), (0, 0)))
            padding = "VALID"
        else:
            padding = "SAME"
        # conv in the compute dtype like flax's nn.Conv (no f32
        # preferred_element_type: its VJP rejects mixed-dtype
        # cotangents under grad, and the normal path rounds here too)
        y = jax.lax.conv_general_dilated(
            xc, w2, (self.strides, self.strides), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # custom-vjp stats: a plain (or checkpointed) f32 cast + sum
        # materializes a full-size f32 tensor for the s2 backward
        # (profiled at 17 ms on the stem); the custom backward folds
        # ds1 + 2*y*ds2 as an elementwise expression that fuses into
        # the surrounding gradient chains
        s1, s2 = _sums(y)
        s1 = s1.reshape(self.p, -1).sum(0)
        s2 = s2.reshape(self.p, -1).sum(0)
        count = float(y.shape[0] * y.shape[1] * y.shape[2] * self.p)
        mean, var = _fold_stats(s1, s2, count, self.bn_axis_name)
        _update_running(self, ra_mean, ra_var, mean, var)
        return y, bn_affine(mean, var, scale, bias, self.p)


@jax.custom_vjp
def _sums(y):
    """Channel sums of y and y*y over all leading axes, f32."""
    axes = tuple(range(y.ndim - 1))
    yf = y.astype(jnp.float32)
    return jnp.sum(yf, axis=axes), jnp.sum(yf * yf, axis=axes)


def _sums_fwd(y):
    return _sums(y), y


def _sums_bwd(y, cts):
    ds1, ds2 = cts
    dy = (ds1 + 2.0 * y.astype(jnp.float32) * ds2).astype(y.dtype)
    return (dy,)


_sums.defvjp(_sums_fwd, _sums_bwd)


def _fold_stats(s1, s2, count, axis_name):
    if axis_name is not None:
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
        count = count * jax.lax.axis_size(axis_name)
    mean = s1 / count
    var = s2 / count - mean * mean
    return mean, var


def _update_running(mod, ra_mean, ra_var, mean, var):
    if not mod.is_initializing():
        ra_mean.value = (_BN_MOM * ra_mean.value
                         + (1 - _BN_MOM) * jax.lax.stop_gradient(mean))
        ra_var.value = (_BN_MOM * ra_var.value
                        + (1 - _BN_MOM) * jax.lax.stop_gradient(var))


class PackedGemmConvBN(nn.Module):
    """1x1 ConvBN as the fused Pallas GEMM. Inputs: a list of
    (x2d [M, p*Ci], affine-or-None) pairs — raw producer outputs fuse
    the producer's BN+act in this layer's input read; activated
    tensors pass affine None. Returns (raw y2d, consumer affine).
    Parameter tree == ConvBN's.

    ``sum_inputs`` switches the multi-input semantics from channel
    concatenation (the kernel split along Cin per operand) to a SUM
    over the full kernel: y = (sum_i g_i(x_i)) @ w. That is exactly a
    CSP residual chain consumed without materializing the adds —
    block_out = act(pre) + act(ex1) + ... distributes over the matmul
    (P3CSPStage)."""
    features: int
    act: str = "mish"          # activation inside fused prologues
    bn_axis_name: Optional[str] = None
    p: int = P
    sum_inputs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        from .layers import _BNState, _ConvKernel
        if self.sum_inputs:
            cin = inputs[0][0].shape[-1] // self.p
        else:
            cin = sum(x.shape[-1] for x, _ in inputs) // self.p
        k, _ = _ConvKernel(self.features, 1, False, DARKNET_NORMAL,
                           name="conv")(cin)
        scale, bias, ra_mean, ra_var = _BNState(
            self.features, name="bn")()
        # split the [1,1,Cin,Co] kernel along Cin per input operand,
        # block-diag-expand each slice (concat-free concat handling);
        # sum_inputs: every operand takes the full kernel instead
        w = k[0, 0]
        ws, offset = [], 0
        for x, _ in inputs:
            if self.sum_inputs:
                wi = w
            else:
                ci = x.shape[-1] // self.p
                wi = w[offset:offset + ci]
                offset += ci
            ws.append((wi if self.p == 1
                       else _block_diag(wi, self.p)).astype(self.dtype))
        xs = [x for x, _ in inputs]
        affines = [a for _, a in inputs]
        y, s1, s2 = fused_gemm(xs, ws, affines, act=self.act,
                               dtype=self.dtype)
        s1 = s1.reshape(self.p, -1).sum(0)
        s2 = s2.reshape(self.p, -1).sum(0)
        count = float(y.shape[0] * self.p)
        mean, var = _fold_stats(s1, s2, count, self.bn_axis_name)
        _update_running(self, ra_mean, ra_var, mean, var)
        return y, bn_affine(mean, var, scale, bias, self.p)


class PackedCSPResBlock(nn.Module):
    """CSP residual module on packed rows. Takes the block input as an
    ACTIVATED 2D tensor; returns the activated output (the residual
    add forces materialization either way, matching XLA's fusion of
    normalize+add). Tree == CSPResBlock (squeeze/expand children)."""
    mid: int
    out: int
    spatial: Any = None         # (B/p, H, W) for the 3x3 conv
    bn_axis_name: Optional[str] = None
    p: int = P
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_act, train: bool = True):
        bq, h, w = self.spatial
        sq_y, sq_aff = PackedGemmConvBN(
            self.mid, act="mish", bn_axis_name=self.bn_axis_name,
            p=self.p, dtype=self.dtype,
            name="squeeze")([(x_act, None)], train)
        sq_act = activate(sq_y, sq_aff, "mish", self.dtype)
        ex_y, ex_aff = PackedConvBN3x3(
            self.out, 3, 1, act="mish",
            bn_axis_name=self.bn_axis_name, p=self.p, dtype=self.dtype,
            name="expand")(rows_to(sq_act, bq, h, w), train)
        ex_act2 = rows_of(activate(ex_y, ex_aff, "mish", self.dtype))
        return x_act + ex_act2


class PackedCSPStage(nn.Module):
    """CSPStage on packed tensors (tree == CSPStage). Takes
    (raw y2d, affine, (B/p, H, W)) from the previous stage, returns
    the same triple at half resolution."""
    features: int
    blocks: int
    narrow: bool = True
    bn_axis_name: Optional[str] = None
    p: int = P
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, train: bool = True):
        y_in, aff_in, (bq, h, w) = carry
        kw = dict(bn_axis_name=self.bn_axis_name, p=self.p,
                  dtype=self.dtype)
        mid = self.features // 2 if self.narrow else self.features
        # carry forms: 4D + affine None = already-activated stage
        # input; 4D + affine = raw 3x3/stem output (a rows round-trip
        # there materializes 1.4 GB transpose pairs in backward —
        # profiled); 2D rows + affine = raw GEMM output
        if y_in.ndim == 4:
            x_act4 = (y_in if aff_in is None
                      else activate(y_in, aff_in, "mish", self.dtype))
        else:
            x_act4 = rows_to(
                activate(y_in, aff_in, "mish", self.dtype), bq, h, w)
        dn_y, dn_aff = PackedConvBN3x3(
            self.features, 3, 2, act="mish", **kw,
            name="down")(x_act4, train)
        h, w = dn_y.shape[1], dn_y.shape[2]
        dn2 = rows_of(dn_y)
        cross_y, cross_aff = PackedGemmConvBN(
            mid, act="mish", **kw,
            name="cross")([(dn2, dn_aff)], train)
        pre_y, pre_aff = PackedGemmConvBN(
            mid, act="mish", **kw, name="pre")([(dn2, dn_aff)], train)
        z_act = activate(pre_y, pre_aff, "mish", self.dtype)
        for b in range(self.blocks):
            z_act = PackedCSPResBlock(
                self.features // 2, mid, spatial=(bq, h, w), **kw,
                name=f"block{b + 1}")(z_act, train)
        post_y, post_aff = PackedGemmConvBN(
            mid, act="mish", **kw, name="post")([(z_act, None)], train)
        out_y, out_aff = PackedGemmConvBN(
            self.features, act="mish", **kw,
            name="out")([(post_y, post_aff), (cross_y, cross_aff)],
                        train)
        return out_y, out_aff, (bq, h, w)


class PackedPallasConvBN3x3(nn.Module):
    """3x3 (or darknet stride-2) ConvBN as the fused Pallas 9-tap GEMM
    (ops/pallas/packed_conv3x3.py). Consumes (raw x2d rows, producer
    affine-or-None): the producer's BN+activation is applied in this
    conv's input read, so no normalize pass and no activated tensor is
    ever materialized — the tax that made the packed-XLA-conv path
    lose end to end (BASELINE.md). Returns (raw y2d rows at the output
    resolution, consumer affine). Parameter tree == ConvBN's.

    ``act_in`` is the PRODUCER's activation (fused into the read);
    this layer's own activation is the consumer's business, like every
    packed module here. ``im2col`` selects the wide-dot small-K kernel
    variant (the stem: packed K=6 would waste 122 of the 128 MXU
    contraction lanes on the 9-dot path)."""
    features: int
    strides: int = 1
    act_in: str = "mish"
    im2col: bool = False
    bn_axis_name: Optional[str] = None
    p: int = P
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x2d, affine, spatial, train: bool = True):
        from .layers import _BNState, _ConvKernel
        k, _ = _ConvKernel(self.features, 3, False, DARKNET_NORMAL,
                           name="conv")(x2d.shape[-1] // self.p)
        scale, bias, ra_mean, ra_var = _BNState(
            self.features, name="bn")()
        w = (k if self.p == 1
             else _block_diag(k, self.p)).astype(self.dtype)
        y, s1, s2 = fused_conv3x3(
            x2d, w, affine, spatial=spatial, stride=self.strides,
            act=self.act_in, im2col=self.im2col, dtype=self.dtype)
        s1 = s1.reshape(self.p, -1).sum(0)
        s2 = s2.reshape(self.p, -1).sum(0)
        count = float(y.shape[0] * self.p)
        mean, var = _fold_stats(s1, s2, count, self.bn_axis_name)
        _update_running(self, ra_mean, ra_var, mean, var)
        return y, bn_affine(mean, var, scale, bias, self.p)


class P3CSPResBlock(nn.Module):
    """CSP residual module with NOTHING materialized: takes the
    running term list [(raw y2d, affine), ...] whose activated sum is
    the block input, returns the expand conv's (raw, affine) term —
    the caller appends it to the list (residual add by distribution,
    see PackedGemmConvBN.sum_inputs). Tree == CSPResBlock."""
    mid: int
    out: int
    spatial: Any = None
    bn_axis_name: Optional[str] = None
    p: int = P
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, terms, train: bool = True):
        kw = dict(bn_axis_name=self.bn_axis_name, p=self.p,
                  dtype=self.dtype)
        sq_y, sq_aff = PackedGemmConvBN(
            self.mid, act="mish", sum_inputs=True, **kw,
            name="squeeze")(terms, train)
        return PackedPallasConvBN3x3(
            self.out, 1, act_in="mish", **kw,
            name="expand")(sq_y, sq_aff, self.spatial, train)


class P3CSPStage(nn.Module):
    """CSPStage executed entirely in Pallas (tree == CSPStage): the
    3x3/stride-2 convs are fused 9-tap GEMMs and the residual chain is
    a term list consumed by sum-GEMMs, so between kernel outputs (raw
    conv results — unavoidable) no tensor is materialized: no BN
    normalize, no activation pass, no residual add, no concat. Takes
    and returns (raw y2d rows, affine, (Bq, H, W)).

    ``p_down`` runs the stride-2 down conv at a higher packing factor
    than the stage body: stage1's input is 32-channel, which at p=2
    gives 64-lane row arrays that HBM tiling pads 2x (a measured
    2.64 GB tensor at 416^2/b128); at p=4 the lanes are a dense 128.
    Because pack_batch folds CONSECUTIVE images, the p=4 down output
    [R, 4C] reinterprets as the p=2 layout [2R, 2C] with a pure
    reshape — image pairs land exactly where pack_batch(x, 2) puts
    them, so no data moves at the boundary."""
    features: int
    blocks: int
    narrow: bool = True
    p_down: int = 0
    bn_axis_name: Optional[str] = None
    p: int = P
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, train: bool = True):
        y_in, aff_in, (bq, h, w) = carry
        kw = dict(bn_axis_name=self.bn_axis_name, p=self.p,
                  dtype=self.dtype)
        mid = self.features // 2 if self.narrow else self.features
        pd = self.p_down or self.p
        dn_y, dn_aff = PackedPallasConvBN3x3(
            self.features, 2, act_in="mish",
            bn_axis_name=self.bn_axis_name, p=pd, dtype=self.dtype,
            name="down")(y_in, aff_in, (bq, h, w), train)
        h, w = h // 2, w // 2
        if pd != self.p:
            f = pd // self.p
            dn_y = dn_y.reshape(dn_y.shape[0] * f,
                                dn_y.shape[1] // f)
            dn_aff = (dn_aff[0][:, :dn_aff[0].shape[1] // f],
                      dn_aff[1][:, :dn_aff[1].shape[1] // f])
            bq = bq * f
        cross = PackedGemmConvBN(
            mid, act="mish", **kw,
            name="cross")([(dn_y, dn_aff)], train)
        pre = PackedGemmConvBN(
            mid, act="mish", **kw, name="pre")([(dn_y, dn_aff)], train)
        terms = [pre]
        for b in range(self.blocks):
            terms.append(P3CSPResBlock(
                self.features // 2, mid, spatial=(bq, h, w), **kw,
                name=f"block{b + 1}")(terms, train))
        post = PackedGemmConvBN(
            mid, act="mish", sum_inputs=True, **kw,
            name="post")(terms, train)
        out_y, out_aff = PackedGemmConvBN(
            self.features, act="mish", **kw,
            name="out")([post, cross], train)
        return out_y, out_aff, (bq, h, w)
