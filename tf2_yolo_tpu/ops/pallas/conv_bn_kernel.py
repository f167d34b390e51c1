"""Fused convolution + BatchNorm-statistics Pallas TPU kernels.

The round-2 step ablations (BASELINE.md) showed BN *training*
statistics are the entire 441->500 img/s gap for YOLOv4@416/b128:
computing E[y], E[y^2] of every conv output costs one extra read pass
over each activation (~20 GB/step at b128) because XLA cannot fuse a
reduction into a convolution's epilogue. These kernels compute the
conv AND accumulate the per-channel statistic sums in-register while
the output tile is still in VMEM, so the statistics cost zero extra
HBM traffic.

The reference has no counterpart (it delegates conv+BN to TF's
prebuilt kernels — SURVEY.md §2.2); the design target is the
bandwidth floor identified by this repo's own ablations.

Ops (all `jax.custom_vjp`; backward = standard XLA conv backward on
``dy_eff = dy + ds1 + 2*y*ds2`` — identical pass structure to the
unfused BN backward, so the backward cost is unchanged):

- ``conv1x1_stats(x, w, b)``: 1x1 stride-1 conv (a row-tiled matmul).
- ``conv3x3_stats(x, w, b, stride=1)``: 3x3 conv; stride 1 keras-SAME
  or stride 2 with the Darknet top/left pad + VALID semantics
  (reference yolov3/models/backbone.py:58-63).

Inputs are NHWC, any float dtype (bf16 on TPU); statistics are f32 of
the *output-dtype-rounded* values, matching flax.linen.BatchNorm's
f32-stats-of-bf16-input behavior (use_fast_variance E[y^2]-E[y]^2).

On CPU (no Mosaic backend) the kernels run in interpreter mode so the
same code path is unit-testable without a TPU.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    # Mosaic-compile on any real TPU (incl. remote PJRT plugins whose
    # platform name isn't "tpu", e.g. "axon" — device_kind still says
    # TPU); interpret elsewhere (CPU tests).
    dev = jax.devices()[0]
    return not (dev.platform == "tpu"
                or "TPU" in getattr(dev, "device_kind", ""))


def _round_up(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# 1x1 convolution (row-tiled matmul) + statistics epilogue
# ---------------------------------------------------------------------------

def _conv1x1_kernel(x_ref, w_ref, b_ref, y_ref, s1_ref, s2_ref,
                    *, h, w, th, wp):
    """Grid (N, H-tiles) over the NATIVE NHWC layout — reshaping to
    (N*H*W, C) at the pallas boundary forces XLA to physically
    relayout 2 activation-sized arrays (tiled layouts differ), which
    measured +10 ms on the 208^2x64 layer. Blocks stay 4D instead.
    The block W dim is padded to a multiple of 8 (Mosaic sublane
    tiling requires it — the 52^2/26^2/13^2 stages are unaligned);
    out-of-image rows AND columns are select-masked out of the
    statistics (safe even against NaN/inf in the padding garbage)."""
    n_i = pl.program_id(0)
    t_i = pl.program_id(1)

    @pl.when(jnp.logical_and(n_i == 0, t_i == 0))
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    xv = x_ref[0]                        # (th, Wp, Ci)
    yf = jax.lax.dot_general(
        xv, w_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    yf = yf + b_ref[:].astype(jnp.float32)
    y = yf.astype(y_ref.dtype)
    y_ref[:] = y[None]

    rows = (jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1), 0)
            + t_i * th)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    valid = jnp.logical_and(rows < h, cols < w)
    yz = jnp.where(valid, y.astype(jnp.float32), 0.0)
    s1_ref[:] += jnp.sum(yz, axis=(0, 1)).reshape(1, -1)
    s2_ref[:] += jnp.sum(yz * yz, axis=(0, 1)).reshape(1, -1)


def _pick_rows(h, w, ci, co, itemsize):
    """Output rows per tile: keep the double-buffered x and y tiles in
    a modest VMEM slice (lane dims pad to 128)."""
    budget = 8 * 1024 * 1024
    per_row = (w * (_round_up(ci, 128) + _round_up(co, 128))
               * itemsize * 2)          # x+y, double-buffered
    fits = [t for t in (64, 32, 16, 8, 4, 2, 1)
            if t * per_row <= budget and t <= h]
    for t in fits:
        if h % t == 0:
            return t
    return fits[0] if fits else 1


def _conv1x1_stats_fwd_impl(x, w, b):
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    wm = w.reshape(ci, co)
    wp = _round_up(wd, 8)
    th = _pick_rows(h, wp, ci, co, jnp.dtype(x.dtype).itemsize)

    y, s1, s2 = pl.pallas_call(
        functools.partial(_conv1x1_kernel, h=h, w=wd, th=th, wp=wp),
        grid=(n, pl.cdiv(h, th)),
        in_specs=[
            pl.BlockSpec((1, th, wp, ci), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, wp, co), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, wd, co), x.dtype),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, wm, b.reshape(1, co))
    return y, s1[0], s2[0]


@jax.custom_vjp
def conv1x1_stats(x, w, b):
    """1x1 stride-1 conv with fused per-channel statistic sums.

    Args:
      x: (N, H, W, Ci) activations.
      w: (1, 1, Ci, Co) kernel (same dtype as x).
      b: (Co,) bias (pass zeros when the conv is bias-free).
    Returns:
      (y, s1, s2): y (N, H, W, Co) in x.dtype; s1 = sum(y), s2 =
      sum(y^2) per channel in f32, so mean = s1/M, var = s2/M - mean^2
      with M = N*H*W.
    """
    y, s1, s2 = _conv1x1_stats_fwd_impl(x, w, b)
    return y, s1, s2


def _conv1x1_stats_fwd(x, w, b):
    y, s1, s2 = _conv1x1_stats_fwd_impl(x, w, b)
    return (y, s1, s2), (x, w, y)


def _dy_eff(dy, ds1, ds2, y):
    """Total cotangent wrt the raw conv output: the direct dy plus the
    statistic sums' contributions d(s1)/dy = 1, d(s2)/dy = 2y."""
    out = dy.astype(jnp.float32)
    if ds1 is not None:
        out = out + ds1.astype(jnp.float32)
    if ds2 is not None:
        out = out + 2.0 * y.astype(jnp.float32) * ds2.astype(jnp.float32)
    return out.astype(dy.dtype)


def _ref_conv1x1(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _vjp_conv(x, w, stride, pad1x1):
    """Conv in x.dtype for the backward (no preferred_element_type:
    its f32 cotangent would mix with bf16 operands inside the conv
    transpose and XLA rejects mixed-dtype convs; the MXU accumulates
    f32 internally either way, matching nn.Conv's gradient
    precision)."""
    if pad1x1:
        pad = "VALID"
        strides = (1, 1)
    else:
        pad = ((1, 1), (1, 1)) if stride == 1 else ((1, 0), (1, 0))
        strides = (stride, stride)
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), strides, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv1x1_stats_bwd(res, cts):
    x, w, y = res
    dy, ds1, ds2 = cts
    g = _dy_eff(dy, ds1, ds2, y)
    # NHWC conv VJP (not reshaped 2D dots: those force tiled-layout
    # relayout copies of activation-sized arrays)
    _, vjp = jax.vjp(lambda xx, ww: _vjp_conv(xx, ww, 1, True), x, w)
    dx, dw = vjp(g)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(x.dtype)
    return dx, dw.astype(w.dtype), db


conv1x1_stats.defvjp(_conv1x1_stats_fwd, _conv1x1_stats_bwd)


# ---------------------------------------------------------------------------
# 3x3 convolution + statistics epilogue
# ---------------------------------------------------------------------------
#
# Grid: (N, H-tiles). The input stays in HBM (pl.ANY) and each step
# DMAs a halo window into a VMEM scratch (standard BlockSpec blocks
# are disjoint, so the 1-row overlap between consecutive tiles needs a
# manual copy). DMA sizes must be static, so the window is clamped
# inside [0, H) and written at a *dynamic destination offset* chosen
# so that conceptual input row j always lands at scratch row 1+j;
# out-of-image halo rows are masked to zero with a select. Width
# halos never exist in HBM — the DMA writes into columns [1, W+1] and
# the scratch's border columns are zeroed once. The conv is 9 shifted
# (rows, W, Ci) x (Ci, Co) MXU dots accumulated in f32.

def _conv3x3_kernel(x_hbm, w_ref, b_ref, y_ref, s1_ref, s2_ref,
                    xt, sem, *, h, w, ci, th, stride, h_out, w_blk):
    n_i = pl.program_id(0)
    t_i = pl.program_id(1)
    first = jnp.logical_and(n_i == 0, t_i == 0)

    @pl.when(first)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)
        xt[:] = jnp.zeros_like(xt)      # zeros the pad columns

    if stride == 1:
        row0 = t_i * th - 1             # first conceptual input row
        rows_needed = th + 2
    else:
        row0 = 2 * t_i * th - 1
        rows_needed = 2 * th + 1

    # Static-size window clamped in-bounds; conceptual row j = input
    # row row0 + j lands at scratch row 1 + j for any clamp shift.
    src0 = jnp.clip(row0, 0, h - rows_needed)
    dst0 = 1 - (row0 - src0)            # in {0, 1, 2}
    cp = pltpu.make_async_copy(
        x_hbm.at[n_i, pl.ds(src0, rows_needed), :, :],
        xt.at[pl.ds(dst0, rows_needed), pl.ds(1, w), :],
        sem,
    )
    cp.start()
    cp.wait()

    xv = xt[:]
    w_scr = xv.shape[1]
    # row slice only — full (8-aligned) scratch width, Mosaic requires
    # slice shapes on the sublane axis be multiples of the (8, 128)
    # tiling (52/26/13-wide stages are unaligned)
    xc = jax.lax.slice(xv, (1, 0, 0), (1 + rows_needed, w_scr, ci))
    row_ids = (jax.lax.broadcasted_iota(
        jnp.int32, (rows_needed, 1, 1), 0) + row0)
    valid = jnp.logical_and(row_ids >= 0, row_ids < h)
    xc = jnp.where(valid, xc, jnp.zeros_like(xc))

    w_out = w // stride
    acc = jnp.zeros((th, w_blk, y_ref.shape[3]), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            if stride == 1:
                # (th, w_blk) windows: w_blk is 8-aligned; columns
                # past w+2 are scratch zeros, masked from the stats
                xs = xc[ky:ky + th, kx:kx + w_blk, :]
            else:
                rows = jax.lax.slice(
                    xc, (ky, 0, 0), (ky + 2 * th - 1, w + 2, ci),
                    (2, 1, 1))
                xs = jax.lax.slice(
                    rows, (0, kx, 0), (th, kx + 2 * w_out - 1, ci),
                    (1, 2, 1))
            acc = acc + jax.lax.dot_general(
                xs, w_ref[ky, kx], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    yf = acc + b_ref[:].astype(jnp.float32)
    y = yf.astype(y_ref.dtype)
    y_ref[:] = y[None]

    # mask padding rows (last tile) and padding columns out of stats
    out_rows = (jax.lax.broadcasted_iota(
        jnp.int32, (th, 1, 1), 0) + t_i * th)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (1, w_blk, 1), 1)
    ok = jnp.logical_and(out_rows < h_out, out_cols < w_out)
    yz = jnp.where(ok, y.astype(jnp.float32), 0.0)
    s1_ref[:] += jnp.sum(yz, axis=(0, 1)).reshape(1, -1)
    s2_ref[:] += jnp.sum(yz * yz, axis=(0, 1)).reshape(1, -1)


def _pick_tile_h(h, h_out, w, ci, co, itemsize, stride):
    """Output rows per tile: keep x scratch + double-buffered y tile
    within a modest VMEM slice (lane dims pad to 128). The clamped
    halo window must fit inside the image: rows_needed <= h."""
    ci_p = _round_up(ci, 128)
    co_p = _round_up(co, 128)
    budget = 8 * 1024 * 1024
    fits = []
    for th in (64, 32, 16, 8, 4, 2, 1):
        in_rows = (2 * th + 3) if stride == 2 else (th + 4)
        rows_needed = (2 * th + 1) if stride == 2 else (th + 2)
        if rows_needed > h:
            continue
        x_tile = in_rows * (w + 2) * ci_p * itemsize
        y_tile = th * (w // stride) * co_p * itemsize
        if x_tile + 2 * y_tile <= budget:
            fits.append(th)
    for th in fits:                     # prefer an even split
        if h_out % th == 0:
            return th
    return fits[0] if fits else 1


def _conv3x3_stats_fwd_impl(x, w, b, stride):
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    h_out, w_out = h // stride, wd // stride
    # stride 1 blocks/scratch are 8-aligned on the sublane (W) axis
    # (Mosaic tiling); stride 2 keeps exact widths (interpret-only —
    # its strided slices don't legalize on hardware)
    w_blk = _round_up(w_out, 8) if stride == 1 else w_out
    w_scr = w_blk + 8 if stride == 1 else wd + 2
    th = _pick_tile_h(h, h_out, w_scr, ci, co,
                      jnp.dtype(x.dtype).itemsize, stride)
    rows_needed = (2 * th + 1) if stride == 2 else (th + 2)

    kernel = functools.partial(
        _conv3x3_kernel, h=h, w=wd, ci=ci, th=th, stride=stride,
        h_out=h_out, w_blk=w_blk)

    y, s1, s2 = pl.pallas_call(
        kernel,
        grid=(n, pl.cdiv(h_out, th)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3, ci, co), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, w_blk, co),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h_out, w_out, co), x.dtype),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows_needed + 2, w_scr, ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(x, w, b.reshape(1, co))
    return y, s1[0], s2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_stats(x, w, b, stride=1):
    """3x3 conv with fused per-channel statistic sums.

    stride=1: keras-SAME padding. stride=2: Darknet semantics — a
    (1,0),(1,0) top/left zero-pad then VALID (reference
    yolov3/models/backbone.py:58-63); H and W must be even.
    Returns (y, s1, s2) like :func:`conv1x1_stats`.
    """
    y, s1, s2 = _conv3x3_stats_fwd_impl(x, w, b, stride)
    return y, s1, s2


def _conv3x3_stats_fwd(x, w, b, stride):
    y, s1, s2 = _conv3x3_stats_fwd_impl(x, w, b, stride)
    return (y, s1, s2), (x, w, y)


def _ref_conv3x3(x, w, b, stride):
    pad = ((1, 1), (1, 1)) if stride == 1 else ((1, 0), (1, 0))
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _conv3x3_stats_bwd(stride, res, cts):
    x, w, y = res
    dy, ds1, ds2 = cts
    g = _dy_eff(dy, ds1, ds2, y)
    _, vjp = jax.vjp(
        lambda xx, ww: _vjp_conv(xx, ww, stride, False), x, w)
    dx, dw = vjp(g)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(x.dtype)
    return dx, dw.astype(w.dtype), db


conv3x3_stats.defvjp(_conv3x3_stats_fwd, _conv3x3_stats_bwd)


# ---------------------------------------------------------------------------
# Pure-XLA reference (test oracle + CPU fallback)
# ---------------------------------------------------------------------------

def conv_stats_ref(x, w, b, stride=1):
    """XLA reference for conv{1x1,3x3}_stats: conv, then the separate
    statistics pass the fused kernels eliminate."""
    if w.shape[0] == 1:
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = (y + b.astype(jnp.float32)).astype(x.dtype)
    else:
        y = _ref_conv3x3(x, w, b, stride)
    yf = y.astype(jnp.float32)
    s1 = jnp.sum(yf, axis=(0, 1, 2))
    s2 = jnp.sum(yf * yf, axis=(0, 1, 2))
    return y, s1, s2
