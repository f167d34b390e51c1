"""Fused prologue+3x3conv+BN-statistics kernels (Pallas TPU).

Companion to packed_gemm.py: that module removed the BN normalize+mish
pass for the 1x1 convolutions of the batch-packed early CSPDarknet
stages, but the 3x3 / stride-2 convolutions stayed on XLA — and the
measured end-to-end result (BASELINE.md "fused prologue-GEMM
backbone") showed the packed-XLA-conv taxes (+22%% forward, ~2x dW,
fusion-region breakage at every pallas_call boundary) eat the GEMM
wins. These kernels move the 3x3s into the same packed-rows layout so
the whole early region can run in Pallas with no XLA conv in between:

  - activations are 2D row matrices [H*W*Bq, pC] in (h,w,b)-major
    order (models/packed_region.py rows_of): a w-neighbour is a +-Bq
    row shift and an h-neighbour a +-W*Bq shift, so a 3x3 conv is
    NINE shifted GEMMs against per-tap [pC, pCo] weight slices —
    MXU-shaped, no im2col materialization;
  - the h-halo comes from neighbour grid blocks (the same input
    passed with i-1 / i / i+1 index maps), the w-halo from Bq-row
    zero margins plus output-row masks at the two w edges;
  - the producer's BN affine + activation is applied in the input
    read (prologue) and this conv's raw-output channel sums come out
    of the epilogue — exactly the fused_gemm contract, so the caller
    folds statistics identically;
  - stride-2 uses the darknet geometry this repo pins everywhere
    (top/left zero pad + VALID, models/layers.py): output (ho,wo)
    reads input rows 2ho-1+dh — block-strided row gathers, margins
    supplying the pad zeros.

Backward is a fused custom VJP. Unlike packed_gemm (which recomputes
its forward in-VMEM), these kernels save the forward OUTPUT y as a
residual — y is already materialized in HBM as the op result, so the
statistics cotangent fold (dyt = dy + ds1 + 2*y*ds2) costs no
recompute FLOPs; dx is the transposed 9-tap GEMM fan-in over dyt
(term-split per packed_gemm's rounding analysis: the constant ds1
term is rank-1 and becomes a broadcast add, not a GEMM), and dW /
d(affine) accumulate across the sequential grid in the epilogue.

No reference counterpart: the reference delegates convolution to TF's
stock kernels (SURVEY.md §2.2); the fusion map is this repo's own
round-3 profiling (tools/parse_tpu_profile.py: stage1 alone is 72 ms
of the 282 ms step at ~12%% effective efficiency).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .packed_gemm import _prologue

# Interpret mode for CPU tests (set by tests or call sites).
INTERPRET = False


def set_interpret(on):
    global INTERPRET
    INTERPRET = bool(on)


_TAPS = tuple((dh, dw) for dh in range(3) for dw in range(3))


def _wrow(w_ref, tap, k):
    """Per-tap [K, N] slice of the flat [9K, N] weight block."""
    return w_ref[tap * k:(tap + 1) * k, :]


def _col_index(r, bq):
    """[R, 1] int32 of each row's w-column index (row // Bq)."""
    return jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) // bq


def _maybe_prologue(x, a_ref, b_ref, act, has_affine):
    if has_affine:
        g, gp, xf = _prologue(x, a_ref, b_ref, act)
        return g, gp, xf
    return x, None, None


# ------------------------------------------------------------ fwd s1

def _fwd_s1_kernel(bq, wdim, act, has_affine, refs):
    (xm_ref, xc_ref, xp_ref, w_ref, a_ref, b_ref,
     y_ref, s1_ref, s2_ref) = refs
    r, k = xc_ref.shape
    n = y_ref.shape[1]
    pid = pl.program_id(0)
    last = pl.num_programs(0) - 1

    g_m = _maybe_prologue(xm_ref[...], a_ref, b_ref, act, has_affine)[0]
    g_c = _maybe_prologue(xc_ref[...], a_ref, b_ref, act, has_affine)[0]
    g_p = _maybe_prologue(xp_ref[...], a_ref, b_ref, act, has_affine)[0]
    g_m = jnp.where(pid == 0, jnp.zeros_like(g_m), g_m)
    g_p = jnp.where(pid == last, jnp.zeros_like(g_p), g_p)
    zb = jnp.zeros((bq, k), g_c.dtype)
    ext = jnp.concatenate([zb, g_m, g_c, g_p, zb], axis=0)

    col = _col_index(r, bq)
    m_w0 = (col > 0).astype(jnp.float32)           # output w == 0
    m_wl = (col < wdim - 1).astype(jnp.float32)    # output w == W-1

    acc = jnp.zeros((r, n), jnp.float32)
    for tap, (dh, dw) in enumerate(_TAPS):
        seg = jax.lax.slice(ext, (dh * r + dw * bq, 0),
                            (dh * r + dw * bq + r, k))
        part = jax.lax.dot(seg, _wrow(w_ref, tap, k),
                           preferred_element_type=jnp.float32)
        if dw == 0:
            part = part * m_w0
        elif dw == 2:
            part = part * m_wl
        acc = acc + part
    yb = acc.astype(y_ref.dtype)
    y_ref[...] = yb

    @pl.when(pid == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    yf = yb.astype(jnp.float32)
    s1_ref[...] += jnp.sum(yf, axis=0, keepdims=True)
    s2_ref[...] += jnp.sum(yf * yf, axis=0, keepdims=True)


# ----------------------------------------------------- fwd s1 im2col

def _im2col(ext, r, bq, k, m_w0, m_wl):
    """[9 taps] x [R, K] masked segments concatenated along lanes —
    the [R, 9K] im2col block. Only worth it for small K (the stem's
    K=6): one full-contraction dot replaces nine K-deep ones."""
    cols = []
    for dh, dw in _TAPS:
        seg = jax.lax.slice(ext, (dh * r + dw * bq, 0),
                            (dh * r + dw * bq + r, k))
        if dw == 0:
            seg = seg * m_w0.astype(seg.dtype)
        elif dw == 2:
            seg = seg * m_wl.astype(seg.dtype)
        cols.append(seg)
    return jnp.concatenate(cols, axis=1)


def _fwd_s1_im2col_kernel(bq, wdim, act, has_affine, refs):
    (xm_ref, xc_ref, xp_ref, w_ref, a_ref, b_ref,
     y_ref, s1_ref, s2_ref) = refs
    r, k = xc_ref.shape
    pid = pl.program_id(0)
    last = pl.num_programs(0) - 1

    g_m = _maybe_prologue(xm_ref[...], a_ref, b_ref, act, has_affine)[0]
    g_c = _maybe_prologue(xc_ref[...], a_ref, b_ref, act, has_affine)[0]
    g_p = _maybe_prologue(xp_ref[...], a_ref, b_ref, act, has_affine)[0]
    g_m = jnp.where(pid == 0, jnp.zeros_like(g_m), g_m)
    g_p = jnp.where(pid == last, jnp.zeros_like(g_p), g_p)
    zb = jnp.zeros((bq, k), g_c.dtype)
    ext = jnp.concatenate([zb, g_m, g_c, g_p, zb], axis=0)

    col_idx = _col_index(r, bq)
    m_w0 = (col_idx > 0).astype(jnp.float32)
    m_wl = (col_idx < wdim - 1).astype(jnp.float32)
    col = _im2col(ext, r, bq, k, m_w0, m_wl)
    yb = jax.lax.dot(col, w_ref[...],
                     preferred_element_type=jnp.float32
                     ).astype(y_ref.dtype)
    y_ref[...] = yb

    @pl.when(pid == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    yf = yb.astype(jnp.float32)
    s1_ref[...] += jnp.sum(yf, axis=0, keepdims=True)
    s2_ref[...] += jnp.sum(yf * yf, axis=0, keepdims=True)


# ------------------------------------------------------------ fwd s2

def _fwd_s2_kernel(bq, w2, act, has_affine, refs):
    (xm_ref, xc_ref, w_ref, a_ref, b_ref,
     y_ref, s1_ref, s2_ref) = refs
    rin2, k = xc_ref.shape          # 2 input h-rows
    rin = rin2 // 2
    rout = w2 * bq
    n = y_ref.shape[1]
    pid = pl.program_id(0)

    g_m = _maybe_prologue(xm_ref[rin:, :], a_ref, b_ref, act,
                          has_affine)[0]
    g_c = _maybe_prologue(xc_ref[...], a_ref, b_ref, act,
                          has_affine)[0]
    g_m = jnp.where(pid == 0, jnp.zeros_like(g_m), g_m)
    zb = jnp.zeros((bq, k), g_c.dtype)
    ext = jnp.concatenate([zb, g_m, g_c, zb], axis=0)

    col = _col_index(rout, bq)
    m_w0 = (col > 0).astype(jnp.float32)           # output wo == 0

    acc = jnp.zeros((rout, n), jnp.float32)
    for tap, (dh, dw) in enumerate(_TAPS):
        seg = jax.lax.slice(ext, (dh * rin + dw * bq, 0),
                            (dh * rin + dw * bq + rin, k))
        seg = seg.reshape(w2, 2 * bq, k)[:, :bq, :].reshape(rout, k)
        part = jax.lax.dot(seg, _wrow(w_ref, tap, k),
                           preferred_element_type=jnp.float32)
        if dw == 0:
            part = part * m_w0
        acc = acc + part
    yb = acc.astype(y_ref.dtype)
    y_ref[...] = yb

    @pl.when(pid == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    yf = yb.astype(jnp.float32)
    s1_ref[...] += jnp.sum(yf, axis=0, keepdims=True)
    s2_ref[...] += jnp.sum(yf * yf, axis=0, keepdims=True)


def _fwd_call(x2d, wflat, a, b, bq, hdim, wdim, stride, act,
              has_affine, im2col):
    rin = wdim * bq
    k = x2d.shape[1]
    n = wflat.shape[1]
    if stride == 1:
        grid = (hdim,)
        in_specs = [
            pl.BlockSpec((rin, k), lambda i: (jnp.maximum(i - 1, 0), 0)),
            pl.BlockSpec((rin, k), lambda i: (i, 0)),
            pl.BlockSpec(
                (rin, k),
                lambda i: (jnp.minimum(i + 1, hdim - 1), 0)),
            pl.BlockSpec(wflat.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ]
        rout, hout = rin, hdim
        kernel = functools.partial(
            _fwd_s1_im2col_kernel if im2col else _fwd_s1_kernel,
            bq, wdim, act, has_affine)
    else:
        h2, w2 = hdim // 2, wdim // 2
        grid = (h2,)
        in_specs = [
            pl.BlockSpec((2 * rin, k),
                         lambda i: (jnp.maximum(i - 1, 0), 0)),
            pl.BlockSpec((2 * rin, k), lambda i: (i, 0)),
            pl.BlockSpec(wflat.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ]
        rout, hout = w2 * bq, h2
        kernel = functools.partial(_fwd_s2_kernel, bq, w2, act,
                                   has_affine)
    out_specs = [
        pl.BlockSpec((rout, n), lambda i: (i, 0)),
        pl.BlockSpec((1, n), lambda i: (0, 0)),
        pl.BlockSpec((1, n), lambda i: (0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((hout * rout, n), x2d.dtype),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
    ]
    if stride == 1:
        ins = (x2d, x2d, x2d, wflat, a, b)
    else:
        ins = (x2d, x2d, wflat, a, b)
    return pl.pallas_call(
        lambda *refs: kernel(refs), grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape, interpret=INTERPRET,
    )(*ins)


# ------------------------------------------------------------ bwd s1

def _bwd_s1_kernel(bq, wdim, act, has_affine, refs):
    (xm_ref, xc_ref, xp_ref, dym_ref, dyc_ref, dyp_ref,
     ym_ref, yc_ref, yp_ref, w_ref, a_ref, b_ref, ds1_ref, ds2_ref,
     dx_ref, dwf_ref, da_ref, db_ref) = refs
    r, k = xc_ref.shape
    n = dyc_ref.shape[1]
    dt = xc_ref.dtype
    pid = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(pid == 0)
    def _init():
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    ds1 = ds1_ref[...]
    ds2 = ds2_ref[...]
    first_z = lambda v: jnp.where(pid == 0, jnp.zeros_like(v), v)
    last_z = lambda v: jnp.where(pid == last, jnp.zeros_like(v), v)

    # dy / (2*y*ds2) halo strips, zeroed outside the image.
    dy_m = first_z(dym_ref[...])
    dy_c = dyc_ref[...]
    dy_p = last_z(dyp_ref[...])
    two_ds2 = (2.0 * ds2)
    yd_m = first_z((ym_ref[...].astype(jnp.float32)
                    * two_ds2).astype(dt))
    yd_c = (yc_ref[...].astype(jnp.float32) * two_ds2).astype(dt)
    yd_p = last_z((yp_ref[...].astype(jnp.float32)
                   * two_ds2).astype(dt))
    zn = jnp.zeros((bq, n), dt)
    dy_ext = jnp.concatenate([zn, dy_m, dy_c, dy_p, zn], axis=0)
    yd_ext = jnp.concatenate([zn, yd_m, yd_c, yd_p, zn], axis=0)

    col = _col_index(r, bq)
    m_w0 = (col > 0).astype(jnp.float32)
    m_wl = (col < wdim - 1).astype(jnp.float32)

    # dg: transposed 9-tap fan-in over dyt, term-split (the rank-1
    # ds1 contribution is a broadcast add, not a GEMM)
    dg = jnp.zeros((r, k), jnp.float32)
    for tap, (dh, dw) in enumerate(_TAPS):
        start = (2 - dh) * r + (2 - dw) * bq
        wt = _wrow(w_ref, tap, k)
        dots = (jax.lax.dot_general(
                    jax.lax.slice(dy_ext, (start, 0), (start + r, n)),
                    wt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    jax.lax.slice(yd_ext, (start, 0), (start + r, n)),
                    wt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
        const = jax.lax.dot_general(
            ds1, wt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # out-of-image h rows contribute nothing: the dy/yd strips are
        # already zeroed, but the constant term needs the explicit
        # scalar gate
        if dh == 2:
            const = const * jnp.where(pid == 0, 0.0, 1.0)
        elif dh == 0:
            const = const * jnp.where(pid == last, 0.0, 1.0)
        part = dots + const
        # w-edge: the shifted read crosses into the adjacent h-row's
        # real data — mask the whole tap at the invalid output column
        if dw == 2:
            part = part * m_w0
        elif dw == 0:
            part = part * m_wl
        dg = dg + part

    if has_affine:
        _, gp_c, xf_c = _prologue(xc_ref[...], a_ref, b_ref, act)
        dz = dg * gp_c
        dx_ref[...] = (dz * a_ref[0, :]).astype(dt)
        da_ref[...] += jnp.sum(dz * xf_c, axis=0, keepdims=True)
        db_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    else:
        dx_ref[...] = dg.astype(dt)

    # dW: per-tap shifted-g^T @ dyt over this program's output rows
    g_m = _maybe_prologue(xm_ref[...], a_ref, b_ref, act,
                          has_affine)[0]
    g_c = _maybe_prologue(xc_ref[...], a_ref, b_ref, act,
                          has_affine)[0]
    g_p = _maybe_prologue(xp_ref[...], a_ref, b_ref, act,
                          has_affine)[0]
    g_m = first_z(g_m)
    g_p = last_z(g_p)
    zk = jnp.zeros((bq, k), g_c.dtype)
    g_ext = jnp.concatenate([zk, g_m, g_c, g_p, zk], axis=0)

    dyt = (dy_c.astype(jnp.float32) + ds1
           + yc_ref[...].astype(jnp.float32) * two_ds2).astype(dt)
    dyt_m = {1: dyt,
             0: dyt * m_w0.astype(dt),
             2: dyt * m_wl.astype(dt)}
    for tap, (dh, dw) in enumerate(_TAPS):
        seg = jax.lax.slice(g_ext, (dh * r + dw * bq, 0),
                            (dh * r + dw * bq + r, k))
        dwf_ref[tap * k:(tap + 1) * k, :] += jax.lax.dot_general(
            seg, dyt_m[dw], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


# ----------------------------------------------------- bwd s1 im2col

def _bwd_s1_im2col_kernel(bq, wdim, act, has_affine, refs):
    (xm_ref, xc_ref, xp_ref, dym_ref, dyc_ref, dyp_ref,
     ym_ref, yc_ref, yp_ref, w_ref, a_ref, b_ref, ds1_ref, ds2_ref,
     dx_ref, dwf_ref, da_ref, db_ref) = refs
    r, k = xc_ref.shape
    n = dyc_ref.shape[1]
    dt = xc_ref.dtype
    pid = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(pid == 0)
    def _init():
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    ds1 = ds1_ref[...]
    ds2 = ds2_ref[...]
    two_ds2 = 2.0 * ds2
    first_z = lambda v: jnp.where(pid == 0, jnp.zeros_like(v), v)
    last_z = lambda v: jnp.where(pid == last, jnp.zeros_like(v), v)

    col_idx = _col_index(r, bq)
    m_w0 = (col_idx > 0).astype(jnp.float32)
    m_wl = (col_idx < wdim - 1).astype(jnp.float32)

    # dg via one wide transposed dot over the dyt halo: dcol_ext =
    # dyt_ext @ w^T (term-split; the rank-1 ds1 term applies only to
    # in-image ext rows), then nine shifted masked adds
    dy_m = first_z(dym_ref[...])
    dy_c = dyc_ref[...]
    dy_p = last_z(dyp_ref[...])
    yd_m = first_z((ym_ref[...].astype(jnp.float32)
                    * two_ds2).astype(dt))
    yd_c = (yc_ref[...].astype(jnp.float32) * two_ds2).astype(dt)
    yd_p = last_z((yp_ref[...].astype(jnp.float32)
                   * two_ds2).astype(dt))
    zn = jnp.zeros((bq, n), dt)
    dy_ext = jnp.concatenate([zn, dy_m, dy_c, dy_p, zn], axis=0)
    yd_ext = jnp.concatenate([zn, yd_m, yd_c, yd_p, zn], axis=0)
    gate = lambda cond: jnp.where(cond, 0.0, 1.0)
    ones_r = jnp.ones((r, 1), jnp.float32)
    vext = jnp.concatenate([
        jnp.zeros((bq, 1), jnp.float32),
        ones_r * gate(pid == 0), ones_r, ones_r * gate(pid == last),
        jnp.zeros((bq, 1), jnp.float32)], axis=0)
    dcol_ext = (jax.lax.dot_general(
                    dy_ext, w_ref[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    yd_ext, w_ref[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                + vext * jax.lax.dot_general(
                    ds1, w_ref[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
    dg = jnp.zeros((r, k), jnp.float32)
    for tap, (dh, dw) in enumerate(_TAPS):
        start = (2 - dh) * r + (2 - dw) * bq
        part = jax.lax.slice(dcol_ext, (start, tap * k),
                             (start + r, (tap + 1) * k))
        if dw == 2:
            part = part * m_w0
        elif dw == 0:
            part = part * m_wl
        dg = dg + part

    if has_affine:
        _, gp_c, xf_c = _prologue(xc_ref[...], a_ref, b_ref, act)
        dz = dg * gp_c
        dx_ref[...] = (dz * a_ref[0, :]).astype(dt)
        da_ref[...] += jnp.sum(dz * xf_c, axis=0, keepdims=True)
        db_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    else:
        dx_ref[...] = dg.astype(dt)

    # dW: one im2col rebuild + one full-contraction dot
    g_m = _maybe_prologue(xm_ref[...], a_ref, b_ref, act,
                          has_affine)[0]
    g_c = _maybe_prologue(xc_ref[...], a_ref, b_ref, act,
                          has_affine)[0]
    g_p = _maybe_prologue(xp_ref[...], a_ref, b_ref, act,
                          has_affine)[0]
    g_m = first_z(g_m)
    g_p = last_z(g_p)
    zk = jnp.zeros((bq, k), g_c.dtype)
    g_ext = jnp.concatenate([zk, g_m, g_c, g_p, zk], axis=0)
    col = _im2col(g_ext, r, bq, k, m_w0, m_wl)
    dyt = (dy_c.astype(jnp.float32) + ds1
           + yc_ref[...].astype(jnp.float32) * two_ds2).astype(dt)
    dwf_ref[...] += jax.lax.dot_general(
        col, dyt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# ------------------------------------------------------------ bwd s2

def _bwd_s2_kernel(bq, wdim, act, has_affine, refs):
    (xm_ref, xc_ref, dyc_ref, dyn_ref, yc_ref, yn_ref,
     w_ref, a_ref, b_ref, ds1_ref, ds2_ref,
     dx_ref, dwf_ref, da_ref, db_ref) = refs
    rin2, k = xc_ref.shape
    rin = rin2 // 2
    w2 = wdim // 2
    rout = w2 * bq
    n = dyc_ref.shape[1]
    dt = xc_ref.dtype
    pid = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(pid == 0)
    def _init():
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    ds1 = ds1_ref[...]
    ds2 = ds2_ref[...]
    two_ds2 = 2.0 * ds2
    last_z = lambda v: jnp.where(pid == last, jnp.zeros_like(v), v)

    dy_c = dyc_ref[...]
    dy_n = last_z(dyn_ref[...])
    yd_c = (yc_ref[...].astype(jnp.float32) * two_ds2).astype(dt)
    yd_n = last_z((yn_ref[...].astype(jnp.float32)
                   * two_ds2).astype(dt))
    zn = jnp.zeros((bq, n), dt)
    exts = {
        "c": (jnp.concatenate([zn, dy_c, zn], axis=0),
              jnp.concatenate([zn, yd_c, zn], axis=0), False),
        "n": (jnp.concatenate([zn, dy_n, zn], axis=0),
              jnp.concatenate([zn, yd_n, zn], axis=0), True),
    }

    col_out = _col_index(rout, bq)
    m_last_wo = (col_out < w2 - 1).astype(jnp.float32)

    def term(src, shift, tap):
        dy_ext, yd_ext, is_next = exts[src]
        start = bq + shift * bq
        wt = _wrow(w_ref, tap, k)
        out = (jax.lax.dot_general(
                   jax.lax.slice(dy_ext, (start, 0),
                                 (start + rout, n)),
                   wt, (((1,), (1,)), ((), ())),
                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(
                   jax.lax.slice(yd_ext, (start, 0),
                                 (start + rout, n)),
                   wt, (((1,), (1,)), ((), ())),
                   preferred_element_type=jnp.float32))
        const = jax.lax.dot_general(
            ds1, wt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if is_next:
            const = const * jnp.where(pid == last, 0.0, 1.0)
        if shift == 1:
            const = const * m_last_wo
        return out + const

    # taps are (dh, dw) indices into the 3x3 grid, row-major
    q00 = term("c", 0, 4)                       # w[1,1]
    q01 = term("c", 1, 3) + term("c", 0, 5)     # w[1,0], w[1,2]
    q10 = term("n", 0, 1) + term("c", 0, 7)     # w[0,1], w[2,1]
    q11 = (term("n", 1, 0) + term("n", 0, 2)    # w[0,0], w[0,2]
           + term("c", 1, 6) + term("c", 0, 8))  # w[2,0], w[2,2]

    def interleave(qa, qb):
        s = jnp.stack([qa.reshape(w2, bq, k), qb.reshape(w2, bq, k)],
                      axis=1)
        return s.reshape(rin, k)

    dg = jnp.concatenate([interleave(q00, q01),
                          interleave(q10, q11)], axis=0)

    if has_affine:
        _, gp_c, xf_c = _prologue(xc_ref[...], a_ref, b_ref, act)
        dz = dg * gp_c
        dx_ref[...] = (dz * a_ref[0, :]).astype(dt)
        da_ref[...] += jnp.sum(dz * xf_c, axis=0, keepdims=True)
        db_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    else:
        dx_ref[...] = dg.astype(dt)

    # dW over this program's single output h-row
    g_m = _maybe_prologue(xm_ref[rin:, :], a_ref, b_ref, act,
                          has_affine)[0]
    g_c = _maybe_prologue(xc_ref[...], a_ref, b_ref, act,
                          has_affine)[0]
    g_m = jnp.where(pid == 0, jnp.zeros_like(g_m), g_m)
    zk = jnp.zeros((bq, k), g_c.dtype)
    g_ext = jnp.concatenate([zk, g_m, g_c, zk], axis=0)

    dyt = (dy_c.astype(jnp.float32) + ds1
           + yc_ref[...].astype(jnp.float32) * two_ds2).astype(dt)
    m_w0 = (col_out > 0).astype(dt)
    for tap, (dh, dw) in enumerate(_TAPS):
        seg = jax.lax.slice(g_ext, (dh * rin + dw * bq, 0),
                            (dh * rin + dw * bq + rin, k))
        seg = seg.reshape(w2, 2 * bq, k)[:, :bq, :].reshape(rout, k)
        dy_tap = dyt * m_w0 if dw == 0 else dyt
        dwf_ref[tap * k:(tap + 1) * k, :] += jax.lax.dot_general(
            seg, dy_tap, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _bwd_call(x2d, wflat, a, b, y2d, dy, ds1, ds2,
              bq, hdim, wdim, stride, act, has_affine, im2col):
    rin = wdim * bq
    k = x2d.shape[1]
    n = wflat.shape[1]
    if stride == 1:
        grid = (hdim,)
        xmaps = [lambda i: (jnp.maximum(i - 1, 0), 0),
                 lambda i: (i, 0),
                 lambda i: (jnp.minimum(i + 1, hdim - 1), 0)]
        in_specs = (
            [pl.BlockSpec((rin, k), m) for m in xmaps]
            + [pl.BlockSpec((rin, n), m) for m in xmaps]
            + [pl.BlockSpec((rin, n), m) for m in xmaps]
            + [pl.BlockSpec(wflat.shape, lambda i: (0, 0)),
               pl.BlockSpec((1, k), lambda i: (0, 0)),
               pl.BlockSpec((1, k), lambda i: (0, 0)),
               pl.BlockSpec((1, n), lambda i: (0, 0)),
               pl.BlockSpec((1, n), lambda i: (0, 0))]
        )
        ins = (x2d, x2d, x2d, dy, dy, dy, y2d, y2d, y2d,
               wflat, a, b, ds1, ds2)
        dx_rows = rin
        kernel = functools.partial(
            _bwd_s1_im2col_kernel if im2col else _bwd_s1_kernel,
            bq, wdim, act, has_affine)
    else:
        h2, w2 = hdim // 2, wdim // 2
        rout = w2 * bq
        grid = (h2,)
        in_specs = [
            pl.BlockSpec((2 * rin, k),
                         lambda i: (jnp.maximum(i - 1, 0), 0)),
            pl.BlockSpec((2 * rin, k), lambda i: (i, 0)),
            pl.BlockSpec((rout, n), lambda i: (i, 0)),
            pl.BlockSpec((rout, n),
                         lambda i: (jnp.minimum(i + 1, h2 - 1), 0)),
            pl.BlockSpec((rout, n), lambda i: (i, 0)),
            pl.BlockSpec((rout, n),
                         lambda i: (jnp.minimum(i + 1, h2 - 1), 0)),
            pl.BlockSpec(wflat.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ]
        ins = (x2d, x2d, dy, dy, y2d, y2d, wflat, a, b, ds1, ds2)
        dx_rows = 2 * rin
        kernel = functools.partial(_bwd_s2_kernel, bq, wdim, act,
                                   has_affine)
    out_specs = [
        pl.BlockSpec((dx_rows, k), lambda i: (i, 0)),
        pl.BlockSpec(wflat.shape, lambda i: (0, 0)),
        pl.BlockSpec((1, k), lambda i: (0, 0)),
        pl.BlockSpec((1, k), lambda i: (0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        jax.ShapeDtypeStruct(wflat.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, k), jnp.float32),
        jax.ShapeDtypeStruct((1, k), jnp.float32),
    ]
    return pl.pallas_call(
        lambda *refs: kernel(refs), grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape, interpret=INTERPRET,
    )(*ins)


# ----------------------------------------------------------- wrapper

@functools.lru_cache(maxsize=None)
def _build(bq, hdim, wdim, stride, act, has_affine, im2col):
    @jax.custom_vjp
    def f(x2d, wflat, a, b):
        return _fwd_call(x2d, wflat, a, b, bq, hdim, wdim, stride,
                         act, has_affine, im2col)

    def fwd(x2d, wflat, a, b):
        y, s1, s2 = f(x2d, wflat, a, b)
        return (y, s1, s2), (x2d, wflat, a, b, y)

    def bwd(res, cts):
        x2d, wflat, a, b, y = res
        dy, ds1, ds2 = cts
        dx, dwf, da, db = _bwd_call(
            x2d, wflat, a, b, y, dy, ds1, ds2,
            bq, hdim, wdim, stride, act, has_affine, im2col)
        return (dx.astype(x2d.dtype), dwf.astype(wflat.dtype),
                da.astype(a.dtype), db.astype(b.dtype))

    f.defvjp(fwd, bwd)
    return f


def fused_conv3x3(x2d, w, affine, *, spatial, stride=1, act="mish",
                  im2col=False, dtype=jnp.bfloat16):
    """3x3 convolution on packed (h,w,b)-major rows, with the
    producer's BN affine+activation fused into the input read and the
    raw output's channel sums in the epilogue.

    x2d:     [H*W*Bq, K] rows (models/packed_region.py rows_of).
    w:       [3, 3, K, N] weights, block-diag-expanded by the caller.
    affine:  (a, b) with shape [1, K] (prologue ``act(x*a + b)``) or
             None (consume x as-is — already activated, or the raw
             image at the stem).
    spatial: (Bq, H, W) of the input rows.
    stride:  1 (SAME) or 2 (darknet top/left pad + VALID —
             models/layers.py ConvBN's pinned stride-2 geometry).
    im2col:  stride-1 only — build the [R, 9K] tap-concatenated block
             and run ONE full-contraction dot per direction instead of
             nine K-deep ones. Only profitable for small K (the stem's
             packed K=6, where a K-deep dot uses 6/128 of the MXU).

    Returns (y2d [(H/stride)*(W/stride)*Bq, N], s1 [1,N] f32,
    s2 [1,N] f32) — the fused_gemm contract, differentiable via a
    fused custom VJP (see module docstring).
    """
    bq, hdim, wdim = spatial
    k = x2d.shape[1]
    has_affine = affine is not None
    if has_affine:
        a = affine[0].reshape(1, k).astype(jnp.float32)
        b = affine[1].reshape(1, k).astype(jnp.float32)
    else:
        a = jnp.ones((1, k), jnp.float32)
        b = jnp.zeros((1, k), jnp.float32)
    if im2col and stride != 1:
        raise ValueError("im2col is a stride-1 mode")
    wflat = w.reshape(9 * k, w.shape[-1]).astype(dtype)
    f = _build(bq, hdim, wdim, stride, act, has_affine, im2col)
    return f(x2d.astype(dtype), wflat, a, b)
