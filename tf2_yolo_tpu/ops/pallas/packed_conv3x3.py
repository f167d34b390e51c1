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
  - the grid is 2D (h-row x w-chunk); each program's window is one
    W-CHUNK of one h-row, and the eight neighbours it shifts into
    arrive as explicit halo blocks: per tap-h-offset, a center block
    plus two Bq-row column-halo blocks (separate BlockSpecs with
    clamped index maps, zeroed in-kernel at the true image edges).
    The first cut of these kernels used whole h-rows as blocks and
    full-row f32 accumulators; the real TPU compiler rejected that
    with scoped-VMEM stack OOMs (26-65 MB vs the 16 MB default —
    windows AND temporaries are scoped allocations). Chunked blocks
    keep every program under a few MB and pipeline better;
  - the producer's BN affine + activation is applied in the input
    read (prologue) and this conv's raw-output channel sums come out
    of the epilogue — exactly the fused_gemm contract, so the caller
    folds statistics identically;
  - stride-2 uses the darknet geometry this repo pins everywhere
    (top/left zero pad + VALID, models/layers.py): output (ho,wo)
    reads input rows 2ho-1+dh — block-strided row picks, the
    top/left pad supplied by the zeroed halo blocks.

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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .packed_gemm import _prologue

# Interpret mode for CPU tests (set by tests or call sites).
INTERPRET = False

# Target rows per w-chunk block (the M of each tap GEMM). Bounded so
# that windows + temporaries of the heaviest kernel (bwd: 27 input
# blocks, double-buffered) stay within the default 16 MB scoped-VMEM
# budget at 128 lanes. Must stay a multiple of Bq times a divisor of
# W; _chunk_cols picks the largest fit.
BLOCK_ROWS = int(os.environ.get("PACKED3_BLOCK_ROWS", "1024"))


def set_interpret(on):
    global INTERPRET
    INTERPRET = bool(on)


_TAPS = tuple((dh, dw) for dh in range(3) for dw in range(3))


def _chunk_cols(wdim, bq, max_rows):
    """Largest divisor wc of wdim with wc*bq <= max_rows (else 1)."""
    best = 1
    for d in range(1, wdim + 1):
        if wdim % d == 0 and d * bq <= max_rows:
            best = d
    return best


def _wrow(w_ref, tap, k):
    """Per-tap [K, N] slice of the flat [9K, N] weight block."""
    return w_ref[tap * k:(tap + 1) * k, :]


def _g_of(ref_val, a_ref, b_ref, act, has_affine, gate):
    """Prologue-activated block, zeroed when ``gate`` (a traced bool
    scalar or None) is False — the halo/edge handling."""
    if has_affine:
        g = _prologue(ref_val, a_ref, b_ref, act)[0]
    else:
        g = ref_val
    if gate is not None:
        g = jnp.where(gate, g, jnp.zeros_like(g))
    return g


def _and(*gates):
    out = None
    for g in gates:
        if g is None:
            continue
        out = g if out is None else jnp.logical_and(out, g)
    return out


# ------------------------------------------------------------ fwd s1

def _fwd_s1_kernel(bq, im2col, act, has_affine, refs):
    (xl0, xc0, xr0, xl1, xc1, xr1, xl2, xc2, xr2,
     w_ref, a_ref, b_ref, y_ref, s1_ref, s2_ref) = refs
    xls = (xl0, xl1, xl2)
    xcs = (xc0, xc1, xc2)
    xrs = (xr0, xr1, xr2)
    rs, k = xc1.shape
    n = y_ref.shape[1]
    i = pl.program_id(0)
    j = pl.program_id(1)
    nh = pl.num_programs(0)
    nw = pl.num_programs(1)

    acc = None
    cols = []
    for dh in range(3):
        hgate = ((i > 0) if dh == 0
                 else (i < nh - 1) if dh == 2 else None)
        lh = _g_of(xls[dh][...], a_ref, b_ref, act, has_affine,
                   _and(hgate, j > 0))
        ce = _g_of(xcs[dh][...], a_ref, b_ref, act, has_affine, hgate)
        rh = _g_of(xrs[dh][...], a_ref, b_ref, act, has_affine,
                   _and(hgate, j < nw - 1))
        ext = jnp.concatenate([lh, ce, rh], axis=0)
        for dw in range(3):
            seg = jax.lax.slice(ext, (dw * bq, 0), (dw * bq + rs, k))
            if im2col:
                cols.append(seg)
            else:
                part = jax.lax.dot(
                    seg, _wrow(w_ref, dh * 3 + dw, k),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
    if im2col:
        # one full-contraction dot — only profitable for small K (the
        # stem's packed K=6, where a K-deep dot wastes the MXU).
        acc = jax.lax.dot(jnp.concatenate(cols, axis=1), w_ref[...],
                          preferred_element_type=jnp.float32)
    yb = acc.astype(y_ref.dtype)
    y_ref[...] = yb

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    yf = yb.astype(jnp.float32)
    s1_ref[...] += jnp.sum(yf, axis=0, keepdims=True)
    s2_ref[...] += jnp.sum(yf * yf, axis=0, keepdims=True)


# ------------------------------------------------------------ fwd s2

def _fwd_s2_kernel(bq, act, has_affine, refs):
    (xl0, xc0, xl1, xc1, xl2, xc2,
     w_ref, a_ref, b_ref, y_ref, s1_ref, s2_ref) = refs
    xls = (xl0, xl1, xl2)
    xcs = (xc0, xc1, xc2)
    rin, k = xc1.shape              # 2*wc2*bq center rows
    rout = rin // 2
    wc2 = rout // bq
    n = y_ref.shape[1]
    i = pl.program_id(0)
    j = pl.program_id(1)
    nw = pl.num_programs(1)

    acc = None
    for dh in range(3):
        # input h-row 2i-1+dh; only dh==0 can fall off the top
        hgate = (i > 0) if dh == 0 else None
        lh = _g_of(xls[dh][...], a_ref, b_ref, act, has_affine,
                   _and(hgate, j > 0))
        ce = _g_of(xcs[dh][...], a_ref, b_ref, act, has_affine, hgate)
        # trailing zero pad so the dw=2 strided pick can slice a full
        # 2*rout window (its last bq rows are never selected)
        ext = jnp.concatenate(
            [lh, ce, jnp.zeros((bq, k), ce.dtype)], axis=0)
        for dw in range(3):
            seg = jax.lax.slice(ext, (dw * bq, 0),
                                (dw * bq + 2 * rout, k))
            seg = seg.reshape(wc2, 2 * bq, k)[:, :bq, :].reshape(
                rout, k)
            part = jax.lax.dot(seg, _wrow(w_ref, dh * 3 + dw, k),
                               preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    yb = acc.astype(y_ref.dtype)
    y_ref[...] = yb

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    yf = yb.astype(jnp.float32)
    s1_ref[...] += jnp.sum(yf, axis=0, keepdims=True)
    s2_ref[...] += jnp.sum(yf * yf, axis=0, keepdims=True)


def _fwd_call(x2d, wflat, a, b, bq, hdim, wdim, stride, act,
              has_affine, im2col):
    k = x2d.shape[1]
    n = wflat.shape[1]
    nbq = x2d.shape[0] // bq        # total bq-row groups (h*w)

    def halo_spec(arr_k, idx_fn):
        return pl.BlockSpec(
            (bq, arr_k),
            lambda i, j, f=idx_fn: (jnp.clip(f(i, j), 0, nbq - 1), 0))

    if stride == 1:
        # the im2col variant carries extra wide lane-padded buffers
        # (the [R,9K] col and the transposed dcol) — halve its block
        # budget (a 3328-row stem bwd measured 28.2 MB scoped VMEM)
        wc = _chunk_cols(wdim, bq,
                         BLOCK_ROWS // 2 if im2col else BLOCK_ROWS)
        nw = wdim // wc
        rs = wc * bq
        in_specs, ins = [], []
        for dh in range(3):
            def hh(i, d=dh):
                return jnp.clip(i + d - 1, 0, hdim - 1)
            in_specs += [
                halo_spec(k, lambda i, j, d=dh: hh(i, d) * wdim
                          + j * wc - 1),
                pl.BlockSpec((rs, k),
                             lambda i, j, d=dh: (hh(i, d) * nw + j, 0)),
                halo_spec(k, lambda i, j, d=dh: hh(i, d) * wdim
                          + (j + 1) * wc),
            ]
            ins += [x2d, x2d, x2d]
        grid = (hdim, nw)
        rout, hout = rs, hdim
        kernel = functools.partial(_fwd_s1_kernel, bq, im2col, act,
                                   has_affine)
    else:
        h2, w2 = hdim // 2, wdim // 2
        wc2 = _chunk_cols(w2, bq, max(BLOCK_ROWS // 2, bq))
        nw = w2 // wc2
        rs = 2 * wc2 * bq           # input center rows
        in_specs, ins = [], []
        for dh in range(3):
            def hh(i, d=dh):
                return jnp.clip(2 * i + d - 1, 0, hdim - 1)
            in_specs += [
                halo_spec(k, lambda i, j, d=dh: hh(i, d) * wdim
                          + 2 * j * wc2 - 1),
                pl.BlockSpec((rs, k),
                             lambda i, j, d=dh: (hh(i, d) * nw + j, 0)),
            ]
            ins += [x2d, x2d]
        grid = (h2, nw)
        rout, hout = wc2 * bq, h2
        kernel = functools.partial(_fwd_s2_kernel, bq, act, has_affine)

    in_specs += [
        pl.BlockSpec(wflat.shape, lambda i, j: (0, 0)),
        pl.BlockSpec((1, k), lambda i, j: (0, 0)),
        pl.BlockSpec((1, k), lambda i, j: (0, 0)),
    ]
    ins += [wflat, a, b]
    out_specs = [
        pl.BlockSpec((rout, n), lambda i, j: (i * grid[1] + j, 0)),
        pl.BlockSpec((1, n), lambda i, j: (0, 0)),
        pl.BlockSpec((1, n), lambda i, j: (0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((hout * grid[1] * rout, n), x2d.dtype),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
    ]
    return pl.pallas_call(
        lambda *refs: kernel(refs), grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape, interpret=INTERPRET,
    )(*ins)


# ------------------------------------------------------------ bwd s1

def _bwd_s1_kernel(bq, im2col, act, has_affine, refs):
    (xl0, xc0, xr0, xl1, xc1, xr1, xl2, xc2, xr2,
     dl0, dc0, dr0, dl1, dc1, dr1, dl2, dc2, dr2,
     w_ref, a_ref, b_ref, ds1_ref,
     dx_ref, dwf_ref, da_ref, db_ref) = refs
    xls, xcs, xrs = (xl0, xl1, xl2), (xc0, xc1, xc2), (xr0, xr1, xr2)
    dls, dcs, drs = (dl0, dl1, dl2), (dc0, dc1, dc2), (dr0, dr1, dr2)
    rs, k = xc1.shape
    n = dc1.shape[1]
    dt = xc1.dtype
    i = pl.program_id(0)
    j = pl.program_id(1)
    nh = pl.num_programs(0)
    nw = pl.num_programs(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    ds1 = ds1_ref[...]

    row = jax.lax.broadcasted_iota(jnp.int32, (rs, 1), 0)
    m_first = (row >= bq).astype(jnp.float32)   # 0 on first bq rows
    m_last = (row < rs - bq).astype(jnp.float32)
    ones_r = jnp.ones((rs, 1), jnp.float32)

    def zed(v, gate):
        if gate is None:
            return v
        return jnp.where(gate, v, jnp.zeros_like(v))

    # dg: transposed 9-tap fan-in over dyt = dyf + ds1, where
    # dyf = dy + 2*y*ds2 was folded OUTSIDE the kernel (one fused
    # XLA elementwise pass) — halves the dg GEMMs and the window
    # traffic. The rank-1 ds1 term stays a separate exact broadcast:
    # packed_gemm's rounding analysis showed pre-adding the CONSTANT
    # into a bf16 sum swamps small dy entries (30% rel. error on dx);
    # dy and 2*y*ds2 are same-scale row terms and fold safely.
    dg = jnp.zeros((rs, k), jnp.float32)
    for e in (-1, 0, 1):            # dyf h-row = i + e
        dh = 1 - e                  # the tap-h these rows back-prop
        ei = e + 1                  # ref triple index (maps use e)
        hgate = ((i > 0) if e == -1
                 else (i < nh - 1) if e == 1 else None)
        lg, rg = _and(hgate, j > 0), _and(hgate, j < nw - 1)
        dy_ext = jnp.concatenate([
            zed(dls[ei][...], lg), zed(dcs[ei][...], hgate),
            zed(drs[ei][...], rg)], axis=0)
        hconst = (jnp.where(hgate, 1.0, 0.0)
                  if hgate is not None else None)
        if im2col:
            # one wide transposed dot per h-offset: contract n against
            # this dh's [3K] tap block, then three shifted column picks
            wt3 = w_ref[dh * 3 * k:(dh + 1) * 3 * k, :]
            dcol = jax.lax.dot_general(
                dy_ext, wt3, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            cvec = jax.lax.dot_general(
                ds1, wt3, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if hconst is not None:
                cvec = cvec * hconst
            for dw in range(3):
                part = jax.lax.slice(
                    dcol, ((2 - dw) * bq, dw * k),
                    ((2 - dw) * bq + rs, (dw + 1) * k))
                const = jax.lax.slice(cvec, (0, dw * k),
                                      (1, (dw + 1) * k))
                cmask = ones_r
                if dw == 2:
                    cmask = jnp.where(j == 0, m_first, ones_r)
                elif dw == 0:
                    cmask = jnp.where(j == nw - 1, m_last, ones_r)
                dg = dg + part + cmask * const
        else:
            for dw in range(3):
                wt = _wrow(w_ref, dh * 3 + dw, k)
                off = (2 - dw) * bq
                dots = jax.lax.dot_general(
                    jax.lax.slice(dy_ext, (off, 0), (off + rs, n)),
                    wt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                const = jax.lax.dot_general(
                    ds1, wt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if hconst is not None:
                    const = const * hconst
                # const applies only where the tap's y read is
                # in-image; the dyf strips are already zeroed there
                cmask = ones_r
                if dw == 2:
                    cmask = jnp.where(j == 0, m_first, ones_r)
                elif dw == 0:
                    cmask = jnp.where(j == nw - 1, m_last, ones_r)
                dg = dg + dots + cmask * const

    if has_affine:
        _, gp_c, xf_c = _prologue(xc1[...], a_ref, b_ref, act)
        dz = dg * gp_c
        dx_ref[...] = (dz * a_ref[0, :]).astype(dt)
        da_ref[...] += jnp.sum(dz * xf_c, axis=0, keepdims=True)
        db_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    else:
        dx_ref[...] = dg.astype(dt)

    # dW: per-tap shifted-g^T @ dyt over this program's output rows
    dyt = (dc1[...].astype(jnp.float32) + ds1).astype(dt)
    cols = []
    for dh in range(3):
        hgate = ((i > 0) if dh == 0
                 else (i < nh - 1) if dh == 2 else None)
        lh = _g_of(xls[dh][...], a_ref, b_ref, act, has_affine,
                   _and(hgate, j > 0))
        ce = _g_of(xcs[dh][...], a_ref, b_ref, act, has_affine, hgate)
        rh = _g_of(xrs[dh][...], a_ref, b_ref, act, has_affine,
                   _and(hgate, j < nw - 1))
        g_ext = jnp.concatenate([lh, ce, rh], axis=0)
        for dw in range(3):
            seg = jax.lax.slice(g_ext, (dw * bq, 0),
                                (dw * bq + rs, k))
            if im2col:
                cols.append(seg)
            else:
                tap = dh * 3 + dw
                dwf_ref[tap * k:(tap + 1) * k, :] += (
                    jax.lax.dot_general(
                        seg, dyt, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
    if im2col:
        dwf_ref[...] += jax.lax.dot_general(
            jnp.concatenate(cols, axis=1), dyt,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


# ------------------------------------------------------------ bwd s2

def _bwd_s2_kernel(bq, act, has_affine, refs):
    (xl0, xc0, xl1, xc1, xl2, xc2,
     dcc, dcr, dnc, dnr,
     w_ref, a_ref, b_ref, ds1_ref,
     dx0_ref, dx1_ref, dwf_ref, da_ref, db_ref) = refs
    xls, xcs = (xl0, xl1, xl2), (xc0, xc1, xc2)
    rin, k = xc1.shape              # 2*wc2*bq input center rows
    rout = rin // 2
    wc2 = rout // bq
    n = dcc.shape[1]
    dt = xc1.dtype
    i = pl.program_id(0)
    j = pl.program_id(1)
    nh = pl.num_programs(0)
    nw = pl.num_programs(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    ds1 = ds1_ref[...]
    ngate = (i < nh - 1)
    rgate = (j < nw - 1)

    def zed(v, gate):
        if gate is None:
            return v
        return jnp.where(gate, v, jnp.zeros_like(v))

    # dyf = dy + 2*y*ds2 folded outside the kernel (see _bwd_s1_kernel)
    exts = {
        "c": (jnp.concatenate([dcc[...], zed(dcr[...], rgate)],
                              axis=0), None),
        "n": (jnp.concatenate([zed(dnc[...], ngate),
                               zed(dnr[...], _and(ngate, rgate))],
                              axis=0), ngate),
    }

    row = jax.lax.broadcasted_iota(jnp.int32, (rout, 1), 0)
    m_last = (row < rout - bq).astype(jnp.float32)
    ones_r = jnp.ones((rout, 1), jnp.float32)

    def term(src, shift, tap):
        dy_ext, hconst = exts[src]
        off = shift * bq
        wt = _wrow(w_ref, tap, k)
        out = jax.lax.dot_general(
            jax.lax.slice(dy_ext, (off, 0), (off + rout, n)),
            wt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        const = jax.lax.dot_general(
            ds1, wt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if hconst is not None:
            const = const * jnp.where(hconst, 1.0, 0.0)
        cmask = ones_r
        if shift == 1:
            cmask = jnp.where(j == nw - 1, m_last, ones_r)
        return out + cmask * const

    # taps are (dh, dw) indices into the 3x3 grid, row-major
    q00 = term("c", 0, 4)                       # w[1,1]
    q01 = term("c", 1, 3) + term("c", 0, 5)     # w[1,0], w[1,2]
    q10 = term("n", 0, 1) + term("c", 0, 7)     # w[0,1], w[2,1]
    q11 = (term("n", 1, 0) + term("n", 0, 2)    # w[0,0], w[0,2]
           + term("c", 1, 6) + term("c", 0, 8))  # w[2,0], w[2,2]

    def interleave(qa, qb):
        s = jnp.stack([qa.reshape(wc2, bq, k),
                       qb.reshape(wc2, bq, k)], axis=1)
        return s.reshape(rin, k)

    def emit(dx_ref, dg, xc_ref):
        if has_affine:
            _, gp, xf = _prologue(xc_ref[...], a_ref, b_ref, act)
            dz = dg * gp
            dx_ref[...] = (dz * a_ref[0, :]).astype(dt)
            da_ref[...] += jnp.sum(dz * xf, axis=0, keepdims=True)
            db_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
        else:
            dx_ref[...] = dg.astype(dt)

    emit(dx0_ref, interleave(q00, q01), xc1)    # input h-row 2i
    emit(dx1_ref, interleave(q10, q11), xc2)    # input h-row 2i+1

    # dW over this program's output chunk
    dyt = (dcc[...].astype(jnp.float32) + ds1).astype(dt)
    for dh in range(3):
        hgate = (i > 0) if dh == 0 else None
        lh = _g_of(xls[dh][...], a_ref, b_ref, act, has_affine,
                   _and(hgate, j > 0))
        ce = _g_of(xcs[dh][...], a_ref, b_ref, act, has_affine, hgate)
        g_ext = jnp.concatenate(
            [lh, ce, jnp.zeros((bq, k), ce.dtype)], axis=0)
        for dw in range(3):
            seg = jax.lax.slice(g_ext, (dw * bq, 0),
                                (dw * bq + 2 * rout, k))
            seg = seg.reshape(wc2, 2 * bq, k)[:, :bq, :].reshape(
                rout, k)
            tap = dh * 3 + dw
            dwf_ref[tap * k:(tap + 1) * k, :] += jax.lax.dot_general(
                seg, dyt, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _bwd_call(x2d, wflat, a, b, dyf, ds1,
              bq, hdim, wdim, stride, act, has_affine, im2col):
    k = x2d.shape[1]
    n = wflat.shape[1]
    nbq_in = x2d.shape[0] // bq
    nbq_out = dyf.shape[0] // bq

    def halo(arr_k, nbq, idx_fn):
        return pl.BlockSpec(
            (bq, arr_k),
            lambda i, j, f=idx_fn: (jnp.clip(f(i, j), 0, nbq - 1), 0))

    if stride == 1:
        wc = _chunk_cols(wdim, bq,
                         BLOCK_ROWS // 2 if im2col else BLOCK_ROWS)
        nw = wdim // wc
        rs = wc * bq
        in_specs, ins = [], []
        for arr, arr_k in ((x2d, k), (dyf, n)):
            for dh in range(3):
                def hh(i, d=dh):
                    return jnp.clip(i + d - 1, 0, hdim - 1)
                in_specs += [
                    halo(arr_k, nbq_in,
                         lambda i, j, d=dh: hh(i, d) * wdim
                         + j * wc - 1),
                    pl.BlockSpec(
                        (rs, arr_k),
                        lambda i, j, d=dh: (hh(i, d) * nw + j, 0)),
                    halo(arr_k, nbq_in,
                         lambda i, j, d=dh: hh(i, d) * wdim
                         + (j + 1) * wc),
                ]
                ins += [arr, arr, arr]
        grid = (hdim, nw)
        dx_spec = pl.BlockSpec((rs, k),
                               lambda i, j: (i * nw + j, 0))
        dx_shapes = [jax.ShapeDtypeStruct(x2d.shape, x2d.dtype)]
        kernel = functools.partial(_bwd_s1_kernel, bq, im2col, act,
                                   has_affine)
    else:
        h2, w2 = hdim // 2, wdim // 2
        wc2 = _chunk_cols(w2, bq, max(BLOCK_ROWS // 2, bq))
        nw = w2 // wc2
        rin = 2 * wc2 * bq
        rout = wc2 * bq
        in_specs, ins = [], []
        for dh in range(3):
            def hh(i, d=dh):
                return jnp.clip(2 * i + d - 1, 0, hdim - 1)
            in_specs += [
                halo(k, nbq_in,
                     lambda i, j, d=dh: hh(i, d) * wdim
                     + 2 * j * wc2 - 1),
                pl.BlockSpec((rin, k),
                             lambda i, j, d=dh: (hh(i, d) * nw + j, 0)),
            ]
            ins += [x2d, x2d]
        for e in (0, 1):            # output h-rows i and i+1
            def ho(i, eo=e):
                return jnp.clip(i + eo, 0, h2 - 1)
            in_specs += [
                pl.BlockSpec(
                    (rout, n),
                    lambda i, j, eo=e: (ho(i, eo) * nw + j, 0)),
                halo(n, nbq_out,
                     lambda i, j, eo=e: ho(i, eo) * w2
                     + (j + 1) * wc2),
            ]
            ins += [dyf, dyf]
        grid = (h2, nw)
        # dx comes out as two half-sized arrays (even / odd input
        # h-rows), interleaved below — each grid step owns one w-chunk
        # of both rows of its input h-row pair
        dx_spec = [
            pl.BlockSpec((rin, k), lambda i, j: (i * nw + j, 0)),
            pl.BlockSpec((rin, k), lambda i, j: (i * nw + j, 0)),
        ]
        half = jax.ShapeDtypeStruct((x2d.shape[0] // 2, k), x2d.dtype)
        dx_shapes = [half, half]
        kernel = functools.partial(_bwd_s2_kernel, bq, act,
                                   has_affine)

    in_specs += [
        pl.BlockSpec(wflat.shape, lambda i, j: (0, 0)),
        pl.BlockSpec((1, k), lambda i, j: (0, 0)),
        pl.BlockSpec((1, k), lambda i, j: (0, 0)),
        pl.BlockSpec((1, n), lambda i, j: (0, 0)),
    ]
    ins += [wflat, a, b, ds1]
    tail_specs = [
        pl.BlockSpec(wflat.shape, lambda i, j: (0, 0)),
        pl.BlockSpec((1, k), lambda i, j: (0, 0)),
        pl.BlockSpec((1, k), lambda i, j: (0, 0)),
    ]
    tail_shapes = [
        jax.ShapeDtypeStruct(wflat.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, k), jnp.float32),
        jax.ShapeDtypeStruct((1, k), jnp.float32),
    ]
    if stride == 1:
        out_specs = [dx_spec] + tail_specs
        out_shape = dx_shapes + tail_shapes
        res = pl.pallas_call(
            lambda *refs: kernel(refs), grid=grid, in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape,
            interpret=INTERPRET)(*ins)
        return res
    out_specs = dx_spec + tail_specs
    out_shape = dx_shapes + tail_shapes
    dx0, dx1, dwf, da, db = pl.pallas_call(
        lambda *refs: kernel(refs), grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        interpret=INTERPRET)(*ins)
    # dx0 holds the even input h-rows, dx1 the odd ones — interleave
    rrow = wdim * bq
    dx = jnp.stack([dx0.reshape(h2, rrow, k),
                    dx1.reshape(h2, rrow, k)], axis=1)
    return (dx.reshape(x2d.shape), dwf, da, db)


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
        # fold the row-scale statistics cotangent terms into one
        # array (a single fused XLA elementwise pass); the rank-1 ds1
        # constant stays a separate exact in-kernel broadcast (see
        # _bwd_s1_kernel)
        dyf = (dy.astype(jnp.float32)
               + y.astype(jnp.float32) * (2.0 * ds2)).astype(dy.dtype)
        dx, dwf, da, db = _bwd_call(
            x2d, wflat, a, b, dyf, ds1,
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
