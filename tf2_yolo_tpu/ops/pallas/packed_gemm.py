"""Fused prologue+1x1conv+BN-statistics GEMM kernels (Pallas TPU).

The round-2/3 ablations (BASELINE.md) pinned the exact-gradient train
gap on the BatchNorm *normalize* pass: XLA fuses the stat reduction
into its conv epilogues but always materializes normalize+activation
as a separate elementwise pass (one extra HBM read+write of every
early-stage activation per direction). These kernels remove that pass
for the 1x1 convolutions of the low-channel backbone stages by fusing
the *previous* layer's BN affine + activation into the GEMM's input
read (the prologue XLA never builds), and this layer's raw-output
channel sums into its epilogue.

Layout: callers present activations as 2D row matrices [M, K] whose
lane (last) dimension is the *packed* channel axis — for C below the
128-lane width, two batch images are folded side by side
([B,H,W,C] -> [B/2,H,W,2C], a batch->channel transpose), so C=64
fills the lanes exactly. Weights arrive block-diagonally expanded
([[w,0],[0,w]]): 2x nominal FLOPs, which is free at these layers'
~8:1 bandwidth:FLOP ratios (measured: fused GEMM 3.0 ms vs XLA
conv+BN+mish chain 5.3 ms per stage1-shaped layer —
tools/bench_packed_probe.py).

The convolution itself is exact (1x1 convs are channel GEMMs; the
packing is a relabeling of the batch axis). Multiple inputs express
channel-concat fusions (y = sum_i g_i(x_i) @ w_i) without ever
materializing the concat.

Backward (custom VJP) is a single fused kernel per layer that reads
only {x_i, dy}: it recomputes the prologue and the raw output y
in-VMEM (GPipe-style recompute, MXU FLOPs are not the bottleneck
here), folds the statistics cotangents (ds1 + 2*y*ds2) into dy, and
emits dx_i plus the dW_i / d(affine) reductions as epilogue
accumulations across the sequential grid — 2 reads + 1 write per
layer-direction where XLA's BN-train backward needs ~4-6 passes.

No reference counterpart: the reference delegates all of this to
TF's stock kernels (SURVEY.md §2.2); the fusion map is this repo's
own profiling (tools/parse_tpu_profile.py round-3 capture: the
208^2x64 stage alone is 72 ms of the 282 ms step).
"""

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Interpret mode for CPU tests (set by tests/conftest or call sites).
INTERPRET = False


def set_interpret(on):
    global INTERPRET
    INTERPRET = bool(on)


def _act_and_grad(z, act):
    """Activation value and derivative. Called in f32: the analytic
    bf16 derivative diverges up to ~20%% pointwise from autodiff's
    bf16 rounding chain (measured), so the prologue runs in f32 and
    casts down only for the MXU — a strictly tighter rounding than
    the flax path's bf16 mish, at pure-VPU cost (+4%% on the fused
    layer, tools/bench_packed_probe.py). Mish uses the reused-exp
    training form (models/layers.py mish)."""
    if act == "mish":
        one = jnp.asarray(1.0, z.dtype)
        two = jnp.asarray(2.0, z.dtype)
        u = jnp.exp(jnp.minimum(z, jnp.asarray(20.0, z.dtype)))
        d = (one + u) * (one + u) + one
        c = one - two / d
        g = z * c
        # dg/dz = c + z * (2/d^2) * 2(1+u)u   (u clamped: beyond the
        # clamp c is constant and the derivative correctly tends to c)
        gp = c + z * (two / (d * d)) * (two * (one + u) * u)
        return g, gp
    if act == "leaky":
        slope = jnp.asarray(0.1, z.dtype)
        return (jnp.where(z >= 0, z, z * slope),
                jnp.where(z >= 0, jnp.asarray(1.0, z.dtype), slope))
    if act == "linear":
        return z, jnp.ones_like(z)
    raise ValueError(f"unsupported packed-gemm activation: {act!r}")


def _prologue(x, a, b, act):
    """f32 prologue: returns (g in x.dtype for the MXU, gp_f32,
    x_f32)."""
    xf = x.astype(jnp.float32)
    z = xf * a[0, :] + b[0, :]
    g, gp = _act_and_grad(z, act)
    return g.astype(x.dtype), gp, xf


def _pick_mblk(m, preferred):
    for cand in (preferred, 8192, 4096, 2048, 1024, 512, 256, 128, 64,
                 32, 16, 8, 4, 2, 1):
        if cand <= preferred and m % cand == 0:
            return cand
    raise ValueError(f"M={m} has no usable row-block divisor")


# ---------------------------------------------------------------- fwd

def _fwd_kernel(nx, pattern, act, x_and_params_refs):
    refs = list(x_and_params_refs)
    xs = refs[:nx]
    ws = refs[nx:2 * nx]
    aas = refs[2 * nx:3 * nx]
    bbs = refs[3 * nx:4 * nx]
    y_ref, s1_ref, s2_ref = refs[4 * nx:]

    acc = None
    for i in range(nx):
        x = xs[i][...]
        if pattern[i]:
            x, _, _ = _prologue(x, aas[i], bbs[i], act)
        part = jax.lax.dot(x, ws[i][...],
                           preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    yb = acc.astype(y_ref.dtype)
    y_ref[...] = yb

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    # statistics of the STORED (bf16-rounded) output, like flax's
    # f32 stats over the bf16 activation
    yf = yb.astype(jnp.float32)
    s1_ref[...] += jnp.sum(yf, axis=0, keepdims=True)
    s2_ref[...] += jnp.sum(yf * yf, axis=0, keepdims=True)


def _fwd_call(xs, ws, aas, bbs, pattern, act, mblk):
    nx = len(xs)
    m = xs[0].shape[0]
    n = ws[0].shape[1]
    mb = _pick_mblk(m, mblk)
    grid = (m // mb,)
    in_specs = (
        [pl.BlockSpec((mb, x.shape[1]), lambda i: (i, 0)) for x in xs]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in ws]
        + [pl.BlockSpec((1, a.shape[1]), lambda i: (0, 0)) for a in aas]
        + [pl.BlockSpec((1, b.shape[1]), lambda i: (0, 0)) for b in bbs]
    )
    out_specs = [
        pl.BlockSpec((mb, n), lambda i: (i, 0)),
        pl.BlockSpec((1, n), lambda i: (0, 0)),
        pl.BlockSpec((1, n), lambda i: (0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, n), xs[0].dtype),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
    ]
    kernel = lambda *refs: _fwd_kernel(nx, pattern, act, refs)
    y, s1, s2 = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=INTERPRET,
    )(*xs, *ws, *aas, *bbs)
    return y, s1, s2


# ---------------------------------------------------------------- bwd

def _bwd_kernel(nx, pattern, act, refs):
    refs = list(refs)
    xs = refs[:nx]
    ws = refs[nx:2 * nx]
    aas = refs[2 * nx:3 * nx]
    bbs = refs[3 * nx:4 * nx]
    dy_ref, ds1_ref, ds2_ref = refs[4 * nx:4 * nx + 3]
    outs = refs[4 * nx + 3:]
    dx_refs = outs[:nx]
    dw_refs = outs[nx:2 * nx]
    da_refs = outs[2 * nx:3 * nx]
    db_refs = outs[3 * nx:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (*dw_refs, *da_refs, *db_refs):
            r[...] = jnp.zeros_like(r)

    # recompute prologues and the raw output y (bf16-rounded, matching
    # the forward's stored value) to fold the statistics cotangents
    gs, gps, raw = [], [], []
    acc = None
    for i in range(nx):
        x = xs[i][...]
        if pattern[i]:
            g, gp, xf = _prologue(x, aas[i], bbs[i], act)
        else:
            g, gp, xf = x, None, None
        gs.append(g)
        gps.append(gp)
        raw.append(xf)
        part = jax.lax.dot(g, ws[i][...],
                           preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    dt = xs[0].dtype
    y_b = acc.astype(dt)
    yf = y_b.astype(jnp.float32)

    # The total output cotangent is dyt = dy + ds1 + 2*y*ds2. For the
    # dg GEMMs it is decomposed per term so each rounds to bf16 at its
    # own scale (a single pre-rounded sum lets the constant ds1 term
    # swamp small dy entries — measured 30% relative error on dx):
    #   dg = dy @ w^T + (y * 2ds2) @ w^T + (ds1 @ w^T)  [row constant]
    dy_b = dy_ref[...]
    yds2 = (y_b * (2.0 * ds2_ref[...]).astype(dt))
    dyt_b = (dy_b.astype(jnp.float32)
             + ds1_ref[...] + 2.0 * yf * ds2_ref[...]
             ).astype(dt)              # for the (robust) dW GEMM

    for i in range(nx):
        # dg_i = dyt @ w_i^T   (contract over N), f32, term-split
        dg = (jax.lax.dot_general(
                  dy_b, ws[i][...], (((1,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(
                  yds2, ws[i][...], (((1,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(
                  ds1_ref[...].astype(dt), ws[i][...],
                  (((1,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32))
        if pattern[i]:
            dz = dg * gps[i]
            dx_refs[i][...] = (dz * aas[i][0, :]).astype(dt)
            da_refs[i][...] += jnp.sum(dz * raw[i], axis=0,
                                       keepdims=True)
            db_refs[i][...] += jnp.sum(dz, axis=0, keepdims=True)
        else:
            dx_refs[i][...] = dg.astype(dt)
        # dW_i = g_i^T @ dyt   (contract over rows)
        dw_refs[i][...] += jax.lax.dot_general(
            gs[i], dyt_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _bwd_call(xs, ws, aas, bbs, dy, ds1, ds2, pattern, act, mblk):
    nx = len(xs)
    m = xs[0].shape[0]
    n = ws[0].shape[1]
    mb = _pick_mblk(m, mblk)
    grid = (m // mb,)
    in_specs = (
        [pl.BlockSpec((mb, x.shape[1]), lambda i: (i, 0)) for x in xs]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in ws]
        + [pl.BlockSpec((1, a.shape[1]), lambda i: (0, 0)) for a in aas]
        + [pl.BlockSpec((1, b.shape[1]), lambda i: (0, 0)) for b in bbs]
        + [pl.BlockSpec((mb, n), lambda i: (i, 0)),
           pl.BlockSpec((1, n), lambda i: (0, 0)),
           pl.BlockSpec((1, n), lambda i: (0, 0))]
    )
    out_specs = (
        [pl.BlockSpec((mb, x.shape[1]), lambda i: (i, 0)) for x in xs]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in ws]
        + [pl.BlockSpec((1, a.shape[1]), lambda i: (0, 0)) for a in aas]
        + [pl.BlockSpec((1, b.shape[1]), lambda i: (0, 0)) for b in bbs]
    )
    out_shape = (
        [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in xs]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in aas]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bbs]
    )
    kernel = lambda *refs: _bwd_kernel(nx, pattern, act, refs)
    outs = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=INTERPRET,
    )(*xs, *ws, *aas, *bbs, dy, ds1, ds2)
    dxs = tuple(outs[:nx])
    dws = tuple(outs[nx:2 * nx])
    das = tuple(outs[2 * nx:3 * nx])
    dbs = tuple(outs[3 * nx:])
    return dxs, dws, das, dbs


# ----------------------------------------------------------- wrapper

@functools.lru_cache(maxsize=None)
def _build(nx, pattern, act, mblk_fwd, mblk_bwd):
    @jax.custom_vjp
    def f(xs, ws, aas, bbs):
        return _fwd_call(list(xs), list(ws), list(aas), list(bbs),
                         pattern, act, mblk_fwd)

    def fwd(xs, ws, aas, bbs):
        out = f(xs, ws, aas, bbs)
        return out, (xs, ws, aas, bbs)

    def bwd(res, cts):
        xs, ws, aas, bbs = res
        dy, ds1, ds2 = cts
        dxs, dws, das, dbs = _bwd_call(
            list(xs), list(ws), list(aas), list(bbs),
            dy, ds1, ds2, pattern, act, mblk_bwd)
        # cotangent dtypes must match the (bf16) primals; the inner
        # accumulations were f32, so this is one final rounding —
        # the same boundary rounding a bf16 flax conv's grads pay at
        # the param-cast VJP.
        cast = lambda ts, ps: tuple(
            t.astype(p.dtype) for t, p in zip(ts, ps))
        return (cast(dxs, xs), cast(dws, ws),
                cast(das, aas), cast(dbs, bbs))

    f.defvjp(fwd, bwd)
    return f


def fused_gemm(xs: Sequence[jnp.ndarray],
               ws: Sequence[jnp.ndarray],
               affines: Sequence[Optional[Tuple[jnp.ndarray,
                                                jnp.ndarray]]],
               act: str = "mish",
               mblk_fwd: int = 8192,
               mblk_bwd: int = 2048,
               dtype=jnp.bfloat16):
    """y = sum_i prologue_i(x_i) @ w_i, plus channel sums of y.

    xs:      [M, K_i] bf16 row matrices (lane dim = packed channels).
    ws:      [K_i, N] bf16 weights (block-diag-expanded by the caller).
    affines: per input, None (consume as-is) or (a, b) with shape
             [1, K_i] — prologue ``act(x*a + b)``.
    act:     "mish" | "leaky" | "linear" — activation inside every
             non-None prologue.

    Returns (y [M,N] bf16, s1 [1,N] f32, s2 [1,N] f32) where s1/s2 are
    the column sums of y and y*y over all M rows (BN statistics
    numerators; the caller divides and folds packed groups).
    Differentiable via a fused custom VJP (see module docstring).
    """
    nx = len(xs)
    # A 3-term 128-lane sum-GEMM bwd (P3 stage2 'post') measured
    # 24.78 MB of scoped VMEM at mblk 2048 — marginally over the
    # 24 MB compile budget; halve the row block for that class. The
    # wider-lane many-term stages (PACKED=1 stages 3-5, k>=256, up to
    # 9 terms) compile and were measured end-to-end at 2048 — leave
    # them alone.
    if nx >= 3 and mblk_bwd >= 2048 and max(
            x.shape[1] for x in xs) <= 128:
        mblk_bwd = 1024
    pattern = tuple(a is not None for a in affines)
    aas, bbs = [], []
    for i, a in enumerate(affines):
        k = xs[i].shape[1]
        if a is None:
            aas.append(jnp.ones((1, k), jnp.float32))
            bbs.append(jnp.zeros((1, k), jnp.float32))
        else:
            aas.append(a[0].reshape(1, k).astype(jnp.float32))
            bbs.append(a[1].reshape(1, k).astype(jnp.float32))
    f = _build(nx, pattern, act, mblk_fwd, mblk_bwd)
    return f(tuple(x.astype(dtype) for x in xs),
             tuple(w.astype(dtype) for w in ws),
             tuple(aas), tuple(bbs))
