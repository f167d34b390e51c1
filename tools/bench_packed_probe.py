"""Microbench: Pallas batch-packed fused (normalize+mish+1x1conv+stats)
GEMM vs XLA's (conv1x1 + BN-train + mish) chain at the stage1 shape
(208^2, 64 ch, b128, bf16).

Packing: [B,H,W,C] -> [H*W*B/2, 2C] rows (two batch elements per lane
row), so C=64 fills the 128 lanes exactly. Weights become the
block-diagonal [[w,0],[0,w]] (2x nominal FLOPs; these layers are ~8:1
bandwidth-bound so the MXU padding is free). The kernel applies the
previous layer's BN affine + mish on the INPUT READ (the prologue XLA
never fuses into its convs) and accumulates this layer's raw-output
channel sums in the epilogue (which XLA does fuse).

Per-layer HBM traffic: fused = 1 read + 1 write; XLA = 2 reads +
2 writes (conv pass + normalize/mish pass).

MEASURED (TPU v5e, 2026-08-18, quiet box):
  fused pallas  3.01-3.21 ms/layer (~470 GB/s effective)  MBLK 8192
  xla chain     5.20-5.30 ms/layer
  ratio 0.57-0.61; MBLK 16384 OOMs scoped vmem (16M limit).
Also probed: running the SAME conv+BN+mish chain entirely in XLA on
batch->channel packed tensors ([32,H,W,4C], block-diag weights) is
SLOWER than unpacked XLA (1.10x @1x1 C64, 1.22x @3x3 C64, 1.31x
@3x3 C32) — XLA's early convs are not purely lane-starved; the win
comes from the eliminated normalize pass, so only the Pallas fused
layers should use the packed form (ops/pallas/packed_gemm.py), with
3x3/stride-2 staying on XLA.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 128, 208, 208, 64
M = H * W * (B // 2)        # rows after packing
MBLK = 2048
NLAYERS = 4
STEPS = 20


def fused_kernel(x_ref, w_ref, a_ref, b_ref, y_ref, s1_ref, s2_ref):
    # prologue: previous layer's BN affine + mish, fused into the read
    x = x_ref[...].astype(jnp.float32)
    x = x * a_ref[...] + b_ref[...]
    u = jnp.exp(jnp.minimum(x, 20.0))
    x = x * (1.0 - 2.0 / ((1.0 + u) * (1.0 + u) + 1.0))
    y = jax.lax.dot(x.astype(jnp.bfloat16), w_ref[...],
                    preferred_element_type=jnp.float32)
    y_ref[...] = y.astype(jnp.bfloat16)
    # epilogue: raw-output channel sums for this layer's BN stats
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s1_ref[...] += jnp.sum(y, axis=0, keepdims=True)
    s2_ref[...] += jnp.sum(y * y, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=())
def fused_chain(x, ws, aas, bbs):
    s1 = s2 = None
    for w, a, b in zip(ws, aas, bbs):
        x, s1, s2 = pl.pallas_call(
            fused_kernel,
            grid=(M // MBLK,),
            in_specs=[
                pl.BlockSpec((MBLK, 128), lambda i: (i, 0)),
                pl.BlockSpec((128, 128), lambda i: (0, 0)),
                pl.BlockSpec((1, 128), lambda i: (0, 0)),
                pl.BlockSpec((1, 128), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((MBLK, 128), lambda i: (i, 0)),
                pl.BlockSpec((1, 128), lambda i: (0, 0)),
                pl.BlockSpec((1, 128), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((M, 128), jnp.bfloat16),
                jax.ShapeDtypeStruct((1, 128), jnp.float32),
                jax.ShapeDtypeStruct((1, 128), jnp.float32),
            ],
        )(x, w, a, b)
    return x, s1, s2


@jax.jit
def xla_chain(x, ws, scales, biases):
    # x: NHWC. Each layer: conv1x1 -> train-BN stats -> normalize+mish
    s1 = s2 = None
    for w, sc, bi in zip(ws, scales, biases):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        m = jnp.mean(y, axis=(0, 1, 2))
        v = jnp.mean(y * y, axis=(0, 1, 2)) - m * m
        yn = (y - m) * jax.lax.rsqrt(v + 1e-3) * sc + bi
        u = jnp.exp(jnp.minimum(yn, 20.0))
        x = (yn * (1.0 - 2.0 / ((1.0 + u) * (1.0 + u) + 1.0))
             ).astype(jnp.bfloat16)
        s1, s2 = m, v
    return x, s1, s2


def bench(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[-1])
    return (time.perf_counter() - t0) / STEPS * 1e3


def main():
    key = jax.random.PRNGKey(0)
    print(f"device={jax.devices()[0]}  shape b{B} {H}x{W}x{C} "
          f"packed M={M}")
    xp = jax.device_put(
        jax.random.normal(key, (M, 128), jnp.bfloat16) * 0.1)
    w1 = [np.asarray(jax.random.normal(jax.random.PRNGKey(i),
                                       (C, C), jnp.float32)) * 0.05
          for i in range(NLAYERS)]
    ws = [jax.device_put(jnp.asarray(np.block(
        [[w, np.zeros_like(w)], [np.zeros_like(w), w]]),
        ).astype(jnp.bfloat16)) for w in w1]
    aas = [jax.device_put(jnp.ones((1, 128), jnp.float32))
           for _ in range(NLAYERS)]
    bbs = [jax.device_put(jnp.zeros((1, 128), jnp.float32))
           for _ in range(NLAYERS)]
    t_fused = bench(fused_chain, xp, ws, aas, bbs)

    xn = jax.device_put(
        jax.random.normal(key, (B, H, W, C), jnp.bfloat16) * 0.1)
    wsx = [jax.device_put(jnp.asarray(w)[None, None].astype(
        jnp.bfloat16)) for w in w1]
    scs = [jax.device_put(jnp.ones((C,), jnp.float32))
           for _ in range(NLAYERS)]
    bis = [jax.device_put(jnp.zeros((C,), jnp.float32))
           for _ in range(NLAYERS)]
    t_xla = bench(xla_chain, xn, wsx, scs, bis)

    gb = M * 128 * 2 * 2 / 1e9   # read+write bf16 per layer
    print(f"fused pallas: {t_fused:7.2f} ms total, "
          f"{t_fused/NLAYERS:6.2f} ms/layer "
          f"({gb/(t_fused/NLAYERS)*1e3:6.0f} GB/s eff)")
    print(f"xla chain:    {t_xla:7.2f} ms total, "
          f"{t_xla/NLAYERS:6.2f} ms/layer")
    print(f"ratio fused/xla = {t_fused/t_xla:.2f}")


if __name__ == "__main__":
    main()
