"""Microbench: the fused 9-tap Pallas 3x3 conv (ops/pallas/
packed_conv3x3.py) vs XLA's (normalize+mish materialize -> conv3x3 ->
stats) chain at the CSPDarknet early-stage shapes — forward AND full
train (value_and_grad) per layer.

Shapes probed (YOLOv4 @416, b128, batch-packed p=2):
  stage1-expand   208^2, 64ch packed -> [M=208*208*64, 128], stride 1
  stage1-down     416^2, 32->64ch packed (64->128 lanes), stride 2
  stage2-expand   104^2, 64ch packed, stride 1

Run on the TPU (the axon tunnel must be up):
  python tools/bench_packed_conv3x3_probe.py

The XLA side replicates what the BENCH_PACKED=2 region actually pays:
an explicit activate pass (producer normalize+mish), the packed conv,
and the channel-sum statistics with the custom-VJP fold
(models/packed_region.py _sums).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# The fused 3x3 kernels keep full-h-row f32 accumulators on the Mosaic
# stack; the default 16M scoped-vmem limit rejects them at 208^2x64.
# Raise per-compile (v5e has 128M VMEM) to probe kernel viability.
SCOPED_VMEM = os.environ.get("PROBE_SCOPED_VMEM", "65536")
OPTS = ({"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM}
        if SCOPED_VMEM else None)


def jit_opts(fn, *args):
    return jax.jit(fn).lower(*args).compile(compiler_options=OPTS)

from tf2_yolo_tpu.models.packed_region import (
    _block_diag, _sums, activate, rows_of, rows_to)
from tf2_yolo_tpu.ops.pallas.packed_conv3x3 import fused_conv3x3

STEPS = 10


def bench(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / STEPS * 1e3


def probe(name, bq, h, w, cin, cout, stride):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    kp, kq = 2 * cin, 2 * cout
    x2 = jax.device_put(
        jax.random.normal(k1, (h * w * bq, kp), jnp.bfloat16) * 0.1)
    wk = jax.device_put(
        jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.05)
    a = jax.device_put(jnp.ones((1, kp), jnp.float32))
    b = jax.device_put(jnp.zeros((1, kp), jnp.float32))
    cy = jax.device_put(jnp.full(
        ((h // stride) * (w // stride) * bq, kq), 1e-4, jnp.bfloat16))

    def pallas_fwd(x2, wk, a, b):
        w2 = _block_diag(wk).astype(jnp.bfloat16)
        return fused_conv3x3(x2, w2, (a, b), spatial=(bq, h, w),
                             stride=stride, act="mish")

    def pallas_train(x2, wk, a, b):
        def loss(args):
            x2, wk, a, b = args
            w2 = _block_diag(wk).astype(jnp.bfloat16)
            y, s1, s2 = fused_conv3x3(
                x2, w2, (a, b), spatial=(bq, h, w), stride=stride,
                act="mish")
            return (jnp.sum((y * cy).astype(jnp.float32))
                    + jnp.sum(s1) * 1e-4 + jnp.sum(s2) * 1e-5)
        return jax.value_and_grad(loss)((x2, wk, a, b))

    def _xla_fwd(x2, wk, a, b):
        g = activate(x2, (a, b), "mish", jnp.bfloat16)
        g4 = rows_to(g, bq, h, w)
        w2 = _block_diag(wk).astype(jnp.bfloat16)
        if stride == 2:
            g4 = jnp.pad(g4, ((0, 0), (1, 0), (1, 0), (0, 0)))
            pad = "VALID"
        else:
            pad = "SAME"
        y = jax.lax.conv_general_dilated(
            g4, w2, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        s1, s2 = _sums(y)
        return rows_of(y), s1, s2

    xla_fwd = jit_opts(_xla_fwd, x2, wk, a, b)

    def xla_train(x2, wk, a, b):
        def loss(args):
            y, s1, s2 = _xla_fwd(*args)
            return (jnp.sum((y * cy).astype(jnp.float32))
                    + jnp.sum(s1) * 1e-4 + jnp.sum(s2) * 1e-5)
        return jax.value_and_grad(loss)((x2, wk, a, b))

    pallas_fwd = jit_opts(pallas_fwd, x2, wk, a, b)
    pallas_train = jit_opts(pallas_train, x2, wk, a, b)
    xla_train = jit_opts(xla_train, x2, wk, a, b)
    t_pf = bench(pallas_fwd, x2, wk, a, b)
    t_xf = bench(xla_fwd, x2, wk, a, b)
    t_pt = bench(pallas_train, x2, wk, a, b)
    t_xt = bench(xla_train, x2, wk, a, b)
    print(f"{name:16s} fwd pallas {t_pf:7.2f}  xla {t_xf:7.2f}  "
          f"ratio {t_pf / t_xf:.2f} | train pallas {t_pt:7.2f}  "
          f"xla {t_xt:7.2f}  ratio {t_pt / t_xt:.2f}")


def probe_stem(bq=64, h=416, w=416, cout=32):
    """Pallas im2col stem on the packed image vs the real alternative:
    unpacked XLA conv (3ch) + stats + pack transpose of the output."""
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    ximg = jax.device_put(
        jax.random.normal(k1, (2 * bq, h, w, 3), jnp.bfloat16))
    wk = jax.device_put(
        jax.random.normal(k2, (3, 3, 3, cout), jnp.float32) * 0.05)
    cy = jax.device_put(jnp.full(
        (h * w * bq, 2 * cout), 1e-4, jnp.bfloat16))

    from tf2_yolo_tpu.models.packed_region import pack_batch

    def pallas_train(ximg, wk):
        def loss(args):
            ximg, wk = args
            x2 = rows_of(pack_batch(ximg))
            w2 = _block_diag(wk).astype(jnp.bfloat16)
            y, s1, s2 = fused_conv3x3(
                x2, w2, None, spatial=(bq, h, w), stride=1,
                act="mish", im2col=True)
            return (jnp.sum((y * cy).astype(jnp.float32))
                    + jnp.sum(s1) * 1e-4 + jnp.sum(s2) * 1e-5)
        return jax.value_and_grad(loss)((ximg, wk))

    def xla_train(ximg, wk):
        def loss(args):
            ximg, wk = args
            y = jax.lax.conv_general_dilated(
                ximg, wk.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            s1, s2 = _sums(y)
            yp = rows_of(pack_batch(y))   # feed downstream packed
            return (jnp.sum((yp * cy).astype(jnp.float32))
                    + jnp.sum(s1) * 1e-4 + jnp.sum(s2) * 1e-5)
        return jax.value_and_grad(loss)((ximg, wk))

    pallas_train = jit_opts(pallas_train, ximg, wk)
    xla_train = jit_opts(xla_train, ximg, wk)
    t_p = bench(pallas_train, ximg, wk)
    t_x = bench(xla_train, ximg, wk)
    print(f"{'stem-im2col':16s} train pallas {t_p:7.2f}  "
          f"xla+pack {t_x:7.2f}  ratio {t_p / t_x:.2f}")


def main():
    import sys
    print(f"device={jax.devices()[0]}", flush=True)
    which = set(sys.argv[1:]) or {"s1e", "s1d", "s2e", "stem"}
    if "s1e" in which:
        probe("stage1-expand", 64, 208, 208, 64, 64, 1)
    if "s1d" in which:
        probe("stage1-down", 64, 416, 416, 32, 64, 2)
    if "s1d4" in which:
        # the in-model p=4 shape (P3CSPStage.p_down): bq=B/4, dense
        # 128-lane input rows, 256-lane output
        probe("stage1-down-p4", 32, 416, 416, 64, 128, 2)
    if "s2e" in which:
        probe("stage2-expand", 64, 104, 104, 64, 64, 1)
    if "stem" in which:
        probe_stem()


if __name__ == "__main__":
    main()
