"""Parity tests for the fused prologue+GEMM+stats kernels
(ops/pallas/packed_gemm.py) against plain-jnp reference math, in
Pallas interpret mode on CPU (the same kernels run compiled on TPU).

Reference math mirrors the flax ConvBN semantics the kernel fuses:
bf16 compute, f32 statistics of the bf16-rounded output, mish in the
reused-exp training form (models/layers.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_yolo_tpu.ops.pallas import packed_gemm


@pytest.fixture(autouse=True)
def _interpret():
    packed_gemm.set_interpret(True)
    yield
    packed_gemm.set_interpret(False)


def _mish(x):
    u = jnp.exp(jnp.minimum(x, jnp.asarray(20.0, x.dtype)))
    one = jnp.asarray(1.0, x.dtype)
    return x * (one - 2.0 / ((one + u) * (one + u) + one))


def _ref(xs, ws, affines, act):
    # kernel semantics: prologue in f32, cast to bf16 for the MXU
    acc = None
    for x, w, aff in zip(xs, ws, affines):
        x = x.astype(jnp.bfloat16)
        if aff is not None:
            a, b = aff
            z = (x.astype(jnp.float32) * a.reshape(1, -1)
                 + b.reshape(1, -1))
            x = (_mish(z) if act == "mish" else (
                jnp.where(z >= 0, z, z * 0.1)
                if act == "leaky" else z)).astype(jnp.bfloat16)
        part = jax.lax.dot(x, w.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    y = acc.astype(jnp.bfloat16)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=0, keepdims=True), \
        jnp.sum(yf * yf, axis=0, keepdims=True)


def _rand(key, shape, scale=0.5):
    return (jax.random.normal(key, shape, jnp.float32) * scale
            ).astype(jnp.bfloat16)


@pytest.mark.parametrize("act", ["mish", "leaky"])
@pytest.mark.parametrize("cfg", [
    # (M, Ks, N, pattern)
    (256, (128,), 128, (True,)),
    (256, (128,), 64, (False,)),
    (128, (128, 128), 256, (True, True)),
    (128, (256,), 128, (True,)),
])
def test_forward_matches_reference(act, cfg):
    m, ks, n, pattern = cfg
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 8)
    xs = [_rand(keys[i], (m, k)) for i, k in enumerate(ks)]
    ws = [_rand(keys[3 + i], (k, n), 0.1) for i, k in enumerate(ks)]
    affines = [
        ((jax.random.normal(keys[6], (1, k)) * 0.2 + 1.0),
         (jax.random.normal(keys[7], (1, k)) * 0.1))
        if p else None
        for k, p in zip(ks, pattern)]
    y, s1, s2 = packed_gemm.fused_gemm(xs, ws, affines, act=act,
                                       mblk_fwd=64, mblk_bwd=64)
    yr, s1r, s2r = _ref(xs, ws, affines, act)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yr, np.float32),
                               rtol=0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r),
                               rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("act", ["mish", "leaky"])
def test_grads_match_reference(act):
    m, ks, n = 128, (128, 128), 128
    pattern = (True, False)
    key = jax.random.PRNGKey(3)
    keys = jax.random.split(key, 8)
    xs = [_rand(keys[i], (m, k)) for i, k in enumerate(ks)]
    ws = [_rand(keys[2 + i], (k, n), 0.1) for i, k in enumerate(ks)]
    a = (jax.random.normal(keys[6], (1, ks[0])) * 0.2 + 1.0)
    b = jax.random.normal(keys[7], (1, ks[0])) * 0.1

    def loss_fused(xs, ws, a, b):
        y, s1, s2 = packed_gemm.fused_gemm(
            xs, ws, [(a, b), None], act=act, mblk_fwd=64, mblk_bwd=64)
        # touch all outputs incl. the stats (exercises the ds1/ds2
        # fold-back path through the recomputed y)
        return (jnp.sum(y.astype(jnp.float32) ** 2) * 1e-2
                + jnp.sum(s1 * 0.3) + jnp.sum(s2 * 0.05))

    def loss_ref(xs, ws, a, b):
        y, s1, s2 = _ref(xs, ws, [(a, b), None], act)
        return (jnp.sum(y.astype(jnp.float32) ** 2) * 1e-2
                + jnp.sum(s1 * 0.3) + jnp.sum(s2 * 0.05))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(xs, ws, a, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xs, ws, a, b)
    labels = ["dx0", "dx1", "dw0", "dw1", "da", "db"]
    flat_f = [*gf[0], *gf[1], gf[2], gf[3]]
    flat_r = [*gr[0], *gr[1], gr[2], gr[3]]
    for name, have, want in zip(labels, flat_f, flat_r):
        have = np.asarray(have, np.float32)
        want = np.asarray(want, np.float32)
        # global scale-aware metrics: elementwise-relative checks
        # explode on cancellation-tiny entries where bf16 rounding
        # noise is irreducible in BOTH implementations (measured
        # rel-L2 0.002-0.005 here)
        l2 = np.linalg.norm(have - want) / max(
            np.linalg.norm(want), 1e-9)
        mx = np.max(np.abs(have - want)) / max(
            np.max(np.abs(want)), 1e-9)
        assert l2 < 0.02, (name, l2)
        assert mx < 0.03, (name, mx)


def test_sum_decomposition_matches_concat():
    """Two-input fused GEMM == one GEMM over the channel concat —
    the concat-free formulation used for the CSP `out` convs."""
    m, k, n = 128, 128, 128
    key = jax.random.PRNGKey(9)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x1, x2 = _rand(k1, (m, k)), _rand(k2, (m, k))
    w = _rand(k3, (2 * k, n), 0.1)
    y, s1, s2 = packed_gemm.fused_gemm(
        [x1, x2], [w[:k], w[k:]], [None, None], act="mish",
        mblk_fwd=64, mblk_bwd=64)
    yr = jax.lax.dot(jnp.concatenate([x1, x2], axis=1), w,
                     preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yr, np.float32),
                               rtol=0, atol=1e-2)
