"""Parity for the fused 3x3 Pallas kernels (ops/pallas/packed_conv3x3)
against a pure-XLA oracle of the same math: prologue (producer BN
affine + activation) -> 3x3 conv (SAME, or darknet stride-2 top/left
pad + VALID) -> raw output + channel sums. Runs in f32 interpret mode
on CPU, so differences are summation order only."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_yolo_tpu.models.packed_region import rows_of, rows_to
from tf2_yolo_tpu.ops.pallas import packed_conv3x3


@pytest.fixture(autouse=True)
def interpret_mode():
    packed_conv3x3.set_interpret(True)
    yield
    packed_conv3x3.set_interpret(False)


def _act(z, act):
    if act == "mish":
        u = jnp.exp(jnp.minimum(z, 20.0))
        return z * (1.0 - 2.0 / ((1.0 + u) * (1.0 + u) + 1.0))
    if act == "leaky":
        return jnp.where(z >= 0, z, z * 0.1)
    return z


def _oracle(x4, w, affine, stride, act):
    """Same math on 4D tensors with stock XLA ops."""
    if affine is not None:
        a, b = affine
        g = _act(x4.astype(jnp.float32) * a.reshape(-1)
                 + b.reshape(-1), act).astype(x4.dtype)
    else:
        g = x4
    if stride == 2:
        g = jnp.pad(g, ((0, 0), (1, 0), (1, 0), (0, 0)))
        padding = "VALID"
    else:
        padding = "SAME"
    y = jax.lax.conv_general_dilated(
        g, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    yf = y.astype(jnp.float32)
    s1 = jnp.sum(yf, axis=(0, 1, 2)).reshape(1, -1)
    s2 = jnp.sum(yf * yf, axis=(0, 1, 2)).reshape(1, -1)
    return y, s1, s2


def _setup(bq=2, h=8, w=8, k=4, n=6, has_affine=True, seed=0):
    rng = np.random.RandomState(seed)
    x4 = jnp.asarray(rng.randn(bq, h, w, k) * 0.5, jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, k, n) * 0.3, jnp.float32)
    if has_affine:
        affine = (jnp.asarray(rng.rand(1, k) + 0.5, jnp.float32),
                  jnp.asarray(rng.randn(1, k) * 0.2, jnp.float32))
    else:
        affine = None
    return x4, wk, affine


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("act", ["mish", "leaky"])
@pytest.mark.parametrize("has_affine", [True, False])
def test_forward_matches_oracle(stride, act, has_affine):
    bq, h, w, k, n = 2, 8, 6, 4, 6
    x4, wk, affine = _setup(bq, h, w, k, n, has_affine)
    y_ref, s1_ref, s2_ref = _oracle(x4, wk, affine, stride, act)
    y2, s1, s2 = packed_conv3x3.fused_conv3x3(
        rows_of(x4), wk, affine, spatial=(bq, h, w), stride=stride,
        act=act, dtype=jnp.float32)
    y4 = rows_to(y2, bq, h // stride, w // stride)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("act", ["mish", "leaky"])
@pytest.mark.parametrize("has_affine", [True, False])
def test_grads_match_oracle(stride, act, has_affine):
    bq, h, w, k, n = 2, 6, 8, 4, 6
    x4, wk, affine = _setup(bq, h, w, k, n, has_affine, seed=1)
    rng = np.random.RandomState(2)
    cy = jnp.asarray(rng.randn(bq, h // stride, w // stride, n),
                     jnp.float32)
    c1 = jnp.asarray(rng.randn(1, n), jnp.float32)
    c2 = jnp.asarray(rng.randn(1, n) * 0.1, jnp.float32)

    def loss_kernel(x4, wk, a, b):
        aff = (a, b) if has_affine else None
        y2, s1, s2 = packed_conv3x3.fused_conv3x3(
            rows_of(x4), wk, aff, spatial=(bq, h, w), stride=stride,
            act=act, dtype=jnp.float32)
        y4 = rows_to(y2, bq, h // stride, w // stride)
        return (jnp.sum(y4 * cy) + jnp.sum(s1 * c1)
                + jnp.sum(s2 * c2))

    def loss_oracle(x4, wk, a, b):
        aff = (a, b) if has_affine else None
        y, s1, s2 = _oracle(x4, wk, aff, stride, act)
        return (jnp.sum(y * cy) + jnp.sum(s1 * c1)
                + jnp.sum(s2 * c2))

    a0 = (affine[0] if has_affine
          else jnp.ones((1, k), jnp.float32))
    b0 = (affine[1] if has_affine
          else jnp.zeros((1, k), jnp.float32))
    args = (x4, wk, a0, b0)
    lk = jax.value_and_grad(loss_kernel, argnums=(0, 1, 2, 3))
    lo = jax.value_and_grad(loss_oracle, argnums=(0, 1, 2, 3))
    vk, gk = lk(*args)
    vo, go = lo(*args)
    np.testing.assert_allclose(float(vk), float(vo), rtol=1e-5)
    names = ["dx", "dw", "da", "db"]
    for name, a, b in zip(names, gk, go):
        if not has_affine and name in ("da", "db"):
            continue
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        assert l2 < 1e-5, (name, l2, stride, act)


def test_stride1_rectangular_and_bigger_batch():
    bq, h, w, k, n = 4, 10, 6, 8, 4
    x4, wk, affine = _setup(bq, h, w, k, n, True, seed=3)
    y_ref, s1_ref, s2_ref = _oracle(x4, wk, affine, 1, "mish")
    y2, s1, s2 = packed_conv3x3.fused_conv3x3(
        rows_of(x4), wk, affine, spatial=(bq, h, w), stride=1,
        act="mish", dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(rows_to(y2, bq, h, w)), np.asarray(y_ref),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("has_affine", [True, False])
def test_im2col_forward_and_grads_match(has_affine):
    """Small-K im2col mode (the stem's shape class): one wide dot per
    direction must equal the oracle exactly like the 9-dot path."""
    bq, h, w, k, n = 2, 6, 8, 6, 8
    x4, wk, affine = _setup(bq, h, w, k, n, has_affine, seed=4)
    y_ref, s1_ref, s2_ref = _oracle(x4, wk, affine, 1, "mish")
    y2, s1, s2 = packed_conv3x3.fused_conv3x3(
        rows_of(x4), wk, affine, spatial=(bq, h, w), stride=1,
        act="mish", im2col=True, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(rows_to(y2, bq, h, w)), np.asarray(y_ref),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2_ref),
                               rtol=1e-5, atol=1e-5)

    rng = np.random.RandomState(5)
    cy = jnp.asarray(rng.randn(bq, h, w, n), jnp.float32)
    c1 = jnp.asarray(rng.randn(1, n), jnp.float32)
    c2 = jnp.asarray(rng.randn(1, n) * 0.1, jnp.float32)

    def loss_kernel(x4, wk, a, b):
        aff = (a, b) if has_affine else None
        y2, s1, s2 = packed_conv3x3.fused_conv3x3(
            rows_of(x4), wk, aff, spatial=(bq, h, w), stride=1,
            act="mish", im2col=True, dtype=jnp.float32)
        return (jnp.sum(rows_to(y2, bq, h, w) * cy)
                + jnp.sum(s1 * c1) + jnp.sum(s2 * c2))

    def loss_oracle(x4, wk, a, b):
        aff = (a, b) if has_affine else None
        y, s1, s2 = _oracle(x4, wk, aff, 1, "mish")
        return (jnp.sum(y * cy) + jnp.sum(s1 * c1)
                + jnp.sum(s2 * c2))

    a0 = affine[0] if has_affine else jnp.ones((1, k), jnp.float32)
    b0 = affine[1] if has_affine else jnp.zeros((1, k), jnp.float32)
    args = (x4, wk, a0, b0)
    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(*args)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(*args)
    for name, a, b in zip(["dx", "dw", "da", "db"], gk, go):
        if not has_affine and name in ("da", "db"):
            continue
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        assert l2 < 1e-5, (name, l2)
