"""Fused Pallas conv+BN-statistics kernels vs the XLA reference, and
the ConvBN fused path vs the stock flax path (same parameter tree).

On CPU the kernels run in interpret mode — same code path as TPU
minus Mosaic lowering (the TPU timings live in BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_yolo_tpu.ops.pallas.conv_bn_kernel import (
    conv1x1_stats, conv3x3_stats, conv_stats_ref)
from tf2_yolo_tpu.models.layers import ConvBN

rng = np.random.RandomState(0)


def _assert_close(got, want, rtol, atol, msg):
    for g, w, tag in zip(got, want, ["y", "s1", "s2"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=rtol, atol=atol,
                                   err_msg=f"{msg}/{tag}")


@pytest.mark.parametrize("n,h,w,ci,co", [
    (2, 8, 8, 16, 32),
    (3, 7, 5, 8, 8),        # uneven M: last-tile masking
    (2, 13, 13, 16, 8),     # sublane-unaligned W (52/26/13 stages)
])
def test_conv1x1_stats_matches_ref(n, h, w, ci, co):
    x = jnp.asarray(rng.randn(n, h, w, ci), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, ci, co) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
    _assert_close(conv1x1_stats(x, k, b), conv_stats_ref(x, k, b),
                  2e-5, 1e-5, f"1x1 {n}x{h}x{w}x{ci}->{co}")


@pytest.mark.parametrize("stride,n,h,w,ci,co", [
    (1, 2, 8, 8, 8, 16),
    (1, 1, 12, 8, 3, 8),    # stem-like 3-channel input
    (1, 2, 13, 13, 8, 16),  # sublane-unaligned W (52/26/13 stages)
    (2, 2, 8, 8, 8, 16),    # darknet top/left pad
    (2, 1, 12, 6, 4, 8),
])
def test_conv3x3_stats_matches_ref(stride, n, h, w, ci, co):
    x = jnp.asarray(rng.randn(n, h, w, ci), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
    _assert_close(conv3x3_stats(x, k, b, stride),
                  conv_stats_ref(x, k, b, stride),
                  2e-5, 1e-5, f"3x3s{stride}")


def _bn_loss(conv, stride=None):
    def f(x, k, b):
        if stride is None:
            y, s1, s2 = conv(x, k, b)
        else:
            y, s1, s2 = conv(x, k, b, stride)
        m = y.size / y.shape[-1]
        mean = s1 / m
        var = s2 / m - mean * mean
        z = (y - mean) * jax.lax.rsqrt(var + 1e-3)
        # mix in raw y and stats so db/ds1/ds2 cotangents are nonzero
        return (jnp.sum(jnp.tanh(z)) + 1e-3 * jnp.sum(jnp.tanh(y))
                + 1e-3 * jnp.sum(jnp.sin(s1)))
    return f


@pytest.mark.parametrize("kind,stride", [("1x1", None), ("3x3", 1),
                                         ("3x3", 2)])
def test_fused_conv_grads_match_ref(kind, stride):
    """custom_vjp backward (incl. the ds1/ds2 statistic-sum cotangent
    routing dy_eff = dy + ds1 + 2*y*ds2) vs jax.grad of the XLA ref."""
    if kind == "1x1":
        x = jnp.asarray(rng.randn(2, 6, 6, 8), jnp.float32)
        k = jnp.asarray(rng.randn(1, 1, 8, 16) * 0.2, jnp.float32)
        b = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
        fused = conv1x1_stats
    else:
        x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, 4, 8) * 0.2, jnp.float32)
        b = jnp.asarray(rng.randn(8) * 0.1, jnp.float32)
        fused = conv3x3_stats
    g_f = jax.grad(_bn_loss(fused, stride), argnums=(0, 1, 2))(x, k, b)
    g_r = jax.grad(_bn_loss(conv_stats_ref,
                            stride if kind == "3x3" else None)
                   if kind == "3x3" else
                   _bn_loss(lambda xx, kk, bb: conv_stats_ref(xx, kk, bb)),
                   argnums=(0, 1, 2))(x, k, b)
    for gf, gr, tag in zip(g_f, g_r, ["dx", "dk", "db"]):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=5e-5,
                                   err_msg=f"{kind}s{stride}/{tag}")


@pytest.mark.parametrize("kernel,strides,use_bias", [
    (1, 1, False), (1, 1, True), (3, 1, False), (3, 1, True),
    (3, 2, False),
])
def test_convbn_fused_matches_unfused(kernel, strides, use_bias):
    """ConvBN(fused=True) == ConvBN(fused=False) under shared weights:
    forward (train+eval), running-stat updates, and parameter grads.
    The param tree is identical, so one init drives both."""
    x = jnp.asarray(rng.randn(2, 8, 8, 8) * 0.5, jnp.float32)
    mk = lambda fused: ConvBN(16, kernel, strides, act="mish",
                              use_bias=use_bias, fused=fused)
    v = mk(False).init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(
                mk(True).init(jax.random.PRNGKey(0), x, train=False)))

    for train in (False, True):
        if train:
            yu, mu = mk(False).apply(v, x, train=True,
                                     mutable=["batch_stats"])
            yf, mf = mk(True).apply(v, x, train=True,
                                    mutable=["batch_stats"])
            for k2 in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(mu["batch_stats"]["bn"][k2]),
                    np.asarray(mf["batch_stats"]["bn"][k2]),
                    rtol=2e-5, atol=1e-6, err_msg=f"ra {k2}")
        else:
            yu = mk(False).apply(v, x, train=False)
            yf = mk(True).apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(yu), np.asarray(yf),
                                   rtol=5e-5, atol=1e-5,
                                   err_msg=f"train={train}")

    def loss(mod):
        def f(params):
            vv = {"params": params, "batch_stats": v["batch_stats"]}
            y, _ = mod.apply(vv, x, train=True, mutable=["batch_stats"])
            return jnp.sum(y * y)
        return f
    gu = jax.grad(loss(mk(False)))(v["params"])
    gf = jax.grad(loss(mk(True)))(v["params"])
    for (pu, lu), (_, lf) in zip(
            jax.tree_util.tree_leaves_with_path(gu),
            jax.tree_util.tree_leaves_with_path(gf)):
        np.testing.assert_allclose(np.asarray(lu), np.asarray(lf),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad {pu}")


def test_convbn_fused_unsupported_shapes_fall_back():
    """Shapes the kernels don't cover (odd stride-2 widths, tiny
    spatial, 7x7 kernels, no-BN convs) silently use the XLA path."""
    x = jnp.ones((1, 4, 4, 4), jnp.float32)
    mod = ConvBN(8, 7, 2, act="leaky", darknet_pad=False, fused=True)
    v = mod.init(jax.random.PRNGKey(0), x, train=False)
    assert mod.apply(v, x, train=False).shape == (1, 2, 2, 8)
    mod2 = ConvBN(8, 3, 1, act="leaky", use_bn=False, fused=True)
    v2 = mod2.init(jax.random.PRNGKey(0), x, train=False)
    assert mod2.apply(v2, x, train=False).shape == (1, 4, 4, 8)
