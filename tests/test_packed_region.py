"""Full-model parity for the batch-packed early-stage path
(models/packed_region.py): the packed YOLOv4 train forward, BN
running-statistics updates, loss and gradients must match the normal
flax path. Runs in f32 with Pallas interpret mode on CPU, so the only
differences are summation orders (blocked GEMM/stats vs XLA fusions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_yolo_tpu.models import YoloV4
from tf2_yolo_tpu.models.layers import set_packed_early
from tf2_yolo_tpu.ops.pallas import packed_gemm


@pytest.fixture
def packed_mode():
    # p2=True exercises BOTH mechanisms: the batch-packed (p=2)
    # stem/stage1/stage2 and the unpacked (p=1) fused-GEMM stages 3-5
    packed_gemm.set_interpret(True)
    set_packed_early(True, p2=True)
    yield
    set_packed_early(False)
    packed_gemm.set_interpret(False)


ANCHORS = np.stack([np.linspace(0.1, 0.8, 9),
                    np.linspace(0.1, 0.7, 9)], axis=1)


def _setup():
    module = YoloV4(anchors=ANCHORS, class_num=2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x[:1], train=False)
    return module, variables, x


def _train_apply(module, variables, x):
    out, mut = module.apply(variables, x, train=True,
                            mutable=["batch_stats"])
    return out, mut


def test_packed_forward_and_stats_match(packed_mode):
    module, variables, x = _setup()
    set_packed_early(False)
    out_n, mut_n = _train_apply(module, variables, x)
    set_packed_early(True, p2=True)
    out_p, mut_p = _train_apply(module, variables, x)
    for a, b in zip(out_p, out_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    leaves_n = jax.tree_util.tree_leaves_with_path(mut_n)
    leaves_p = jax.tree_util.tree_leaves_with_path(mut_p)
    assert [p for p, _ in leaves_p] == [p for p, _ in leaves_n]
    for (path, a), (_, b) in zip(leaves_p, leaves_n):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_packed_grads_match(packed_mode):
    module, variables, x = _setup()

    def loss_fn(params, batch_stats):
        out, _ = module.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, mutable=["batch_stats"])
        return sum(jnp.mean(jnp.log1p(o.astype(jnp.float32) ** 2))
                   for o in out)

    args = (variables["params"], variables["batch_stats"])
    set_packed_early(False)
    loss_n, g_n = jax.value_and_grad(loss_fn)(*args)
    set_packed_early(True, p2=True)
    loss_p, g_p = jax.value_and_grad(loss_fn)(*args)
    np.testing.assert_allclose(float(loss_p), float(loss_n),
                               rtol=1e-4)
    # The untrained net's gradients are chaotically conditioned (a
    # 1e-6 input perturbation swings BN scale/bias grads ~9% rel-L2
    # on the PURE flax path — 315 leaves over 5e-3), so a fixed
    # tolerance cannot separate bugs from noise. Criterion: each
    # leaf's packed-vs-normal error must stay within 10x that leaf's
    # own conditioning noise (normal vs eps-perturbed normal).
    # Measured on the correct implementation: zero leaves exceed it.

    def loss_fn_eps(params, batch_stats):
        out, _ = module.apply(
            {"params": params, "batch_stats": batch_stats},
            x + 1e-6, train=True, mutable=["batch_stats"])
        return sum(jnp.mean(jnp.log1p(o.astype(jnp.float32) ** 2))
                   for o in out)

    set_packed_early(False)
    g_c = jax.grad(loss_fn_eps)(*args)
    leaves_n = jax.tree_util.tree_leaves_with_path(g_n)
    leaves_p = jax.tree_util.tree_leaves_with_path(g_p)
    leaves_c = jax.tree_util.tree_leaves_with_path(g_c)
    assert [p for p, _ in leaves_p] == [p for p, _ in leaves_n]
    for (path, a), (_, b), (_, c) in zip(leaves_p, leaves_n,
                                         leaves_c):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        c = np.asarray(c, np.float32)
        nb = max(np.linalg.norm(b), 1e-9)
        err_pack = np.linalg.norm(a - b) / nb
        err_cond = np.linalg.norm(c - b) / nb
        # Scale factor 100: the packed region's legitimate rounding
        # (different blocked summation orders throughout) perturbs
        # the forward ~100x more than the 1e-6 input probe does (the
        # forward parity test bounds it at 2e-3 relative), and the
        # measured errors track that ratio (e.g. head kernel 3.9%
        # packed vs 0.05% conditioning). Real math bugs (wrong term,
        # missing factor) sit at 10-100% — caught by the 0.2 ceiling
        # even on strongly-chaotic leaves.
        assert err_pack < max(100 * err_cond, 5e-3), (
            jax.tree_util.keystr(path), err_pack, err_cond)
        assert err_pack < 0.2, (jax.tree_util.keystr(path), err_pack)


def test_packed_conv3x3_layer_matches_convbn(packed_mode):
    """Single-layer (shallow, tight) parity: PackedConvBN3x3 ==
    ConvBN on the same params — block-diag conv, folded stats,
    affine+activate, and gradients, without deep-chain conditioning
    noise."""
    from flax.core import freeze
    from tf2_yolo_tpu.models.layers import ConvBN
    from tf2_yolo_tpu.models.packed_region import (
        PackedConvBN3x3, activate, pack_batch, unpack_batch)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(4, 16, 16, 8) - 0.3, jnp.float32)
    normal = ConvBN(16, 3, 2, act="mish")
    packed = PackedConvBN3x3(16, 3, 2, act="mish")
    variables = normal.init(jax.random.PRNGKey(0), x, train=False)

    def f_normal(params, x):
        out, mut = normal.apply(
            {"params": params,
             "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return out, mut

    def f_packed(params, x):
        (y, aff), mut = packed.apply(
            {"params": params,
             "batch_stats": variables["batch_stats"]},
            pack_batch(x), train=True, mutable=["batch_stats"])
        return unpack_batch(activate(y, aff, "mish", jnp.float32)), mut

    out_n, mut_n = f_normal(variables["params"], x)
    out_p, mut_p = f_packed(variables["params"], x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_n),
                               rtol=1e-5, atol=1e-6)
    for (pth, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(mut_p),
            jax.tree_util.tree_leaves_with_path(mut_n)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(pth))

    def loss_n(params):
        return jnp.sum(f_normal(params, x)[0] ** 2)

    def loss_p(params):
        return jnp.sum(f_packed(params, x)[0] ** 2)

    g_n = jax.grad(loss_n)(variables["params"])
    g_p = jax.grad(loss_p)(variables["params"])
    for (pth, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_p),
            jax.tree_util.tree_leaves_with_path(g_n)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        assert l2 < 1e-4, (jax.tree_util.keystr(pth), l2)


def test_packed_inactive_in_eval_and_odd_batch(packed_mode):
    module, variables, x = _setup()
    # eval: identical outputs with the knob on and off
    out_p = module.apply(variables, x, train=False)
    set_packed_early(False)
    out_n = module.apply(variables, x, train=False)
    for a, b in zip(out_p, out_n):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # odd batch: the p=2 region must fall back (p=1 stages still on)
    set_packed_early(True, p2=True)
    out, _ = module.apply(variables, x[:3], train=True,
                          mutable=["batch_stats"])
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_packed_p1_only_forward_matches(packed_mode):
    """Default mode (stages 3-5 fused-GEMM, early stages normal):
    forward + stats parity."""
    module, variables, x = _setup()
    set_packed_early(False)
    out_n, mut_n = _train_apply(module, variables, x)
    set_packed_early(True, p2=False)
    out_p, mut_p = _train_apply(module, variables, x)
    for a, b in zip(out_p, out_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(mut_p),
            jax.tree_util.tree_leaves_with_path(mut_n)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


@pytest.fixture
def p3_mode():
    from tf2_yolo_tpu.ops.pallas import packed_conv3x3
    packed_gemm.set_interpret(True)
    packed_conv3x3.set_interpret(True)
    set_packed_early(True, p3=True)
    yield
    set_packed_early(False)
    packed_conv3x3.set_interpret(False)
    packed_gemm.set_interpret(False)


def test_p3_forward_and_stats_match(p3_mode):
    """All-Pallas early region (P3CSPStage: fused 9-tap 3x3 GEMMs,
    sum-GEMM residual term lists) == the normal flax path."""
    module, variables, x = _setup()
    set_packed_early(False)
    out_n, mut_n = _train_apply(module, variables, x)
    set_packed_early(True, p3=True)
    out_p, mut_p = _train_apply(module, variables, x)
    for a, b in zip(out_p, out_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    leaves_n = jax.tree_util.tree_leaves_with_path(mut_n)
    leaves_p = jax.tree_util.tree_leaves_with_path(mut_p)
    assert [p for p, _ in leaves_p] == [p for p, _ in leaves_n]
    for (path, a), (_, b) in zip(leaves_p, leaves_n):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_p3_grads_match(p3_mode):
    """Conditioning-calibrated gradient parity for the all-Pallas
    region (same criterion as test_packed_grads_match)."""
    module, variables, x = _setup()

    def loss_fn(params, batch_stats, xin):
        out, _ = module.apply(
            {"params": params, "batch_stats": batch_stats}, xin,
            train=True, mutable=["batch_stats"])
        return sum(jnp.mean(jnp.log1p(o.astype(jnp.float32) ** 2))
                   for o in out)

    args = (variables["params"], variables["batch_stats"])
    set_packed_early(False)
    loss_n, g_n = jax.value_and_grad(loss_fn)(*args, x)
    g_c = jax.grad(loss_fn)(*args, x + 1e-6)
    set_packed_early(True, p3=True)
    loss_p, g_p = jax.value_and_grad(loss_fn)(*args, x)
    np.testing.assert_allclose(float(loss_p), float(loss_n),
                               rtol=1e-4)
    leaves_n = jax.tree_util.tree_leaves_with_path(g_n)
    leaves_p = jax.tree_util.tree_leaves_with_path(g_p)
    leaves_c = jax.tree_util.tree_leaves_with_path(g_c)
    assert [p for p, _ in leaves_p] == [p for p, _ in leaves_n]
    for (path, a), (_, b), (_, c) in zip(leaves_p, leaves_n,
                                         leaves_c):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        c = np.asarray(c, np.float32)
        nb = max(np.linalg.norm(b), 1e-9)
        err_pack = np.linalg.norm(a - b) / nb
        err_cond = np.linalg.norm(c - b) / nb
        assert err_pack < max(100 * err_cond, 5e-3), (
            jax.tree_util.keystr(path), err_pack, err_cond)
        assert err_pack < 0.2, (jax.tree_util.keystr(path), err_pack)


def test_p3_eval_identical_and_odd_batch_falls_back(p3_mode):
    module, variables, x = _setup()
    out_p = module.apply(variables, x, train=False)
    set_packed_early(False)
    out_n = module.apply(variables, x, train=False)
    for a, b in zip(out_p, out_n):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    set_packed_early(True, p3=True)
    out, _ = module.apply(variables, x[:3], train=True,
                          mutable=["batch_stats"])
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
