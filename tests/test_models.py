"""Model shape/structure tests (small inputs to keep CPU compile fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_yolo_tpu.models import (YoloV1, YoloV2, YoloV3, YoloV4,
                                 space_to_depth, upsample2x, mish)


def init_and_apply(model, shape, train=False):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=train,
                      mutable=["batch_stats"] if train else False)
    return variables, out


def test_space_to_depth_matches_tf_order():
    # tf.nn.space_to_depth: output channel blocks ordered row-major over
    # the spatial block, each containing the full input channel dim.
    x = np.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3).astype(np.float32)
    out = np.asarray(space_to_depth(jnp.asarray(x), 2))
    assert out.shape == (2, 2, 2, 12)
    np.testing.assert_array_equal(out[0, 0, 0, :3], x[0, 0, 0])
    np.testing.assert_array_equal(out[0, 0, 0, 3:6], x[0, 0, 1])
    np.testing.assert_array_equal(out[0, 0, 0, 6:9], x[0, 1, 0])
    np.testing.assert_array_equal(out[0, 0, 0, 9:12], x[0, 1, 1])


def test_upsample2x():
    x = jnp.asarray(np.arange(4).reshape(1, 2, 2, 1).astype(np.float32))
    out = np.asarray(upsample2x(x))
    assert out.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(out[0, :2, :2, 0],
                                  [[0, 0], [0, 1 * 0 + 0]])


def test_mish_values():
    x = jnp.asarray([0.0, 1.0, -1.0])
    out = np.asarray(mish(x))
    sp = np.log1p(np.exp([0.0, 1.0, -1.0]))
    np.testing.assert_allclose(out, [0.0, 1.0, -1.0] * np.tanh(sp),
                               rtol=1e-4, atol=1e-6)


def test_yolov1_shapes():
    model = YoloV1(bbox_num=2, class_num=3)
    _, out = init_and_apply(model, (1, 64, 64, 3))
    assert out.shape == (1, 1, 1, 5 * 2 + 3)     # stride 64
    out_np = np.asarray(out)
    # sigmoid/softmax ranges
    assert (out_np[..., :10] >= 0).all() and (out_np[..., :10] <= 1).all()
    np.testing.assert_allclose(out_np[..., 10:].sum(-1), 1.0, rtol=1e-5)


def test_yolov2_shapes_and_anchor_scaling():
    anchors = [[0.1, 0.2], [0.4, 0.3]]
    model = YoloV2(anchors=anchors, class_num=2)
    _, out = init_and_apply(model, (1, 64, 64, 3))
    assert out.shape == (1, 2, 2, 2 * (5 + 2))   # stride 32
    shaped = np.asarray(out).reshape(1, 2, 2, 2, 7)
    # wh = exp(raw) * anchor > 0, and prob rows softmax-normalized
    assert (shaped[..., 2:4] > 0).all()
    np.testing.assert_allclose(shaped[..., 5:].sum(-1), 1.0, rtol=1e-5)


def test_yolov3_shapes():
    anchors = np.full((9, 2), 0.3)
    model = YoloV3(anchors=anchors, class_num=2)
    _, outs = init_and_apply(model, (1, 96, 96, 3))
    assert len(outs) == 3
    assert outs[0].shape == (1, 3, 3, 3 * 7)     # stride 32
    assert outs[1].shape == (1, 6, 6, 3 * 7)     # stride 16
    assert outs[2].shape == (1, 12, 12, 3 * 7)   # stride 8


def test_yolov3_tiny_shapes():
    anchors = np.full((6, 2), 0.3)
    model = YoloV3(anchors=anchors, class_num=2, backbone="tiny_darknet")
    _, outs = init_and_apply(model, (1, 96, 96, 3))
    assert len(outs) == 2
    assert outs[0].shape == (1, 3, 3, 3 * 7)
    assert outs[1].shape == (1, 6, 6, 3 * 7)


def test_yolov4_shapes_and_anchor_params():
    anchors = np.stack([np.linspace(0.1, 0.9, 9),
                        np.linspace(0.2, 0.8, 9)], 1)
    model = YoloV4(anchors=anchors, class_num=2)
    variables, outs = init_and_apply(model, (1, 96, 96, 3))
    assert len(outs) == 3
    assert outs[0].shape == (1, 3, 3, 3 * 7)
    # anchors live as per-head params, coarse level gets anchors[0:3]
    p = variables["params"]
    np.testing.assert_allclose(np.asarray(p["head1"]["anchors"]),
                               anchors[:3], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p["head3"]["anchors"]),
                               anchors[6:], rtol=1e-6)


def test_darknet_stride2_asymmetric_padding():
    """A stride-2 darknet conv halves odd-free dims exactly (96->48)
    and uses top/left padding: feature at (0,0) must only see input
    pixel (0,0) given a 3x3 identity-ish kernel."""
    from tf2_yolo_tpu.models import ConvBN
    conv = ConvBN(1, 3, 2, act="linear", use_bn=False, use_bias=False)
    x = jnp.zeros((1, 6, 6, 1), jnp.float32)
    v = conv.init(jax.random.PRNGKey(0), x)
    assert conv.apply(v, x).shape == (1, 3, 3, 1)
    # kernel picking center tap: out[0,0] sees padded (top-left) region
    k = np.zeros((3, 3, 1, 1), np.float32)
    k[1, 1, 0, 0] = 1.0   # center tap
    v = {"params": {"conv": {"kernel": jnp.asarray(k)}}}
    xin = np.arange(36, dtype=np.float32).reshape(1, 6, 6, 1)
    out = np.asarray(conv.apply(v, jnp.asarray(xin)))
    # with ((1,0),(1,0)) padding + VALID, center taps hit input pixels
    # (0,0),(0,2),(0,4) / (2,0)... i.e. even coordinates
    np.testing.assert_array_equal(out[0, :, :, 0],
                                  xin[0, ::2, ::2, 0])


def test_yolov4_remat_matches_no_remat():
    """jax.checkpoint over CSP stages must not change the math."""
    from tf2_yolo_tpu.models import YoloV4
    anchors = np.full((9, 2), 0.3)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                    jnp.float32)
    m0 = YoloV4(anchors=anchors, class_num=2, remat=False)
    m1 = YoloV4(anchors=anchors, class_num=2, remat=True)
    v = m0.init(jax.random.PRNGKey(0), x, train=False)
    o0 = m0.apply(v, x, train=False)
    o1 = m1.apply(v, x, train=False)
    for a, b in zip(o0, o1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6)


def test_spp_cascade_matches_direct_pools():
    """Cascaded 5x5 pools must equal direct 13/9/5 SAME maxpools,
    including border clipping."""
    from flax import linen as nn
    from tf2_yolo_tpu.models import SPP
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 13, 13, 8).astype(np.float32))
    got = np.asarray(SPP().apply({}, x))
    direct = [np.asarray(nn.max_pool(x, (p, p), (1, 1), "SAME"))
              for p in (13, 9, 5)]
    want = np.concatenate([*direct, np.asarray(x)], axis=-1)
    np.testing.assert_array_equal(got, want)


def test_bn_stats_stop_gradient_forward_exact_backward_differs():
    """set_bn_stats_stop_gradient / ConvBN(bn_stats_sg=True): the
    train-mode forward (outputs AND running-stat updates) is identical
    to standard flax BatchNorm — only the backward treats mean/var as
    constants (frozen-statistics backward). The dropped coupling term
    is NOT numerically small (the incoming cotangent correlates with
    xhat through the activation derivative), so the assertion is
    forward-exactness + same-scale finite gradients, not gradient
    closeness; training fidelity is established empirically
    (convergence matrix run, BASELINE.md)."""
    from flax import linen as nn
    from tf2_yolo_tpu.models.layers import (ConvBN,
                                            set_bn_stats_stop_gradient)

    class Stack(nn.Module):
        sg: bool = False

        @nn.compact
        def __call__(self, x, train=False):
            x = ConvBN(16, kernel=3, act="leaky", bn_stats_sg=self.sg,
                       name="c1")(x, train=train)
            x = ConvBN(16, kernel=1, act="mish", bn_stats_sg=self.sg,
                       name="c2")(x, train=train)
            return x

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    m_ref = Stack(sg=False)
    m_sg = Stack(sg=True)
    v = m_ref.init(jax.random.PRNGKey(0), x, train=True)
    # randomize so BN stats/grads are nontrivial
    leaves, tree = jax.tree_util.tree_flatten(v)
    v = jax.tree_util.tree_unflatten(
        tree, [jnp.asarray(rng.normal(0, 0.5, l.shape), l.dtype)
               for l in leaves])

    # a fixed random linear probe: generic loss whose gradient is not
    # dominated by the batch-coupling term (sum(out^2) would be — a
    # BN output's sum of squares is nearly batch-invariant, making the
    # exact gradient ~0 and ANY approximation look large)
    r = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 16)), jnp.float32)

    def loss(mod, params):
        def f(p):
            out, mut = mod.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) * r), mut
        (val, mut), grads = jax.value_and_grad(f, has_aux=True)(params)
        return val, mut, grads

    val0, mut0, g0 = loss(m_ref, v["params"])
    val1, mut1, g1 = loss(m_sg, v["params"])

    # forward identical (loss value + running-stat updates)
    np.testing.assert_allclose(float(val0), float(val1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(mut0),
                    jax.tree_util.tree_leaves(mut1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6)

    # gradients: different (sg engaged), finite, same scale — the
    # frozen-stats direction, not a perturbation of the exact one
    ga = np.concatenate([np.asarray(l).ravel()
                         for l in jax.tree_util.tree_leaves(g0)])
    gb = np.concatenate([np.asarray(l).ravel()
                         for l in jax.tree_util.tree_leaves(g1)])
    assert np.all(np.isfinite(gb))
    assert not np.allclose(ga, gb, rtol=1e-7, atol=1e-9)
    ratio = np.linalg.norm(gb) / np.linalg.norm(ga)
    assert 0.1 < ratio < 10.0

    # eval path is untouched by the knob
    o_ref = m_ref.apply(v, x, train=False)
    o_sg = m_sg.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_sg))

    # the module-global switch drives the same path
    set_bn_stats_stop_gradient(True)
    try:
        val2, _, g2 = loss(Stack(sg=None), v["params"])
    finally:
        set_bn_stats_stop_gradient(False)
    np.testing.assert_allclose(float(val2), float(val1), rtol=1e-6)
    gc = np.concatenate([np.asarray(l).ravel()
                         for l in jax.tree_util.tree_leaves(g2)])
    np.testing.assert_allclose(gc, gb, rtol=1e-6)


def test_bn_sg_scope_limits_to_named_modules():
    """set_bn_stats_stop_gradient(scope="backbone"): neck/head ConvBN
    gradients are bitwise those of exact BN (their layers keep the
    standard backward AND their params are downstream of the sg'd
    backbone only through forward values, which sg does not change);
    backbone gradients differ (sg engaged there)."""
    import jax.tree_util as tu
    from tf2_yolo_tpu.models import YoloV4
    from tf2_yolo_tpu.models.layers import set_bn_stats_stop_gradient

    anchors = np.full((9, 2), 0.3)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                    jnp.float32)
    m = YoloV4(anchors=anchors, class_num=2)
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    def grads(on, scope):
        set_bn_stats_stop_gradient(on, scope=scope)
        try:
            def f(p):
                outs, _ = m.apply(
                    {"params": p, "batch_stats": v["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])
                return sum(jnp.sum(o.astype(jnp.float32) * (i + 1))
                           for i, o in enumerate(outs))
            return jax.grad(f)(v["params"])
        finally:
            set_bn_stats_stop_gradient(False)

    g_off = grads(False, None)
    g_bb = grads(True, "backbone")

    def flat(g, want_backbone):
        return np.concatenate([
            np.asarray(l).ravel()
            for p, l in tu.tree_leaves_with_path(g)
            if ("backbone" in "".join(str(k) for k in p))
            == want_backbone])

    np.testing.assert_array_equal(flat(g_bb, False), flat(g_off, False))
    assert not np.allclose(flat(g_bb, True), flat(g_off, True),
                           rtol=1e-5)
