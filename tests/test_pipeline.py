"""Pipeline parallelism (parallel/pipeline.py): MPMD microbatch
streaming must be EXACT — pipelined forward == composed single-device
forward, pipelined value_and_grad == jax.value_and_grad of the same
computation (gradient-accumulation mean over microbatches) — and stage
arrays must actually live on their stage devices.

The reference has no multi-device training at all (SURVEY.md §2.3);
PP here is the beyond-plan third axis next to DP and TP.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from tf2_yolo_tpu.parallel import PipelineExecutor, split_yolov4


class _Stage0(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3))(x)
        return nn.relu(x)


class _Stage1(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(4, (3, 3), strides=(2, 2))(x)
        return x.mean(axis=(1, 2))


def _two_stage(batch=8):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 16, 16, 3), jnp.float32)
    m0, m1 = _Stage0(), _Stage1()
    p0 = m0.init(jax.random.PRNGKey(0), x)
    p1 = m1.init(jax.random.PRNGKey(1), m0.apply(p0, x))
    stages = [lambda p, a: m0.apply(p, a), lambda p, a: m1.apply(p, a)]
    return stages, [p0, p1], x


def test_pipeline_forward_matches_composed():
    stages, params, x = _two_stage()
    pipe = PipelineExecutor(stages, params)
    for mb in (None, 4, 2):
        got = np.asarray(pipe.run(x, microbatch=mb))
        want = np.asarray(stages[1](params[1], stages[0](params[0], x)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pipeline_stage_placement():
    stages, params, x = _two_stage()
    devs = jax.devices()[:2]
    pipe = PipelineExecutor(stages, params, devices=devs)
    for p, d in zip(pipe.params, devs):
        for leaf in jax.tree_util.tree_leaves(p):
            assert leaf.devices() == {d}, (leaf.devices(), d)
    out = pipe.run(x, microbatch=4)
    assert out.devices() == {devs[1]}        # final stage's device


def test_pipeline_value_and_grad_exact():
    """Pipelined training step == jax.value_and_grad of the composed
    computation, at every microbatch split (mean-over-microbatch
    semantics = gradient accumulation)."""
    stages, params, x = _two_stage()
    y = jnp.asarray(np.random.RandomState(2).rand(8, 4), jnp.float32)

    def loss_fn(out, yb):
        return jnp.mean((out - yb) ** 2)

    def composed(p0p1):
        p0, p1 = p0p1
        return loss_fn(stages[1](p1, stages[0](p0, x)), y)

    want_l, (want_g0, want_g1) = jax.value_and_grad(composed)(
        tuple(params))

    pipe = PipelineExecutor(stages, params)
    step = pipe.value_and_grad(loss_fn)
    for mb in (None, 4, 2, 1):
        loss, (g0, g1) = step(x, y, microbatch=mb)
        # mean-of-microbatch-means == full-batch mean only when the
        # per-microbatch loss is itself a mean over equal-sized
        # microbatches — true here
        np.testing.assert_allclose(float(loss), float(want_l),
                                   rtol=1e-5)
        for got, want in ((g0, want_g0), (g1, want_g1)):
            for a, b in zip(jax.tree_util.tree_leaves(got),
                            jax.tree_util.tree_leaves(want)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-5, atol=1e-6)


def test_pipeline_apply_grads_trains():
    """Two optimizer steps through the pipeline reduce the loss."""
    import optax

    stages, params, x = _two_stage()
    y = jnp.zeros((8, 4), jnp.float32)
    tx = optax.sgd(0.1)
    pipe = PipelineExecutor(stages, params)
    opt_states = pipe.init_opt(tx)
    step = pipe.value_and_grad(lambda out, yb: jnp.mean((out - yb) ** 2))

    losses = []
    for _ in range(3):
        loss, grads = step(x, y, microbatch=4)
        opt_states = pipe.apply_grads(tx, opt_states, grads)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_split_yolov4_pipeline_matches_full_apply():
    """split_yolov4: the 2-stage pipelined forward reproduces the
    monolithic eval-mode apply, and the param cut is a disjoint,
    complete partition of the variable tree."""
    from tf2_yolo_tpu.models import YoloV4

    anchors = np.stack([np.linspace(0.1, 0.8, 9),
                        np.linspace(0.1, 0.7, 9)], axis=1)
    module = YoloV4(anchors=anchors, class_num=2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(4, 96, 96, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x[:1], train=False)

    stages, params = split_yolov4(module, variables)
    assert set(params[0]["params"]) == {"backbone"}
    assert set(params[0]["params"]) | set(params[1]["params"]) \
        == set(variables["params"])

    pipe = PipelineExecutor(stages, params)
    got = pipe.run(x, microbatch=2)
    want = module.apply(variables, x, train=False)
    # two-program partition compiles different fusions than the
    # monolith; untrained exp(wh)-amplified channels magnify the f32
    # reduction-order noise to ~5e-4 relative
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=1e-5)

    # a pipelined optimizer step must train ONLY the params
    # collection: batch_stats (frozen in the eval-mode stage forward)
    # pass through apply_grads bitwise-unchanged
    import optax
    tx = optax.sgd(1e-4)
    opt_states = pipe.init_opt(tx)
    step = pipe.value_and_grad(
        lambda out, *_: sum(jnp.mean(o ** 2) for o in out))
    _, grads = step(x, microbatch=2)
    before = [jax.tree_util.tree_map(np.asarray, p["batch_stats"])
              for p in pipe.params]
    pipe.apply_grads(tx, opt_states, grads)
    for s, b in enumerate(before):
        for a, c in zip(jax.tree_util.tree_leaves(b),
                        jax.tree_util.tree_leaves(
                            pipe.params[s]["batch_stats"])):
            np.testing.assert_array_equal(a, np.asarray(c))
    assert any(
        not np.array_equal(a, np.asarray(c))
        for a, c in zip(jax.tree_util.tree_leaves(params[0]["params"]),
                        jax.tree_util.tree_leaves(
                            pipe.params[0]["params"])))
