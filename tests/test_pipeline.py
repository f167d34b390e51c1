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

from tf2_yolo_tpu.parallel import (PipelineExecutor, split_detector,
                                   split_yolov4)


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


def test_pipeline_meshes_dp_within_stage():
    """PP x DP composition: each stage runs SPMD over its own 4-device
    mesh (params replicated in-mesh, activations sharded over "data"),
    stage boundaries reshard between the two disjoint meshes — and the
    result still equals the composed single-device computation
    exactly, for forward, loss, and gradients."""
    import optax
    from jax.sharding import Mesh

    stages, params, x = _two_stage()
    devs = jax.devices()
    assert len(devs) >= 8
    m0 = Mesh(np.array(devs[:4]), ("data",))
    m1 = Mesh(np.array(devs[4:8]), ("data",))
    pipe = PipelineExecutor(stages, params, meshes=[m0, m1])
    for p, m in zip(pipe.params, (m0, m1)):
        for leaf in jax.tree_util.tree_leaves(p):
            assert leaf.sharding.device_set == set(m.devices.flat)

    got = np.asarray(pipe.run(x, microbatch=4))
    want = np.asarray(stages[1](params[1], stages[0](params[0], x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    y = jnp.asarray(np.random.RandomState(2).rand(8, 4), jnp.float32)

    def loss_fn(out, yb):
        return jnp.mean((out - yb) ** 2)

    def composed(p0p1):
        p0, p1 = p0p1
        return loss_fn(stages[1](p1, stages[0](p0, x)), y)

    want_l, want_g = jax.value_and_grad(composed)(tuple(params))
    step = pipe.value_and_grad(loss_fn)
    loss, grads = step(x, y, microbatch=4)
    np.testing.assert_allclose(float(loss), float(want_l), rtol=1e-5)
    for got_g, want_gi in zip(grads, want_g):
        for a, b in zip(jax.tree_util.tree_leaves(got_g),
                        jax.tree_util.tree_leaves(want_gi)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)

    # training steps through the composed meshes reduce the loss
    tx = optax.sgd(0.1)
    opt_states = pipe.init_opt(tx)
    losses = []
    for _ in range(3):
        loss, grads = step(x, jnp.zeros((8, 4), jnp.float32),
                           microbatch=4)
        opt_states = pipe.apply_grads(tx, opt_states, grads)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_split_yolov4_3stage_matches_full_apply_and_grads():
    """n_stages=3 (stem+stages1-3 | stages4-5 | neck+heads): the
    pipelined forward reproduces the monolithic eval-mode apply, the
    nested param cut is a disjoint complete partition, and the
    pipelined value_and_grad equals jax.value_and_grad of the same
    frozen-stats computation on every stage's subtree."""
    from tf2_yolo_tpu.models import YoloV4

    anchors = np.stack([np.linspace(0.1, 0.8, 9),
                        np.linspace(0.1, 0.7, 9)], axis=1)
    module = YoloV4(anchors=anchors, class_num=2)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(4, 96, 96, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x[:1], train=False)

    stages, params = split_yolov4(module, variables, n_stages=3)
    assert set(params[0]["params"]["backbone"]) \
        == {"stem", "stage1", "stage2", "stage3"}
    assert set(params[1]["params"]["backbone"]) == {"stage4", "stage5"}
    assert "backbone" not in params[2]["params"]
    got_bb = set(params[0]["params"]["backbone"]) \
        | set(params[1]["params"]["backbone"])
    assert got_bb == set(variables["params"]["backbone"])
    assert set(params[2]["params"]) \
        == set(variables["params"]) - {"backbone"}

    pipe = PipelineExecutor(stages, params)
    got = pipe.run(x, microbatch=2)
    want = module.apply(variables, x, train=False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=1e-5)

    # log1p bounds the loss gradient (2o/(1+o²) <= 1): a plain
    # mean(o²) squares the exp(wh) head channels, amplifying f32
    # reduction-order noise between the two compiled partitions to
    # ~0.4% relative on e8-magnitude gradient values — the comparison
    # here pins the CUT's exactness, so keep the scale bounded
    def loss_fn(out, *_):
        return sum(jnp.mean(jnp.log1p(o ** 2)) for o in out)

    def composed(p):
        out = module.apply({**variables, "params": p}, x, train=False)
        return loss_fn(out)

    want_l, want_g = jax.value_and_grad(composed)(variables["params"])
    step = pipe.value_and_grad(loss_fn)
    loss, grads = step(x, microbatch=2)
    # mean-of-microbatch-means reassociates the batch reduction and
    # the two compiled partitions fuse differently: ~4e-5 relative
    # noise on the scalar at f32
    np.testing.assert_allclose(float(loss), float(want_l), rtol=1e-3)
    want_stage_g = [
        {"backbone": {k: want_g["backbone"][k]
                      for k in params[0]["params"]["backbone"]}},
        {"backbone": {k: want_g["backbone"][k]
                      for k in params[1]["params"]["backbone"]}},
        {k: want_g[k] for k in params[2]["params"]},
    ]
    for got_g, want_gs in zip(grads, want_stage_g):
        ga = jax.tree_util.tree_leaves_with_path(got_g)
        wa = jax.tree_util.tree_leaves_with_path(want_gs)
        assert [p for p, _ in ga] == [p for p, _ in wa]
        # an untrained net in EVAL mode (running stats at init values,
        # RandomNormal-0.02 conv kernels) shrinks activations through
        # the neck, so a few deep BN bias gradients vanish to ~1e-7
        # norm while the stage's dominant leaves sit at ~1e-1; on such
        # leaves the two compiled partitions' f32 noise is O(1e-9)
        # absolute but O(1%) relative. Bound each leaf relatively OR
        # absolutely against the stage's gradient scale.
        stage_scale = max(float(np.linalg.norm(np.asarray(b)))
                          for _, b in wa)
        for (pth, a), (_, b) in zip(ga, wa):
            # per-leaf relative L2: elementwise comparison is flaky on
            # the handful (~2 per million) of near-cancelled elements
            # whose value differs O(1%) between the two compiled
            # partitions; the gradient AS A VECTOR must still agree
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            abs_err = np.linalg.norm(a - b)
            err = abs_err / (np.linalg.norm(b) + 1e-12)
            assert err < 1e-3 or abs_err < 1e-7 * stage_scale, \
                (pth, err, abs_err, stage_scale)


def test_pipeline_save_load_merge(tmp_path):
    """PP persistence: save/load roundtrips the per-stage trees
    bitwise, and merged_variables() reconstructs the monolithic
    variable tree (leaves AND structure) so a pipeline-trained model
    drives the ordinary single-program apply."""
    import optax
    from tf2_yolo_tpu.models import YoloV4

    anchors = np.stack([np.linspace(0.1, 0.8, 9),
                        np.linspace(0.1, 0.7, 9)], axis=1)
    module = YoloV4(anchors=anchors, class_num=2)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x[:1], train=False)

    stages, params = split_yolov4(module, variables, n_stages=3)
    pipe = PipelineExecutor(stages, params)

    # merged == original: same paths, identical leaves
    want = jax.tree_util.tree_leaves_with_path(
        jax.device_get(variables))
    got = jax.tree_util.tree_leaves_with_path(pipe.merged_variables())
    assert [p for p, _ in got] == [p for p, _ in want]
    for (_, a), (_, b) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # one PP train step, save, reset, load -> trained values back
    tx = optax.sgd(1e-3)
    opt_states = pipe.init_opt(tx)
    step = pipe.value_and_grad(
        lambda out, *_: sum(jnp.mean(jnp.log1p(o ** 2)) for o in out))
    _, grads = step(x, microbatch=2)
    pipe.apply_grads(tx, opt_states, grads)
    trained = [jax.device_get(p) for p in pipe.params]

    path = str(tmp_path / "pp_state.msgpack")
    pipe.save(path)
    pipe.params = [jax.device_put(p, t)
                   for p, t in zip(params, pipe._par_t)]  # reset
    pipe.load(path)
    for have, want_tree in zip(pipe.params, trained):
        for a, b in zip(jax.tree_util.tree_leaves(
                            jax.device_get(have)),
                        jax.tree_util.tree_leaves(want_tree)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the merged trained tree drives the monolithic apply and matches
    # the pipelined forward
    out_m = module.apply(pipe.merged_variables(), x, train=False)
    out_p = pipe.run(x, microbatch=2)
    for g, w in zip(out_p, out_m):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=1e-5)


class _Stage0BN(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3))(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=0.9)(x)
        return nn.relu(x)


class _Stage1BN(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(4, (3, 3), strides=(2, 2))(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=0.9)(x)
        return x.mean(axis=(1, 2))


def _two_stage_bn(batch=8):
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(batch, 16, 16, 3), jnp.float32)
    m0, m1 = _Stage0BN(), _Stage1BN()
    p0 = m0.init(jax.random.PRNGKey(0), x)
    p1 = m1.init(jax.random.PRNGKey(1), m0.apply(p0, x))

    def mk(m, train):
        if not train:
            return lambda p, a, _m=m: _m.apply(p, a, train=False)

        def fn(p, a, _m=m):
            y, mut = _m.apply(p, a, train=True,
                              mutable=["batch_stats"])
            return y, mut["batch_stats"]
        return fn

    stages = [mk(m0, False), mk(m1, False)]
    train_stages = [mk(m0, True), mk(m1, True)]
    return (m0, m1), stages, train_stages, [p0, p1], x


def _oracle_train_step(modules, params, x, y, loss_fn):
    """Single-device train-mode step: loss, per-stage param grads, and
    EMA-updated batch_stats — the semantics PP train mode must match."""
    m0, m1 = modules

    def fwd(p0p1):
        p0t, p1t = p0p1
        h, mut0 = m0.apply({**params[0], "params": p0t}, x,
                           train=True, mutable=["batch_stats"])
        out, mut1 = m1.apply({**params[1], "params": p1t}, h,
                             train=True, mutable=["batch_stats"])
        return loss_fn(out, y), (mut0["batch_stats"],
                                 mut1["batch_stats"])

    (loss, stats), grads = jax.value_and_grad(fwd, has_aux=True)(
        (params[0]["params"], params[1]["params"]))
    return loss, grads, stats


def test_pipeline_train_mode_bn_full_microbatch_matches_single_device():
    """Train-mode PP with microbatch == batch equals the single-device
    train-mode step EXACTLY: loss, grads (through the batch
    statistics), and the EMA-updated running stats in the stage
    trees."""
    modules, stages, train_stages, params, x = _two_stage_bn()
    y = jnp.asarray(np.random.RandomState(8).rand(8, 4), jnp.float32)

    def loss_fn(out, yb):
        return jnp.mean((out - yb) ** 2)

    want_l, want_g, want_stats = _oracle_train_step(
        modules, params, x, y, loss_fn)

    pipe = PipelineExecutor(stages, params, train_stages=train_stages)
    step = pipe.value_and_grad(loss_fn)       # train defaults on
    loss, grads = step(x, y, microbatch=None)
    np.testing.assert_allclose(float(loss), float(want_l), rtol=1e-5)
    for got, want in zip(grads, want_g):
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)
    # running stats were EMA-updated IN the live stage trees
    for s, want_st in enumerate(want_stats):
        got_leaves = jax.tree_util.tree_leaves(
            pipe.params[s]["batch_stats"])
        want_leaves = jax.tree_util.tree_leaves(want_st)
        init_leaves = jax.tree_util.tree_leaves(
            params[s]["batch_stats"])
        for a, b, i in zip(got_leaves, want_leaves, init_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)
            assert not np.array_equal(np.asarray(a), np.asarray(i))


def test_pipeline_train_mode_bn_microbatched_matches_sequential():
    """Train-mode PP with microbatch < batch equals sequentially
    train-stepping each microbatch on one device with gradient
    accumulation (per-microbatch batch statistics, chained EMA) —
    the standard GPipe BN semantics."""
    modules, stages, train_stages, params, x = _two_stage_bn()
    y = jnp.asarray(np.random.RandomState(9).rand(8, 4), jnp.float32)

    def loss_fn(out, yb):
        return jnp.mean((out - yb) ** 2)

    mb = 4
    n = x.shape[0] // mb
    cur = [dict(p) for p in params]
    acc = None
    total = 0.0
    for i in range(n):
        xs, ys_ = x[i * mb:(i + 1) * mb], y[i * mb:(i + 1) * mb]
        l, g, stats = _oracle_train_step(modules, cur, xs, ys_, loss_fn)
        total += float(l) / n
        g = jax.tree_util.tree_map(lambda a: a / n, g)
        acc = g if acc is None else jax.tree_util.tree_map(
            jnp.add, acc, g)
        for s in range(2):
            cur[s] = {**cur[s], "batch_stats": stats[s]}

    pipe = PipelineExecutor(stages, params, train_stages=train_stages)
    step = pipe.value_and_grad(loss_fn, train=True)
    loss, grads = step(x, y, microbatch=mb)
    np.testing.assert_allclose(float(loss), total, rtol=1e-5)
    for got, want in zip(grads, acc):
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)
    for s in range(2):
        for a, b in zip(jax.tree_util.tree_leaves(
                            pipe.params[s]["batch_stats"]),
                        jax.tree_util.tree_leaves(
                            cur[s]["batch_stats"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_split_detector_train_mode_v4():
    """with_train=True on the real YOLOv4 cut: a full-microbatch PP
    train step equals the single-device train-mode apply (loss, grads,
    updated stats), and merged_variables() round-trips the UPDATED
    running stats into the monolithic tree."""
    from tf2_yolo_tpu.models import YoloV4

    anchors = np.stack([np.linspace(0.1, 0.8, 9),
                        np.linspace(0.1, 0.7, 9)], axis=1)
    module = YoloV4(anchors=anchors, class_num=2)
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x[:1], train=False)

    stages, params, train_stages = split_yolov4(
        module, variables, with_train=True)
    pipe = PipelineExecutor(stages, params, train_stages=train_stages)

    def loss_fn(out, *_):
        return sum(jnp.mean(jnp.log1p(o ** 2)) for o in out)

    def composed(p, xin):
        out, mut = module.apply({**variables, "params": p}, xin,
                                train=True, mutable=["batch_stats"])
        return loss_fn(out), mut["batch_stats"]

    (want_l, want_stats), want_g = jax.value_and_grad(
        composed, has_aux=True)(variables["params"], x)
    # conditioning calibration (same criterion as test_packed_region):
    # train-mode BN gradients of the untrained net amplify 1e-6 input
    # perturbations by orders of magnitude, so a fixed tolerance can't
    # separate two-compiled-partition rounding from bugs — bound the
    # cut's error by the oracle's OWN sensitivity instead
    cond_g = jax.grad(lambda p, xin: composed(p, xin)[0])(
        variables["params"], x + 1e-6)

    step = pipe.value_and_grad(loss_fn)
    loss, grads = step(x, microbatch=None)
    np.testing.assert_allclose(float(loss), float(want_l), rtol=1e-3)

    def stage_view(tree):
        return [
            {"backbone": tree["backbone"]},
            {k: v for k, v in tree.items() if k != "backbone"},
        ]

    for got_g, want_gs, cond_gs in zip(grads, stage_view(want_g),
                                       stage_view(cond_g)):
        ga = jax.tree_util.tree_leaves_with_path(got_g)
        wa = jax.tree_util.tree_leaves_with_path(want_gs)
        ca = jax.tree_util.tree_leaves_with_path(cond_gs)
        assert [p for p, _ in ga] == [p for p, _ in wa]
        for (pth, a), (_, b), (_, c) in zip(ga, wa, ca):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            c = np.asarray(c, np.float64)
            nb = max(np.linalg.norm(b), 1e-12)
            err = np.linalg.norm(a - b) / nb
            err_cond = np.linalg.norm(c - b) / nb
            assert err < max(100 * err_cond, 5e-3), (pth, err,
                                                     err_cond)
            assert err < 0.2, (pth, err)

    # merged tree carries the updated stats (== oracle stats)
    merged = pipe.merged_variables()
    got = jax.tree_util.tree_leaves_with_path(merged["batch_stats"])
    want = jax.tree_util.tree_leaves_with_path(
        jax.device_get(want_stats))
    assert [p for p, _ in got] == [p for p, _ in want]
    changed = 0
    init_map = dict(jax.tree_util.tree_leaves_with_path(
        jax.device_get(variables["batch_stats"])))
    for (pth, a), (_, b) in zip(got, want):
        # the two compiled partitions reassociate the batch-stat
        # reductions: ~2e-6 absolute on near-zero means/vars
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
        if not np.array_equal(np.asarray(a), np.asarray(init_map[pth])):
            changed += 1
    assert changed > 0


def test_split_detector_all_families():
    """split_detector: the generic backbone|neck cut reproduces the
    monolithic eval forward for every detector family (v1, v2, v3
    full + tiny) — pipeline parallelism is family-generic."""
    from tf2_yolo_tpu.models import YoloV1, YoloV2, YoloV3

    rng = np.random.RandomState(5)
    anchors5 = np.stack([np.linspace(0.1, 0.8, 5),
                         np.linspace(0.1, 0.7, 5)], axis=1)
    anchors9 = np.stack([np.linspace(0.1, 0.8, 9),
                         np.linspace(0.1, 0.7, 9)], axis=1)
    anchors6 = anchors9[:6]
    cases = [
        (YoloV1(bbox_num=2, class_num=2), 64),
        (YoloV2(anchors=anchors5, class_num=2), 64),
        (YoloV3(anchors=anchors9, class_num=2), 64),
        (YoloV3(anchors=anchors6, class_num=2,
                backbone="tiny_darknet"), 64),
    ]
    for module, size in cases:
        x = jnp.asarray(rng.rand(2, size, size, 3), jnp.float32)
        variables = module.init(jax.random.PRNGKey(0), x[:1],
                                train=False)
        stages, params = split_detector(module, variables)
        assert set(params[0]["params"]) == {"backbone"}
        assert set(params[0]["params"]) | set(params[1]["params"]) \
            == set(variables["params"])
        pipe = PipelineExecutor(stages, params)
        got = pipe.run(x, microbatch=1)
        want = module.apply(variables, x, train=False)
        got_l = got if isinstance(got, (list, tuple)) else [got]
        want_l = want if isinstance(want, (list, tuple)) else [want]
        for g, w in zip(got_l, want_l):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-3, atol=1e-5)
