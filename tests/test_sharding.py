"""Distributed correctness on the virtual 8-device CPU mesh
(SURVEY.md §4): sharded train step == single-device train step.

A shallow conv-BN detector head keeps f32 reduction-order noise small
enough for tight comparison (the full backbones amplify ulp-level
all-reduce differences through dozens of BN layers — loss still
matches to ~1e-4 there, asserted separately in the v2 check).
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from tf2_yolo_tpu.models import YoloV2
from tf2_yolo_tpu.models.heads import AnchorHead
from tf2_yolo_tpu.ops import wrap_yolo_loss_v2
from tf2_yolo_tpu.parallel import (make_optimizer, create_train_state,
                                   make_train_step, make_mesh,
                                   batch_sharding, replicated,
                                   best_data_axis)

ANCHORS = np.array([[0.2, 0.2], [0.4, 0.3]], np.float32)


class TinyDetector(nn.Module):
    """2 conv-BN blocks + anchor head; stride 32 via avg pooling."""

    @nn.compact
    def __call__(self, x, train=False):
        from tf2_yolo_tpu.models import ConvBN
        x = ConvBN(16, 3, 2, act="leaky")(x, train)
        x = ConvBN(32, 3, 2, act="leaky")(x, train)
        x = nn.avg_pool(x, (8, 8), (8, 8))
        return AnchorHead(ANCHORS, 2, prob_act="softmax")(x)


def _setup(batch=8):
    model = TinyDetector()
    rng = np.random.RandomState(0)
    x = rng.rand(batch, 64, 64, 3).astype(np.float32)
    y = np.zeros((batch, 2, 2, 7), np.float32)
    for i in range(batch):
        y[i, rng.randint(2), rng.randint(2)] = \
            [0.5, 0.5, 0.3, 0.3, 1, 1, 0]
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    loss_fn = wrap_yolo_loss_v2((2, 2), 2, 2, ANCHORS)
    tx = make_optimizer("sgd", 1e-2)
    state = create_train_state(variables, tx)
    step = make_train_step(model.apply, tx, [loss_fn])
    return state, step, x, y


def test_sharded_step_matches_single_device():
    state, step, x, y = _setup()

    s1 = jax.jit(step)(state, jnp.asarray(x), (jnp.asarray(y),))
    loss1 = float(s1[1]["loss"])
    params1 = s1[0].params

    mesh = make_mesh(8)
    shard = batch_sharding(mesh)
    rep = replicated(mesh)
    state8 = jax.device_put(state, rep)
    x8 = jax.device_put(jnp.asarray(x), shard)
    y8 = jax.device_put(jnp.asarray(y), shard)
    s8 = jax.jit(step)(state8, x8, (y8,))
    loss8 = float(s8[1]["loss"])
    params8 = s8[0].params

    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params1),
                    jax.tree_util.tree_leaves(params8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    # BN batch statistics are global-batch statistics under sharding
    for a, b in zip(jax.tree_util.tree_leaves(s1[0].batch_stats),
                    jax.tree_util.tree_leaves(s8[0].batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_full_v2_sharded_loss_close():
    """Full DarkNet-19: loss equivalence within deep-net f32 noise."""
    model = YoloV2(anchors=ANCHORS, class_num=2)
    rng = np.random.RandomState(1)
    x = rng.rand(8, 64, 64, 3).astype(np.float32)
    y = np.zeros((8, 2, 2, 7), np.float32)
    y[:, 0, 0] = [0.5, 0.5, 0.3, 0.3, 1, 1, 0]
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    loss_fn = wrap_yolo_loss_v2((2, 2), 2, 2, ANCHORS)
    tx = make_optimizer("sgd", 1e-2)
    state = create_train_state(variables, tx)
    step = make_train_step(model.apply, tx, [loss_fn])

    loss1 = float(jax.jit(step)(
        state, jnp.asarray(x), (jnp.asarray(y),))[1]["loss"])
    mesh = make_mesh(8)
    s8 = jax.device_put(state, replicated(mesh))
    x8 = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    y8 = jax.device_put(jnp.asarray(y), batch_sharding(mesh))
    loss8 = float(jax.jit(step)(s8, x8, (y8,))[1]["loss"])
    np.testing.assert_allclose(loss8, loss1, rtol=1e-3)


def test_tensor_parallel_step_matches_single_device():
    """Megatron-style channel sharding over the 'model' axis
    (tensor_parallel_shardings): a (data=4, model=2) mesh must produce
    the same loss, updated params, and BN statistics as one device —
    GSPMD inserts the Cin-contraction all-reduces that make the
    channel-sharded convs exact."""
    from jax.sharding import PartitionSpec as P
    from tf2_yolo_tpu.parallel import tensor_parallel_shardings

    state, step, x, y = _setup()
    s1 = jax.jit(step)(state, jnp.asarray(x), (jnp.asarray(y),))
    loss1 = float(s1[1]["loss"])

    mesh = make_mesh(n_data=4, n_model=2)
    rules = tensor_parallel_shardings(state, mesh, min_channels=16)
    # the rule must actually shard the conv kernels at this gate
    sharded = [s for s in jax.tree_util.tree_leaves(
        rules, is_leaf=lambda l: hasattr(l, "spec"))
        if s.spec != P()]
    assert sharded, "no leaf was sharded over the model axis"
    stp = jax.device_put(state, rules)
    xs = jax.device_put(jnp.asarray(x),
                        jax.NamedSharding(mesh, P("data")))
    ys = jax.device_put(jnp.asarray(y),
                        jax.NamedSharding(mesh, P("data")))
    stp2, logs = jax.jit(step)(stp, xs, (ys,))
    np.testing.assert_allclose(float(logs["loss"]), loss1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1[0].params),
                    jax.tree_util.tree_leaves(stp2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1[0].batch_stats),
                    jax.tree_util.tree_leaves(stp2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_engine_fit_tensor_parallel():
    """Model.compile(n_model=2): the keras-like engine trains over a
    (data=4, model=2) mesh with channel-sharded state and produces the
    same loss trajectory as pure data parallelism."""
    from tf2_yolo_tpu.engine import Model

    rng = np.random.RandomState(0)
    x = rng.rand(8, 64, 64, 3).astype(np.float32)
    y = np.zeros((8, 2, 2, 7), np.float32)
    y[:, 0, 0] = [0.5, 0.5, 0.3, 0.3, 1, 1, 0]
    loss_fn = wrap_yolo_loss_v2((2, 2), 2, 2, ANCHORS)

    histories = []
    for n_model in (1, 2):
        model = Model(TinyDetector(), (64, 64, 3), seed=0)
        # tp_min_channels low enough that the 16/32-channel convs
        # actually shard (default gate is 128 for the real backbones)
        model.compile("sgd", loss=loss_fn, learning_rate=1e-2,
                      n_model=n_model, tp_min_channels=16)
        h = model.fit(x, y, epochs=2, batch_size=8, verbose=0)
        histories.append(h["loss"])
    np.testing.assert_allclose(histories[1], histories[0], rtol=1e-5)


def test_put_global_batch():
    """put_global_batch binds host rows into a P('data')-sharded
    global array (single-process: equivalent to sharded device_put;
    the same call is the multi-host assembly path) and feeds the
    train step to the same loss."""
    from tf2_yolo_tpu.parallel import (put_global_batch,
                                       process_batch_slice)

    state, step, x, y = _setup()
    mesh = make_mesh(8)
    sl = process_batch_slice(x.shape[0])
    assert sl == slice(0, 8)            # single-process: all rows
    xg = put_global_batch(mesh, x[sl])
    yg = put_global_batch(mesh, y[sl])
    assert xg.shape == x.shape
    assert xg.sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(xg), x)

    loss_ref = float(jax.jit(step)(
        state, jnp.asarray(x), (jnp.asarray(y),))[1]["loss"])
    s8 = jax.device_put(state, replicated(mesh))
    loss_g = float(jax.jit(step)(s8, xg, (yg,))[1]["loss"])
    np.testing.assert_allclose(loss_g, loss_ref, rtol=1e-5)


def test_best_data_axis():
    assert best_data_axis(8, 8) == 8
    assert best_data_axis(6, 8) == 6
    assert best_data_axis(7, 4) == 1
    assert best_data_axis(12, 8) == 6


class TinyDetectorNoBN(nn.Module):
    """BN-free variant: plain convs + anchor head. Needed for exact
    gradient-accumulation equivalence — BatchNorm train-mode statistics
    differ between half-batches and the full batch, so only a BN-free
    model has per-sample-decomposable gradients."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(16, (3, 3), (2, 2))(x)
        x = nn.leaky_relu(x, 0.1)
        x = nn.Conv(32, (3, 3), (2, 2))(x)
        x = nn.leaky_relu(x, 0.1)
        x = nn.avg_pool(x, (8, 8), (8, 8))
        return AnchorHead(ANCHORS, 2, prob_act="softmax")(x)


def test_gradient_accumulation_matches_big_batch():
    """MultiSteps(k=2) on two half-batches == one step on the full
    batch. Exact for SGD because the loss is sum(mean_over_batch(...)):
    loss(full) = (loss(h1) + loss(h2)) / 2, so the full-batch gradient
    is the average of the half-batch gradients — which is exactly what
    MultiSteps accumulates before the single inner update."""
    from tf2_yolo_tpu.parallel import make_optimizer, create_train_state, \
        make_train_step
    from tf2_yolo_tpu.ops import wrap_yolo_loss_v2

    model = TinyDetectorNoBN()
    rng = np.random.RandomState(0)
    x = rng.rand(8, 64, 64, 3).astype(np.float32)
    y = np.zeros((8, 2, 2, 7), np.float32)
    for i in range(8):
        y[i, rng.randint(2), rng.randint(2)] = \
            [0.5, 0.5, 0.3, 0.3, 1, 1, 0]
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    loss_fn = wrap_yolo_loss_v2((2, 2), 2, 2, ANCHORS)

    tx1 = make_optimizer("sgd", 1e-2)
    st1 = create_train_state(variables, tx1)
    step1 = jax.jit(make_train_step(model.apply, tx1, [loss_fn]))
    st1, _ = step1(st1, jnp.asarray(x), (jnp.asarray(y),))

    tx2 = make_optimizer("sgd", 1e-2, accumulate_steps=2)
    st2 = create_train_state(variables, tx2)
    step2 = jax.jit(make_train_step(model.apply, tx2, [loss_fn]))
    st2, _ = step2(st2, jnp.asarray(x[:4]), (jnp.asarray(y[:4]),))
    mid_params = st2.params
    # first microstep only accumulates — params must not move yet
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(mid_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    st2, _ = step2(st2, jnp.asarray(x[4:]), (jnp.asarray(y[4:]),))

    # after the second microstep: identical to the full-batch update
    # (up to f32 reduction-order noise: mean over 8 vs two means of 4)
    moved = False
    for a, b, init in zip(jax.tree_util.tree_leaves(st1.params),
                          jax.tree_util.tree_leaves(st2.params),
                          jax.tree_util.tree_leaves(variables["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
        moved = moved or not np.array_equal(np.asarray(a),
                                            np.asarray(init))
    assert moved, "optimizer never updated any parameter"
    assert int(st2.step) == 2


def test_evaluate_shards_like_fit():
    """Model.evaluate must run on the data mesh (state replicated,
    batch sharded) and agree with a directly-computed single-device
    eval step (VERDICT round-1 weak #7: eval used to bypass the mesh)."""
    from tf2_yolo_tpu.engine import Model
    from tf2_yolo_tpu.parallel import make_eval_step

    model = TinyDetector()
    eng = Model(model, (64, 64, 3))
    loss_fn = wrap_yolo_loss_v2((2, 2), 2, 2, ANCHORS)
    eng.compile("sgd", loss=loss_fn)

    rng = np.random.RandomState(0)
    x = rng.rand(16, 64, 64, 3).astype(np.float32)
    y = np.zeros((16, 2, 2, 7), np.float32)
    y[:, 0, 1] = [0.5, 0.5, 0.3, 0.3, 1, 0, 1]

    logs = eng.evaluate(x, y, batch_size=8, verbose=0)

    eng._ensure_state()
    direct = make_eval_step(model.apply, [loss_fn])
    l1 = float(jax.jit(direct)(
        eng._state, jnp.asarray(x[:8]), (jnp.asarray(y[:8]),))["loss"])
    l2 = float(jax.jit(direct)(
        eng._state, jnp.asarray(x[8:]), (jnp.asarray(y[8:]),))["loss"])
    np.testing.assert_allclose(logs["loss"], (l1 + l2) / 2, rtol=1e-5)

    # the state was actually placed on the 8-device mesh
    leaf = jax.tree_util.tree_leaves(eng._state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_fit_with_validation_remainder_mesh_switch():
    """A validation remainder batch lands on a smaller mesh; the NEXT
    epoch's train step must still see state and batch on the same
    device set (regression: evaluate() used its own mesh tracker and
    left the state on the validation mesh while fit's cached tracker
    skipped re-placement)."""
    from tf2_yolo_tpu.engine import Model

    model = Model(TinyDetector(), (64, 64, 3))
    loss_fn = wrap_yolo_loss_v2((2, 2), 2, 2, ANCHORS)
    model.compile("sgd", loss=loss_fn, learning_rate=1e-2)

    rng = np.random.RandomState(0)
    x = rng.rand(16, 64, 64, 3).astype(np.float32)
    y = np.zeros((16, 2, 2, 7), np.float32)
    y[:, 0, 0] = [0.5, 0.5, 0.3, 0.3, 1, 1, 0]
    # 12 validation rows -> batches of 8 and 4: the 4-row remainder
    # moves the state onto a 4-device mesh mid-epoch
    history = model.fit(x, y, epochs=2, batch_size=8, shuffle=False,
                        verbose=0, validation_data=(x[:12], y[:12]))
    assert len(history["loss"]) == 2
    assert np.isfinite(history["loss"]).all()
    assert np.isfinite(history["val_loss"]).all()


def test_spatial_partitioning_forward_and_train():
    """SURVEY §2.3 large-input axis: image HEIGHT sharded over a
    'space' mesh axis. GSPMD must insert conv halo exchanges so the
    spatially-partitioned result equals the unsharded one — forward
    (darknet asymmetric pads included) and a full train step (BN batch
    statistics reduce across spatial shards too)."""
    from tf2_yolo_tpu.parallel import (make_mesh_spatial,
                                       spatial_sharding)

    state, step, x, y = _setup(batch=4)
    step = jax.jit(step)
    ref_state, ref_logs = step(state, jnp.asarray(x), (jnp.asarray(y),))

    mesh = make_mesh_spatial(n_data=2, n_space=4)
    xs = jax.device_put(jnp.asarray(x), spatial_sharding(mesh))
    ys = jax.device_put(jnp.asarray(y), batch_sharding(mesh))
    st = jax.device_put(state, replicated(mesh))
    sh_state, sh_logs = step(st, xs, (ys,))

    np.testing.assert_allclose(float(sh_logs["loss"]),
                               float(ref_logs["loss"]), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(sh_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_spatial_halo_exchange_is_thin():
    """Pin the STRUCTURE of the spatial partitioning's compiled
    communication, not just its values: GSPMD must implement the conv
    overlap as collective-permutes of halo-THIN row slices between
    neighboring spatial shards. A regression in the sharding
    annotations typically degrades to all-gathering the height axis —
    which still passes the value test above while moving every
    activation over ICI (the round-2 multichip dryrun's 20 s
    rendezvous warnings were single-core thread serialization of the
    8 virtual devices, but this is the failure mode they'd mask on
    real hardware)."""
    import re
    from tf2_yolo_tpu.parallel import (make_mesh_spatial,
                                       spatial_sharding)

    state, step, x, y = _setup(batch=4)
    mesh = make_mesh_spatial(n_data=2, n_space=4)
    xs = jax.device_put(jnp.asarray(x), spatial_sharding(mesh))
    ys = jax.device_put(jnp.asarray(y), batch_sharding(mesh))
    st = jax.device_put(state, replicated(mesh))
    hlo = jax.jit(step).lower(st, xs, (ys,)).compile().as_text()

    # x is (4,64,64,3) over space=4 -> 16-row shards (8 after the
    # first stride-2 conv); every 4D collective-permute must be
    # halo-thin in H. Legitimate maxima observed: 3x3 forward halos
    # are 2-3 rows, stride-2 backward (input-cotangent) halos up to 6,
    # and the 8x8 avg-pool exchanges whole 4-row stage-2 shards. A
    # height-axis gather of the 16-row input shards would exceed this.
    cperms = re.findall(
        r"collective-permute[^=]*=\s*\S+?\[([\d,]+)\]", hlo)
    shapes = [tuple(int(d) for d in s.split(",")) for s in cperms]
    conv_halos = [s for s in shapes if len(s) == 4]
    assert conv_halos, (
        "no conv halo exchange found — spatial sharding not engaged?")
    for s in conv_halos:
        assert s[1] <= 6, (
            f"collective-permute moves a {s[1]}-row slice (shape {s})"
            f" — halo exchange degraded to bulk activation movement")

    # total permute traffic stays a small fraction of the activations
    # it shadows. Halos + the pool's end-of-spatial-axis reshard (the
    # 8x8 window collapses H to 2, funneling stage-2 shards to one
    # device — those pairs legitimately hop >1) measure ~44k floats vs
    # ~147k forward activation floats; a height-axis redistribution of
    # any full stage roughly doubles it.
    act_floats = 4 * (64 * 64 * 3 + 32 * 32 * 16 + 16 * 16 * 32)
    moved = sum(int(np.prod(s)) for s in conv_halos)
    assert moved < 0.5 * act_floats, (
        f"collective-permutes move {moved} floats "
        f"(~{moved / act_floats:.0%} of forward activations) — "
        f"spatial comm degraded to bulk redistribution")

    # no height all-gather: any all-gather of a 4D activation would be
    # >= a full shard; grads/stats all-reduce instead (1D/param-sized)
    for s in re.findall(r"all-gather[^=]*=\s*\S+?\[([\d,]+)\]", hlo):
        dims = tuple(int(d) for d in s.split(","))
        if len(dims) == 4:
            assert dims[1] <= 6, (
                f"all-gather of activation rows (shape {dims})")


def test_ema_smoothed_updates():
    """ema_decay chains optax.ema after the base optimizer: with plain
    SGD (no momentum) the applied update must equal the debiased EMA
    of the raw SGD updates, step by step."""
    import optax
    from tf2_yolo_tpu.parallel import make_optimizer

    lr, decay = 0.1, 0.5
    tx = make_optimizer(optax.sgd(lr), ema_decay=decay)
    params = {"w": jnp.asarray(2.0)}
    opt = tx.init(params)

    ema_acc, applied = 0.0, []
    for step in range(1, 4):
        g = {"w": jnp.asarray(float(step))}       # raw grads 1, 2, 3
        updates, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, updates)
        raw = -lr * float(step)                   # sgd update
        ema_acc = decay * ema_acc + (1 - decay) * raw
        debias = 1 - decay ** step                # optax.ema debiases
        applied.append(ema_acc / debias)
        np.testing.assert_allclose(float(updates["w"]),
                                   applied[-1], rtol=1e-6)


def test_compile_xla_options_plumbed():
    """xla_options reaches the jit: a benign option compiles and
    trains; a bogus option surfaces an error naming the flag."""
    import pytest
    from tf2_yolo_tpu.engine import Model

    model = Model(TinyDetectorNoBN(), (64, 64, 3))
    loss_fn = wrap_yolo_loss_v2((2, 2), 2, 2, ANCHORS)
    x = np.random.RandomState(0).rand(8, 64, 64, 3).astype(np.float32)
    y = np.zeros((8, 2, 2, 7), np.float32)
    y[:, 0, 0] = [0.5, 0.5, 0.3, 0.3, 1, 1, 0]

    model.compile("sgd", loss=loss_fn,
                  xla_options={"xla_backend_optimization_level": "2"})
    hist = model.fit(x, y, epochs=1, batch_size=8, verbose=0)
    assert np.isfinite(hist["loss"][0])

    model.compile("sgd", loss=loss_fn,
                  xla_options={"xla_not_a_real_flag": "1"})
    with pytest.raises(Exception, match="xla_not_a_real_flag"):
        model.fit(x, y, epochs=1, batch_size=8, verbose=0)


def test_dp_allreduce_is_gradient_sized():
    """Pin the STRUCTURE of data-parallel communication: the sharded
    train step's all-reduces must move gradient/BN-stat-sized tensors
    (params are replicated, batch is sharded), never activations. A
    sharding-annotation regression typically degrades to re-gathering
    activations across the data axis — value tests still pass (the
    math is equivalent) while every step pays activation-volume ICI
    traffic on real hardware."""
    import re

    state, step, x, y = _setup()
    mesh = make_mesh(8)
    st = jax.device_put(state, replicated(mesh))
    x8 = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    y8 = jax.device_put(jnp.asarray(y), batch_sharding(mesh))
    hlo = jax.jit(step).lower(st, x8, (y8,)).compile().as_text()

    n_params = sum(np.prod(l.shape) for l in
                   jax.tree_util.tree_leaves(state.params))
    n_stats = sum(np.prod(l.shape) for l in
                  jax.tree_util.tree_leaves(state.batch_stats))
    # smallest activation tensor in this net: conv2 output shards
    # (8, 16, 16, 32) -> full (global) form 65536 elements; gradient
    # all-reduces (even combiner-fused) stay well under it.
    budget = 3 * (n_params + n_stats)

    sizes = []
    for shape_s in re.findall(
            r"all-reduce(?:-start)?[^=]*=\s*\(?[a-z0-9]+\[([\d,]*)\]",
            hlo):
        dims = [int(d) for d in shape_s.split(",") if d]
        sizes.append(int(np.prod(dims)) if dims else 1)
    assert sizes, "expected gradient all-reduces in the DP step HLO"
    assert max(sizes) <= budget, (max(sizes), budget)
    assert sum(sizes) <= 4 * budget, (sum(sizes), budget)


def test_tp_collectives_are_channel_gathers():
    """Pin the STRUCTURE of tensor-parallel communication. With every
    eligible conv kernel sharded on Cout (tensor_parallel_shardings),
    GSPMD must resolve consecutive sharded convs by all-gathering the
    channel-sharded activation over the *model* axis — channel-dim
    gathers bounded by one layer's activation — while all-reduces stay
    gradient/BN-stat-sized as in the DP step. A regression typically
    shows up as batch-dim gathers (resharding the data axis), an
    all-to-all, or whole-forward activation re-materialization."""
    import re

    from tf2_yolo_tpu.parallel import tensor_parallel_shardings

    state, step, x, y = _setup()
    mesh = make_mesh(n_data=4, n_model=2)
    rules = tensor_parallel_shardings(state, mesh, min_channels=16)
    st = jax.device_put(state, rules)
    xb = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    yb = jax.device_put(jnp.asarray(y), batch_sharding(mesh))
    hlo = jax.jit(step).lower(st, xb, (yb,)).compile().as_text()

    assert "all-to-all" not in hlo
    assert "collective-permute" not in hlo

    # every all-gather: channel dim (NHWC dim 3), no bigger than the
    # largest per-shard conv input incl. halo padding (2x slack)
    gathers = re.findall(
        r"all-gather(?:-start)?[^=]*= [a-z0-9]+\[([\d,]+)\][^\n]*"
        r"dimensions=\{(\d+)\}", hlo)
    assert gathers, "expected channel all-gathers between TP convs"
    act_budget = 2 * (2 * 33 * 33 * 16)   # ConvBN_1 padded input, b=2/shard
    for shape_s, dim in gathers:
        dims = [int(d) for d in shape_s.split(",")]
        assert len(dims) < 4 or int(dim) == 3, (shape_s, dim)
        assert int(np.prod(dims)) <= act_budget, (shape_s, act_budget)

    # all-reduces: the backward of each channel all-gather is an
    # activation-sized cotangent sum over the MODEL axis (group size
    # 2); everything reduced over groups touching the DATA axis (size
    # 4 or 8) must stay gradient/BN-stat-sized.
    n_params = sum(np.prod(l.shape) for l in
                   jax.tree_util.tree_leaves(state.params))
    n_stats = sum(np.prod(l.shape) for l in
                  jax.tree_util.tree_leaves(state.batch_stats))
    budget = 3 * (n_params + n_stats)
    seen_data_axis = False
    for shape_s, gsize in re.findall(
            r"all-reduce(?:-start)?[^=]*=\s*\(?[a-z0-9]+\[([\d,]*)\]"
            r"[^\n]*replica_groups=\[\d+,(\d+)\]", hlo):
        dims = [int(d) for d in shape_s.split(",") if d]
        size = int(np.prod(dims)) if dims else 1
        if int(gsize) == 2:          # model axis: gather backward
            assert size <= act_budget, (shape_s, act_budget)
        else:                        # data axis (or both): gradients
            seen_data_axis = True
            assert size <= budget, (shape_s, budget)
    assert seen_data_axis, "expected data-axis gradient all-reduces"
