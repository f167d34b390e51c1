"""Demo: multi-device training on a mesh (virtual CPU devices here,
real chips on a TPU slice — the code is identical).

Shows the three sharding strategies:
  - data parallel: batch split over the "data" axis (default in
    Model.fit — this script shows the raw pjit path underneath);
  - spatial partitioning: image height additionally split over a
    "space" axis for inputs too large per device;
  - tensor parallel: wide conv kernels channel-split over a "model"
    axis for models too wide per device (Model.compile(n_model=N)
    is the engine-level knob).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_sharded.py --cpu
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--steps", type=int, default=5)
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tf2_yolo_tpu.models import YoloV2
    from tf2_yolo_tpu.ops import wrap_yolo_loss_v2
    from tf2_yolo_tpu.parallel import (make_mesh, make_mesh_spatial,
                                       batch_sharding, spatial_sharding,
                                       replicated, make_optimizer,
                                       create_train_state,
                                       make_train_step)

    n_dev = len(jax.devices())
    print(f"{n_dev} {jax.devices()[0].platform} devices")

    anchors = np.array([[0.2, 0.2], [0.45, 0.35]], np.float32)
    module = YoloV2(anchors=anchors, class_num=2)
    rng = np.random.RandomState(0)
    batch, size = 2 * n_dev, 64
    x = rng.rand(batch, size, size, 3).astype(np.float32)
    y = np.zeros((batch, size // 32, size // 32, 7), np.float32)
    y[:, 0, 0] = [0.5, 0.5, 0.3, 0.3, 1, 1, 0]

    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, size, size, 3)), train=False)
    tx = make_optimizer("adam", 1e-3)
    loss_fn = wrap_yolo_loss_v2((size // 32, size // 32), 2, 2, anchors)
    step = jax.jit(make_train_step(module.apply, tx, [loss_fn]))

    # -- data parallel: batch over all devices -------------------------
    mesh = make_mesh(n_dev)
    state = jax.device_put(create_train_state(variables, tx),
                           replicated(mesh))
    xb = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    yb = jax.device_put(jnp.asarray(y), batch_sharding(mesh))
    for i in range(args.steps):
        state, logs = step(state, xb, (yb,))
        print(f"dp   step {i + 1}: loss {float(logs['loss']):.4f}")

    # -- data x space: height spatially partitioned --------------------
    if n_dev % 2 == 0:
        smesh = make_mesh_spatial(n_data=n_dev // 2, n_space=2)
        sstate = jax.device_put(create_train_state(variables, tx),
                                replicated(smesh))
        xs = jax.device_put(jnp.asarray(x), spatial_sharding(smesh))
        ys = jax.device_put(jnp.asarray(y), batch_sharding(smesh))
        for i in range(args.steps):
            sstate, logs = step(sstate, xs, (ys,))
            print(f"dpxs step {i + 1}: loss {float(logs['loss']):.4f}")

    # -- data x model: tensor parallelism ------------------------------
    if n_dev % 2 == 0:
        from tf2_yolo_tpu.parallel import tensor_parallel_shardings
        tmesh = make_mesh(n_data=n_dev // 2, n_model=2)
        tstate = create_train_state(variables, tx)
        tstate = jax.device_put(
            tstate, tensor_parallel_shardings(tstate, tmesh,
                                              min_channels=64))
        xt = jax.device_put(jnp.asarray(x), batch_sharding(tmesh))
        yt = jax.device_put(jnp.asarray(y), batch_sharding(tmesh))
        for i in range(args.steps):
            tstate, logs = step(tstate, xt, (yt,))
            print(f"dpxm step {i + 1}: loss {float(logs['loss']):.4f}")

    # -- pipeline parallelism: stage-split across devices (MPMD) -------
    if n_dev >= 2:
        import optax
        from tf2_yolo_tpu.models import YoloV4
        from tf2_yolo_tpu.ops import wrap_yolo_loss_v4
        from tf2_yolo_tpu.parallel import (PipelineExecutor,
                                           split_yolov4)

        anchors9 = np.stack([np.linspace(0.05, 0.75, 9),
                             np.linspace(0.07, 0.65, 9)], axis=1)
        v4 = YoloV4(anchors=anchors9, class_num=2)
        xp = jnp.asarray(rng.rand(4, 96, 96, 3), jnp.float32)
        pvars = v4.init(jax.random.PRNGKey(0), xp[:1], train=False)
        outs = v4.apply(pvars, xp, train=False)
        grids = [o.shape[1:3] for o in outs]
        lfs = [wrap_yolo_loss_v4(g, 3, 2) for g in grids]
        yps = [jnp.zeros((4, *g, 7), jnp.float32)
               .at[:, 0, 0].set(jnp.asarray([.5, .5, .3, .3, 1, 1, 0]))
               for g in grids]

        # 3 chips: cut the CSP body itself (stem+stages1-3 |
        # stages4-5 | neck+heads); 2 chips: backbone | neck+heads
        n_stages = 3 if n_dev >= 3 else 2
        pipe = PipelineExecutor(*split_yolov4(v4, pvars,
                                              n_stages=n_stages))
        ptx = optax.sgd(1e-4)
        opt_states = pipe.init_opt(ptx)   # params only; BN stats frozen
        pstep = pipe.value_and_grad(
            lambda out, *ys: sum(jnp.mean(lf(yb, o))
                                 for lf, yb, o in zip(lfs, ys, out)))
        for i in range(args.steps):
            loss, grads = pstep(xp, *yps, microbatch=2)
            opt_states = pipe.apply_grads(ptx, opt_states, grads)
            print(f"pipe step {i + 1}: loss {float(loss):.4f} "
                  f"({n_stages} stages on "
                  f"{[str(d) for d in pipe.devices]})")


if __name__ == "__main__":
    main()
