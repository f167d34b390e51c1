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


if __name__ == "__main__":
    main()
