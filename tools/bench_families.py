"""Per-family TPU throughput: train + inference for YOLOv1/v2/v3.

bench.py / bench_infer.py measure the flagship (YOLOv4); this tool
completes the measured envelope across the reference's other three
model families (reference yolov1_5/yolov2/yolov3 packages), printing
one JSON line per family:

    {"family": "yolov2", "train_img_per_sec": ..., "infer_img_per_sec":
     ..., "size": 416, "train_batch": ..., "infer_batch": ..., ...}

Train = the full jitted step (forward + loss + backward + Adam).
Infer = eval-mode forward + device decode (top-k) + greedy NMS — the
same end-to-end deployment program bench_infer.py times for v4.
Timing protocol per CLAUDE.md: device-resident inputs, pipelined
dispatch, completion fenced by one small host fetch.

Env knobs: BENCH_VERSIONS="1,2,3" (comma list), BENCH_BATCH (train,
default 128), BENCH_INFER_BATCH (default 128), BENCH_CLASSES (3),
BENCH_STEPS (10), BENCH_XLA_OPTS (JSON; default scoped-vmem 24576 as
measured optimal for the v4 programs — applies on TPU only).
v1 runs at 448 px (grid = input//64, reference yolov1_5 default);
v2/v3 at 416 px (grid = input//32). Override with BENCH_SIZE.
"""

import json
import os
import time

import numpy as np

VERSIONS = [int(v) for v in
            os.environ.get("BENCH_VERSIONS", "1,2,3").split(",")]
TRAIN_BATCH = int(os.environ.get("BENCH_BATCH", "128"))
INFER_BATCH = int(os.environ.get("BENCH_INFER_BATCH", "128"))
CLASSES = int(os.environ.get("BENCH_CLASSES", "3"))
STEPS = int(os.environ.get("BENCH_STEPS", "10"))
MAX_BOXES = int(os.environ.get("BENCH_MAX_BOXES", "128"))
WARMUP = 3
XLA_OPTS = json.loads(os.environ.get(
    "BENCH_XLA_OPTS", '{"xla_tpu_scoped_vmem_limit_kib": "24576"}'))


def _labels(rng, batch, grids, class_num, bbox_or_abox, version):
    """Random sparse grid labels, 4 boxes/image, reference layouts
    ((N,S,S,5+C) ground truth for every family)."""
    ys = []
    for g in grids:
        y = np.zeros((batch, g, g, 5 + class_num), np.float32)
        for b in range(batch):
            for _ in range(4):
                gy, gx = rng.randint(0, g, 2)
                y[b, gy, gx, :5] = [*rng.rand(2), 0.2, 0.3, 1.0]
                y[b, gy, gx, 5 + rng.randint(class_num)] = 1.0
        ys.append(y)
    return ys


def bench_family(version):
    import jax
    import jax.numpy as jnp
    from tf2_yolo_tpu.models import YoloV1, YoloV2, YoloV3
    from tf2_yolo_tpu.ops import (wrap_yolo_loss_v1, wrap_yolo_loss_v2,
                                  wrap_yolo_loss_v3)
    from tf2_yolo_tpu.ops.decode import decode_multi_level
    from tf2_yolo_tpu.ops.nms import apply_nms_device
    from tf2_yolo_tpu.parallel import (make_optimizer,
                                       create_train_state,
                                       make_train_step)

    platform = jax.devices()[0].platform
    dt = jnp.bfloat16 if platform != "cpu" else jnp.float32
    size = int(os.environ.get(
        "BENCH_SIZE", "448" if version == 1 else "416"))
    rng = np.random.RandomState(0)

    if version == 1:
        module = YoloV1(bbox_num=2, class_num=CLASSES, dtype=dt)
        grids = [size // 64]
        loss_fns = [wrap_yolo_loss_v1((grids[0], grids[0]), 2, CLASSES)]
    elif version == 2:
        anchors = np.stack([np.linspace(0.08, 0.7, 5),
                            np.linspace(0.1, 0.6, 5)], axis=1)
        module = YoloV2(anchors=anchors, class_num=CLASSES, dtype=dt)
        grids = [size // 32]
        loss_fns = [wrap_yolo_loss_v2((grids[0], grids[0]), 5, CLASSES,
                                      anchors)]
    elif version == 3:
        anchors = np.stack([np.linspace(0.05, 0.75, 9),
                            np.linspace(0.07, 0.65, 9)], axis=1)
        module = YoloV3(anchors=anchors, class_num=CLASSES, dtype=dt)
        g0 = size // 32
        grids = [g0 * (2 ** level) for level in range(3)]
        loss_fns = [wrap_yolo_loss_v3(
            (g, g), 3, CLASSES, anchors[3 * i:3 * i + 3])
            for i, g in enumerate(grids)]
    else:
        raise ValueError("bench.py/bench_infer.py cover v4")

    x = jnp.asarray(
        rng.rand(TRAIN_BATCH, size, size, 3).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x[:1], train=False)
    ys = tuple(jnp.asarray(y) for y in
               _labels(rng, TRAIN_BATCH, grids, CLASSES, None, version))

    opts = XLA_OPTS if platform == "tpu" else {}

    # ---- train ----
    tx = make_optimizer("adam", 1e-3)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(module.apply, tx, loss_fns),
                   donate_argnums=0)
    step = step.lower(state, x, ys).compile(compiler_options=opts
                                            or None)
    for _ in range(WARMUP):
        state, logs = step(state, x, ys)
    jax.block_until_ready(logs["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, logs = step(state, x, ys)
    jax.block_until_ready(logs["loss"])
    train_rate = TRAIN_BATCH * STEPS / (time.perf_counter() - t0)

    # ---- inference (fresh variables: train donated the originals) ----
    xi = jnp.asarray(
        rng.rand(INFER_BATCH, size, size, 3).astype(np.float32))
    variables = jax.device_put(
        module.init(jax.random.PRNGKey(0), xi[:1], train=False))

    def infer(variables, x):
        outs = module.apply(variables, x, train=False)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        rows, valid = decode_multi_level(
            outs, class_num=CLASSES, threshold=0.5,
            max_boxes=MAX_BOXES, version=version)
        rows, keep = apply_nms_device(rows, valid, nms_mode=1,
                                      nms_threshold=0.45)
        return rows, keep

    infer_fn = jax.jit(infer).lower(variables, xi).compile(
        compiler_options=opts or None)
    rows, keep = infer_fn(variables, xi)
    for _ in range(WARMUP):
        rows, keep = infer_fn(variables, xi)
    np.asarray(keep)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        rows, keep = infer_fn(variables, xi)
    np.asarray(keep)
    infer_rate = INFER_BATCH * STEPS / (time.perf_counter() - t0)

    return {
        "family": f"yolov{'1_5' if version == 1 else version}",
        "size": size,
        "platform": platform,
        "train_batch": TRAIN_BATCH,
        "train_img_per_sec": round(train_rate, 2),
        "infer_batch": INFER_BATCH,
        "infer_img_per_sec": round(infer_rate, 2),
    }


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_bench_cache")
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    for version in VERSIONS:
        print(json.dumps(bench_family(version)), flush=True)


if __name__ == "__main__":
    main()
