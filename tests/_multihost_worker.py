"""Worker process for tests/test_multihost.py.

Runs one process of a 2-process (simulated 2-host) data-parallel
training run: 4 virtual CPU devices per process, gloo cross-process
collectives, this process's disjoint half of the dataset, and the
stock engine.Model.fit path. Writes the loss history and a parameter
digest as JSON for the parent test to compare against the
single-process oracle.

Usage: python _multihost_worker.py <pid> <nprocs> <port> <out.json>
"""

import json
import os
import sys


def main():
    pid, nprocs, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # per-CPU-feature cache dir (see tests/conftest.py: this VM
    # migrates across hosts and foreign AOT entries abort the process)
    import hashlib
    tag = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = "_" + hashlib.sha1(
                        line.encode()).hexdigest()[:10]
                    break
    except OSError:
        pass
    os.environ["JAX_COMPILATION_CACHE_DIR"] = \
        f"/tmp/jax_test_cache{tag}"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tf2_yolo_tpu.parallel import (distributed_initialize,
                                       process_batch_slice)
    distributed_initialize(f"127.0.0.1:{port}", num_processes=nprocs,
                           process_id=pid)
    assert jax.process_count() == nprocs
    assert jax.device_count() == 4 * nprocs

    import numpy as np
    from tf2_yolo_tpu.engine import Model
    from tf2_yolo_tpu.models import YoloV2
    from tf2_yolo_tpu.ops import wrap_yolo_loss_v2

    # Same fixture construction as the parent test (seeded).
    rng = np.random.RandomState(0)
    n, size, classes = 16, 64, 2
    anchors = np.stack([np.linspace(0.1, 0.6, 5),
                        np.linspace(0.15, 0.55, 5)], axis=1)
    x = rng.rand(n, size, size, 3).astype(np.float32)
    g = size // 32
    y = np.zeros((n, g, g, 5 + classes), np.float32)
    for b in range(n):
        gy, gx = rng.randint(0, g, 2)
        y[b, gy, gx, :5] = [*rng.rand(2), 0.3, 0.4, 1.0]
        y[b, gy, gx, 5 + rng.randint(classes)] = 1.0

    sl = process_batch_slice(n)
    model = Model(YoloV2(anchors=anchors, class_num=classes),
                  input_shape=(size, size, 3), seed=0)
    model.compile(optimizer="adam", learning_rate=1e-3,
                  loss=wrap_yolo_loss_v2((g, g), 5, classes, anchors))

    # On the UNTRAINED (identical) params: eval-mode loss over the
    # global batch (exercises the multi-process binding + eval step —
    # deterministic, so the parent compares it TIGHTLY), and the
    # local-devices predict path.
    eval0 = model.evaluate(x[sl], y[sl], batch_size=4,
                           verbose=0)["loss"]
    pred = model.predict(x[sl][:4], batch_size=4)
    pred_abs_sum = float(np.abs(np.float64(pred)).sum())

    history = model.fit(x[sl], y[sl], epochs=2, batch_size=4,
                        shuffle=False, verbose=0)

    leaves = jax.tree_util.tree_leaves(model.variables)
    digest = {
        "eval0": eval0,
        "pred_abs_sum": pred_abs_sum,
        "abs_sum": float(sum(np.abs(np.asarray(l)).sum()
                             for l in leaves)),
        "sum": float(sum(np.asarray(l).sum() for l in leaves)),
    }

    # Multi-process checkpoint/resume: a fresh identically-seeded model
    # trained 1 epoch with process-coordinated Orbax checkpointing
    # (process 0 writes, all processes barrier), then ANOTHER fresh
    # model resumed from that checkpoint to the 2-epoch target, must
    # reproduce the uninterrupted 2-epoch run (`model` above)
    # bit-exactly — params, optimizer trajectory, loss history.
    ck = os.path.join(os.path.dirname(out_path), "ckpt")

    def fresh():
        m = Model(YoloV2(anchors=anchors, class_num=classes),
                  input_shape=(size, size, 3), seed=0)
        m.compile(optimizer="adam", learning_rate=1e-3,
                  loss=wrap_yolo_loss_v2((g, g), 5, classes, anchors))
        return m

    # ONE full-batch train step from the same init (global batch 16 =
    # 8 rows per process): the only cross-process numeric difference
    # is collective reduction order (~1e-6 relative), so the parent
    # asserts TIGHT equality of the step-1 loss and updated-parameter
    # digest against the single-process oracle — the per-step
    # correctness bound that the (BN-chaotic) multi-step trajectory
    # check cannot give.
    model_s = fresh()
    hist_s = model_s.fit(x[sl], y[sl], epochs=1, batch_size=8,
                         shuffle=False, verbose=0)
    ls = jax.tree_util.tree_leaves(model_s.variables)
    digest["step1_loss"] = hist_s["loss"][0]
    digest["step1_abs_sum"] = float(
        sum(np.abs(np.float64(np.asarray(l))).sum() for l in ls))

    # multi-process x tensor parallelism: the same step over a GLOBAL
    # ("data" 4, "model" 2) mesh spanning both processes — the
    # composition the engine must support on real pods. Same global
    # computation, so the loss must match the DP step above.
    model_tp = fresh()
    model_tp.compile(optimizer="adam", learning_rate=1e-3,
                     loss=wrap_yolo_loss_v2((g, g), 5, classes,
                                            anchors),
                     n_model=2)
    hist_tp = model_tp.fit(x[sl], y[sl], epochs=1, batch_size=8,
                           shuffle=False, verbose=0)
    digest["tp_step1_loss"] = hist_tp["loss"][0]

    model_b = fresh()
    model_b.fit(x[sl], y[sl], epochs=1, batch_size=4, shuffle=False,
                verbose=0, checkpoint_dir=ck, checkpoint_every=1)
    model_c = fresh()
    hist_c = model_c.fit(x[sl], y[sl], epochs=2, batch_size=4,
                         shuffle=False, verbose=0, checkpoint_dir=ck,
                         resume=True)
    la = jax.tree_util.tree_leaves(model.variables)
    lc = jax.tree_util.tree_leaves(model_c.variables)
    resume_max_diff = max(
        float(np.abs(np.asarray(a) - np.asarray(c)).max())
        for a, c in zip(la, lc))
    digest["resume_max_diff"] = resume_max_diff
    digest["resume_epochs_run"] = len(hist_c["loss"])
    digest["resume_loss1"] = hist_c["loss"][-1]

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "loss": history["loss"],
                   "digest": digest}, f)


if __name__ == "__main__":
    main()
