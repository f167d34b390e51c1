"""Multi-process (multi-host) training equals single-process training.

A real TPU slice runs one process per host; the engine binds each
process's local batch rows into global arrays over the full mesh
(engine.Model._place / parallel.put_global_batch). This test runs a
REAL 2-process jax.distributed session on CPU (4 virtual devices per
process, gloo collectives — the SURVEY §4 distributed-test strategy
taken one level further than the virtual 8-device mesh) and asserts
the multi-process YOLOv2 training run is numerically identical to the
single-process run over the concatenated data.

The reference has no multi-process story at all (SURVEY.md §2.3).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)   # worker forces cpu itself
    procs, outs = [], []
    for pid in range(2):
        out = tmp / f"p{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port),
             str(out)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    results = []
    logs = []
    for p, out in zip(procs, outs):
        try:
            # each worker compiles ~6 programs; on the shared single
            # vCPU under a concurrent suite that can exceed 15 min
            stdout, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        logs.append(stdout)
        if p.returncode != 0:
            pytest.fail(f"worker failed (rc={p.returncode}):\n{stdout}")
        with open(out) as f:
            results.append(json.load(f))
    return results


def _fixture_data():
    """Must match tests/_multihost_worker.py exactly (same seed)."""
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
    return x, y, anchors, g, classes


def test_two_process_run_matches_single_process(worker_results):
    import jax
    from tf2_yolo_tpu.engine import Model
    from tf2_yolo_tpu.models import YoloV2
    from tf2_yolo_tpu.ops import wrap_yolo_loss_v2

    r0, r1 = worker_results

    # both processes observed the SAME global batches: identical
    # loss history and identical (replicated) trained parameters
    np.testing.assert_allclose(r0["loss"], r1["loss"], rtol=1e-6)
    assert r0["digest"]["abs_sum"] == pytest.approx(
        r1["digest"]["abs_sum"], rel=1e-6)
    assert r0["digest"]["sum"] == pytest.approx(
        r1["digest"]["sum"], rel=1e-6)

    # single-process oracle over the SAME global batch composition:
    # multi-process batch k = [proc0 rows, proc1 rows], i.e. global
    # rows [0:4]+[8:12] then [4:8]+[12:16] per epoch
    x, y, anchors, g, classes = _fixture_data()
    order = np.r_[0:4, 8:12, 4:8, 12:16]
    model = Model(YoloV2(anchors=anchors, class_num=classes),
                  input_shape=(64, 64, 3), seed=0)
    model.compile(optimizer="adam", learning_rate=1e-3,
                  loss=wrap_yolo_loss_v2((g, g), 5, classes, anchors))

    # TIGHT checks on the untrained (identical) params, where the only
    # difference is collective reduction order: the global eval loss
    # (pins the per-process -> global batch binding: any wrong/dropped
    # /duplicated rows shift this at 1e-2 scale) and each process's
    # local predict().
    ev = model.evaluate(x[order], y[order], batch_size=8,
                        verbose=0)["loss"]
    assert r0["digest"]["eval0"] == pytest.approx(ev, rel=1e-5)
    assert r1["digest"]["eval0"] == pytest.approx(ev, rel=1e-5)
    pred0 = model.predict(x[0:4], batch_size=4)
    pred1 = model.predict(x[8:12], batch_size=4)
    assert r0["digest"]["pred_abs_sum"] == pytest.approx(
        float(np.abs(np.float64(pred0)).sum()), rel=1e-5)
    assert r1["digest"]["pred_abs_sum"] == pytest.approx(
        float(np.abs(np.float64(pred1)).sum()), rel=1e-5)

    history = model.fit(x[order], y[order], epochs=2, batch_size=8,
                        shuffle=False, verbose=0)

    # LOOSE check on the training trajectory: collective reduction
    # order differs between the gloo cross-process run and the
    # single-process run, and the untrained net's BatchNorm amplifies
    # ~1e-6 numeric differences into percent-scale loss divergence
    # within an epoch (measured ~9% gradient swing under 1e-6 input
    # perturbations — BASELINE.md packed-region notes; observed here:
    # epoch-1 loss matches to 1.2e-4, epoch 2 to 4.5%). The tight
    # eval/predict checks above carry the correctness claim; this one
    # pins "same trajectory, same scale".
    np.testing.assert_allclose(r0["loss"], history["loss"], rtol=0.2)

    leaves = jax.tree_util.tree_leaves(model.variables)
    abs_sum = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))
    assert r0["digest"]["abs_sum"] == pytest.approx(abs_sum, rel=0.01)


def test_two_process_single_step_tight(worker_results):
    """Decomposed equality bound: ONE full-batch train step from the
    same init must match the single-process oracle TIGHTLY (the only
    cross-process difference is collective reduction order, ~1e-6
    relative per step) — this carries the per-step correctness claim
    that the BN-chaotic multi-step trajectory cannot. And the
    multi-process x tensor-parallel (global 4x2 mesh spanning both
    processes) step is the SAME computation, so its loss must agree
    too."""
    from tf2_yolo_tpu.engine import Model
    from tf2_yolo_tpu.models import YoloV2
    from tf2_yolo_tpu.ops import wrap_yolo_loss_v2
    import jax

    r0, r1 = worker_results
    # processes saw identical global steps: bit-comparable digests
    assert r0["digest"]["step1_loss"] == pytest.approx(
        r1["digest"]["step1_loss"], rel=1e-6)
    assert r0["digest"]["step1_abs_sum"] == pytest.approx(
        r1["digest"]["step1_abs_sum"], rel=1e-6)

    x, y, anchors, g, classes = _fixture_data()
    order = np.r_[0:8, 8:16]     # one full-batch step: plain order
    model = Model(YoloV2(anchors=anchors, class_num=classes),
                  input_shape=(64, 64, 3), seed=0)
    model.compile(optimizer="adam", learning_rate=1e-3,
                  loss=wrap_yolo_loss_v2((g, g), 5, classes, anchors))
    hist = model.fit(x[order], y[order], epochs=1, batch_size=16,
                     shuffle=False, verbose=0)
    leaves = jax.tree_util.tree_leaves(model.variables)
    abs_sum = float(sum(np.abs(np.float64(np.asarray(l))).sum()
                        for l in leaves))
    # reduction-order bound: loss to 1e-4 relative, params to 1e-5
    assert r0["digest"]["step1_loss"] == pytest.approx(
        hist["loss"][0], rel=1e-4)
    assert r0["digest"]["step1_abs_sum"] == pytest.approx(
        abs_sum, rel=1e-5)

    # multi-process TP: same global computation as the DP step
    assert r0["digest"]["tp_step1_loss"] == pytest.approx(
        r1["digest"]["tp_step1_loss"], rel=1e-6)
    assert r0["digest"]["tp_step1_loss"] == pytest.approx(
        hist["loss"][0], rel=1e-3)


def test_multiprocess_checkpoint_resume(worker_results):
    """Process-coordinated Orbax checkpoint + resume reproduces the
    uninterrupted multi-process run bit-exactly on every process
    (computed inside the workers — see tests/_multihost_worker.py)."""
    for r in worker_results:
        assert r["digest"]["resume_epochs_run"] == 1   # epoch 1 skipped
        assert r["digest"]["resume_max_diff"] == 0.0
    # and the resumed epoch-2 loss equals the uninterrupted epoch-2
    # loss on both processes (identical global batches)
    assert worker_results[0]["digest"]["resume_loss1"] == pytest.approx(
        worker_results[0]["loss"][-1], rel=1e-6)
    assert worker_results[1]["digest"]["resume_loss1"] == pytest.approx(
        worker_results[1]["loss"][-1], rel=1e-6)
