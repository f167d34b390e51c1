"""Auxiliary subsystems: config tree, checkpoints, assets, kmeans_jax,
vis_img/export smoke (SURVEY.md §5)."""

import os

import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg")


def test_config_roundtrip(tmp_path):
    from tf2_yolo_tpu import YoloConfig, LossConfig

    cfg = YoloConfig(version=2, input_shape=(96, 96, 3),
                     class_names=["a", "b"],
                     anchors=[[0.2, 0.2], [0.4, 0.3]],
                     loss=LossConfig(binary_weight=0.5,
                                     ignore_thresh=0.7))
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    back = YoloConfig.from_json(path)
    assert back == cfg


def test_config_build_and_loss():
    from tf2_yolo_tpu import YoloConfig

    cfg = YoloConfig(version=2, input_shape=(96, 96, 3),
                     class_names=["a", "b"],
                     anchors=[[0.2, 0.2], [0.4, 0.3]])
    yolo = cfg.build()
    assert yolo.model is not None
    loss = cfg.build_loss(yolo)
    assert callable(loss)


def test_checkpoint_save_restore(tmp_path):
    import jax.numpy as jnp
    import optax
    from tf2_yolo_tpu.parallel import (create_train_state,
                                       save_checkpoint,
                                       restore_checkpoint,
                                       latest_checkpoint)

    tx = optax.adam(1e-3)
    variables = {"params": {"w": jnp.ones((3, 3))},
                 "batch_stats": {"m": jnp.zeros((3,))}}
    state = create_train_state(variables, tx)
    state = state._replace(step=jnp.asarray(7, jnp.int32))

    ckpt_dir = save_checkpoint(str(tmp_path / "ck"), state)
    assert latest_checkpoint(str(tmp_path / "ck")) == ckpt_dir

    blank = create_train_state(
        {"params": {"w": jnp.zeros((3, 3))},
         "batch_stats": {"m": jnp.ones((3,))}}, tx)
    restored = restore_checkpoint(ckpt_dir, blank)
    assert int(restored.step) == 7
    np.testing.assert_allclose(restored.params["w"], np.ones((3, 3)))
    np.testing.assert_allclose(restored.batch_stats["m"],
                               np.zeros((3,)))


def test_checkpoint_async(tmp_path):
    """Async checkpointing (the SURVEY §5 checkpoint-row plan):
    ``block=False`` snapshots synchronously and writes in background;
    the committed state equals a blocking save, stray in-flight
    Orbax tmp dirs are invisible to latest_checkpoint/pruning, and
    ``fit(checkpoint_async=True)`` fences before returning with the
    final checkpoint equal to the final live state."""
    import jax
    import jax.numpy as jnp
    import optax
    from tf2_yolo_tpu.parallel import (create_train_state,
                                       save_checkpoint,
                                       restore_checkpoint,
                                       latest_checkpoint,
                                       wait_for_saves)

    tx = optax.adam(1e-3)
    state = create_train_state(
        {"params": {"w": jnp.full((3, 3), 2.0)},
         "batch_stats": {"m": jnp.zeros((3,))}}, tx)
    state = state._replace(step=jnp.asarray(5, jnp.int32))
    ck = str(tmp_path / "ck")
    # a stray in-flight-style dir must not break step parsing/pruning
    os.makedirs(os.path.join(ck, "step_9.orbax-checkpoint-tmp-1"))
    d = save_checkpoint(ck, state, block=False)
    wait_for_saves()
    assert latest_checkpoint(ck) == d
    blank = create_train_state(
        {"params": {"w": jnp.zeros((3, 3))},
         "batch_stats": {"m": jnp.ones((3,))}}, tx)
    restored = restore_checkpoint(d, blank)
    assert int(restored.step) == 5
    np.testing.assert_array_equal(restored.params["w"],
                                  np.full((3, 3), 2.0))

    # engine path: async per-epoch checkpoints; the latest committed
    # checkpoint after fit() equals the live final state bit-exactly
    from tf2_yolo_tpu.engine import Model
    from tf2_yolo_tpu.models import YoloV2
    from tf2_yolo_tpu.ops import wrap_yolo_loss_v2

    anchors = [[0.3, 0.3]]
    x = np.random.RandomState(0).rand(4, 64, 64, 3).astype(np.float32)
    y = np.zeros((4, 2, 2, 6), np.float32)
    y[:, 0, 0] = [0.5, 0.5, 0.3, 0.3, 1, 1]
    m = Model(YoloV2(anchors=anchors, class_num=1), (64, 64, 3), seed=3)
    m.compile("adam", loss=wrap_yolo_loss_v2((2, 2), 1, 1, anchors),
              learning_rate=1e-3)
    ck2 = str(tmp_path / "ck2")
    m.fit(x, y, epochs=3, batch_size=2, seed=11, verbose=0,
          checkpoint_dir=ck2, checkpoint_every=1, checkpoint_async=True)
    latest = latest_checkpoint(ck2)
    assert latest.endswith("step_6")     # 3 epochs x 2 steps
    restored = restore_checkpoint(latest, m._state)
    for a, b in zip(jax.tree_util.tree_leaves(restored._asdict()),
                    jax.tree_util.tree_leaves(m._state._asdict())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_resume_preemption(tmp_path):
    """Preemption-safe resume (SURVEY §5 failure/elastic-recovery row,
    absent in the reference): 2 epochs + kill + fit(resume=True) to the
    same total-epoch target must reproduce the uninterrupted 4-epoch
    run exactly — params, step counter, and shuffle order — and a
    resume past a completed run is a no-op."""
    import jax
    import numpy as np
    from tf2_yolo_tpu.engine import Model
    from tf2_yolo_tpu.models import YoloV2
    from tf2_yolo_tpu.ops import wrap_yolo_loss_v2

    anchors = [[0.3, 0.3]]
    x = np.random.RandomState(0).rand(4, 64, 64, 3).astype(np.float32)
    y = np.zeros((4, 2, 2, 6), np.float32)
    y[:, 0, 0] = [0.5, 0.5, 0.3, 0.3, 1, 1]

    def make():
        m = Model(YoloV2(anchors=anchors, class_num=1), (64, 64, 3),
                  seed=3)
        m.compile("adam",
                  loss=wrap_yolo_loss_v2((2, 2), 1, 1, anchors),
                  learning_rate=1e-3)
        return m

    ref = make()
    ref.fit(x, y, epochs=4, batch_size=2, seed=11, verbose=0)

    ck = str(tmp_path / "ck")
    m1 = make()
    m1.fit(x, y, epochs=2, batch_size=2, seed=11, verbose=0,
           checkpoint_dir=ck, checkpoint_every=1)
    # "fresh process": a new Model resumes to the TOTAL epoch target
    m2 = make()
    hist = m2.fit(x, y, epochs=4, batch_size=2, seed=11, verbose=0,
                  checkpoint_dir=ck, checkpoint_every=1, resume=True)
    assert len(hist["loss"]) == 2       # only the remaining epochs ran
    for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    m3 = make()
    hist3 = m3.fit(x, y, epochs=4, batch_size=2, seed=11, verbose=0,
                   checkpoint_dir=ck, checkpoint_every=1, resume=True)
    assert hist3["loss"] == []          # already complete: no-op

    with pytest.raises(ValueError):
        make().fit(x, y, epochs=1, verbose=0, resume=True)


def test_fit_sigterm_checkpoint_and_midepoch_resume(tmp_path):
    """checkpoint_on_interrupt: a SIGTERM mid-epoch finishes the
    current step, checkpoints, and returns; fit(resume=True) then
    skips the already-trained batches of the partial epoch so the
    optimizer trajectory exactly matches the uninterrupted run
    (batch-granular resume). Handlers must be restored after fit()."""
    import os
    import signal
    import jax
    import numpy as np
    from tf2_yolo_tpu.engine import Model
    from tf2_yolo_tpu.models import YoloV2
    from tf2_yolo_tpu.ops import wrap_yolo_loss_v2

    anchors = [[0.3, 0.3]]
    x = np.random.RandomState(0).rand(4, 64, 64, 3).astype(np.float32)
    y = np.zeros((4, 2, 2, 6), np.float32)
    y[:, 0, 0] = [0.5, 0.5, 0.3, 0.3, 1, 1]

    def make():
        m = Model(YoloV2(anchors=anchors, class_num=1), (64, 64, 3),
                  seed=3)
        m.compile("adam",
                  loss=wrap_yolo_loss_v2((2, 2), 1, 1, anchors),
                  learning_rate=1e-3)
        return m

    ref = make()
    ref.fit(x, y, epochs=3, batch_size=2, seed=11, verbose=0)

    class KillAtStep:
        def __init__(self, at):
            self.seen = 0
            self.at = at

        def on_train_batch_end(self, batch, logs, model):
            self.seen += 1
            if self.seen == self.at:    # deliver a real SIGTERM
                os.kill(os.getpid(), signal.SIGTERM)

    prev = signal.getsignal(signal.SIGTERM)
    ck = str(tmp_path / "ck")
    m1 = make()
    # 2 steps/epoch; kill after the 3rd step = mid-epoch-2
    hist = m1.fit(x, y, epochs=3, batch_size=2, seed=11, verbose=0,
                  checkpoint_dir=ck, checkpoint_on_interrupt=True,
                  callbacks=[KillAtStep(3)])
    assert signal.getsignal(signal.SIGTERM) is prev  # restored
    assert len(hist["loss"]) == 1       # only the completed epoch
    assert int(m1._state.step) == 3     # stopped right after step 3

    m2 = make()
    m2.fit(x, y, epochs=3, batch_size=2, seed=11, verbose=0,
           checkpoint_dir=ck, resume=True)
    assert int(m2._state.step) == 6
    for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError):
        make().fit(x, y, epochs=1, verbose=0,
                   checkpoint_on_interrupt=True)


def test_checkpoint_tp_sharded_state(tmp_path):
    """Orbax round-trip of a TENSOR-PARALLEL-sharded TrainState: save
    from a (data=4, model=2) mesh with channel-sharded leaves, restore
    into a replicated skeleton, values identical — the resume story
    must not depend on the sharding the state was trained under."""
    import jax
    import jax.numpy as jnp
    import optax
    from tf2_yolo_tpu.parallel import (create_train_state,
                                       save_checkpoint,
                                       restore_checkpoint, make_mesh,
                                       tensor_parallel_shardings)

    tx = optax.adam(1e-3)
    rng = np.random.RandomState(0)
    w = rng.rand(3, 3, 8, 32).astype(np.float32)
    variables = {"params": {"conv": {"kernel": jnp.asarray(w)}},
                 "batch_stats": {"m": jnp.arange(32, dtype=jnp.float32)}}
    state = create_train_state(variables, tx)
    mesh = make_mesh(n_data=4, n_model=2)
    state = jax.device_put(
        state, tensor_parallel_shardings(state, mesh, min_channels=32))
    # the kernel really is channel-sharded over 'model' (a replicated
    # placement would also span all devices — assert the spec)
    from jax.sharding import PartitionSpec as P
    assert (state.params["conv"]["kernel"].sharding.spec
            == P(None, None, None, "model"))

    ckpt_dir = save_checkpoint(str(tmp_path / "ck_tp"), state)
    blank = create_train_state(
        {"params": {"conv": {"kernel": jnp.zeros((3, 3, 8, 32))}},
         "batch_stats": {"m": jnp.zeros((32,))}}, tx)
    restored = restore_checkpoint(ckpt_dir, blank)
    np.testing.assert_allclose(
        np.asarray(restored.params["conv"]["kernel"]), w)
    np.testing.assert_allclose(np.asarray(restored.batch_stats["m"]),
                               np.arange(32, dtype=np.float32))


def test_checkpoint_pruning(tmp_path):
    import jax.numpy as jnp
    import optax
    from tf2_yolo_tpu.parallel import create_train_state, save_checkpoint

    tx = optax.sgd(1e-2)
    state = create_train_state({"params": {"w": jnp.ones(2)}}, tx)
    for step in range(5):
        state = state._replace(step=jnp.asarray(step, jnp.int32))
        save_checkpoint(str(tmp_path / "ck"), state, keep=2)
    kept = sorted(os.listdir(tmp_path / "ck"))
    assert kept == ["step_3", "step_4"]


def test_assets():
    from tf2_yolo_tpu.assets import load_class_names

    coco = load_class_names("coco")
    assert len(coco) == 80 and coco[0] == "person"
    voc = load_class_names("voc")
    assert len(voc) == 20 and "person" in voc
    imagenet = load_class_names("imagenet")
    assert len(imagenet) == 1000 and imagenet[0] == "kit fox"
    pairs = load_class_names("imagenet", with_synsets=True)
    assert pairs[0] == ("n02119789", "kit fox")
    assert all(s.startswith("n") and s[1:].isdigit() for s, _ in pairs)
    # comma names in user files are NOT split (only nNNNNNNNN, lines are)
    import tempfile, os
    fd, path = tempfile.mkstemp(suffix=".txt")
    os.write(fd, b"tv,monitor\nperson\n")
    os.close(fd)
    assert load_class_names(path) == ["tv,monitor", "person"]
    os.unlink(path)


def test_kmeans_jax_clusters():
    from tf2_yolo_tpu.utils.kmeans import kmeans_jax

    rng = np.random.RandomState(0)
    small = rng.rand(60, 2) * 0.05 + 0.05
    large = rng.rand(60, 2) * 0.1 + 0.7
    data = np.vstack([small, large])
    centers = kmeans_jax(data, 2, dist="iou", seed=1)
    areas = np.sort(centers[:, 0] * centers[:, 1])
    assert areas[0] < 0.02 and areas[1] > 0.3

    centers = kmeans_jax(data, 2, dist="euclidean", seed=1)
    assert centers.shape == (2, 2)


def test_vis_img_smoke(tmp_path):
    from tf2_yolo_tpu.utils import vis_img

    img = np.zeros((96, 96, 3))
    label = np.zeros((3, 3, 7))
    label[1, 1] = [0.5, 0.5, 0.3, 0.3, 1, 1, 0]   # class 0
    out = str(tmp_path / "vis.png")
    fig_ax = vis_img(img, label, class_names=["a", "b"], version=2,
                     savefig_path=out, return_fig_ax=True)
    assert fig_ax is not None
    assert os.path.getsize(out) > 0


def test_array_export_roundtrip(tmp_path):
    import json
    import xml.etree.ElementTree as ET
    from tf2_yolo_tpu.utils import array_to_json, array_to_xml
    from tf2_yolo_tpu.data import parse_labelimg

    label = np.zeros((3, 3, 7))
    label[1, 1] = [0.5, 0.5, 0.3, 0.3, 0.9, 0.95, 0.0]
    shaped = label.reshape(3, 3, 1, 7)
    shaped[1, 1, 0, 5] = 0.95

    jpath = str(tmp_path / "out.json")
    array_to_json(jpath, (96, 96), label, class_names=["a", "b"],
                  version=2)
    data = json.load(open(jpath, encoding="big5"))
    assert len(data["shapes"]) == 1
    assert data["shapes"][0]["label"] == "a"

    xpath = str(tmp_path / "out.xml")
    array_to_xml(xpath, (96, 96), label, class_names=["a", "b"],
                 version=2)
    boxes, labels = parse_labelimg(xpath, ["a", "b"], encoding="utf-8")
    assert len(boxes) == 1 and labels == [0]


def test_fit_profile_trace(tmp_path):
    """SURVEY §5 tracing hook: profile_dir captures a jax trace."""
    from tf2_yolo_tpu import yolov2

    yolo = yolov2.Yolo(input_shape=(64, 64, 3), class_names=["a"])
    yolo.create_model(anchors=[[0.3, 0.3]])
    x = np.random.RandomState(0).rand(4, 64, 64, 3).astype(np.float32)
    y = np.zeros((4, 2, 2, 6), np.float32)
    y[:, 0, 0] = [0.5, 0.5, 0.3, 0.3, 1, 1]
    yolo.model.compile("adam", loss=yolo.loss())
    prof = str(tmp_path / "prof")
    yolo.model.fit(x, y, epochs=1, batch_size=4, verbose=0,
                   profile_dir=prof)
    # trace directory produced with at least one artifact
    found = [f for _, _, fs in os.walk(prof) for f in fs]
    assert found


def test_lr_multiplier_survives_resume(tmp_path):
    """The mutable LR multiplier lives in OPTIMIZER STATE, so a
    ReduceLROnPlateau-shrunk rate must come back from the checkpoint:
    resume into a fresh process continues at the reduced rate, not the
    compiled base rate."""
    import numpy as np
    from tf2_yolo_tpu.engine import Model
    from tf2_yolo_tpu.models import YoloV2
    from tf2_yolo_tpu.ops import wrap_yolo_loss_v2

    anchors = [[0.3, 0.3]]
    x = np.random.RandomState(0).rand(4, 64, 64, 3).astype(np.float32)
    y = np.zeros((4, 2, 2, 6), np.float32)
    y[:, 0, 0] = [0.5, 0.5, 0.3, 0.3, 1, 1]

    def make():
        m = Model(YoloV2(anchors=anchors, class_num=1), (64, 64, 3),
                  seed=3)
        m.compile("adam",
                  loss=wrap_yolo_loss_v2((2, 2), 1, 1, anchors),
                  learning_rate=1e-3)
        return m

    ck = str(tmp_path / "ck")
    m1 = make()
    m1.lr_multiplier = 0.25
    m1.fit(x, y, epochs=1, batch_size=2, seed=11, verbose=0,
           checkpoint_dir=ck, checkpoint_every=1)

    m2 = make()
    assert m2.lr_multiplier == 1.0
    m2.fit(x, y, epochs=2, batch_size=2, seed=11, verbose=0,
           checkpoint_dir=ck, checkpoint_every=1, resume=True)
    assert abs(m2.lr_multiplier - 0.25) < 1e-7
