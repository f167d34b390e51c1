"""uint8 device-side normalization: shipping raw uint8 image batches
and rescaling on the accelerator (engine input_rescale) must reproduce
the float path exactly — same f32 multiply, just executed on device —
while moving 4x (vs f32) / 8x (vs the reader's f64) fewer bytes.
"""

import numpy as np
import pytest

from tests.helpers_data import make_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("u8ds")
    return make_dataset(str(root), n_images=8, size=(96, 96))


def _build():
    from tf2_yolo_tpu import yolov2

    yolo = yolov2.Yolo(input_shape=(96, 96, 3),
                       class_names=["square", "bar"])
    yolo.create_model(anchors=[[0.2, 0.2], [0.35, 0.1]])
    return yolo


def test_sequence_uint8_batches(dataset):
    """uint8=True: raw uint8 batches whose device-side rescale equals
    the host-side rescaled float batch."""
    from tf2_yolo_tpu.data import YoloDataSequence

    img_dir, lab_dir = dataset
    kw = dict(img_path=img_dir, label_path=lab_dir, batch_size=4,
              size=(96, 96), grid_shape=(3, 3),
              class_names=["square", "bar"], shuffle=False)
    f_img, f_lab = YoloDataSequence(**kw)[0]
    u_img, u_lab = YoloDataSequence(uint8=True, **kw)[0]
    assert u_img.dtype == np.uint8
    np.testing.assert_allclose(
        u_img.astype(np.float32) * np.float32(1 / 255),
        f_img.astype(np.float32), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(u_lab, f_lab)


def test_fit_predict_evaluate_uint8_matches_float(dataset):
    """fit/evaluate/predict on uint8 inputs == the float32 pipeline
    (identical losses and outputs)."""
    img_dir, lab_dir = dataset

    yolo_f = _build()
    img, label = yolo_f.read_file_to_dataset(
        img_dir, lab_dir, encoding="utf-8", shuffle=False)
    u8 = np.round(np.asarray(img) * 255).astype(np.uint8)
    x32 = u8.astype(np.float32) * np.float32(1 / 255)

    yolo_u = _build()
    for y in (yolo_f, yolo_u):
        y.model.compile("adam", learning_rate=1e-3, loss=y.loss())

    hist_f = yolo_f.model.fit(x32, label, epochs=2, batch_size=4,
                              shuffle=False, verbose=0)
    hist_u = yolo_u.model.fit(u8, label, epochs=2, batch_size=4,
                              shuffle=False, verbose=0)
    np.testing.assert_allclose(hist_u["loss"], hist_f["loss"],
                               rtol=1e-5)

    ev_f = yolo_f.model.evaluate(x32, label, batch_size=4,
                                 verbose=0)["loss"]
    ev_u = yolo_u.model.evaluate(u8, label, batch_size=4,
                                 verbose=0)["loss"]
    np.testing.assert_allclose(ev_u, ev_f, rtol=1e-5)

    p_f = yolo_f.model.predict(x32[:4])
    p_u = yolo_u.model.predict(u8[:4])
    np.testing.assert_allclose(p_u, p_f, rtol=1e-5, atol=1e-6)


def test_facade_sequence_uint8_trains(dataset):
    """read_file_to_sequence(uint8=True) feeds fit() end to end."""
    img_dir, lab_dir = dataset
    yolo = _build()
    seq = yolo.read_file_to_sequence(
        img_dir, lab_dir, batch_size=4, encoding="utf-8",
        shuffle=False, uint8=True)
    img0, _ = seq[0]
    assert img0.dtype == np.uint8
    yolo.model.compile("adam", loss=yolo.loss())
    hist = yolo.model.fit(seq, epochs=1, verbose=0)
    assert np.isfinite(hist["loss"]).all()
