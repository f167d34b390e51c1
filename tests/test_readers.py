"""Reader-path coverage: cv2 reader parity with PIL, evaluate()."""

import numpy as np
import pytest

from tf2_yolo_tpu.data import YoloDataSequence
from tests.helpers_data import make_dataset

cv2 = pytest.importorskip("cv2")


def test_cv_reader_matches_pil_labels(tmp_path):
    img_dir, lab_dir = make_dataset(str(tmp_path), n_images=4,
                                    size=(96, 96))
    kw = dict(img_path=img_dir, label_path=lab_dir, batch_size=4,
              size=(96, 96), grid_shape=(6, 6),
              class_names=["square", "bar"], shuffle=False,
              encoding="utf-8")
    cv_img, cv_lab = YoloDataSequence(reader="cv", **kw)[0]
    pil_img, pil_lab = YoloDataSequence(reader="PIL", **kw)[0]
    # labels identical (same zoom math); images differ in channel
    # order (cv keeps BGR like the reference) but same shape/range
    np.testing.assert_allclose(cv_lab, pil_lab)
    assert cv_img.shape == pil_img.shape
    # BGR vs RGB: channel-reversed images should match closely
    np.testing.assert_allclose(cv_img[..., ::-1], pil_img, atol=0.05)


def test_model_evaluate(tmp_path):
    from tf2_yolo_tpu import yolov2

    img_dir, lab_dir = make_dataset(str(tmp_path), n_images=4,
                                    size=(96, 96))
    yolo = yolov2.Yolo(input_shape=(96, 96, 3),
                       class_names=["square", "bar"])
    yolo.create_model(anchors=[[0.2, 0.2], [0.35, 0.1]])
    img, label = yolo.read_file_to_dataset(img_dir, lab_dir,
                                           encoding="utf-8",
                                           shuffle=False)
    yolo.model.compile("adam", loss=yolo.loss(),
                       metrics=yolo.metrics("obj"))
    logs = yolo.model.evaluate(img, label, batch_size=4, verbose=0)
    assert "loss" in logs and "obj_acc" in logs
    assert np.isfinite(logs["loss"])
