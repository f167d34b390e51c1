"""Native (C++) loader tests: parity with the Python pipeline."""

import os

import numpy as np
import pytest

from tests.helpers_data import make_dataset

native = pytest.importorskip("tf2_yolo_tpu.native")

if not native.available():
    pytest.skip("native loader could not be built",
                allow_module_level=True)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("nat")
    return make_dataset(str(root), n_images=6, size=(96, 96))


def test_load_image_and_zoom(dataset):
    img_dir, _ = dataset
    path = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
    img, zoom = native.load_image(path, (48, 48))
    assert img.shape == (48, 48, 3) and img.dtype == np.uint8
    np.testing.assert_allclose(zoom, [2.0, 2.0])


def test_load_image_missing_file_raises(dataset):
    with pytest.raises(IOError):
        native.load_image("/nonexistent/zzz.png", (32, 32))


def test_parse_labelimg_matches_python(dataset):
    from tf2_yolo_tpu.data import parse_labelimg as py_parse
    _, lab_dir = dataset
    for f in sorted(os.listdir(lab_dir)):
        xml = open(os.path.join(lab_dir, f)).read()
        nb, nl = native.parse_labelimg(xml, ["square", "bar"])
        pb, pl = py_parse(os.path.join(lab_dir, f),
                          ["square", "bar"], encoding="utf-8")
        np.testing.assert_allclose(nb, pb)
        assert nl == pl


def test_batch_pipeline_matches_python(dataset):
    from tf2_yolo_tpu.data import YoloDataSequence
    img_dir, lab_dir = dataset
    names = sorted(os.listdir(img_dir))
    img_paths = [os.path.join(img_dir, n) for n in names]
    xml_paths = [os.path.join(lab_dir, n[:-4] + ".xml") for n in names]

    imgs, labels = native.load_and_encode_batch(
        img_paths, xml_paths, (96, 96), (6, 6), ["square", "bar"],
        threads=3)
    seq = YoloDataSequence(
        img_path=img_dir, label_path=lab_dir, batch_size=6,
        size=(96, 96), grid_shape=(6, 6), rescale=None,
        class_names=["square", "bar"], shuffle=False, encoding="utf-8")
    py_img, py_lab = seq[0]
    np.testing.assert_allclose(labels, py_lab)
    # same-size images: decode is lossless PNG, no resampling applied
    np.testing.assert_allclose(imgs, py_img)


def test_sequence_native_reader(dataset):
    from tf2_yolo_tpu.data import YoloDataSequence
    img_dir, lab_dir = dataset
    seq = YoloDataSequence(
        img_path=img_dir, label_path=lab_dir, reader="native",
        batch_size=4, size=(96, 96), grid_shape=(6, 6),
        class_names=["square", "bar"], shuffle=False,
        thread_num=2, encoding="utf-8")
    img, lab = seq[0]
    assert img.shape == (4, 96, 96, 3)
    assert img.max() <= 1.0 + 1e-9       # rescale applied
    assert (lab[..., 4] == 1).any()

    ref = YoloDataSequence(
        img_path=img_dir, label_path=lab_dir, batch_size=4,
        size=(96, 96), grid_shape=(6, 6),
        class_names=["square", "bar"], shuffle=False,
        encoding="utf-8")
    rimg, rlab = ref[0]
    np.testing.assert_allclose(lab, rlab)
    np.testing.assert_allclose(img, rimg)
