"""Classifier factory tests (reference darknet/darknet19/darknet53/
csp_darknet53 builders)."""

import numpy as np
import pytest

from tf2_yolo_tpu.models import (darknet, darknet19, darknet53,
                                 csp_darknet53)


def test_darknet_v1_classifier():
    model = darknet(input_shape=(64, 64, 3), class_num=5)
    out = model.predict(np.zeros((2, 64, 64, 3), np.float32))
    assert out.shape == (2, 5)
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)


def test_darknet19_classifier():
    model = darknet19(input_shape=(64, 64, 3), class_num=4)
    out = model.predict(np.zeros((1, 64, 64, 3), np.float32))
    assert out.shape == (1, 4)
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)


def test_darknet53_include_top_false():
    model = darknet53(include_top=False, weights=None,
                      input_shape=(64, 64, 3))
    out = model.predict(np.zeros((1, 64, 64, 3), np.float32))
    assert out.shape == (1, 2, 2, 1024)


def test_csp_darknet53_validation():
    with pytest.raises(ValueError):
        csp_darknet53(include_top=True, weights="imagenet",
                      input_shape=(65, 64, 3))
    with pytest.raises(ValueError):
        darknet53(include_top=True, weights="imagenet",
                  input_shape=(64, 64, 3), class_num=10)
