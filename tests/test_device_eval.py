"""Device-path evaluation (batched decode+NMS on accelerator) must
produce the same pandas artifacts as the host path."""

import numpy as np
import pandas as pd

from tf2_yolo_tpu.utils import create_score_mat, PRfunc
from tests.test_device_decode_nms import rand_level


def _data(n=4):
    rng = np.random.RandomState(7)
    preds = rand_level(rng, n=n, s=4, b=2, c=2)
    gts = np.zeros((n, 4, 4, 7), np.float32)
    for i in range(n):
        for _ in range(3):
            y, x = rng.randint(0, 4, 2)
            gts[i, y, x, :4] = rng.rand(4) * 0.5 + 0.2
            gts[i, y, x, 4] = 1
            gts[i, y, x, 5 + rng.randint(2)] = 1
    return gts, preds


def test_score_mat_device_matches_host():
    gts, preds = _data()
    kw = dict(class_names=["a", "b"], conf_threshold=0.4, nms_mode=1,
              nms_threshold=0.5, iou_threshold=0.5, version=2)
    host = create_score_mat(gts, preds, **kw)
    dev = create_score_mat(gts, preds, device=True, **kw)
    pd.testing.assert_frame_equal(host, dev)


def test_prfunc_device_matches_host():
    gts, preds = _data()
    kw = dict(class_names=["a", "b"], conf_threshold=0.3, nms_mode=1,
              version=2)
    host = PRfunc(gts, preds, **kw)
    dev = PRfunc(gts, preds, device=True, **kw)
    for ci in range(2):
        np.testing.assert_allclose(dev.precisions[ci],
                                   host.precisions[ci], atol=1e-9)
        np.testing.assert_allclose(dev.recalls[ci],
                                   host.recalls[ci], atol=1e-9)
    pd.testing.assert_frame_equal(host.get_map("voc2012"),
                                  dev.get_map("voc2012"))


def test_prfunc_device_soft_nms_matches_host():
    gts, preds = _data()
    kw = dict(class_names=["a", "b"], conf_threshold=0.3, nms_mode=2,
              nms_sigma=0.5, version=2)
    host = PRfunc(gts, preds, **kw)
    dev = PRfunc(gts, preds, device=True, **kw)
    pd.testing.assert_frame_equal(host.get_map("area"),
                                  dev.get_map("area"))
