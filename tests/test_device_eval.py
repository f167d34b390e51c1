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


def _ragged_data(n=10, classes=3, seed=11):
    """Uneven fixture: images with 0-5 GTs (some classless images),
    random prediction tensors — exercises empty-GT, empty-pred, and
    per-class imbalance in the device matching."""
    rng = np.random.RandomState(seed)
    preds = rand_level(rng, n=n, s=4, b=2, c=classes)
    gts = np.zeros((n, 4, 4, 5 + classes), np.float32)
    for i in range(n):
        for _ in range(rng.randint(0, 6)):
            y, x = rng.randint(0, 4, 2)
            gts[i, y, x, :4] = rng.rand(4) * 0.5 + 0.2
            gts[i, y, x, 4] = 1
            gts[i, y, x, 5 + rng.randint(classes)] = 1
    return gts, preds


def test_score_mat_device_ragged_all_precision_modes():
    """Fully-device matching (ops/evalmatch.py) == host loops on a
    ragged fixture, for every precision mode."""
    gts, preds = _ragged_data()
    names = ["a", "b", "c"]
    for mode in (0, 1, 2):
        kw = dict(class_names=names, conf_threshold=0.4, nms_mode=1,
                  nms_threshold=0.5, iou_threshold=0.5,
                  precision_mode=mode, version=2)
        host = create_score_mat(gts, preds, **kw)
        dev = create_score_mat(gts, preds, device=True, **kw)
        pd.testing.assert_frame_equal(host, dev)


def test_prfunc_device_ragged_caps_and_modes():
    """Device PR collection (vectorized cap + sweep) == host path:
    small max_per_img forces the per-(image, class) cap, and every
    precision mode / mAP mode agrees."""
    gts, preds = _ragged_data(seed=13)
    names = ["a", "b", "c"]
    for pmode in (0, 1, 2):
        kw = dict(class_names=names, conf_threshold=0.2, nms_mode=1,
                  precision_mode=pmode, max_per_img=3, version=2)
        host = PRfunc(gts, preds, **kw)
        dev = PRfunc(gts, preds, device=True, **kw)
        for ci in range(3):
            np.testing.assert_allclose(dev.precisions[ci],
                                       host.precisions[ci], atol=1e-9)
            np.testing.assert_allclose(dev.recalls[ci],
                                       host.recalls[ci], atol=1e-9)
        for map_mode in ("voc2007", "voc2012", "area", "smootharea"):
            pd.testing.assert_frame_equal(host.get_map(map_mode),
                                          dev.get_map(map_mode))


def test_prfunc_device_no_cap_matches_host():
    gts, preds = _ragged_data(seed=17)
    kw = dict(class_names=["a", "b", "c"], conf_threshold=0.3,
              nms_mode=1, max_per_img=None, version=2)
    host = PRfunc(gts, preds, **kw)
    dev = PRfunc(gts, preds, device=True, **kw)
    for ci in range(3):
        np.testing.assert_allclose(dev.precisions[ci],
                                   host.precisions[ci], atol=1e-9)
        np.testing.assert_allclose(dev.recalls[ci],
                                   host.recalls[ci], atol=1e-9)
