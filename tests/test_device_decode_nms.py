"""Device decode/NMS vs host parity (SURVEY.md §7.4 hard part 1:
identical outputs incl. greedy semantics on fixed fixtures)."""

import numpy as np
import pytest

from tf2_yolo_tpu.ops import (decode_one_level, decode_multi_level,
                              nms_device, soft_nms_device)
from tf2_yolo_tpu.utils import decode as host_decode
from tf2_yolo_tpu.utils import nms as host_nms
from tf2_yolo_tpu.utils import soft_nms as host_soft_nms


def rand_level(rng, n=2, s=4, b=2, c=3):
    out = rng.rand(n, s, s, b * (5 + c)).astype(np.float32)
    shaped = out.reshape(n, s, s, b, 5 + c)
    shaped[..., 2:4] = shaped[..., 2:4] * 0.4 + 0.05
    return out


def _lex_sorted(rows):
    rows = np.asarray(rows, np.float64)
    if len(rows) == 0:
        return rows
    order = np.lexsort(rows.T[::-1])
    return rows[order]


def assert_same_rows(dev, host, atol=1e-5):
    dev, host = _lex_sorted(dev), _lex_sorted(host)
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, atol=atol, rtol=1e-4)


def rows_to_set(rows, digits=5):
    return {tuple(np.round(np.asarray(r, np.float64), digits))
            for r in rows}


def test_device_decode_matches_host():
    rng = np.random.RandomState(0)
    level = rand_level(rng)
    rows, valid = decode_one_level(level, class_num=3, threshold=0.4,
                                   max_boxes=64, version=2)
    rows, valid = np.asarray(rows), np.asarray(valid)
    for i in range(level.shape[0]):
        host = host_decode(level[i], class_num=3, threshold=0.4,
                           version=2)
        dev = rows[i][valid[i]]
        assert_same_rows(dev, host)


def test_device_decode_v1_layout():
    rng = np.random.RandomState(1)
    n, s, b, c = 2, 3, 2, 2
    level = rng.rand(n, s, s, 5 * b + c).astype(np.float32)
    rows, valid = decode_one_level(level, class_num=c, threshold=0.3,
                                   max_boxes=40, version=1)
    rows, valid = np.asarray(rows), np.asarray(valid)
    for i in range(n):
        host = host_decode(level[i], class_num=c, threshold=0.3,
                           version=1)
        dev = rows[i][valid[i]]
        assert_same_rows(dev, host)


def test_device_decode_multi_level():
    rng = np.random.RandomState(2)
    l1 = rand_level(rng, s=2)
    l2 = rand_level(rng, s=4)
    rows, valid = decode_multi_level([l1, l2], class_num=3,
                                     threshold=0.4, max_boxes=128,
                                     version=3)
    rows, valid = np.asarray(rows), np.asarray(valid)
    for i in range(l1.shape[0]):
        host = host_decode(l1[i], l2[i], class_num=3, threshold=0.4,
                           version=3)
        dev = rows[i][valid[i]]
        assert_same_rows(dev, host)


def _pad_rows(host_rows, k=32):
    rows = np.zeros((1, k, 7), np.float32)
    valid = np.zeros((1, k), bool)
    rows[0, :len(host_rows)] = host_rows
    valid[0, :len(host_rows)] = True
    return rows, valid


@pytest.mark.parametrize("iou_mode", [1, 2])
def test_device_nms_matches_host(iou_mode):
    rng = np.random.RandomState(3)
    # random decoded rows: clustered boxes to force suppressions
    base = rng.rand(6, 7)
    base[:, 2:4] = base[:, 2:4] * 0.3 + 0.2
    base[:, :2] = 0.5 + rng.randn(6, 2) * 0.08
    base[:, 4] = rng.rand(6)
    base[:, 5] = rng.randint(0, 2, 6)
    base[:, 6] = rng.rand(6)

    host = host_nms(base, class_num=2, nms_threshold=0.45,
                    iou_mode=iou_mode)
    rows, valid = _pad_rows(base)
    drows, keep = nms_device(rows, valid, 0.45, iou_mode=iou_mode)
    dev = np.asarray(drows)[0][np.asarray(keep)[0]]
    assert_same_rows(dev, host)


def test_device_soft_nms_matches_host():
    rng = np.random.RandomState(4)
    base = rng.rand(6, 7)
    base[:, 2:4] = base[:, 2:4] * 0.3 + 0.2
    base[:, :2] = 0.5 + rng.randn(6, 2) * 0.05
    base[:, 4] = rng.rand(6) * 0.5 + 0.5
    base[:, 5] = 0
    base[:, 6] = 1.0

    host = host_soft_nms(base, class_num=1, nms_threshold=0.45,
                         conf_threshold=0.5, sigma=0.5)
    rows, valid = _pad_rows(base)
    drows, keep = soft_nms_device(rows, valid, 0.45, 0.5, 0.5)
    dev = np.asarray(drows)[0][np.asarray(keep)[0]]
    assert_same_rows(dev, host)


def test_device_nms_chain_semantics():
    """Suppressed box must not suppress others (whitelist parity)."""
    base = np.array([
        [0.50, 0.50, 0.20, 0.20, 0.9, 0, 1.0],
        [0.58, 0.50, 0.20, 0.20, 0.8, 0, 1.0],
        [0.66, 0.50, 0.20, 0.20, 0.7, 0, 1.0],
    ], np.float32)
    rows, valid = _pad_rows(base, k=8)
    drows, keep = nms_device(rows, valid, 0.4)
    dev = np.asarray(drows)[0][np.asarray(keep)[0]]
    assert sorted(dev[:, 4].tolist()) == [pytest.approx(0.7),
                                          pytest.approx(0.9)]


@pytest.mark.parametrize("iou_mode", [1, 2])
def test_nms_fixedpoint_matches_scan(iou_mode):
    """The batched fixed-point iteration (ops/nms.py nms) must produce
    exactly the sequential scan's keep mask (nms_scan) — dense random
    clusters force multi-level suppression chains."""
    from tf2_yolo_tpu.ops.nms import nms_scan
    rng = np.random.RandomState(11)
    n, k = 4, 64
    rows = np.zeros((n, k, 7), np.float32)
    rows[..., :2] = 0.5 + rng.randn(n, k, 2) * 0.1
    rows[..., 2:4] = rng.rand(n, k, 2) * 0.3 + 0.15
    rows[..., 4] = rng.rand(n, k)
    rows[..., 5] = rng.randint(0, 3, (n, k))
    rows[..., 6] = rng.rand(n, k)
    valid = rng.rand(n, k) < 0.9

    r_fp, k_fp = nms_device(rows, valid, 0.45, iou_mode=iou_mode)
    r_sc, k_sc = nms_scan(rows, valid, 0.45, iou_mode=iou_mode)
    np.testing.assert_array_equal(np.asarray(r_fp), np.asarray(r_sc))
    np.testing.assert_array_equal(np.asarray(k_fp), np.asarray(k_sc))


def test_nms_fixedpoint_deep_chain():
    """A maximal alternating chain (each box only overlaps its
    neighbors; greedy keeps every other one) needs the most fixed-point
    sweeps — exactness must survive deep convergence."""
    from tf2_yolo_tpu.ops.nms import nms_scan
    depth = 24
    rows = np.zeros((1, 32, 7), np.float32)
    for i in range(depth):
        rows[0, i] = [0.1 + 0.04 * i, 0.5, 0.1, 0.1,
                      0.9 - 0.02 * i, 0, 1.0]
    valid = np.zeros((1, 32), bool)
    valid[0, :depth] = True

    r_fp, k_fp = nms_device(rows, valid, 0.3)
    r_sc, k_sc = nms_scan(rows, valid, 0.3)
    np.testing.assert_array_equal(np.asarray(k_fp), np.asarray(k_sc))
    kept = np.asarray(r_fp)[0][np.asarray(k_fp)[0]]
    assert len(kept) == depth // 2          # every other box survives
