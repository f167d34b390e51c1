"""Unit tests for host-side parity utilities (SURVEY.md §4: label codec
round-trip, down2xlabel invariants, IoU/DIoU brute-force checks,
NMS/Soft-NMS on fixed fixtures, class-weight formulas)."""

import numpy as np
import pytest

from tf2_yolo_tpu.utils import (decode, nms, soft_nms, cal_iou,
                                down2xlabel, get_class_weight,
                                kmeans, iou_dist, euclidean_dist)


def brute_iou(a, b):
    ax1, ay1 = a[0] - a[2] / 2, a[1] - a[3] / 2
    ax2, ay2 = a[0] + a[2] / 2, a[1] + a[3] / 2
    bx1, by1 = b[0] - b[2] / 2, b[1] - b[3] / 2
    bx2, by2 = b[0] + b[2] / 2, b[1] + b[3] / 2
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / (union + 1e-07)


def test_cal_iou_brute_force():
    rng = np.random.RandomState(0)
    a = rng.rand(10, 4) * 0.8 + 0.1
    b = rng.rand(10, 4) * 0.8 + 0.1
    got = cal_iou(a[:, None, :], b[None, :, :])
    for i in range(10):
        for j in range(10):
            assert abs(got[i, j] - brute_iou(a[i], b[j])) < 1e-6


def test_cal_iou_diou_leq_iou():
    rng = np.random.RandomState(1)
    a = rng.rand(20, 4) * 0.8 + 0.1
    b = rng.rand(20, 4) * 0.8 + 0.1
    iou = cal_iou(a, b, mode=1)
    diou = cal_iou(a, b, mode=2)
    assert np.all(diou <= iou + 1e-9)
    # identical boxes: DIoU == IoU == 1
    same = cal_iou(a, a, mode=2)
    np.testing.assert_allclose(same, 1.0, rtol=1e-5)


def test_decode_v2_roundtrip():
    """Encode one box into a grid, decode recovers it."""
    gh = gw = 4
    c = 3
    b = 2
    label = np.zeros((gh, gw, b * (5 + c)))
    shaped = label.reshape(gh, gw, b, 5 + c)
    # box centered at cell (1, 2) with offset (.5, .25), wh (.3, .4), class 1
    shaped[1, 2, 0] = [0.5, 0.25, 0.3, 0.4, 0.9, 0.1, 0.8, 0.1]
    out = decode(label, class_num=c, threshold=0.5, version=2)
    assert out.shape == (1, 7)
    np.testing.assert_allclose(out[0, 0], (2 + 0.5) / gw)
    np.testing.assert_allclose(out[0, 1], (1 + 0.25) / gh)
    np.testing.assert_allclose(out[0, 2:5], [0.3, 0.4, 0.9])
    assert out[0, 5] == 1 and abs(out[0, 6] - 0.8) < 1e-9


def test_decode_v1_shared_probs():
    gh = gw = 2
    c, b = 2, 2
    label = np.zeros((gh, gw, 5 * b + c))
    label[0, 0, :5] = [0.5, 0.5, 0.2, 0.2, 1.0]     # box 0
    label[0, 0, 5:10] = [0.1, 0.1, 0.1, 0.1, 0.1]   # box 1 low conf
    label[0, 0, -c:] = [0.9, 0.1]
    out = decode(label, class_num=c, threshold=0.5, version=1)
    assert out.shape == (1, 7)
    assert out[0, 5] == 0 and abs(out[0, 6] - 0.9) < 1e-9


def test_decode_row_order_matches_npwhere():
    rng = np.random.RandomState(2)
    gh = gw = 3
    c, b = 2, 2
    label = rng.rand(gh, gw, b * (5 + c))
    out = decode(label, class_num=c, threshold=0.3, version=2)
    shaped = label.reshape(gh, gw, b, 5 + c)
    joint = shaped[..., 4:5] * shaped[..., -c:]
    where = np.where(joint >= 0.3)
    assert len(out) == len(where[0])
    for i in range(len(out)):
        y, x, bx, cl = where[0][i], where[1][i], where[2][i], where[3][i]
        assert out[i, 5] == cl
        np.testing.assert_allclose(out[i, 4], shaped[y, x, bx, 4])


def test_nms_suppresses_overlaps():
    # two heavily overlapping boxes + one far box, same class
    rows = np.array([
        [0.50, 0.50, 0.30, 0.30, 0.9, 0, 0.9],
        [0.51, 0.51, 0.30, 0.30, 0.8, 0, 0.8],
        [0.90, 0.90, 0.10, 0.10, 0.7, 0, 0.7],
    ])
    out = nms(rows, class_num=1, nms_threshold=0.45)
    assert len(out) == 2
    np.testing.assert_allclose(sorted(out[:, 4]), [0.7, 0.9])


def test_nms_classwise_independent():
    rows = np.array([
        [0.50, 0.50, 0.30, 0.30, 0.9, 0, 0.9],
        [0.50, 0.50, 0.30, 0.30, 0.8, 1, 0.8],   # same box, other class
    ])
    out = nms(rows, class_num=2, nms_threshold=0.45)
    assert len(out) == 2


def test_nms_chain_semantics():
    """B overlaps A and C; A suppresses B; suppressed B must NOT
    suppress C (reference whitelist semantics, tools.py:723)."""
    rows = np.array([
        [0.50, 0.50, 0.20, 0.20, 0.9, 0, 1.0],   # A
        [0.58, 0.50, 0.20, 0.20, 0.8, 0, 1.0],   # B overlaps A and C
        [0.66, 0.50, 0.20, 0.20, 0.7, 0, 1.0],   # C overlaps B only
    ])
    iou_ab = cal_iou(rows[0, :5], rows[1, :5])
    iou_bc = cal_iou(rows[1, :5], rows[2, :5])
    iou_ac = cal_iou(rows[0, :5], rows[2, :5])
    thr = 0.4
    assert iou_ab >= thr and iou_bc >= thr and iou_ac < thr
    out = nms(rows, class_num=1, nms_threshold=thr)
    np.testing.assert_allclose(sorted(out[:, 4]), [0.7, 0.9])


def test_soft_nms_decay_and_keep():
    rows = np.array([
        [0.50, 0.50, 0.30, 0.30, 0.95, 0, 1.0],
        [0.52, 0.50, 0.30, 0.30, 0.90, 0, 1.0],   # decayed below 0.5
        [0.90, 0.90, 0.10, 0.10, 0.70, 0, 1.0],   # untouched
    ])
    out = soft_nms(rows, class_num=1, nms_threshold=0.45,
                   conf_threshold=0.5, sigma=0.05)
    assert len(out) == 2
    # survivors keep original confidences
    np.testing.assert_allclose(sorted(out[:, 4]), [0.70, 0.95])


def test_down2xlabel_picks_largest_area():
    label = np.zeros((1, 4, 4, 7))    # 2 classes
    # block (0,0): two boxes; larger area in cell (1,1) of the block
    label[0, 0, 0] = [0.5, 0.5, 0.1, 0.1, 1, 1, 0]
    label[0, 1, 1] = [0.25, 0.75, 0.4, 0.4, 1, 0, 1]
    out = down2xlabel(label)
    assert out.shape == (1, 2, 2, 7)
    sel = out[0, 0, 0]
    # chosen box is the large one; xy remapped: (xy + (col,row))/2
    np.testing.assert_allclose(sel[:2], [(0.25 + 1) / 2, (0.75 + 1) / 2])
    np.testing.assert_allclose(sel[2:], [0.4, 0.4, 1, 0, 1])
    # empty blocks stay zero
    assert out[0, 1, 1].sum() == 0


def test_down2xlabel_matches_reference_loop():
    """Vectorized implementation vs a direct loop transcription of the
    reference algorithm (tools.py:342-367) on random labels."""
    rng = np.random.RandomState(3)
    label = np.zeros((2, 8, 8, 9))
    for n in range(2):
        for _ in range(10):
            y, x = rng.randint(0, 8, 2)
            label[n, y, x, :4] = rng.rand(4)
            label[n, y, x, 4] = 1
            label[n, y, x, 5 + rng.randint(4)] = 1

    def oracle(ld):
        b, gh, gw, ch = ld.shape
        new = np.zeros((b, gh // 2, gw // 2, ch))
        for bi in range(b):
            for i in range(0, gh, 2):
                for j in range(0, gw, 2):
                    crop = ld[bi][i:i + 2, j:j + 2]
                    if crop[..., 4].max() == 1:
                        mid = (crop[..., 2] * crop[..., 3]).argmax()
                        cell = crop[mid // 2, mid % 2]
                        xy = (cell[:2] + [mid % 2, mid // 2]) / 2
                        new[bi][i // 2, j // 2, :2] = xy
                        new[bi][i // 2, j // 2, 2:] = cell[2:]
        return new

    np.testing.assert_allclose(down2xlabel(label), oracle(label))


def test_get_class_weight_formulas():
    rng = np.random.RandomState(4)
    label = (rng.rand(2, 4, 4, 3) > 0.7).astype(float)
    total = 2 * 4 * 4
    counts = label.reshape(-1, 3).sum(0)

    alpha = get_class_weight(label, "alpha")
    expected = (1 / counts) / np.sum(1 / counts) * 3
    np.testing.assert_allclose(alpha, expected)

    binary = get_class_weight(label, "binary")
    np.testing.assert_allclose(binary, counts / (total - counts))

    log_w = get_class_weight(label, "log")
    raw = np.log(total * (1 / counts))
    np.testing.assert_allclose(log_w, raw / raw.sum() * 3)

    eff = get_class_weight(label, "effective")
    beta = (total - 1) / total
    raw = (1 - beta) / (1 - np.power(beta, counts))
    np.testing.assert_allclose(eff, raw / raw.sum() * 3)


def test_kmeans_deterministic_under_seed():
    rng = np.random.RandomState(5)
    data = rng.rand(100, 2)
    np.random.seed(42)
    c1 = kmeans(data, 3, euclidean_dist, 0.01, verbose=False)
    np.random.seed(42)
    c2 = kmeans(data, 3, euclidean_dist, 0.01, verbose=False)
    np.testing.assert_allclose(c1, c2)
    assert c1.shape == (3, 2)


def test_kmeans_iou_dist_anchors():
    rng = np.random.RandomState(6)
    # two well-separated size clusters
    small = rng.rand(50, 2) * 0.05 + 0.05
    large = rng.rand(50, 2) * 0.1 + 0.7
    data = np.vstack([small, large])
    np.random.seed(0)
    centers = kmeans(data, 2, iou_dist, 0.001, verbose=False)
    areas = np.sort(centers[:, 0] * centers[:, 1])
    assert areas[0] < 0.02 and areas[1] > 0.3
