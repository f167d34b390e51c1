"""Numerical-parity tests: jnp losses vs a NumPy oracle of the
reference formulas (SURVEY.md §4 'numerical-parity tests').

The oracle below re-derives the reference math (yolov{1_5,2,3,4}/losses)
in plain NumPy on random tensors; the framework losses must match at
f32 tolerances.
"""

import math

import numpy as np
import pytest

from tf2_yolo_tpu.ops import (wrap_yolo_loss_v1, wrap_yolo_loss_v2,
                              wrap_yolo_loss_v3, wrap_yolo_loss_v4)

EPS = 1e-07
RNG = np.random.RandomState(0)


def np_iou_grid(xywh_true, xywh_pred, grid_shape, want_ciou=False):
    gs = np.array(grid_shape[::-1], dtype=np.float32)
    xy_t, wh_t = xywh_true[..., 0:2] / gs, xywh_true[..., 2:4]
    xy_p, wh_p = xywh_pred[..., 0:2] / gs, xywh_pred[..., 2:4]
    min_t, max_t = xy_t - wh_t / 2, xy_t + wh_t / 2
    min_p, max_p = xy_p - wh_p / 2, xy_p + wh_p / 2
    iw = np.maximum(np.minimum(max_p, max_t) - np.maximum(min_p, min_t), 0)
    inter = iw[..., 0] * iw[..., 1]
    union = (wh_t[..., 0] * wh_t[..., 1] + wh_p[..., 0] * wh_p[..., 1]
             - inter)
    iou = inter / (union + EPS)
    if not want_ciou:
        return iou
    ew = np.maximum(max_p, max_t) - np.minimum(min_p, min_t)
    c2 = ew[..., 0] ** 2 + ew[..., 1] ** 2
    rho2 = ((xy_t[..., 0] - xy_p[..., 0]) ** 2
            + (xy_t[..., 1] - xy_p[..., 1]) ** 2)
    at = np.arctan(wh_t[..., 0] / (wh_t[..., 1] + EPS))
    ap = np.arctan(wh_p[..., 0] / (wh_p[..., 1] + EPS))
    v = 4 / math.pi ** 2 * (at - ap) ** 2
    alpha = v / (1 - iou + v)
    return iou, iou - rho2 / c2 - alpha * v


def one_hot(idx, depth):
    return np.eye(depth, dtype=np.float32)[idx]


def sbm(x):
    return np.sum(np.mean(x, axis=0))


def make_data(n=2, s=4, b=3, c=5, v1=False, seed=1):
    rng = np.random.RandomState(seed)
    if v1:
        y_true = np.zeros((n, s, s, 5 + c), np.float32)
        y_pred = rng.rand(n, s, s, 5 * b + c).astype(np.float32)
        # softmax-normalize shared class probs
        p = y_pred[..., -c:]
        y_pred[..., -c:] = p / p.sum(-1, keepdims=True)
    else:
        y_true = np.zeros((n, s, s, 5 + c), np.float32)
        y_pred = rng.rand(n, s, s, b * (5 + c)).astype(np.float32)
        shaped = y_pred.reshape(n, s, s, b, 5 + c)
        shaped[..., 2:4] = shaped[..., 2:4] * 0.9 + 0.05  # wh > 0
        y_pred = shaped.reshape(n, s, s, b * (5 + c))
    # sprinkle objects
    for i in range(n):
        for _ in range(4):
            y, x = rng.randint(0, s, 2)
            y_true[i, y, x, :4] = rng.rand(4) * 0.8 + 0.1
            y_true[i, y, x, 4] = 1.0
            y_true[i, y, x, 5 + rng.randint(c)] = 1.0
    return y_true, y_pred


def test_v1_loss_parity():
    n, s, b, c = 2, 4, 3, 5
    gs = (s, s)
    y_true, y_pred = make_data(n, s, b, c, v1=True)
    bw, lw = 0.7, [5, 5, 1, 1]

    xywhc_t = y_true[..., :-c].reshape(n, s, s, 1, 5)
    xywhc_p = y_pred[..., :-c].reshape(n, s, s, b, 5)
    iou = np_iou_grid(xywhc_t[..., :4], xywhc_p[..., :4], gs)
    resp = one_hot(np.argmax(iou, -1), b)
    resp_e = resp[..., None]
    has = xywhc_t[..., 4]
    has_e = has[..., None]
    no = 1 - has * resp
    wh_t = np.maximum(xywhc_t[..., 2:4], EPS)
    wh_p = np.maximum(xywhc_p[..., 2:4], EPS)
    xy_l = sbm(has_e * resp_e * (xywhc_t[..., :2] - xywhc_p[..., :2]) ** 2)
    wh_l = sbm(has_e * resp_e * (np.sqrt(wh_t) - np.sqrt(wh_p)) ** 2)
    c_l = (sbm(has * resp * (iou - xywhc_p[..., 4]) ** 2)
           + bw * sbm(no * xywhc_p[..., 4] ** 2))
    p_p = np.clip(y_pred[..., -c:], EPS, 1 - EPS)
    p_l = -sbm(has * y_true[..., -c:] * np.log(p_p))
    expected = lw[0] * xy_l + lw[1] * wh_l + lw[2] * c_l + lw[3] * p_l

    got = wrap_yolo_loss_v1(gs, b, c, bw, lw)(y_true, y_pred)
    np.testing.assert_allclose(float(got), expected, rtol=2e-5)


def test_v2_loss_parity():
    n, s, b, c = 2, 4, 3, 5
    gs = (s, s)
    y_true, y_pred = make_data(n, s, b, c)
    anchors = RNG.rand(b, 2).astype(np.float32) * 0.5 + 0.1
    bw, lw, ig = 0.5, [1, 1, 5, 1], 0.6

    t = y_true.reshape(n, s, s, 1, 5 + c)
    p = y_pred.reshape(n, s, s, b, 5 + c)
    pa = anchors.reshape(1, 1, 1, b, 2)
    iou = np_iou_grid(t[..., :4], p[..., :4], gs)
    resp = one_hot(np.argmax(iou, -1), b)
    has = t[..., 4] * resp
    has_e = has[..., None]
    no = (iou < ig).astype(np.float32) * (1 - has)
    wh_t = np.log(np.maximum(t[..., 2:4] / pa, EPS))
    wh_p = np.log(p[..., 2:4] / pa)
    scale = 2 - t[..., 2:3] * t[..., 3:4]
    xy_l = sbm(has_e * scale * (t[..., :2] - p[..., :2]) ** 2)
    wh_l = sbm(has_e * scale * (wh_t - wh_p) ** 2)
    c_l = (sbm(has * (1 - p[..., 4]) ** 2) + bw * sbm(no * p[..., 4] ** 2))
    p_p = np.clip(p[..., -c:], EPS, 1 - EPS)
    p_l = -sbm(has_e * t[..., -c:] * np.log(p_p))
    reg = sbm(wh_p ** 2) * 0.01
    expected = lw[0]*xy_l + lw[1]*wh_l + lw[2]*c_l + lw[3]*p_l + reg

    got = wrap_yolo_loss_v2(gs, b, c, anchors, bw, lw, ig)(y_true, y_pred)
    np.testing.assert_allclose(float(got), expected, rtol=2e-5)


@pytest.mark.parametrize("focal", [False, True])
@pytest.mark.parametrize("use_scale", [True, False])
def test_v3_loss_parity(focal, use_scale):
    n, s, b, c = 2, 4, 3, 5
    gs = (s, s)
    y_true, y_pred = make_data(n, s, b, c, seed=3)
    anchors = RNG.rand(b, 2).astype(np.float32) * 0.5 + 0.1
    bw, lw, ig, gamma = 1.3, [1, 1, 5, 1], 0.6, 2

    t = y_true.reshape(n, s, s, 1, 5 + c)
    p = y_pred.reshape(n, s, s, b, 5 + c)
    pa = anchors.reshape(1, 1, 1, b, 2)
    iou = np_iou_grid(t[..., :4], p[..., :4], gs)
    resp = one_hot(np.argmax(iou, -1), b)
    has = t[..., 4] * resp
    has_e = has[..., None]
    no = (iou < ig).astype(np.float32) * (1 - has)
    wh_t = np.log(np.maximum(t[..., 2:4] / pa, EPS))
    wh_p = np.log(p[..., 2:4] / pa)
    scale = (2 - t[..., 2:3] * t[..., 3:4]) if use_scale else 1.0
    xy_l = sbm(has_e * scale * (t[..., :2] - p[..., :2]) ** 2)
    wh_l = sbm(has_e * scale * (wh_t - wh_p) ** 2)
    cp = p[..., 4]
    if focal:
        cc = np.clip(cp, EPS, 1 - EPS)
        c_l = (-sbm(has * (1 - cc) ** gamma * np.log(cc))
               + bw * -sbm(no * cc ** gamma * np.log(1 - cc)))
    else:
        c_l = sbm(has * (1 - cp) ** 2) + bw * sbm(no * cp ** 2)
    p_p = np.clip(p[..., -c:], EPS, 1 - EPS)
    p_t = t[..., -c:]
    p_l = -sbm(has_e * (p_t * np.log(p_p) + (1 - p_t) * np.log(1 - p_p)))
    reg = sbm(wh_p ** 2) * 0.01
    expected = lw[0]*xy_l + lw[1]*wh_l + lw[2]*c_l + lw[3]*p_l + reg

    got = wrap_yolo_loss_v3(gs, b, c, anchors, bw, lw, ig,
                            use_focal_loss=focal,
                            use_scale=use_scale)(y_true, y_pred)
    np.testing.assert_allclose(float(got), expected, rtol=2e-5)


@pytest.mark.parametrize("smooth,truth", [(0.0, 1.0), (0.1, 0.9)])
def test_v4_loss_parity(smooth, truth):
    n, s, b, c = 2, 4, 3, 5
    gs = (s, s)
    y_true, y_pred = make_data(n, s, b, c, seed=4)
    anchors = RNG.rand(b, 2).astype(np.float32) * 0.5 + 0.1
    bw, lw, whw, ig, gamma = 0.8, [1, 5, 1], 0.01, 0.6, 2

    t = y_true.reshape(n, s, s, 1, 5 + c)
    p = y_pred.reshape(n, s, s, b, 5 + c)
    pa = anchors.reshape(1, 1, 1, b, 2)
    iou, ciou = np_iou_grid(t[..., :4], p[..., :4], gs, want_ciou=True)
    resp = one_hot(np.argmax(iou, -1), b)
    has = t[..., 4] * resp
    if truth < 1:
        tm = (iou > truth).astype(np.float32)
        has = has + tm * (1 - has)
    has_e = has[..., None]
    no = (iou < ig).astype(np.float32) * (1 - has)
    box_l = sbm(has * (1 - ciou))
    cp = np.clip(p[..., 4], EPS, 1 - EPS)
    if smooth > 0:
        oe, ne = np.abs(1 - smooth - cp), np.abs(smooth - cp)
    else:
        oe, ne = 1 - cp, cp
    c_l = (-sbm(has * oe ** gamma * np.log(1 - oe))
           + bw * -sbm(no * ne ** gamma * np.log(1 - ne)))
    p_p = np.clip(p[..., -c:], EPS, 1 - EPS)
    p_t = t[..., -c:]
    p_l = -sbm(has_e * (p_t * np.log(p_p) + (1 - p_t) * np.log(1 - p_p)))
    wh_p = np.log(p[..., 2:4] / pa)
    expected = lw[0]*box_l + lw[1]*c_l + lw[2]*p_l + whw * sbm(wh_p ** 2)

    got = wrap_yolo_loss_v4(gs, b, c, anchors, bw, lw, whw, ig,
                            truth_thresh=truth,
                            label_smooth=smooth)(y_true, y_pred)
    np.testing.assert_allclose(float(got), expected, rtol=2e-5)


def test_loss_accepts_shaped_input():
    n, s, b, c = 2, 4, 3, 5
    y_true, y_pred = make_data(n, s, b, c, seed=5)
    anchors = np.full((b, 2), 0.3, np.float32)
    fn = wrap_yolo_loss_v2((s, s), b, c, anchors)
    flat = float(fn(y_true, y_pred))
    shaped = float(fn(y_true.reshape(n, s, s, 1, 5 + c),
                      y_pred.reshape(n, s, s, b, 5 + c)))
    np.testing.assert_allclose(flat, shaped, rtol=1e-6)
