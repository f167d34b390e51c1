"""Box geometry ops (IoU / DIoU / CIoU) as pure jax.numpy functions.

Semantics match the reference implementations:
  - broadcast IoU / DIoU over xywh tensors: /root/reference/utils/tools.py:630-684
  - grid-normalized loss IoU (xy divided by grid, wh already normalized):
    /root/reference/yolov4/losses/loss.py:10-61
All functions are shape-polymorphic under broadcasting and jit-safe
(static control flow only), so XLA fuses them into surrounding code.
"""

import math

import jax.numpy as jnp

EPSILON = 1e-07


def _corners(xy, wh):
    half = wh / 2.0
    return xy - half, xy + half


def pair_iou(xywh_a, xywh_b, mode=1):
    """Broadcast IoU of two xywh tensors (x, y normalized by image size).

    Args:
        xywh_a: array (..., 4).
        xywh_b: array (..., 4), broadcast-compatible with ``xywh_a``.
        mode: 1 -> IoU, 2 -> DIoU (= IoU - rho^2 / c^2).

    Returns:
        IoU (or DIoU) scores with the broadcast shape of the inputs
        minus the last axis.
    """
    xy_a, wh_a = xywh_a[..., 0:2], xywh_a[..., 2:4]
    xy_b, wh_b = xywh_b[..., 0:2], xywh_b[..., 2:4]

    mins_a, maxes_a = _corners(xy_a, wh_a)
    mins_b, maxes_b = _corners(xy_b, wh_b)

    inter_mins = jnp.maximum(mins_b, mins_a)
    inter_maxes = jnp.minimum(maxes_b, maxes_a)
    inter_wh = jnp.maximum(inter_maxes - inter_mins, 0.0)
    inter_area = inter_wh[..., 0] * inter_wh[..., 1]

    area_a = wh_a[..., 0] * wh_a[..., 1]
    area_b = wh_b[..., 0] * wh_b[..., 1]
    union = area_a + area_b - inter_area
    iou = inter_area / (union + EPSILON)

    if mode == 1:
        return iou

    # DIoU penalty: squared center distance over squared enclosing diagonal.
    enc_mins = jnp.minimum(mins_b, mins_a)
    enc_maxes = jnp.maximum(maxes_b, maxes_a)
    enc_wh = enc_maxes - enc_mins
    enc_c2 = enc_wh[..., 0] ** 2 + enc_wh[..., 1] ** 2
    rho2 = ((xy_a[..., 0] - xy_b[..., 0]) ** 2
            + (xy_a[..., 1] - xy_b[..., 1]) ** 2)
    return iou - rho2 / enc_c2


def grid_iou(xywh_true, xywh_pred, grid_shape, return_ciou=False):
    """Loss-side IoU where only xy is normalized by the grid.

    The label stores xy as the offset inside the owning cell and wh
    normalized by image size; the reference divides xy by the grid
    (W, H order) before computing IoU (yolov4/losses/loss.py:14-18).

    Args:
        xywh_true: (..., 1, 4) grid-space truth.
        xywh_pred: (..., B, 4) grid-space prediction.
        grid_shape: (grid_h, grid_w) python ints.
        return_ciou: also return CIoU (= IoU - rho^2/c^2 - alpha*v).

    Returns:
        iou (..., B) or (iou, ciou).
    """
    wh_norm = jnp.asarray(grid_shape[::-1], dtype=xywh_true.dtype)

    xy_true = xywh_true[..., 0:2] / wh_norm
    wh_true = xywh_true[..., 2:4]
    xy_pred = xywh_pred[..., 0:2] / wh_norm
    wh_pred = xywh_pred[..., 2:4]

    mins_t, maxes_t = _corners(xy_true, wh_true)
    mins_p, maxes_p = _corners(xy_pred, wh_pred)

    inter_mins = jnp.maximum(mins_p, mins_t)
    inter_maxes = jnp.minimum(maxes_p, maxes_t)
    inter_wh = jnp.maximum(inter_maxes - inter_mins, 0.0)
    inter_area = inter_wh[..., 0] * inter_wh[..., 1]

    area_t = wh_true[..., 0] * wh_true[..., 1]
    area_p = wh_pred[..., 0] * wh_pred[..., 1]
    union = area_p + area_t - inter_area
    iou = inter_area / (union + EPSILON)

    if not return_ciou:
        return iou

    enc_mins = jnp.minimum(mins_p, mins_t)
    enc_maxes = jnp.maximum(maxes_p, maxes_t)
    enc_wh = enc_maxes - enc_mins
    enc_c2 = enc_wh[..., 0] ** 2 + enc_wh[..., 1] ** 2
    rho2 = ((xy_true[..., 0] - xy_pred[..., 0]) ** 2
            + (xy_true[..., 1] - xy_pred[..., 1]) ** 2)

    atan_t = jnp.arctan(wh_true[..., 0] / (wh_true[..., 1] + EPSILON))
    atan_p = jnp.arctan(wh_pred[..., 0] / (wh_pred[..., 1] + EPSILON))
    v = 4.0 / (math.pi ** 2) * (atan_t - atan_p) ** 2
    alpha = v / (1.0 - iou + v)

    ciou = iou - rho2 / enc_c2 - alpha * v
    return iou, ciou
