"""The four YOLO loss families as pure jax.numpy closures.

Each wrapper returns ``loss(y_true, y_pred) -> scalar`` with semantics
matching the reference (value-parity at f32 tolerances):
  - v1: /root/reference/yolov1_5/losses/loss.py:40-118
  - v2: /root/reference/yolov2/losses/loss.py:40-137
  - v3: /root/reference/yolov3/losses/loss.py:40-164
  - v4: /root/reference/yolov4/losses/loss.py:64-169

The closures are traced once under jit and fully fused by XLA; they
accept either the flat channel layout (N, S, S, B*(5+C)) the facade
models emit, or pre-shaped (N, S, S, B, 5+C) tensors (the reshape is a
no-op in that case). Reduction convention is ``sum(mean(x, axis=0))``
(per-batch mean, then sum over grid/box/coord axes), as in the
reference's ``reduce_sum(reduce_mean(..., axis=0))``.

All math that is numerically cliff-prone (log of wh ratios, exp-based
focal terms) should be fed f32 tensors; the training engine upcasts
model outputs to f32 before the loss for exactly this reason.
"""

import jax.numpy as jnp
import jax.nn

from .geometry import grid_iou, EPSILON


def _as_f32(x):
    return jnp.asarray(x, jnp.float32)


def _sum_batch_mean(x):
    """sum over all axes of the per-batch mean (reference reduction)."""
    return jnp.sum(jnp.mean(x, axis=0))


def _response_mask(iou_scores, bbox_num, dtype):
    """One-hot of the best-IoU box per cell (ties -> first index)."""
    return jax.nn.one_hot(
        jnp.argmax(iou_scores, axis=-1), bbox_num, dtype=dtype)


def wrap_yolo_loss_v1(grid_shape,
                      bbox_num,
                      class_num,
                      binary_weight=1,
                      loss_weight=(1, 1, 1, 1)):
    """YOLOv1 loss: SSE xy + sqrt-wh + IoU-target conf + softmax-CE class.

    Layout: y[..., :5*B] is per-box xywhc, y[..., -C:] is the shared
    class distribution (yolov1_5/losses/loss.py:47-52).
    """
    grid_shape = tuple(int(g) for g in grid_shape)
    binary_weight = jnp.asarray(binary_weight, jnp.float32)

    def yolo_loss(y_true, y_pred):
        y_true = _as_f32(y_true)
        y_pred = _as_f32(y_pred)
        y_true = y_true.reshape(-1, *grid_shape, 5 * 1 + class_num)
        y_pred = y_pred.reshape(-1, *grid_shape, 5 * bbox_num + class_num)

        xywhc_true = y_true[..., :-class_num].reshape(
            -1, *grid_shape, 1, 5)
        xywhc_pred = y_pred[..., :-class_num].reshape(
            -1, *grid_shape, bbox_num, 5)

        iou_scores = grid_iou(xywhc_true[..., :4], xywhc_pred[..., :4],
                              grid_shape)                      # N,S,S,B
        response = _response_mask(iou_scores, bbox_num, y_true.dtype)
        response_exp = response[..., None]

        has_obj = xywhc_true[..., 4]                           # N,S,S,1
        has_obj_exp = has_obj[..., None]                       # N,S,S,1,1
        no_obj = 1.0 - has_obj * response                      # N,S,S,B

        xy_true = xywhc_true[..., 0:2]
        xy_pred = xywhc_pred[..., 0:2]
        wh_true = jnp.maximum(xywhc_true[..., 2:4], EPSILON)
        wh_pred = jnp.maximum(xywhc_pred[..., 2:4], EPSILON)
        c_pred = xywhc_pred[..., 4]

        xy_loss = _sum_batch_mean(
            has_obj_exp * response_exp * jnp.square(xy_true - xy_pred))
        wh_loss = _sum_batch_mean(
            has_obj_exp * response_exp
            * jnp.square(jnp.sqrt(wh_true) - jnp.sqrt(wh_pred)))
        has_obj_c = _sum_batch_mean(
            has_obj * response * jnp.square(iou_scores - c_pred))
        no_obj_c = _sum_batch_mean(no_obj * jnp.square(c_pred))
        c_loss = has_obj_c + binary_weight * no_obj_c

        p_true = y_true[..., -class_num:]
        p_pred = jnp.clip(y_pred[..., -class_num:], EPSILON, 1 - EPSILON)
        p_loss = -_sum_batch_mean(has_obj * p_true * jnp.log(p_pred))

        return jnp.mean(loss_weight[0] * xy_loss
                        + loss_weight[1] * wh_loss
                        + loss_weight[2] * c_loss
                        + loss_weight[3] * p_loss)

    return yolo_loss


def wrap_yolo_loss_v2(grid_shape,
                      bbox_num,
                      class_num,
                      anchors,
                      binary_weight=1,
                      loss_weight=(1, 1, 1, 1),
                      ignore_thresh=0.6):
    """YOLOv2 loss: log-space anchor-relative wh, ignore-thresh no-obj
    mask, box_loss_scale = 2 - w*h, wh^2*0.01 regularizer."""
    grid_shape = tuple(int(g) for g in grid_shape)
    panchors = jnp.asarray(anchors, jnp.float32).reshape(
        1, 1, 1, bbox_num, 2)
    binary_weight = jnp.asarray(binary_weight, jnp.float32)

    def yolo_loss(y_true, y_pred):
        y_true = _as_f32(y_true).reshape(-1, *grid_shape, 1, 5 + class_num)
        y_pred = _as_f32(y_pred).reshape(
            -1, *grid_shape, bbox_num, 5 + class_num)

        iou_scores = grid_iou(y_true[..., :4], y_pred[..., :4], grid_shape)
        response = _response_mask(iou_scores, bbox_num, y_true.dtype)

        has_obj = y_true[..., 4] * response                    # N,S,S,B
        has_obj_exp = has_obj[..., None]
        no_obj = (iou_scores < ignore_thresh).astype(iou_scores.dtype)
        no_obj = (1.0 - has_obj) * no_obj

        xy_true = y_true[..., 0:2]
        xy_pred = y_pred[..., 0:2]
        wh_true = jnp.log(jnp.maximum(y_true[..., 2:4] / panchors, EPSILON))
        wh_pred = jnp.log(y_pred[..., 2:4] / panchors)
        c_pred = y_pred[..., 4]

        box_scale = 2.0 - y_true[..., 2:3] * y_true[..., 3:4]  # N,S,S,1,1

        xy_loss = _sum_batch_mean(
            has_obj_exp * box_scale * jnp.square(xy_true - xy_pred))
        wh_loss = _sum_batch_mean(
            has_obj_exp * box_scale * jnp.square(wh_true - wh_pred))

        has_obj_c = _sum_batch_mean(has_obj * jnp.square(1.0 - c_pred))
        no_obj_c = _sum_batch_mean(no_obj * jnp.square(c_pred))
        c_loss = has_obj_c + binary_weight * no_obj_c

        p_true = y_true[..., -class_num:]
        p_pred = jnp.clip(y_pred[..., -class_num:], EPSILON, 1 - EPSILON)
        p_loss = -_sum_batch_mean(has_obj_exp * p_true * jnp.log(p_pred))

        regularizer = _sum_batch_mean(jnp.square(wh_pred)) * 0.01

        return jnp.mean(loss_weight[0] * xy_loss
                        + loss_weight[1] * wh_loss
                        + loss_weight[2] * c_loss
                        + loss_weight[3] * p_loss
                        + regularizer)

    return yolo_loss


def wrap_yolo_loss_v3(grid_shape,
                      bbox_num,
                      class_num,
                      anchors=None,
                      binary_weight=1,
                      loss_weight=(1, 1, 1, 1),
                      ignore_thresh=0.6,
                      use_focal_loss=False,
                      focal_loss_gamma=2,
                      use_scale=True):
    """YOLOv3 loss: v2 + optional focal conf loss + BCE class loss."""
    grid_shape = tuple(int(g) for g in grid_shape)
    if anchors is None:
        panchors = jnp.float32(1.0)
    else:
        panchors = jnp.asarray(anchors, jnp.float32).reshape(
            1, 1, 1, bbox_num, 2)
    binary_weight = jnp.asarray(binary_weight, jnp.float32)

    def yolo_loss(y_true, y_pred):
        y_true = _as_f32(y_true).reshape(-1, *grid_shape, 1, 5 + class_num)
        y_pred = _as_f32(y_pred).reshape(
            -1, *grid_shape, bbox_num, 5 + class_num)

        iou_scores = grid_iou(y_true[..., :4], y_pred[..., :4], grid_shape)
        response = _response_mask(iou_scores, bbox_num, y_true.dtype)

        has_obj = y_true[..., 4] * response
        has_obj_exp = has_obj[..., None]
        no_obj = (iou_scores < ignore_thresh).astype(iou_scores.dtype)
        no_obj = (1.0 - has_obj) * no_obj

        xy_true = y_true[..., 0:2]
        xy_pred = y_pred[..., 0:2]
        wh_true = jnp.log(jnp.maximum(y_true[..., 2:4] / panchors, EPSILON))
        wh_pred = jnp.log(y_pred[..., 2:4] / panchors)
        c_pred = y_pred[..., 4]

        if use_scale:
            box_scale = 2.0 - y_true[..., 2:3] * y_true[..., 3:4]
        else:
            box_scale = 1.0

        xy_loss = _sum_batch_mean(
            has_obj_exp * box_scale * jnp.square(xy_true - xy_pred))
        wh_loss = _sum_batch_mean(
            has_obj_exp * box_scale * jnp.square(wh_true - wh_pred))

        if use_focal_loss:
            c_clip = jnp.clip(c_pred, EPSILON, 1 - EPSILON)
            has_obj_c = -_sum_batch_mean(
                has_obj * (1.0 - c_clip) ** focal_loss_gamma
                * jnp.log(c_clip))
            no_obj_c = -_sum_batch_mean(
                no_obj * c_clip ** focal_loss_gamma * jnp.log(1.0 - c_clip))
        else:
            has_obj_c = _sum_batch_mean(has_obj * jnp.square(1.0 - c_pred))
            no_obj_c = _sum_batch_mean(no_obj * jnp.square(c_pred))
        c_loss = has_obj_c + binary_weight * no_obj_c

        p_true = y_true[..., -class_num:]
        p_pred = jnp.clip(y_pred[..., -class_num:], EPSILON, 1 - EPSILON)
        p_loss = -_sum_batch_mean(
            has_obj_exp * (p_true * jnp.log(p_pred)
                           + (1.0 - p_true) * jnp.log(1.0 - p_pred)))

        regularizer = _sum_batch_mean(jnp.square(wh_pred)) * 0.01

        return jnp.mean(loss_weight[0] * xy_loss
                        + loss_weight[1] * wh_loss
                        + loss_weight[2] * c_loss
                        + loss_weight[3] * p_loss
                        + regularizer)

    return yolo_loss


def wrap_yolo_loss_v4(grid_shape,
                      bbox_num,
                      class_num,
                      anchors=None,
                      binary_weight=1,
                      loss_weight=(1, 1, 1),
                      wh_reg_weight=0.01,
                      ignore_thresh=0.6,
                      truth_thresh=1,
                      label_smooth=0,
                      focal_loss_gamma=2):
    """YOLOv4 loss: CIoU box term, focal conf with label smoothing,
    BCE class loss, log-space wh regularizer, 3-way loss weights."""
    grid_shape = tuple(int(g) for g in grid_shape)
    if anchors is None:
        panchors = jnp.float32(1.0)
    else:
        panchors = jnp.asarray(anchors, jnp.float32).reshape(
            1, 1, 1, bbox_num, 2)
    binary_weight = jnp.asarray(binary_weight, jnp.float32)

    def yolo_loss(y_true, y_pred):
        y_true = _as_f32(y_true).reshape(-1, *grid_shape, 1, 5 + class_num)
        y_pred = _as_f32(y_pred).reshape(
            -1, *grid_shape, bbox_num, 5 + class_num)

        iou_scores, ciou_scores = grid_iou(
            y_true[..., :4], y_pred[..., :4], grid_shape, return_ciou=True)
        response = _response_mask(iou_scores, bbox_num, y_true.dtype)

        has_obj = y_true[..., 4] * response
        if truth_thresh < 1:
            truth_mask = (iou_scores > truth_thresh).astype(iou_scores.dtype)
            has_obj = has_obj + truth_mask * (1.0 - has_obj)
        has_obj_exp = has_obj[..., None]

        no_obj = (iou_scores < ignore_thresh).astype(iou_scores.dtype)
        no_obj = (1.0 - has_obj) * no_obj

        box_loss = _sum_batch_mean(has_obj * (1.0 - ciou_scores))

        c_pred = jnp.clip(y_pred[..., 4], EPSILON, 1 - EPSILON)
        if label_smooth > 0:
            obj_error = jnp.abs(1.0 - label_smooth - c_pred)
            no_obj_error = jnp.abs(label_smooth - c_pred)
        else:
            obj_error = 1.0 - c_pred
            no_obj_error = c_pred

        has_obj_c = -_sum_batch_mean(
            has_obj * obj_error ** focal_loss_gamma
            * jnp.log(1.0 - obj_error))
        no_obj_c = -_sum_batch_mean(
            no_obj * no_obj_error ** focal_loss_gamma
            * jnp.log(1.0 - no_obj_error))
        c_loss = has_obj_c + binary_weight * no_obj_c

        p_true = y_true[..., -class_num:]
        p_pred = jnp.clip(y_pred[..., -class_num:], EPSILON, 1 - EPSILON)
        p_loss = -_sum_batch_mean(
            has_obj_exp * (p_true * jnp.log(p_pred)
                           + (1.0 - p_true) * jnp.log(1.0 - p_pred)))

        wh_pred = jnp.log(y_pred[..., 2:4] / panchors)
        wh_reg = _sum_batch_mean(jnp.square(wh_pred))

        return jnp.mean(loss_weight[0] * box_loss
                        + loss_weight[1] * c_loss
                        + loss_weight[2] * p_loss
                        + wh_reg_weight * wh_reg)

    return yolo_loss
