"""Train-time metrics as pure jax.numpy closures.

Reference semantics:
  - v1 layout (5*B + shared C): /root/reference/yolov1_5/metrics/yolo_metrics.py
  - v2+ layout (B x (5+C)): /root/reference/yolov2/metrics/yolo_metrics.py
    (v3/v4 metric files are identical math, only the cal_iou import differs).

Each wrapper returns ``metric(y_true, y_pred) -> scalar`` (the keras
engine averaged the per-sample binary accuracy; here we return the
overall mean directly). The ``version`` argument selects the tensor
layout: 1 for YOLOv1, anything >= 2 for the per-anchor layout.
"""

import jax.numpy as jnp

from .geometry import grid_iou, EPSILON


def _split_v1(y_true, y_pred, grid_shape, bbox_num, class_num):
    xywhc_true = y_true[..., :-class_num].reshape(
        -1, *grid_shape, 1, 5)
    xywhc_pred = y_pred[..., :-class_num].reshape(
        -1, *grid_shape, bbox_num, 5)
    return xywhc_true, xywhc_pred


def _split_v2(y_true, y_pred, grid_shape, bbox_num, class_num):
    y_true = y_true.reshape(-1, *grid_shape, 1, 5 + class_num)
    y_pred = y_pred.reshape(-1, *grid_shape, bbox_num, 5 + class_num)
    return y_true, y_pred


def wrap_obj_acc(grid_shape, bbox_num, class_num, version=2):
    """Binary accuracy of max-over-boxes confidence vs objectness."""
    grid_shape = tuple(int(g) for g in grid_shape)

    def obj_acc(y_true, y_pred):
        y_true = jnp.asarray(y_true, jnp.float32)
        y_pred = jnp.asarray(y_pred, jnp.float32)
        if version == 1:
            t, p = _split_v1(y_true, y_pred, grid_shape, bbox_num, class_num)
        else:
            t, p = _split_v2(y_true, y_pred, grid_shape, bbox_num, class_num)
        c_true = t[..., 4]                                   # N,S,S,1
        c_pred = jnp.max(p[..., 4], axis=-1, keepdims=True)  # N,S,S,1
        # keras binary_accuracy thresholds the prediction at > 0.5
        # (cast(pred > 0.5)), NOT round() — they differ at exactly 0.5
        # (both 0) only by accident and genuinely at conf > 1.5, where
        # round gives 2 != 1 (reference yolov2/metrics/yolo_metrics.py
        # :24 via tf.keras.metrics.binary_accuracy).
        thresholded = (c_pred > 0.5).astype(jnp.float32)
        match = (c_true == thresholded).astype(jnp.float32)
        return jnp.mean(match)

    return obj_acc


def wrap_mean_iou(grid_shape, bbox_num, class_num, version=2):
    """Mean best-box IoU over object cells."""
    grid_shape = tuple(int(g) for g in grid_shape)

    def mean_iou(y_true, y_pred):
        y_true = jnp.asarray(y_true, jnp.float32)
        y_pred = jnp.asarray(y_pred, jnp.float32)
        if version == 1:
            t, p = _split_v1(y_true, y_pred, grid_shape, bbox_num, class_num)
        else:
            t, p = _split_v2(y_true, y_pred, grid_shape, bbox_num, class_num)
        has_obj = t[..., 4]                                   # N,S,S,1
        iou = grid_iou(t[..., :4], p[..., :4], grid_shape)    # N,S,S,B
        iou = jnp.max(iou, axis=-1, keepdims=True) * has_obj
        num_p = jnp.sum(has_obj)
        return jnp.sum(iou) / (num_p + EPSILON)

    return mean_iou


def wrap_class_acc(grid_shape, bbox_num, class_num, version=2):
    """Argmax class match over object cells.

    For v1 the class distribution is shared per cell (denominator is the
    object count); for v2+ it is per anchor box (denominator scaled by
    ``bbox_num`` — yolov2/metrics/yolo_metrics.py:76).
    """
    grid_shape = tuple(int(g) for g in grid_shape)

    def class_acc(y_true, y_pred):
        y_true = jnp.asarray(y_true, jnp.float32)
        y_pred = jnp.asarray(y_pred, jnp.float32)
        if version == 1:
            y_true_r = y_true.reshape(-1, *grid_shape, 5 + class_num)
            y_pred_r = y_pred.reshape(
                -1, *grid_shape, 5 * bbox_num + class_num)
            has_obj = y_true_r[..., 4]                        # N,S,S
            pi_true = jnp.argmax(y_true_r[..., -class_num:], axis=-1)
            pi_pred = jnp.argmax(y_pred_r[..., -class_num:], axis=-1)
            equal = (pi_true == pi_pred).astype(jnp.float32) * has_obj
            num_p = jnp.sum(has_obj)
        else:
            t, p = _split_v2(y_true, y_pred, grid_shape, bbox_num, class_num)
            has_obj = t[..., 4]                               # N,S,S,1
            pi_true = jnp.argmax(t[..., -class_num:], axis=-1)  # N,S,S,1
            pi_pred = jnp.argmax(p[..., -class_num:], axis=-1)  # N,S,S,B
            equal = (pi_true == pi_pred).astype(jnp.float32) * has_obj
            num_p = jnp.sum(has_obj) * bbox_num
        return jnp.sum(equal) / (num_p + EPSILON)

    return class_acc


def wrap_recall(grid_shape, bbox_num, class_num, iou_threshold=0.5,
                version=2):
    """Recall at an IoU threshold, gated on class match."""
    grid_shape = tuple(int(g) for g in grid_shape)

    def recall(y_true, y_pred):
        y_true = jnp.asarray(y_true, jnp.float32)
        y_pred = jnp.asarray(y_pred, jnp.float32)
        if version == 1:
            t, p = _split_v1(y_true, y_pred, grid_shape, bbox_num, class_num)
            y_true_r = y_true.reshape(-1, *grid_shape, 5 + class_num)
            y_pred_r = y_pred.reshape(
                -1, *grid_shape, 5 * bbox_num + class_num)
            has_obj = t[..., 4]                               # N,S,S,1
            pi_true = jnp.argmax(y_true_r[..., -class_num:], axis=-1)
            pi_pred = jnp.argmax(y_pred_r[..., -class_num:], axis=-1)
            equal = (pi_true == pi_pred).astype(jnp.float32)
            equal = equal[..., None] * has_obj                # N,S,S,1
        else:
            t, p = _split_v2(y_true, y_pred, grid_shape, bbox_num, class_num)
            has_obj = t[..., 4]                               # N,S,S,1
            pi_true = jnp.argmax(t[..., -class_num:], axis=-1)
            pi_pred = jnp.argmax(p[..., -class_num:], axis=-1)
            equal = (pi_true == pi_pred).astype(jnp.float32) * has_obj
        iou = grid_iou(t[..., :4], p[..., :4], grid_shape)    # N,S,S,B
        iou = iou * equal
        iou = jnp.max(iou, axis=-1, keepdims=True)            # N,S,S,1
        num_tp = jnp.sum((iou >= iou_threshold).astype(jnp.float32))
        num_p = jnp.sum(has_obj)
        return num_tp / (num_p + EPSILON)

    return recall
