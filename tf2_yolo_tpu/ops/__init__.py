"""Compute ops: geometry, losses, metrics, decode, NMS."""

from .geometry import EPSILON, pair_iou, grid_iou
from .losses import (wrap_yolo_loss_v1, wrap_yolo_loss_v2,
                     wrap_yolo_loss_v3, wrap_yolo_loss_v4)
from .metrics import (wrap_obj_acc, wrap_mean_iou, wrap_class_acc,
                      wrap_recall)

__all__ = [
    "EPSILON", "pair_iou", "grid_iou",
    "wrap_yolo_loss_v1", "wrap_yolo_loss_v2",
    "wrap_yolo_loss_v3", "wrap_yolo_loss_v4",
    "wrap_obj_acc", "wrap_mean_iou", "wrap_class_acc", "wrap_recall",
]
