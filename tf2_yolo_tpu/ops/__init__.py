"""Compute ops: geometry, losses, metrics, decode, NMS."""

from .geometry import EPSILON, pair_iou, grid_iou
from .losses import (wrap_yolo_loss_v1, wrap_yolo_loss_v2,
                     wrap_yolo_loss_v3, wrap_yolo_loss_v4)
from .metrics import (wrap_obj_acc, wrap_mean_iou, wrap_class_acc,
                      wrap_recall)
from .decode import decode_one_level, decode_multi_level
from .nms import nms as nms_device
from .nms import soft_nms as soft_nms_device
from .nms import apply_nms_device

__all__ = [
    "EPSILON", "pair_iou", "grid_iou",
    "wrap_yolo_loss_v1", "wrap_yolo_loss_v2",
    "wrap_yolo_loss_v3", "wrap_yolo_loss_v4",
    "wrap_obj_acc", "wrap_mean_iou", "wrap_class_acc", "wrap_recall",
    "decode_one_level", "decode_multi_level",
    "nms_device", "soft_nms_device", "apply_nms_device",
]
