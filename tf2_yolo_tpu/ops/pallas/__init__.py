"""Pallas (Mosaic) TPU kernels for the training and inference hot paths."""

from .nms_kernel import nms_pallas
from .conv_bn_kernel import (conv1x1_stats, conv3x3_stats,
                             conv_stats_ref)

__all__ = ["nms_pallas", "conv1x1_stats", "conv3x3_stats",
           "conv_stats_ref"]
