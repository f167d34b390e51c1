"""Pallas (Mosaic) TPU kernels for the inference hot path."""

from .nms_kernel import nms_pallas

__all__ = ["nms_pallas"]
