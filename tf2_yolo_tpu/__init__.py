"""tf2_yolo_tpu — a TPU-native (JAX/XLA/Pallas) YOLO detection framework.

A ground-up rebuild of the capabilities of samson6460/tf2_YOLO
(YOLOv1.5 / v2 / v3 / v4 end-to-end: dataset reading, anchor-grid label
encoding, k-means anchor fitting, model construction, multi-part YOLO
losses + training metrics, decode + NMS inference, PR/mAP evaluation,
visualization and annotation export), re-designed TPU-first:

- models are Flax modules compiled by XLA (NHWC, bf16-friendly),
- losses/metrics are pure jax.numpy closures fused by XLA,
- training runs as a jit-compiled step over a ``jax.sharding.Mesh``
  (data-parallel by default, extensible to a model axis),
- inference decode + NMS run on device with static shapes,
- evaluation keeps numpy/pandas parity paths so printed artifacts match
  the reference bit-for-bit where possible.

Public subpackages mirror the reference layout:
  ``tf2_yolo_tpu.yolov1_5`` / ``yolov2`` / ``yolov3`` / ``yolov4``
  (each exposing a ``Yolo`` facade class), and ``tf2_yolo_tpu.utils``
  (kmeans, decode, nms, measurement, ...).
"""

__version__ = "0.1.0"

from . import ops
from . import utils
from . import data
from . import models
from . import parallel
from . import yolov1_5
from . import yolov2
from . import yolov3
from . import yolov4
from . import assets
from . import export
from .engine import (Model, EarlyStopping, ModelCheckpoint,
                     ReduceLROnPlateau, TerminateOnNaN,
                     LearningRateScheduler, CSVLogger)
from .config import YoloConfig, LossConfig, NmsConfig, TrainConfig

__all__ = ["ops", "utils", "data", "models", "parallel", "assets",
           "export", "yolov1_5", "yolov2", "yolov3", "yolov4", "Model",
           "EarlyStopping", "ModelCheckpoint",
           "ReduceLROnPlateau", "TerminateOnNaN",
           "LearningRateScheduler", "CSVLogger",
           "YoloConfig", "LossConfig", "NmsConfig", "TrainConfig",
           "__version__"]
