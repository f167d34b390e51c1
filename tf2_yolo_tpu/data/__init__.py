"""Host data pipeline: parsers, dataset sequence, augmentation."""

from .parsers import parse_labelimg, parse_labelme
from .dataset import YoloDataSequence, encode_to_grid
from .pipeline import prefetch_to_device, threaded_prefetch
from . import augment

__all__ = ["parse_labelimg", "parse_labelme", "YoloDataSequence",
           "encode_to_grid", "augment",
           "prefetch_to_device", "threaded_prefetch"]
