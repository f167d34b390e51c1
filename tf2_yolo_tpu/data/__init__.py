"""Host data pipeline: parsers, dataset sequence, augmentation."""

from .parsers import parse_labelimg, parse_labelme
from .dataset import YoloDataSequence, encode_to_grid
from . import augment

__all__ = ["parse_labelimg", "parse_labelme", "YoloDataSequence",
           "encode_to_grid", "augment"]
