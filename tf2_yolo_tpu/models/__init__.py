"""Model zoo: layers, backbones, heads, full detectors."""

from .layers import ConvBN, ConvActBN, SPP, mish, upsample2x, space_to_depth
from .backbones import (DarknetV1, Darknet19, UNetBody, Darknet53,
                        TinyDarknet, CSPDarknet53, Classifier)
from .resnet import ResNet
from .mobilenet import MobileNetV2
from .heads import HeadV1, AnchorHead
from .detectors import YoloV1, YoloV2, YoloV3, YoloV4, FPNStage
from .classifiers import darknet, darknet19, darknet53, csp_darknet53

__all__ = [
    "ConvBN", "ConvActBN", "SPP", "mish", "upsample2x", "space_to_depth",
    "DarknetV1", "Darknet19", "UNetBody", "Darknet53", "TinyDarknet",
    "CSPDarknet53", "Classifier", "ResNet", "MobileNetV2",
    "HeadV1", "AnchorHead",
    "YoloV1", "YoloV2", "YoloV3", "YoloV4", "FPNStage",
    "darknet", "darknet19", "darknet53", "csp_darknet53",
]
