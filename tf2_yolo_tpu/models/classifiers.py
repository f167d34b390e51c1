"""Classifier builders mirroring the reference's model factories:

  - darknet:       yolov1_5/models/darknet.py:13-23 (GAP + Dense)
  - darknet19:     yolov2/models/darknet.py:18-29 (1x1 conv head + GAP)
  - darknet53:     yolov3/models/darknet.py:19-68
  - csp_darknet53: yolov4/models/darknet.py:20-69

Each returns an engine ``Model`` (predict/save_weights/load_weights).
Named weight sets ("imagenet") resolve against the local weight cache
(zero-egress; see facade_base.resolve_pretrained).
"""

import flax.linen as nn
import jax.numpy as jnp

from ..engine import Model
from .backbones import (DarknetV1, Darknet19, Darknet53, CSPDarknet53,
                        Classifier)


class _FeatureOnly(nn.Module):
    """Backbone feature model (include_top=False): final stage tap."""
    kind: str = "darknet53"

    @nn.compact
    def __call__(self, x, train=False):
        cls = {"darknet53": Darknet53,
               "csp_darknet53": CSPDarknet53}[self.kind]
        out = cls(name="backbone")(x, train)
        return out[-1] if isinstance(out, tuple) else out


def _classifier(backbone, input_shape, class_num, conv_head=False,
                weights=None, kind="classifier"):
    from ..facade_base import resolve_pretrained

    module = Classifier(backbone=backbone, class_num=class_num,
                        conv_head=conv_head)
    model = Model(module, input_shape)
    resolved = resolve_pretrained(weights, kind)
    if resolved is not None:
        model.load_weights(resolved)
    return model


def _validate_imagenet(include_top, weights, input_shape, class_num):
    if include_top and weights == "imagenet":
        if (input_shape[0] % 32 or input_shape[1] % 32
                or input_shape[2] != 3):
            raise ValueError(
                "When setting `include_top=True` and loading "
                "`imagenet` weights, `input_shape` should be "
                "(32x, 32x, 3).")
        if class_num != 1000:
            raise ValueError(
                "If using `weights` as `'imagenet'` with "
                "`include_top` as true, `class_num` should be 1000")


def darknet(input_shape=(224, 224, 3), class_num=10, weights=None):
    """DarkNet-v1 classifier (GAP + softmax Dense)."""
    return _classifier(DarknetV1(), input_shape, class_num,
                       weights=weights, kind="darknet")


def darknet19(input_shape=(416, 416, 3), class_num=10, weights=None):
    """DarkNet-19 classifier (1x1 conv head + GAP + softmax)."""
    return _classifier(Darknet19(), input_shape, class_num,
                       conv_head=True, weights=weights,
                       kind="darknet19")


def darknet53(include_top=True, weights="imagenet",
              input_shape=(448, 448, 3), class_num=1000):
    """Darknet-53 classifier; include_top=False gives the backbone
    feature model (reference yolov3/models/darknet.py:19-68)."""
    _validate_imagenet(include_top, weights, input_shape, class_num)
    if include_top:
        return _classifier(Darknet53(), input_shape, class_num,
                           weights=weights, kind="darknet53")
    from ..facade_base import resolve_pretrained

    model = Model(_FeatureOnly(kind="darknet53"), input_shape)
    resolved = resolve_pretrained(weights, "darknet53_notop")
    if resolved is not None:
        model.load_weights(resolved)
    return model


def csp_darknet53(include_top=True, weights="imagenet",
                  input_shape=(448, 448, 3), class_num=1000):
    """CSPDarknet-53 classifier (reference yolov4/models/darknet.py:20-69)."""
    _validate_imagenet(include_top, weights, input_shape, class_num)
    if include_top:
        return _classifier(CSPDarknet53(), input_shape, class_num,
                           weights=weights, kind="csp_darknet53")
    from ..facade_base import resolve_pretrained

    model = Model(_FeatureOnly(kind="csp_darknet53"), input_shape)
    resolved = resolve_pretrained(weights, "csp_darknet53_notop")
    if resolved is not None:
        model.load_weights(resolved)
    return model
