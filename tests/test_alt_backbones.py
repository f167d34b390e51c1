"""Alternative backbones: ResNet v1/v2 taps, MobileNetV2, UNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_yolo_tpu.models import (ResNet, MobileNetV2, YoloV2, YoloV3,
                                 YoloV4)


def _apply(model, shape):
    x = jnp.zeros(shape, jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    return v, model.apply(v, x, train=False)


@pytest.mark.parametrize("preact", [False, True])
def test_resnet50_tap_shapes(preact):
    model = ResNet(depth=50, preact=preact)
    _, (c3, c4, c5) = _apply(model, (1, 96, 96, 3))
    assert c3.shape == (1, 12, 12, 512)     # stride 8
    assert c4.shape == (1, 6, 6, 1024)      # stride 16
    assert c5.shape == (1, 3, 3, 2048)      # stride 32


def test_mobilenet_v2_shape():
    model = MobileNetV2()
    _, out = _apply(model, (1, 96, 96, 3))
    assert out.shape == (1, 3, 3, 1280)
    assert float(jnp.max(out)) <= 6.0 + 1e-5   # relu6


def test_yolov2_mobilenet_backbone():
    model = YoloV2(anchors=[[0.2, 0.2]], class_num=2,
                   backbone="mobilenet")
    _, out = _apply(model, (1, 64, 64, 3))
    assert out.shape == (1, 2, 2, 1 * 7)


def test_yolov3_resnet_backbone():
    anchors = np.full((3, 2), 0.3)
    model = YoloV3(anchors=anchors, class_num=2, backbone="resnet50")
    _, outs = _apply(model, (1, 96, 96, 3))
    assert [o.shape for o in outs] == [(1, 3, 3, 7), (1, 6, 6, 7),
                                       (1, 12, 12, 7)]


def test_yolov4_resnet_backbone():
    anchors = np.full((3, 2), 0.3)
    model = YoloV4(anchors=anchors, class_num=2,
                   backbone="resnet50v2")
    _, outs = _apply(model, (1, 96, 96, 3))
    assert [o.shape for o in outs] == [(1, 3, 3, 7), (1, 6, 6, 7),
                                       (1, 12, 12, 7)]


def test_facade_rejects_unknown_backbone():
    from tf2_yolo_tpu import yolov3
    yolo = yolov3.Yolo(input_shape=(96, 96, 3), class_names=["a"])
    with pytest.raises(ValueError):
        yolo.create_model(backbone="vgg16", pretrained_body=None)


from flax import linen as nn


class _ToyBackbone(nn.Module):
    """Minimal custom backbone: 3 stride-halving stages -> c3/c4/c5."""
    bn_axis_name: object = None
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        from tf2_yolo_tpu.models import ConvBN
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        x = ConvBN(8, 3, 2, **kw)(x, train)      # /2
        x = ConvBN(8, 3, 2, **kw)(x, train)      # /4
        c3 = ConvBN(16, 3, 2, **kw)(x, train)    # /8
        c4 = ConvBN(32, 3, 2, **kw)(c3, train)   # /16
        c5 = ConvBN(64, 3, 2, **kw)(c4, train)   # /32
        return c3, c4, c5


@pytest.mark.parametrize("cls", [YoloV3, YoloV4])
def test_custom_backbone_factory(cls):
    """Any flax backbone factory plugs into the v3 FPN / v4 PAN neck —
    the equivalent of the reference's wrap-any-keras-application
    builders (yolov3/models/backbone.py:98, yolov4 backbone.py:188)."""
    anchors = np.full((3, 2), 0.3)
    model = cls(anchors=anchors, class_num=2, backbone=_ToyBackbone)
    variables, outs = _apply(model, (1, 96, 96, 3))
    assert [o.shape for o in outs] == [(1, 3, 3, 7), (1, 6, 6, 7),
                                       (1, 12, 12, 7)]
    assert "backbone" in variables["params"]


def test_facade_accepts_backbone_factory():
    from tf2_yolo_tpu import yolov4
    yolo = yolov4.Yolo(input_shape=(96, 96, 3), class_names=["a", "b"])
    anchors = np.stack([np.linspace(0.1, 0.9, 9),
                        np.linspace(0.2, 0.8, 9)], 1)
    yolo.create_model(anchors=anchors.tolist(),
                      backbone=_ToyBackbone, pretrained_body=None)
    out = yolo.model.predict(np.zeros((1, 96, 96, 3), np.float32))
    assert [o.shape for o in out] == [(1, 3, 3, 21), (1, 6, 6, 21),
                                      (1, 12, 12, 21)]
