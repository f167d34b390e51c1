"""YOLOv3 facade (reference yolov3/__init__.py parity)."""

from collections.abc import Iterable

from .engine import Model
from .facade_base import YoloBase, MetricKind, resolve_pretrained
from .models import YoloV3
from .ops import wrap_yolo_loss_v3

__all__ = ["Yolo", "MetricKind"]

DEFAULT_ANCHORS = [[0.89663461, 0.78365384],
                   [0.37500000, 0.47596153],
                   [0.27884615, 0.21634615],
                   [0.14182692, 0.28605769],
                   [0.14903846, 0.10817307],
                   [0.07211538, 0.14663461],
                   [0.07932692, 0.05528846],
                   [0.03846153, 0.07211538],
                   [0.02403846, 0.03125000]]


class Yolo(YoloBase):
    """YOLOv3: Darknet-53 + 3-level FPN, anchors split across levels."""

    version = 3
    stride = 32
    num_levels = 3

    def __init__(self, input_shape=(416, 416, 3), class_names=[]):
        super().__init__(input_shape, class_names)
        self.abox_num = 3
        self.fpn_layers = 3
        self.anchors = None

    @property
    def _bbox_num(self):
        return self.abox_num

    def create_model(self, anchors=DEFAULT_ANCHORS,
                     backbone="full_darknet",
                     pretrained_weights=None,
                     pretrained_body="pascal_voc",
                     dtype=None,
                     input_rescale=1 / 255):
        """Build the v3 model (reference yolov3/__init__.py:100-181).

        backbone: "full_darknet", "tiny_darknet",
        "resnet{50,101,152}{,v2}", or a factory callable
        ``f(bn_axis_name=..., dtype=..., name=...) -> flax module``
        mapping ``(x, train) -> (c3, c4, c5)`` stride-8/16/32 taps —
        the equivalent of the reference's wrap-any-keras-application
        builder (reference yolov3/models/backbone.py:98-126).
        """
        valid = ("full_darknet", "tiny_darknet", "resnet50",
                 "resnet101", "resnet152", "resnet50v2",
                 "resnet101v2", "resnet152v2")
        if not callable(backbone) and backbone not in valid:
            raise ValueError(f"Invalid backbone: {backbone}")

        import jax.numpy as jnp
        module = YoloV3(anchors=anchors, class_num=self.class_num,
                        backbone=backbone, dtype=dtype or jnp.float32)
        self.model = Model(module, self.input_shape,
                           input_rescale=input_rescale)

        if pretrained_body is not None and \
                not isinstance(pretrained_body, str):
            src = (pretrained_body.params
                   if isinstance(pretrained_body, Model)
                   else pretrained_body)
            params = dict(self.model.variables["params"])
            params["backbone"] = src["backbone"] \
                if "backbone" in src else src
            self.model.params = params
        elif isinstance(pretrained_body, str):
            body = resolve_pretrained(pretrained_body, "yolov3_body")
            if body is not None:
                self.model.load_weights(body)

        weights = resolve_pretrained(pretrained_weights, "yolov3")
        if weights is not None:
            self.model.load_weights(weights)

        self.anchors = anchors
        self.grid_shape = tuple(self.model.output_shapes[0][1:3])
        self.fpn_layers = self.num_levels = len(self.model.output_shapes)
        self.abox_num = len(anchors) // self.fpn_layers
        return self.model

    def loss(self, binary_weight=1,
             loss_weight=[1, 1, 5, 1],
             ignore_thresh=0.6,
             use_focal_loss=False,
             focal_loss_gamma=2,
             use_scale=True):
        """Per-level v3 loss list (reference yolov3/__init__.py:380-437):
        anchors split 3-per-level, per-level binary_weight."""
        if (not isinstance(binary_weight, Iterable)
                or len(binary_weight) != self.fpn_layers):
            binary_weight = [binary_weight] * self.fpn_layers
        if isinstance(loss_weight, dict):
            loss_weight = [loss_weight["xy"], loss_weight["wh"],
                           loss_weight["conf"], loss_weight["prob"]]

        losses = []
        for level in range(self.fpn_layers):
            amp = 2 ** level
            grid_shape = (self.grid_shape[0] * amp,
                          self.grid_shape[1] * amp)
            lo = self.abox_num * level
            losses.append(wrap_yolo_loss_v3(
                grid_shape=grid_shape,
                bbox_num=self.abox_num,
                class_num=self.class_num,
                anchors=self.anchors[lo:lo + self.abox_num],
                binary_weight=binary_weight[level],
                loss_weight=loss_weight,
                ignore_thresh=ignore_thresh,
                use_focal_loss=use_focal_loss,
                focal_loss_gamma=focal_loss_gamma,
                use_scale=use_scale))
        return losses


# module-level parity with the reference's per-version subpackages
# (yolovN.losses.wrap_yolo_loss, yolovN.metrics.wrap_*)
from .facade_base import make_version_aliases as _mva

globals().update(_mva(3))
del _mva
