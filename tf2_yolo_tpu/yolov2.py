"""YOLOv2 facade (reference yolov2/__init__.py parity)."""

from .engine import Model
from .facade_base import YoloBase, MetricKind, resolve_pretrained
from .models import YoloV2
from .ops import wrap_yolo_loss_v2

__all__ = ["Yolo", "MetricKind"]

DEFAULT_ANCHORS = [[0.75157846, 0.70525231],
                   [0.60637077, 0.27136769],
                   [0.25680231, 0.42110308],
                   [0.14418923, 0.15865615],
                   [0.04405615, 0.05210654]]


class Yolo(YoloBase):
    """YOLOv2: DarkNet-19 + passthrough, grid = input/32, 5 anchors."""

    version = 2
    stride = 32
    num_levels = 1

    def __init__(self, input_shape=(416, 416, 3), class_names=[]):
        super().__init__(input_shape, class_names)
        self.abox_num = 5
        self.anchors = None

    @property
    def _bbox_num(self):
        return self.abox_num

    def create_model(self, anchors=DEFAULT_ANCHORS,
                     backbone="darknet",
                     pretrained_weights=None,
                     pretrained_backbone=None,
                     dtype=None,
                     input_rescale=1 / 255):
        """Build the v2 model (reference yolov2/__init__.py:69-105).

        Args:
            anchors: (B, 2) normalized prior anchors (width, height).
            backbone: "darknet", "unet", or "mobilenet".
            pretrained_weights: saved weight file path.
            pretrained_backbone: Model / params dict to graft.
            input_rescale: on-device normalization factor for RAW
                uint8 image batches (read_file_to_sequence
                ``uint8=True``); match the sequence's ``rescale``.
        """
        valid = ("darknet", "unet", "mobilenet")
        if backbone not in valid:
            raise ValueError(f"Invalid backbone: {backbone}")

        import jax.numpy as jnp
        module = YoloV2(anchors=anchors, class_num=self.class_num,
                        backbone=backbone, dtype=dtype or jnp.float32)
        self.model = Model(module, self.input_shape,
                           input_rescale=input_rescale)

        if isinstance(pretrained_backbone, str):
            # e.g. "imagenet" for the mobilenet backbone: resolve from
            # the local weight cache and graft ONLY the backbone
            # subtree (the file may be backbone-only or a full model
            # trained with a different head)
            resolved = resolve_pretrained(
                pretrained_backbone, f"{backbone}_backbone")
            if resolved is not None:
                from .facade_base import graft_backbone_file
                graft_backbone_file(self.model, resolved)
        elif pretrained_backbone is not None:
            src = (pretrained_backbone.params
                   if isinstance(pretrained_backbone, Model)
                   else pretrained_backbone)
            params = dict(self.model.variables["params"])
            params["backbone"] = src["backbone"] \
                if "backbone" in src else src
            self.model.params = params

        weights = resolve_pretrained(pretrained_weights, "yolov2")
        if weights is not None:
            self.model.load_weights(weights)

        self.anchors = anchors
        self.abox_num = len(anchors)
        self.grid_shape = tuple(self.model.output_shapes[1:3])
        return self.model

    def loss(self, binary_weight=1,
             loss_weight=[1, 1, 5, 1],
             ignore_thresh=0.6):
        """v2 loss closure (reference yolov2/__init__.py:286-318)."""
        if isinstance(loss_weight, dict):
            loss_weight = [loss_weight["xy"], loss_weight["wh"],
                           loss_weight["conf"], loss_weight["prob"]]
        return wrap_yolo_loss_v2(
            grid_shape=self.grid_shape,
            bbox_num=self.abox_num,
            class_num=self.class_num,
            anchors=self.anchors,
            binary_weight=binary_weight,
            loss_weight=loss_weight,
            ignore_thresh=ignore_thresh)


# module-level parity with the reference's per-version subpackages
# (yolovN.losses.wrap_yolo_loss, yolovN.metrics.wrap_*)
from .facade_base import make_version_aliases as _mva

globals().update(_mva(2))
del _mva
