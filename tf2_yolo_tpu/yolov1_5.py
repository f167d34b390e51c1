"""YOLOv1.5 facade (reference yolov1_5/__init__.py parity).

Usage mirrors the reference:
    yolo = Yolo(input_shape, class_names)
    yolo.create_model()
    img, label = yolo.read_file_to_dataset(img_dir, xml_dir)
    yolo.model.compile("adam", loss=yolo.loss(binary_weight),
                       metrics=yolo.metrics("obj+iou"))
    yolo.model.fit(img, label, epochs=..., batch_size=...)
"""

from .engine import Model
from .facade_base import YoloBase, MetricKind, resolve_pretrained
from .models import YoloV1
from .ops import wrap_yolo_loss_v1

__all__ = ["Yolo", "MetricKind"]


class Yolo(YoloBase):
    """YOLOv1.5: DarkNet-v1 backbone, grid = input/64, 2 boxes/cell."""

    version = 1
    stride = 64
    num_levels = 1

    def __init__(self, input_shape=(448, 448, 3), class_names=[]):
        super().__init__(input_shape, class_names)
        self.bbox_num = 2

    @property
    def _bbox_num(self):
        return self.bbox_num

    def create_model(self, bbox_num=2,
                     pretrained_weights=None,
                     pretrained_backbone=None,
                     dtype=None,
                     input_rescale=1 / 255):
        """Build the v1 model (reference yolov1_5/__init__.py:66-91).

        Args:
            bbox_num: boxes per cell.
            pretrained_weights: path to a saved weight file.
            pretrained_backbone: a Model (or raw params dict) whose
                ``backbone`` params are grafted in.
            dtype: conv/BN compute dtype (e.g. jnp.bfloat16 on TPU);
                params and loss math stay f32.
            input_rescale: on-device normalization factor for RAW
                uint8 image batches (read_file_to_sequence
                ``uint8=True``); match the sequence's ``rescale``.
        """
        import jax.numpy as jnp
        module = YoloV1(bbox_num=bbox_num, class_num=self.class_num,
                        dtype=dtype or jnp.float32)
        self.model = Model(module, self.input_shape,
                           input_rescale=input_rescale)

        if pretrained_backbone is not None:
            src = (pretrained_backbone.params
                   if isinstance(pretrained_backbone, Model)
                   else pretrained_backbone)
            params = dict(self.model.variables["params"])
            params["backbone"] = src["backbone"] \
                if "backbone" in src else src
            self.model.params = params

        weights = resolve_pretrained(pretrained_weights, "yolov1")
        if weights is not None:
            self.model.load_weights(weights)

        self.bbox_num = bbox_num
        self.grid_shape = tuple(self.model.output_shapes[1:3])
        return self.model

    def loss(self, binary_weight, loss_weight=[5, 5, 1, 1]):
        """v1 loss closure (reference yolov1_5/__init__.py:270-297).

        loss_weight: dict {"xy","wh","conf","prob"} or 4-list.
        """
        if isinstance(loss_weight, dict):
            loss_weight = [loss_weight["xy"], loss_weight["wh"],
                           loss_weight["conf"], loss_weight["prob"]]
        return wrap_yolo_loss_v1(
            grid_shape=self.grid_shape,
            bbox_num=self.bbox_num,
            class_num=self.class_num,
            binary_weight=binary_weight,
            loss_weight=loss_weight)


# module-level parity with the reference's per-version subpackages
# (yolovN.losses.wrap_yolo_loss, yolovN.metrics.wrap_*)
from .facade_base import make_version_aliases as _mva

globals().update(_mva(1))
del _mva
