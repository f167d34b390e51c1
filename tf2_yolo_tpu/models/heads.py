"""Detection heads.

TPU-first redesign: the reference builds 4 tiny 1x1 convs *per anchor
box* and concatenates (yolov3/models/__init__.py:38-65) — dozens of
small convs that tile poorly on the MXU. Here each head is ONE fused
1x1 conv emitting all B*(5+C) channels, followed by grouped activations
on the (B, 5+C) view:

    xy   -> sigmoid
    wh   -> exp(.) * anchor        (v2/v3: anchor constants;
                                    v4: trainable anchor parameters,
                                    mirroring the reference Anchor layer
                                    at yolov4/models/backbone.py:40-60)
    conf -> sigmoid
    prob -> softmax (v2) or sigmoid (v3/v4, multi-label)

The exp()/activation math runs in f32 regardless of the conv compute
dtype (wh exponentials overflow bf16 — SURVEY.md §7.4 hard part 6).
Output layout is the reference's flat channel order
[xy, wh, conf, prob] * B, so decode()/losses consume it unchanged.
"""

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import HE_NORMAL


class HeadV1(nn.Module):
    """YOLOv1 head: sigmoid xywhc (5*B) + shared softmax classes (C)
    (reference yolov1_5/models/darknet.py:37-55)."""
    bbox_num: int
    class_num: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        raw = nn.Conv(5 * self.bbox_num + self.class_num, (1, 1),
                      padding="SAME", dtype=self.dtype,
                      param_dtype=jnp.float32,
                      kernel_init=HE_NORMAL,
                      name="conv")(x)
        raw = raw.astype(jnp.float32)
        xywhc = nn.sigmoid(raw[..., :5 * self.bbox_num])
        prob = nn.softmax(raw[..., 5 * self.bbox_num:])
        return jnp.concatenate([xywhc, prob], axis=-1)


class AnchorHead(nn.Module):
    """Fused per-level anchor head for v2/v3/v4.

    Args:
        anchors: (B, 2) normalized anchor priors for this level.
        prob_act: "softmax" (v2) or "sigmoid" (v3/v4).
        anchors_as_params: if True the anchors live as a (B, 2) model
            parameter named ``anchors`` (initialized from the prior) so
            they can be read/written/trained — the v4 ``Anchor`` layer
            semantics (exp(raw) * weight). If False they are constants.
    """
    anchors: Sequence
    class_num: int
    prob_act: str = "sigmoid"
    anchors_as_params: bool = False
    dtype: Any = jnp.float32
    kernel_init: Any = HE_NORMAL

    @nn.compact
    def __call__(self, x):
        import numpy as np
        anchors = np.asarray(self.anchors, np.float32)
        bbox_num = anchors.shape[0]
        c = self.class_num

        raw = nn.Conv(bbox_num * (5 + c), (1, 1), padding="SAME",
                      dtype=self.dtype, param_dtype=jnp.float32,
                      kernel_init=self.kernel_init, name="conv")(x)
        n, h, w, _ = raw.shape
        raw = raw.astype(jnp.float32).reshape(n, h, w, bbox_num, 5 + c)

        if self.anchors_as_params:
            anchor_arr = self.param(
                "anchors", lambda key: jnp.asarray(anchors))
        else:
            anchor_arr = jnp.asarray(anchors)

        xy = nn.sigmoid(raw[..., 0:2])
        # clamp the exponent: an untrained/diverged net can emit huge
        # raw values and exp() overflow poisons the CIoU loss with NaNs
        wh = (jnp.exp(jnp.clip(raw[..., 2:4], -15.0, 15.0))
              * anchor_arr[None, None, None, :, :])
        conf = nn.sigmoid(raw[..., 4:5])
        if self.prob_act == "softmax":
            prob = nn.softmax(raw[..., 5:])
        else:
            prob = nn.sigmoid(raw[..., 5:])

        out = jnp.concatenate([xy, wh, conf, prob], axis=-1)
        return out.reshape(n, h, w, bbox_num * (5 + c))
