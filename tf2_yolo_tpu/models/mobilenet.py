"""MobileNetV2 backbone (the reference's alternative v2 backbone,
yolov2/models/darknet.py:57-61 via keras.applications.MobileNetV2).

Standard MobileNetV2 alpha=1.0: conv 3x3/2 -> 17 inverted-residual
blocks -> 1x1 conv to 1280 ch, ReLU6, BN eps 1e-3. Output stride 32.
Depthwise convs use ``feature_group_count`` so XLA lowers them to the
native depthwise path.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

# keras.applications parity: its Conv2D/Dense layers are built
# with the tf.keras default glorot_uniform initializer (flax
# defaults to lecun_normal, a silent from-scratch divergence).
_GLOROT = nn.initializers.glorot_uniform()


def relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    filters: int
    stride: int = 1
    expand: int = 6
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.999, epsilon=1e-3,
                                dtype=self.dtype,
                                param_dtype=jnp.float32,
                                axis_name=(self.bn_axis_name
                                           if train else None),
                                name=name)

        in_ch = x.shape[-1]
        y = x
        if self.expand != 1:
            y = nn.Conv(in_ch * self.expand, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="expand_conv", kernel_init=_GLOROT)(y)
            y = relu6(bn("expand_bn")(y))
        mid = y.shape[-1]
        y = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", feature_group_count=mid,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dw_conv", kernel_init=_GLOROT)(y)
        y = relu6(bn("dw_bn")(y))
        y = nn.Conv(self.filters, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="project_conv", kernel_init=_GLOROT)(y)
        y = bn("project_bn")(y)
        if self.stride == 1 and in_ch == self.filters:
            y = x + y
        return y


_BLOCKS = [
    # (filters, stride, expand, repeats)
    (16, 1, 1, 1),
    (24, 2, 6, 2),
    (32, 2, 6, 3),
    (64, 2, 6, 4),
    (96, 1, 6, 3),
    (160, 2, 6, 3),
    (320, 1, 6, 1),
]


class MobileNetV2(nn.Module):
    """MobileNetV2 feature extractor -> (N, H/32, W/32, 1280)."""
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem_conv", kernel_init=_GLOROT)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=0.999, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="stem_bn")(x)
        x = relu6(x)

        i = 0
        for filters, stride, expand, repeats in _BLOCKS:
            for r in range(repeats):
                x = InvertedResidual(
                    filters, stride=stride if r == 0 else 1,
                    expand=expand, **kw, name=f"block{i + 1}")(x, train)
                i += 1

        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="head_conv", kernel_init=_GLOROT)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=0.999, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name="head_bn")(x)
        return relu6(x)
