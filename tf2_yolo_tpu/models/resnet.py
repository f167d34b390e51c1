"""ResNet-50/101/152 (v1 and v2/pre-activation) backbones.

The reference uses keras.applications ResNets as alternative v3/v4
backbones, tapping FPN features by layer index (fpn_id [-33, 80] for
v1, [143, 75] for v2 — yolov3/__init__.py:143-166). Here the stage
outputs (c3 stride-8, c4 stride-16, c5 stride-32) are returned
structurally.

Implementation follows the keras.applications structure: 7x7/2 stem +
3x3/2 maxpool, bottleneck stages [3,4,6,3]/[3,4,23,3]/[3,8,36,3], BN
eps 1.001e-5; v2 uses pre-activation blocks and a final BN-ReLU.
"""

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

# keras.applications parity: its Conv2D/Dense layers are built
# with the tf.keras default glorot_uniform initializer (flax
# defaults to lecun_normal, a silent from-scratch divergence).
_GLOROT = nn.initializers.glorot_uniform()


class BottleneckV1(nn.Module):
    """Post-activation bottleneck (keras resnet v1 ordering:
    downsampling stride on the first 1x1 conv)."""
    filters: int
    stride: int = 1
    project: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.99, epsilon=1.001e-5,
                                dtype=self.dtype,
                                param_dtype=jnp.float32,
                                axis_name=(self.bn_axis_name
                                           if train else None),
                                name=name)

        shortcut = x
        if self.project:
            shortcut = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=self.dtype,
                               param_dtype=jnp.float32,
                               name="short_conv", kernel_init=_GLOROT)(x)
            shortcut = bn("short_bn")(shortcut)

        y = nn.Conv(self.filters, (1, 1),
                    strides=(self.stride, self.stride),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1", kernel_init=_GLOROT)(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.filters, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv2", kernel_init=_GLOROT)(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.filters * 4, (1, 1),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv3", kernel_init=_GLOROT)(y)
        y = bn("bn3")(y)
        return nn.relu(shortcut + y)


class BottleneckV2(nn.Module):
    """Pre-activation bottleneck (keras resnet_v2 ordering:
    downsampling stride on the 3x3 conv; projection from the
    pre-activated input)."""
    filters: int
    stride: int = 1
    project: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.99, epsilon=1.001e-5,
                                dtype=self.dtype,
                                param_dtype=jnp.float32,
                                axis_name=(self.bn_axis_name
                                           if train else None),
                                name=name)

        pre = nn.relu(bn("pre_bn")(x))
        if self.project:
            shortcut = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=self.dtype,
                               param_dtype=jnp.float32,
                               name="short_conv", kernel_init=_GLOROT)(pre)
        elif self.stride > 1:
            shortcut = nn.max_pool(x, (1, 1),
                                   (self.stride, self.stride), "SAME")
        else:
            shortcut = x

        y = nn.Conv(self.filters, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1", kernel_init=_GLOROT)(pre)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.filters, (3, 3),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2", kernel_init=_GLOROT)(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.filters * 4, (1, 1),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv3", kernel_init=_GLOROT)(y)
        return shortcut + y


_DEPTHS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class ResNet(nn.Module):
    """ResNet backbone returning (c3, c4, c5) stage outputs.

    Args:
        depth: 50 | 101 | 152.
        preact: False for v1 (ResNet50 style), True for v2.
    """
    depth: int = 50
    preact: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = _DEPTHS[self.depth]
        Block = BottleneckV2 if self.preact else BottleneckV1
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)

        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_conv", kernel_init=_GLOROT)(x)
        if not self.preact:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, epsilon=1.001e-5,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             axis_name=(self.bn_axis_name
                                        if train else None),
                             name="stem_bn")(x)
            x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (3, 3), (2, 2), "VALID")

        taps = {}
        for stage, (filters, n_blocks) in enumerate(
                zip((64, 128, 256, 512), blocks)):
            stride = 1 if stage == 0 else 2
            x = Block(filters, stride=stride, project=True, **kw,
                      name=f"stage{stage + 1}_block1")(x, train)
            for b in range(1, n_blocks):
                x = Block(filters, **kw,
                          name=f"stage{stage + 1}_block{b + 1}")(
                    x, train)
            taps[stage] = x

        c5 = taps[3]
        if self.preact:
            c5 = nn.relu(nn.BatchNorm(
                use_running_average=not train, momentum=0.99,
                epsilon=1.001e-5, dtype=self.dtype,
                param_dtype=jnp.float32,
                axis_name=self.bn_axis_name if train else None,
                name="post_bn")(c5))
        return taps[1], taps[2], c5
