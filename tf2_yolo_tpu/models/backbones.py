"""Backbone networks for YOLOv1.5/v2/v3/v4 (Flax linen, NHWC).

Structural parity with the reference (cited per class); instead of
tapping keras layer indices (43/92/152/131/204) the multi-scale
backbones *return* their stage outputs, so FPN/PAN taps are structural
rather than positional (SURVEY.md §7.4 hard part 4).

All modules take ``train`` for BatchNorm mode and are checkpoint-
friendly: stages are wrapped with ``nn.remat`` optionally by callers
via ``jax.checkpoint`` on the apply fn.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from . import layers as _layers
from .layers import (ConvBN, ConvActBN, max_pool, upsample2x,
                     DARKNET_NORMAL)


class DarknetV1(nn.Module):
    """24-conv DarkNet-v1 body (reference yolov1_5/models/backbone.py:18-48).

    Output stride 64 (448^2 -> 7x7). All convs keras-SAME, biased,
    BN + LeakyReLU(0.1).
    """
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def conv(self, f, k, s=1):
        return ConvBN(f, k, s, act="leaky", use_bias=True,
                      darknet_pad=False, bn_axis_name=self.bn_axis_name,
                      dtype=self.dtype)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.conv(64, 7, 2)(x, train)
        x = max_pool(x)
        x = self.conv(192, 3)(x, train)
        x = max_pool(x)
        for f, k in [(128, 1), (256, 3), (256, 1), (512, 3)]:
            x = self.conv(f, k)(x, train)
        x = max_pool(x)
        for _ in range(4):
            x = self.conv(256, 1)(x, train)
            x = self.conv(512, 3)(x, train)
        x = self.conv(1024, 3)(x, train)
        x = max_pool(x)
        for f, k in [(512, 1), (1024, 3), (512, 1), (1024, 3), (1024, 3)]:
            x = self.conv(f, k)(x, train)
        x = self.conv(1024, 3, 2)(x, train)
        x = self.conv(1024, 3)(x, train)
        x = self.conv(1024, 3)(x, train)
        return x


class Darknet19(nn.Module):
    """DarkNet-19 body (reference yolov2/models/backbone.py:42-73).

    Returns (passthrough, out): the stride-16 512-ch feature used by
    the v2 passthrough (the reference taps keras layer 43, i.e. the
    last conv5 activation before pool5) and the stride-32 1024-ch
    output.
    """
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def conv(self, f, k):
        return ConvBN(f, k, 1, act="leaky", use_bias=True,
                      darknet_pad=False, bn_axis_name=self.bn_axis_name,
                      dtype=self.dtype)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.conv(32, 3)(x, train)
        x = max_pool(x)
        x = self.conv(64, 3)(x, train)
        x = max_pool(x)
        for f, k in [(128, 3), (64, 1), (128, 3)]:
            x = self.conv(f, k)(x, train)
        x = max_pool(x)
        for f, k in [(256, 3), (128, 1), (256, 3)]:
            x = self.conv(f, k)(x, train)
        x = max_pool(x)
        for f, k in [(512, 3), (256, 1), (512, 3), (256, 1), (512, 3)]:
            x = self.conv(f, k)(x, train)
        passthrough = x                       # stride 16, 512 ch
        x = max_pool(x)
        for f, k in [(1024, 3), (512, 1), (1024, 3), (512, 1), (1024, 3)]:
            x = self.conv(f, k)(x, train)
        return passthrough, x


class UNetBody(nn.Module):
    """Encoder-decoder UNet body, v2 alternative backbone
    (reference yolov2/models/backbone.py:76-108). Output stride 32
    via two up-merges from stride 128... (5 pools then 2 ups)."""
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def conv(self, f, k=3):
        return ConvActBN(f, k, act="relu",
                         bn_axis_name=self.bn_axis_name, dtype=self.dtype)

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        for f in (64, 128, 256, 512, 1024):
            x = self.conv(f)(x, train)
            x = self.conv(f)(x, train)
            skips.append(x)
            x = max_pool(x)
        # two decoder stages: merge with the stride-16 and stride-8 skips
        x = upsample2x(x)
        x = self.conv(512, 2)(x, train)
        x = jnp.concatenate([skips[4], x], axis=-1)
        x = self.conv(512)(x, train)
        x = self.conv(512)(x, train)

        x = upsample2x(x)
        x = self.conv(256, 2)(x, train)
        x = jnp.concatenate([skips[3], x], axis=-1)
        x = self.conv(256)(x, train)
        x = self.conv(256)(x, train)
        return x


class ResBlock(nn.Module):
    """Darknet-53 residual block: 1x1 squeeze + 3x3 expand + add
    (reference yolov3/models/backbone.py:64-70)."""
    features: int
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.features // 2, 1, act="leaky",
                   bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                   name="squeeze")(x, train)
        y = ConvBN(self.features, 3, act="leaky",
                   bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                   name="expand")(y, train)
        return x + y


class Darknet53(nn.Module):
    """Darknet-53 body (reference yolov3/models/backbone.py:74-82).

    Returns (c3, c4, c5): stride-8 256ch / stride-16 512ch /
    stride-32 1024ch stage outputs — the FPN taps the reference
    reaches via keras layer indices 92 and 152
    (yolov3/models/darknet.py:86, :92).
    """
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        x = ConvBN(32, 3, act="leaky", **kw, name="stem")(x, train)
        taps = {}
        for i, (f, blocks) in enumerate(
                [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)]):
            x = ConvBN(f, 3, 2, act="leaky", **kw,
                       name=f"stage{i + 1}_down")(x, train)
            for b in range(blocks):
                x = ResBlock(f, **kw, name=f"stage{i + 1}_block{b + 1}")(
                    x, train)
            taps[f] = x
        return taps[256], taps[512], taps[1024]


class TinyDarknet(nn.Module):
    """Tiny YOLOv3 backbone (reference yolov3/models/darknet.py:107-135).

    Returns (c4, c5pre): the stride-16 256-ch tap and the stride-32
    256-ch bottleneck that feed the two tiny heads.
    """
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def conv(self, f, k):
        return ConvBN(f, k, act="leaky", bn_axis_name=self.bn_axis_name,
                      dtype=self.dtype)

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f in (16, 32, 64, 128):
            x = self.conv(f, 3)(x, train)
            x = max_pool(x, 2, 2, "SAME")
        x = self.conv(256, 3)(x, train)
        tap = x                                   # stride 16, 256 ch
        x = max_pool(x, 2, 2, "SAME")
        x = self.conv(512, 3)(x, train)
        x = max_pool(x, 2, 1, "SAME")             # stride-1 pool
        x = self.conv(1024, 3)(x, train)
        x = self.conv(256, 1)(x, train)
        return tap, x


class CSPResBlock(nn.Module):
    """CSP residual module (reference yolov4/models/backbone.py:114-122)."""
    mid: int
    out: int
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # v4 DarknetConv2D init: RandomNormal(0, 0.02)
        # (reference yolov4/models/backbone.py:68)
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                  kernel_init=DARKNET_NORMAL)
        y = ConvBN(self.mid, 1, act="mish", **kw, name="squeeze")(x, train)
        y = ConvBN(self.out, 3, act="mish", **kw, name="expand")(y, train)
        return x + y


class CSPStage(nn.Module):
    """Cross-stage-partial stage: stride-2 down, split into a cross
    path and a residual stack, concat, 1x1 fuse
    (reference yolov4/models/backbone.py:125-146)."""
    features: int
    blocks: int
    narrow: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mkw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        # v4 DarknetConv2D init (reference yolov4/models/backbone.py:68)
        kw = dict(**mkw, kernel_init=DARKNET_NORMAL)
        mid = self.features // 2 if self.narrow else self.features
        x = ConvBN(self.features, 3, 2, act="mish", **kw,
                   name="down")(x, train)
        cross = ConvBN(mid, 1, act="mish", **kw, name="cross")(x, train)
        x = ConvBN(mid, 1, act="mish", **kw, name="pre")(x, train)
        for b in range(self.blocks):
            x = CSPResBlock(self.features // 2, mid, **mkw,
                            name=f"block{b + 1}")(x, train)
        x = ConvBN(mid, 1, act="mish", **kw, name="post")(x, train)
        x = jnp.concatenate([x, cross], axis=-1)
        return ConvBN(self.features, 1, act="mish", **kw,
                      name="out")(x, train)


class CSPDarknet53(nn.Module):
    """CSPDarkNet-53 body (reference yolov4/models/backbone.py:149-157).

    Returns (c3, c4, c5): stride-8 256ch / stride-16 512ch /
    stride-32 1024ch stage outputs — the PAN taps the reference
    reaches via keras layer indices 131 and 204
    (yolov4/models/darknet.py:100, :109).

    ``remat=True`` rematerializes each CSP stage on the backward pass
    (jax.checkpoint), trading ~30% extra forward FLOPs for activation
    memory — enables much larger per-chip batches.

    ``section`` cuts the body for pipeline parallelism
    (parallel/pipeline.py): "early" runs stem + stages 1-3 and returns
    the c3 tap; "late" treats ``x`` AS c3 and runs stages 4-5,
    returning (c4, c5). Submodule names are identical in every mode,
    so each section's apply touches exactly its own param subtree.
    """
    bn_axis_name: Optional[str] = None
    remat: bool = False
    dtype: Any = jnp.float32

    _SPECS = ((64, 1, False), (128, 2, True), (256, 8, True),
              (512, 8, True), (1024, 4, True))

    @nn.compact
    def __call__(self, x, train: bool = False, *,
                 section: Optional[str] = None):
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        # static_argnums=(2,): the `train` bool drives Python control
        # flow (BN mode) and must stay static under checkpointing
        stage_cls = (nn.remat(CSPStage, static_argnums=(2,))
                     if self.remat else CSPStage)
        if section not in (None, "early", "late"):
            raise ValueError(f"Invalid section: {section!r}")
        # Fused-GEMM backbone path (models/packed_region.py): stages
        # 3-5 run with their 1x1 convs as fused prologue-GEMMs
        # (unpacked, C >= 128); PACKED_P2 additionally batch-packs
        # stem/stage1/stage2 on [B/2,H,W,2C]. Same parameter tree
        # (name-for-name stand-ins), train-mode only.
        packed = (_layers.PACKED_EARLY and train and section is None
                  and not self.remat)
        if packed:
            from . import packed_region as pr
            if _layers.PACKED_P3 and x.shape[0] % 4 == 0:
                # whole early region in Pallas past the stem. The stem
                # itself stays an UNPACKED XLA conv (custom-VJP stats,
                # PackedConvBN3x3 p=1): row views of its 3-in/32-out
                # tensors have 6/64 lanes, which HBM (8,128) tiling
                # pads to 128 — a measured 2.64 GB single tensor at
                # 416^2/b128 that OOMs the chip. Its 32-channel output
                # packs at p=4 (4x32 = a dense 128 lanes) for the
                # stage1 down conv; the p=4 -> p=2 boundary after the
                # downsample is a pure reshape (see P3CSPStage.p_down).
                # Stages 1-2 then run batch-packed with 3x3s as fused
                # 9-tap GEMMs and residual chains as sum-GEMM term
                # lists.
                y4, aff1 = pr.PackedConvBN3x3(
                    32, 3, 1, p=1, bn_axis_name=self.bn_axis_name,
                    dtype=self.dtype,
                    name="stem")(x.astype(self.dtype), train)
                nb, hh, wwid = y4.shape[0], y4.shape[1], y4.shape[2]
                aff = (jnp.tile(aff1[0], (1, 4)),
                       jnp.tile(aff1[1], (1, 4)))
                carry = (pr.rows_of_packed(y4, 4), aff,
                         (nb // 4, hh, wwid))
                for i, (f, blocks, narrow) in enumerate(
                        self._SPECS[:2]):
                    carry = pr.P3CSPStage(
                        f, blocks, narrow, p_down=4 if i == 0 else 0,
                        **kw, name=f"stage{i + 1}")(carry, train)
                y2, aff, (bq, h, w) = carry
                x = pr.rows_to_unpacked(
                    pr.activate(y2, aff, "mish", self.dtype),
                    nb, h, w, 2)
            elif _layers.PACKED_P2 and x.shape[0] % 2 == 0:
                xp = pr.pack_batch(x.astype(self.dtype))
                y4, aff = pr.PackedConvBN3x3(
                    32, 3, 1, act="mish", **kw,
                    name="stem")(xp, train)
                carry = (y4, aff,
                         (y4.shape[0], y4.shape[1], y4.shape[2]))
                for i, (f, blocks, narrow) in enumerate(
                        self._SPECS[:2]):
                    carry = pr.PackedCSPStage(
                        f, blocks, narrow, **kw,
                        name=f"stage{i + 1}")(carry, train)
                y2, aff, (bq, h, w) = carry
                x = pr.unpack_batch(pr.rows_to(
                    pr.activate(y2, aff, "mish", self.dtype),
                    bq, h, w))
            else:
                x = ConvBN(32, 3, act="mish", **kw,
                           kernel_init=DARKNET_NORMAL,
                           name="stem")(x, train)
                for i, (f, blocks, narrow) in enumerate(
                        self._SPECS[:2]):
                    x = stage_cls(f, blocks, narrow, **kw,
                                  name=f"stage{i + 1}")(x, train)
            taps = {}
            for i, (f, blocks, narrow) in enumerate(self._SPECS[2:],
                                                    start=2):
                out_y, out_aff, (bq, h, w) = pr.PackedCSPStage(
                    f, blocks, narrow, p=1, **kw,
                    name=f"stage{i + 1}")(
                        (x, None, x.shape[:3]), train)
                x = pr.rows_to(
                    pr.activate(out_y, out_aff, "mish", self.dtype),
                    bq, h, w)
                taps[f] = x
            return taps[256], taps[512], taps[1024]
        if section != "late":
            x = ConvBN(32, 3, act="mish", **kw,
                       kernel_init=DARKNET_NORMAL, name="stem")(x, train)
        taps = {} if section != "late" else {256: x}
        for i, (f, blocks, narrow) in enumerate(self._SPECS):
            if section == "early" and i >= 3:
                break
            if section == "late" and i < 3:
                continue
            x = stage_cls(f, blocks, narrow, **kw,
                          name=f"stage{i + 1}")(x, train)
            taps[f] = x
        if section == "early":
            return taps[256]
        if section == "late":
            return taps[512], taps[1024]
        return taps[256], taps[512], taps[1024]


class Classifier(nn.Module):
    """GAP + softmax classifier top shared by the darknet/darknet19/
    darknet53/csp_darknet53 classifier builders (reference
    yolov1_5/models/darknet.py:13-23, yolov2/models/darknet.py:18-29,
    yolov3/models/darknet.py:19-68, yolov4/models/darknet.py:20-69).
    """
    backbone: nn.Module
    class_num: int = 1000
    conv_head: bool = False       # darknet19 uses a 1x1 conv head
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train)
        if isinstance(feats, tuple):
            feats = feats[-1]
        if self.conv_head:
            feats = ConvBN(self.class_num, 1, act="leaky", use_bias=True,
                           darknet_pad=False, dtype=self.dtype)(feats, train)
            pooled = jnp.mean(feats, axis=(1, 2))
            return nn.softmax(pooled)
        pooled = jnp.mean(feats, axis=(1, 2))
        # tf.keras Dense default init (the reference's classifier Dense
        # at yolov1_5/models/darknet.py:19 uses it); flax's default is
        # lecun_normal.
        logits = nn.Dense(self.class_num, param_dtype=jnp.float32,
                          kernel_init=nn.initializers.glorot_uniform(),
                          dtype=self.dtype)(pooled)
        return nn.softmax(logits)
