"""Full detector networks: backbone + neck + head(s) per YOLO version.

Structural parity with the reference model builders (cited inline);
necks tap backbone stage outputs structurally instead of keras layer
indices. Outputs use the reference's flat channel layout so the same
decode()/loss/metric code applies:
  v1: single (N, S, S, 5*B + C)
  v2: single (N, S, S, B*(5+C))
  v3/v4: list [coarse(stride32), mid(16), fine(8)] of (N,S,S,B*(5+C)).
"""

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import (ConvBN, SPP, upsample2x, space_to_depth,
                     DARKNET_NORMAL)
from .backbones import (DarknetV1, Darknet19, UNetBody, Darknet53,
                        TinyDarknet, CSPDarknet53)
from .resnet import ResNet
from .mobilenet import MobileNetV2
from .heads import HeadV1, AnchorHead


def _resnet_from_name(name, **kw):
    """Map 'resnet50'/'resnet101v2'/... to a ResNet module."""
    preact = name.endswith("v2")
    depth = int(name[len("resnet"):-2] if preact
                else name[len("resnet"):])
    return ResNet(depth=depth, preact=preact, **kw, name="backbone")


def _custom_backbone(factory, kw):
    """Instantiate a user-supplied backbone factory.

    The TPU-idiomatic equivalent of the reference's "wrap any keras
    application" builders (reference yolov3/models/backbone.py:98-126,
    yolov4/models/backbone.py:188-250): any callable
    ``factory(bn_axis_name=..., dtype=..., name=...) -> nn.Module``
    whose module maps ``(x, train) -> (c3, c4, c5)`` feature taps at
    strides 8/16/32 plugs into the v3 FPN or v4 SPP/PAN neck.
    """
    return factory(**kw, name="backbone")


def _check_pipeline_stage(stage, extra=()):
    """Validate a ``pipeline_stage`` value (parallel/pipeline.py cuts)."""
    if stage not in (None, "backbone", "neck") + tuple(extra):
        raise ValueError(f"Invalid pipeline_stage: {stage!r}")


def _split_anchors(anchors, num_levels):
    """Split a flat anchor list evenly across output levels, coarse
    level first (reference yolov3/models/__init__.py:29-40)."""
    anchors = np.asarray(anchors, np.float32)
    if len(anchors) % num_levels:
        raise ValueError(
            "The total number of anchor boxes should be a multiple of "
            f"the number {num_levels} of output tensors")
    per = len(anchors) // num_levels
    return [anchors[i * per:(i + 1) * per] for i in range(num_levels)]


class YoloV1(nn.Module):
    """DarkNet-v1 + v1 head (reference yolov1_5/models/darknet.py:26-55)."""
    bbox_num: int = 2
    class_num: int = 1
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, *,
                 pipeline_stage: Optional[str] = None):
        """``pipeline_stage``: None runs the full net; "backbone"
        returns the DarkNet-v1 feature map; "neck" treats ``x`` AS that
        feature and runs only the head (parallel/pipeline.py cut)."""
        _check_pipeline_stage(pipeline_stage)
        if pipeline_stage != "neck":
            x = DarknetV1(self.bn_axis_name, self.dtype, name="backbone")(
                x, train)
        if pipeline_stage == "backbone":
            return x
        return HeadV1(self.bbox_num, self.class_num, self.dtype,
                      name="head")(x)


class YoloV2(nn.Module):
    """DarkNet-19 (or unet/mobilenet) + passthrough + v2 head
    (reference yolov2/models/darknet.py:32-106).

    The passthrough path taps the stride-16 512-ch feature, reduces to
    64 ch, space-to-depth(2) into stride 32, and concatenates with the
    doubly-convolved backbone output.
    """
    anchors: Sequence
    class_num: int = 1
    backbone: str = "darknet"
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, *,
                 pipeline_stage: Optional[str] = None):
        """``pipeline_stage``: None runs the full net; "backbone"
        returns the backbone taps ((passthrough, feat) for darknet, a
        single feature otherwise); "neck" treats ``x`` AS those taps
        and runs only neck+head (parallel/pipeline.py cut)."""
        _check_pipeline_stage(pipeline_stage)
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        if pipeline_stage == "neck":
            taps = x
        elif self.backbone == "darknet":
            taps = Darknet19(**kw, name="backbone")(x, train)
        elif self.backbone == "unet":
            taps = UNetBody(**kw, name="backbone")(x, train)
        elif self.backbone == "mobilenet":
            taps = MobileNetV2(**kw, name="backbone")(x, train)
        else:
            raise ValueError(f"Invalid backbone: {self.backbone}")
        if pipeline_stage == "backbone":
            return taps
        if self.backbone == "darknet":
            passthrough, feat = taps
            conv = ConvBN(1024, 3, act="leaky", use_bias=True,
                          darknet_pad=False, **kw, name="neck1")(feat, train)
            conv = ConvBN(1024, 3, act="leaky", use_bias=True,
                          darknet_pad=False, **kw, name="neck2")(conv, train)
            pt = ConvBN(64, 3, act="leaky", use_bias=True,
                        darknet_pad=False, **kw,
                        name="passthrough")(passthrough, train)
            pt = space_to_depth(pt, 2)
            merged = jnp.concatenate([pt, conv], axis=-1)
            feat = ConvBN(1024, 3, act="leaky", use_bias=True,
                          darknet_pad=False, **kw, name="neck3")(
                merged, train)
        else:
            feat = taps
        return AnchorHead(self.anchors, self.class_num,
                          prob_act="softmax", dtype=self.dtype,
                          name="head")(feat)


class FPNStage(nn.Module):
    """make_last_layers: 5 alternating 1x1/3x3 convs; optionally also
    the 3x3-expanded output feature
    (reference yolov3/models/backbone.py:85-95; the v4 PAN uses only
    the 5-conv stack, yolov4/models/backbone.py:160-173)."""
    features: int
    act: str = "leaky"
    make_out: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    kernel_init: Any = None     # None -> ConvBN default (he_normal)

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                  kernel_init=self.kernel_init)
        f = self.features
        for i, (ff, k) in enumerate(
                [(f, 1), (f * 2, 3), (f, 1), (f * 2, 3), (f, 1)]):
            x = ConvBN(ff, k, act=self.act, **kw,
                       name=f"conv{i + 1}")(x, train)
        if not self.make_out:
            return x, None
        out = ConvBN(f * 2, 3, act=self.act, **kw, name="out")(x, train)
        return x, out


class YoloV3(nn.Module):
    """Darknet-53 + 3-level top-down FPN + per-level heads
    (reference yolov3/models/darknet.py:71-104)."""
    anchors: Sequence
    class_num: int = 1
    backbone: Any = "full_darknet"   # name or module factory
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, *,
                 pipeline_stage: Optional[str] = None):
        """``pipeline_stage``: None runs the full net; "backbone"
        returns the backbone taps ((c3, c4, c5), or (tap, bottleneck)
        for tiny_darknet); "neck" treats ``x`` AS those taps and runs
        only the FPN + heads (parallel/pipeline.py cut)."""
        _check_pipeline_stage(pipeline_stage)
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)

        if self.backbone == "tiny_darknet":
            if pipeline_stage == "neck":
                tap, bottleneck = x
            else:
                tap, bottleneck = TinyDarknet(**kw, name="backbone")(
                    x, train)
            if pipeline_stage == "backbone":
                return (tap, bottleneck)
            out1 = ConvBN(512, 3, act="leaky", **kw,
                          name="tiny_out1")(bottleneck, train)
            up = ConvBN(128, 1, act="leaky", **kw,
                        name="tiny_up")(bottleneck, train)
            up = upsample2x(up)
            merged = jnp.concatenate([up, tap], axis=-1)
            out2 = ConvBN(256, 3, act="leaky", **kw,
                          name="tiny_out2")(merged, train)
            feats = [out1, out2]
        else:
            if pipeline_stage == "neck":
                c3, c4, c5 = x
            elif callable(self.backbone):
                c3, c4, c5 = _custom_backbone(self.backbone, kw)(
                    x, train)
            elif self.backbone.startswith("resnet"):
                c3, c4, c5 = _resnet_from_name(self.backbone, **kw)(
                    x, train)
            else:
                c3, c4, c5 = Darknet53(**kw, name="backbone")(x, train)
            if pipeline_stage == "backbone":
                return (c3, c4, c5)
            t, out1 = FPNStage(512, **kw, name="fpn1")(c5, train)
            t = ConvBN(256, 1, act="leaky", **kw, name="up1")(t, train)
            t = jnp.concatenate([upsample2x(t), c4], axis=-1)
            t, out2 = FPNStage(256, **kw, name="fpn2")(t, train)
            t = ConvBN(128, 1, act="leaky", **kw, name="up2")(t, train)
            t = jnp.concatenate([upsample2x(t), c3], axis=-1)
            _, out3 = FPNStage(128, **kw, name="fpn3")(t, train)
            feats = [out1, out2, out3]

        per_level = _split_anchors(self.anchors, len(feats))
        outs = []
        for i, (feat, anc) in enumerate(zip(feats, per_level)):
            outs.append(AnchorHead(anc, self.class_num,
                                   prob_act="sigmoid", dtype=self.dtype,
                                   name=f"head{i + 1}")(feat))
        return outs


class YoloV4(nn.Module):
    """CSPDarknet-53 + SPP top-down FPN + bottom-up PAN + v4 heads with
    anchors as trainable parameters
    (reference yolov4/models/darknet.py:72-146,
     yolov4/models/__init__.py:14-71)."""
    anchors: Sequence
    class_num: int = 1
    backbone: Any = "csp_darknet"    # name or module factory
    bn_axis_name: Optional[str] = None
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, *,
                 pipeline_stage: Optional[str] = None):
        """``pipeline_stage``: None runs the full network; "backbone"
        returns the (c3, c4, c5) taps; "neck" treats ``x`` AS those
        taps and runs only neck+heads. "backbone_early" /
        "backbone_late" additionally cut the stock CSPDarknet-53 body
        itself (stem+stages1-3 -> c3 | stages4-5 -> (c3, c4, c5)) for
        3-stage pipelines. Because flax declares submodules lazily,
        each stage's apply touches exactly its own param subtree — the
        cut parallel/pipeline.py stage-splits at."""
        _check_pipeline_stage(
            pipeline_stage, extra=("backbone_early", "backbone_late"))
        kw = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        # v4 neck convs are reference DarknetConv2D: RandomNormal(0, 0.02)
        # (reference yolov4/models/backbone.py:68); backbone constructors
        # get the plain kw (CSP hardcodes the same init; resnet/custom
        # backbones keep their own keras-parity defaults).
        nkw = dict(**kw, kernel_init=DARKNET_NORMAL)
        if pipeline_stage in ("backbone_early", "backbone_late"):
            if callable(self.backbone) or \
                    self.backbone.startswith("resnet"):
                raise ValueError(
                    "backbone_early/backbone_late cuts require the "
                    "stock csp_darknet backbone")
            bb = CSPDarknet53(remat=self.remat, **kw, name="backbone")
            if pipeline_stage == "backbone_early":
                return bb(x, train, section="early")
            c3 = x
            c4, c5 = bb(c3, train, section="late")
            return (c3, c4, c5)
        if pipeline_stage == "neck":
            c3, c4, c5 = x
        elif callable(self.backbone):
            c3, c4, c5 = _custom_backbone(self.backbone, kw)(x, train)
        elif self.backbone.startswith("resnet"):
            c3, c4, c5 = _resnet_from_name(self.backbone, **kw)(x, train)
        else:
            c3, c4, c5 = CSPDarknet53(remat=self.remat, **kw,
                                      name="backbone")(x, train)
        if pipeline_stage == "backbone":
            return (c3, c4, c5)

        # top-down path with SPP at the coarsest level
        t_s = ConvBN(512, 1, act="leaky", **nkw, name="td1_pre1")(c5, train)
        t_s = ConvBN(1024, 3, act="leaky", **nkw, name="td1_pre2")(t_s, train)
        t_s = ConvBN(512, 1, act="leaky", **nkw, name="td1_spp_pre")(
            t_s, train)
        t_s = SPP(name="spp")(t_s)
        t_s = ConvBN(512, 1, act="leaky", **nkw, name="td1_post1")(t_s, train)
        t_s = ConvBN(1024, 3, act="leaky", **nkw, name="td1_post2")(
            t_s, train)
        t_s = ConvBN(512, 1, act="leaky", **nkw, name="td1_post3")(t_s, train)

        up = ConvBN(256, 1, act="leaky", **nkw, name="td1_up")(t_s, train)
        t_m = ConvBN(256, 1, act="leaky", **nkw, name="td2_pre")(c4, train)
        t_m = jnp.concatenate([t_m, upsample2x(up)], axis=-1)
        t_m, _ = FPNStage(256, make_out=False, **nkw, name="td2")(t_m, train)

        up = ConvBN(128, 1, act="leaky", **nkw, name="td2_up")(t_m, train)
        t_l = ConvBN(128, 1, act="leaky", **nkw, name="td3_pre")(c3, train)
        t_l = jnp.concatenate([t_l, upsample2x(up)], axis=-1)
        t_l, _ = FPNStage(128, make_out=False, **nkw, name="td3")(t_l, train)

        out_l = ConvBN(256, 3, act="leaky", **nkw, name="out_l")(t_l, train)

        # bottom-up PAN re-downsamples
        dn = ConvBN(256, 3, 2, act="leaky", **nkw, name="bu1_dn")(t_l, train)
        t_m = jnp.concatenate([dn, t_m], axis=-1)
        t_m, _ = FPNStage(256, make_out=False, **nkw, name="bu1")(t_m, train)
        out_m = ConvBN(512, 3, act="leaky", **nkw, name="out_m")(t_m, train)

        dn = ConvBN(512, 3, 2, act="leaky", **nkw, name="bu2_dn")(t_m, train)
        t_s = jnp.concatenate([dn, t_s], axis=-1)
        t_s, _ = FPNStage(512, make_out=False, **nkw, name="bu2")(t_s, train)
        out_s = ConvBN(1024, 3, act="leaky", **nkw, name="out_s")(t_s, train)

        feats = [out_s, out_m, out_l]      # coarse -> fine
        per_level = _split_anchors(self.anchors, len(feats))
        init = nn.initializers.normal(stddev=0.02)
        outs = []
        for i, (feat, anc) in enumerate(zip(feats, per_level)):
            outs.append(AnchorHead(anc, self.class_num,
                                   prob_act="sigmoid",
                                   anchors_as_params=True,
                                   dtype=self.dtype,
                                   kernel_init=init,
                                   name=f"head{i + 1}")(feat))
        return outs
