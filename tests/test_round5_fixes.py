"""Round-5 ADVICE regressions: per-family reference kernel inits,
compile(bn_stats_sg_scope=False) no-op, uint8 feed guards, and the
device-path cap tie ordering."""

import warnings

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from tests.helpers_data import make_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("r5ds")
    return make_dataset(str(root), n_images=8, size=(96, 96))


# ---------------------------------------------------------------------
# Per-family conv kernel initializers (ADVICE r4 medium): the reference
# sets he_normal explicitly for v1.5/v2/v3 (reference
# yolov1_5/models/backbone.py:13, yolov2/models/backbone.py:15-37,
# yolov3/models/backbone.py:30) and RandomNormal(0, 0.02) for every v4
# DarknetConv2D (reference yolov4/models/backbone.py:68);
# keras.applications backbones + Dense tops use glorot_uniform.
# ---------------------------------------------------------------------

def _conv_kernels(variables):
    for k, v in flatten_dict(variables["params"]).items():
        if k[-1] == "kernel" and getattr(v, "ndim", 0) == 4:
            yield "/".join(k), np.asarray(v)


def test_yolov4_darknet_convs_init_randomnormal_002():
    from tf2_yolo_tpu.models.detectors import YoloV4
    m = YoloV4(anchors=[[0.1, 0.1]] * 9, class_num=2)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    kernels = dict(_conv_kernels(variables))
    assert len(kernels) > 100
    for name, k in kernels.items():
        assert abs(np.std(k) - 0.02) < 0.006, (name, np.std(k))


def test_v1_v2_v3_convs_init_he_normal():
    from tf2_yolo_tpu.models.detectors import YoloV1, YoloV2, YoloV3
    mods = [
        YoloV1(bbox_num=2, class_num=2),
        YoloV2(anchors=[[0.2, 0.2]] * 2, class_num=2),
        YoloV3(anchors=[[0.1, 0.1]] * 9, class_num=2),
    ]
    for m in mods:
        variables = m.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
        for name, k in _conv_kernels(variables):
            fan_in = k.shape[0] * k.shape[1] * k.shape[2]
            expect = (2.0 / fan_in) ** 0.5     # he_normal stddev
            s = float(np.std(k))
            # truncated normal lands slightly below the target stddev;
            # glorot would land at sqrt(2/(fan_in+fan_out)) — far
            # outside this band for the wide layers
            assert 0.55 * expect < s < 1.15 * expect, \
                (type(m).__name__, name, s, expect)


def test_v4_resnet_backbone_keeps_glorot_neck_gets_darknet_init():
    """v4-over-resnet mirrors the reference: the keras.applications
    resnet keeps its glorot default while the PAN/SPP DarknetConv2D
    layers get RandomNormal(0, 0.02)."""
    from tf2_yolo_tpu.models.detectors import YoloV4
    m = YoloV4(anchors=[[0.1, 0.1]] * 9, class_num=2,
               backbone="resnet50")
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    saw_backbone = saw_neck = 0
    for name, k in _conv_kernels(variables):
        s = float(np.std(k))
        if name.startswith("backbone/"):
            # keras and jax compute conv fans identically: both
            # fan_in and fan_out include the receptive field
            rf = k.shape[0] * k.shape[1]
            fan_in = rf * k.shape[2]
            fan_out = rf * k.shape[3]
            glorot = (2.0 / (fan_in + fan_out)) ** 0.5
            assert 0.55 * glorot < s < 1.15 * glorot, (name, s, glorot)
            saw_backbone += 1
        else:
            assert abs(s - 0.02) < 0.006, (name, s)
            saw_neck += 1
    assert saw_backbone > 20 and saw_neck > 20


# ---------------------------------------------------------------------
# compile(bn_stats_sg_scope=...) value handling (ADVICE r4 low)
# ---------------------------------------------------------------------

def _tiny_model():
    from tf2_yolo_tpu.engine import Model
    from tf2_yolo_tpu.models.detectors import YoloV2
    m = YoloV2(anchors=[[0.2, 0.2]], class_num=1)
    return Model(m, (32, 32, 3))


def _tiny_loss():
    from tf2_yolo_tpu.ops.losses import wrap_yolo_loss_v2
    return wrap_yolo_loss_v2(grid_shape=(1, 1), bbox_num=1,
                             class_num=1, anchors=[[0.2, 0.2]])


def test_compile_bn_sg_scope_falsy_is_noop():
    for off in (None, False, "", ()):
        model = _tiny_model()
        model.compile("sgd", loss=_tiny_loss(), bn_stats_sg_scope=off)


def test_compile_bn_sg_scope_invalid_raises():
    model = _tiny_model()
    for bad in (5, 1.5, ["backbone", 3], object()):
        with pytest.raises(ValueError, match="bn_stats_sg_scope"):
            model.compile("sgd", loss=_tiny_loss(),
                          bn_stats_sg_scope=bad)


# ---------------------------------------------------------------------
# uint8 feed guards (ADVICE r4 low)
# ---------------------------------------------------------------------

def test_uint8_with_nondefault_rescale_warns(tmp_path, dataset):
    from tf2_yolo_tpu.data import YoloDataSequence
    img_dir, lab_dir = dataset
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        YoloDataSequence(img_dir, lab_dir, size=(96, 96),
                         grid_shape=(3, 3), class_names=["square", "bar"],
                         rescale=1 / 128, uint8=True, encoding="utf-8")
    assert any("input_rescale" in str(w.message) for w in rec)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        YoloDataSequence(img_dir, lab_dir, size=(96, 96),
                         grid_shape=(3, 3), class_names=["square", "bar"],
                         rescale=1 / 255, uint8=True, encoding="utf-8")
    assert not any("input_rescale" in str(w.message) for w in rec)


def test_uint8_normalized_float_hook_raises(dataset):
    from tf2_yolo_tpu.data import YoloDataSequence
    img_dir, lab_dir = dataset
    seq = YoloDataSequence(
        img_dir, lab_dir, size=(96, 96), grid_shape=(3, 3),
        class_names=["square", "bar"], uint8=True, encoding="utf-8",
        batch_size=2, preprocessing=lambda im: im / 255.0)
    with pytest.raises(ValueError, match="normalized float"):
        seq[0]
    # 0-255-valued float hooks still pass (rounded, not truncated)
    seq_ok = YoloDataSequence(
        img_dir, lab_dir, size=(96, 96), grid_shape=(3, 3),
        class_names=["square", "bar"], uint8=True, encoding="utf-8",
        batch_size=2, preprocessing=lambda im: im.astype(np.float32))
    img, _ = seq_ok[0]
    assert img.dtype == np.uint8 and img.max() > 2


def test_fit_uint8_sequence_rescale_mismatch_raises(dataset):
    from tf2_yolo_tpu import yolov2
    img_dir, lab_dir = dataset
    yolo = yolov2.Yolo(input_shape=(96, 96, 3),
                       class_names=["square", "bar"])
    yolo.create_model(anchors=[[0.2, 0.2]])       # input_rescale 1/255
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        seq = yolo.read_file_to_sequence(
            img_dir, lab_dir, batch_size=4, encoding="utf-8",
            rescale=1 / 128, uint8=True)
    yolo.model.compile("sgd", loss=yolo.loss())
    with pytest.raises(ValueError, match="input_rescale"):
        yolo.model.fit(seq, epochs=1, verbose=0)
    with pytest.raises(ValueError, match="input_rescale"):
        yolo.model.evaluate(seq, verbose=0)


def test_facade_input_rescale_plumbs_to_engine(dataset):
    from tf2_yolo_tpu import yolov2
    img_dir, lab_dir = dataset
    yolo = yolov2.Yolo(input_shape=(96, 96, 3),
                       class_names=["square", "bar"])
    yolo.create_model(anchors=[[0.2, 0.2]], input_rescale=1 / 128)
    assert np.isclose(yolo.model.input_rescale, 1 / 128)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        seq = yolo.read_file_to_sequence(
            img_dir, lab_dir, batch_size=4, encoding="utf-8",
            rescale=1 / 128, uint8=True)
    yolo.model.compile("sgd", loss=yolo.loss())
    hist = yolo.model.fit(seq, epochs=1, verbose=0)
    assert np.isfinite(hist["loss"]).all()


# ---------------------------------------------------------------------
# Device-path per-(image, class) cap: exact-confidence ties must keep
# the same detections as the host path (ADVICE r4 low).
# ---------------------------------------------------------------------

def test_device_cap_tie_ordering_matches_host():
    from tf2_yolo_tpu.utils import PRfunc

    s, b, c = 4, 1, 1
    preds = np.zeros((1, s, s, b * (5 + c)), np.float32)
    gts = np.zeros((1, s, s, 5 + c), np.float32)
    # 6 well-separated same-class detections with EXACTLY equal
    # conf*prob; tiny boxes so NMS keeps them all
    cells = [(0, 0), (0, 2), (1, 1), (2, 0), (2, 3), (3, 2)]
    for (y, x) in cells:
        preds[0, y, x, 0:2] = 0.5
        preds[0, y, x, 2:4] = 0.05
        preds[0, y, x, 4] = 0.8
        preds[0, y, x, 5] = 0.9
    # one GT overlapping only one of the tied cells
    gy, gx = cells[4]
    gts[0, gy, gx, 0:2] = 0.5
    gts[0, gy, gx, 2:4] = 0.05
    gts[0, gy, gx, 4] = 1
    gts[0, gy, gx, 5] = 1

    kw = dict(class_names=["a"], conf_threshold=0.3, nms_mode=1,
              nms_threshold=0.5, version=2, max_per_img=3)
    host = PRfunc(gts, preds, **kw)
    dev = PRfunc(gts, preds, device=True, **kw)
    np.testing.assert_allclose(dev.precisions[0], host.precisions[0],
                               atol=1e-9)
    np.testing.assert_allclose(dev.recalls[0], host.recalls[0],
                               atol=1e-9)
    pd.testing.assert_frame_equal(host.get_map("voc2012"),
                                  dev.get_map("voc2012"))
