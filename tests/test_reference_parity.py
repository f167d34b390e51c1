"""True numerical parity vs the ACTUAL reference implementation.

TensorFlow is available in this environment, so the reference loss
modules (pure tf ops, no keras objects) can be executed directly on
random tensors and compared against this framework's jnp losses.
These tests are optional: skipped when TF or the reference checkout
is absent (the framework itself never depends on either).
"""

import importlib.util
import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REF = "/root/reference"
if not os.path.isdir(REF):
    pytest.skip("reference checkout not available",
                allow_module_level=True)

from tf2_yolo_tpu.ops import (wrap_yolo_loss_v1, wrap_yolo_loss_v2,
                              wrap_yolo_loss_v3, wrap_yolo_loss_v4)
from tests.test_losses import make_data


def _load_ref_loss(version):
    name = {1: "yolov1_5", 2: "yolov2", 3: "yolov3", 4: "yolov4"}[
        version]
    path = os.path.join(REF, name, "losses", "loss.py")
    spec = importlib.util.spec_from_file_location(
        f"ref_loss_v{version}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("version", [1, 2, 3, 4])
def test_loss_matches_reference_tf(version):
    n, s, b, c = 2, 4, 3, 5
    gs = (s, s)
    y_true, y_pred = make_data(n, s, b, c, v1=(version == 1),
                               seed=20 + version)
    anchors = (np.random.RandomState(99).rand(b, 2)
               .astype(np.float32) * 0.5 + 0.1)

    ref = _load_ref_loss(version)
    if version == 1:
        ref_fn = ref.wrap_yolo_loss(gs, b, c, binary_weight=0.7,
                                    loss_weight=[5, 5, 1, 1])
        our_fn = wrap_yolo_loss_v1(gs, b, c, binary_weight=0.7,
                                   loss_weight=[5, 5, 1, 1])
    elif version == 2:
        ref_fn = ref.wrap_yolo_loss(gs, b, c, anchors,
                                    binary_weight=0.5,
                                    loss_weight=[1, 1, 5, 1],
                                    ignore_thresh=0.6)
        our_fn = wrap_yolo_loss_v2(gs, b, c, anchors,
                                   binary_weight=0.5,
                                   loss_weight=[1, 1, 5, 1],
                                   ignore_thresh=0.6)
    elif version == 3:
        ref_fn = ref.wrap_yolo_loss(gs, b, c, anchors,
                                    binary_weight=1.3,
                                    loss_weight=[1, 1, 5, 1],
                                    ignore_thresh=0.6,
                                    use_focal_loss=True,
                                    focal_loss_gamma=2,
                                    use_scale=True)
        our_fn = wrap_yolo_loss_v3(gs, b, c, anchors,
                                   binary_weight=1.3,
                                   loss_weight=[1, 1, 5, 1],
                                   ignore_thresh=0.6,
                                   use_focal_loss=True,
                                   focal_loss_gamma=2,
                                   use_scale=True)
    else:
        ref_fn = ref.wrap_yolo_loss(gs, b, c, anchors,
                                    binary_weight=0.8,
                                    loss_weight=[1, 5, 1],
                                    wh_reg_weight=0.01,
                                    ignore_thresh=0.6,
                                    truth_thresh=0.9,
                                    label_smooth=0.1,
                                    focal_loss_gamma=2)
        our_fn = wrap_yolo_loss_v4(gs, b, c, anchors,
                                   binary_weight=0.8,
                                   loss_weight=[1, 5, 1],
                                   wh_reg_weight=0.01,
                                   ignore_thresh=0.6,
                                   truth_thresh=0.9,
                                   label_smooth=0.1,
                                   focal_loss_gamma=2)

    ref_val = float(ref_fn(tf.constant(y_true, tf.float32),
                           tf.constant(y_pred, tf.float32)))
    our_val = float(our_fn(y_true, y_pred))
    np.testing.assert_allclose(our_val, ref_val, rtol=3e-5)


def test_metrics_match_reference_tf():
    """v2 metric family vs the reference module (v3/v4 files are
    byte-identical math, SURVEY.md §2)."""
    # the reference file does `from yolov2.losses import cal_iou`;
    # satisfy that import with the standalone loss module (importing
    # the real yolov2 package would pull in imgaug/bs4)
    import sys
    import types
    loss_mod = _load_ref_loss(2)
    pkg = types.ModuleType("yolov2")
    sys.modules["yolov2"] = pkg
    sys.modules["yolov2.losses"] = loss_mod
    try:
        path = os.path.join(REF, "yolov2", "metrics",
                            "yolo_metrics.py")
        spec = importlib.util.spec_from_file_location(
            "ref_metrics", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.modules.pop("yolov2", None)
        sys.modules.pop("yolov2.losses", None)

    from tf2_yolo_tpu.ops import (wrap_obj_acc, wrap_mean_iou,
                                  wrap_class_acc, wrap_recall)

    n, s, b, c = 2, 4, 3, 5
    y_true, y_pred = make_data(n, s, b, c, seed=31)
    t, p = tf.constant(y_true, tf.float32), tf.constant(y_pred,
                                                        tf.float32)
    gs = (s, s)

    pairs = [
        (mod.wrap_obj_acc(gs, b, c), wrap_obj_acc(gs, b, c, version=2)),
        (mod.wrap_mean_iou(gs, b, c),
         wrap_mean_iou(gs, b, c, version=2)),
        (mod.wrap_class_acc(gs, b, c),
         wrap_class_acc(gs, b, c, version=2)),
        (mod.wrap_recall(gs, b, c, 0.5),
         wrap_recall(gs, b, c, 0.5, version=2)),
    ]
    for ref_fn, our_fn in pairs:
        ref_val = float(tf.reduce_mean(ref_fn(t, p)))
        our_val = float(our_fn(y_true, y_pred))
        np.testing.assert_allclose(our_val, ref_val, rtol=1e-4,
                                    atol=1e-6)


def _load_ref_metrics(version):
    """Load the reference metrics module for ``version``, satisfying
    its ``from yolovN.losses import cal_iou`` with the standalone loss
    module (importing the real package would pull in imgaug/bs4)."""
    import sys
    import types
    name = {1: "yolov1_5", 2: "yolov2", 3: "yolov3", 4: "yolov4"}[
        version]
    loss_mod = _load_ref_loss(version)
    pkg = types.ModuleType(name)
    sys.modules[name] = pkg
    sys.modules[f"{name}.losses"] = loss_mod
    try:
        path = os.path.join(REF, name, "metrics", "yolo_metrics.py")
        spec = importlib.util.spec_from_file_location(
            f"ref_metrics_v{version}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.modules.pop(name, None)
        sys.modules.pop(f"{name}.losses", None)
    return mod


def test_v1_metrics_match_reference_tf():
    """v1 metric family vs the EXECUTED reference module — its layout
    differs from v2+ (5*B xywhc block + shared softmax classes, and
    class_acc takes no bbox_num: reference
    yolov1_5/metrics/yolo_metrics.py:9-107)."""
    mod = _load_ref_metrics(1)
    from tf2_yolo_tpu.ops import (wrap_obj_acc, wrap_mean_iou,
                                  wrap_class_acc, wrap_recall)

    n, s, b, c = 2, 4, 3, 5
    y_true, y_pred = make_data(n, s, b, c, v1=True, seed=37)
    t = tf.constant(y_true, tf.float32)
    p = tf.constant(y_pred, tf.float32)
    gs = (s, s)

    pairs = [
        (mod.wrap_obj_acc(gs, b, c), wrap_obj_acc(gs, b, c, version=1)),
        (mod.wrap_mean_iou(gs, b, c),
         wrap_mean_iou(gs, b, c, version=1)),
        (mod.wrap_class_acc(gs, c),      # v1 signature: no bbox_num
         wrap_class_acc(gs, b, c, version=1)),
        (mod.wrap_recall(gs, b, c, 0.5),
         wrap_recall(gs, b, c, 0.5, version=1)),
    ]
    for ref_fn, our_fn in pairs:
        ref_val = float(tf.reduce_mean(ref_fn(t, p)))
        our_val = float(our_fn(y_true, y_pred))
        np.testing.assert_allclose(our_val, ref_val, rtol=1e-4,
                                   atol=1e-6)


def test_obj_acc_edge_matches_reference_tf():
    """Exact-0.5 / >1 confidence fixture vs the executed reference
    (keras binary_accuracy thresholds at > 0.5; VERDICT r2 weak #6)."""
    mod = _load_ref_metrics(2)
    from tf2_yolo_tpu.ops import wrap_obj_acc

    n, s, b, c = 1, 2, 2, 3
    y_true = np.zeros((n, s, s, 5 + c), np.float32)
    y_pred = np.zeros((n, s, s, b * (5 + c)), np.float32)
    y_true[0, 0, 0, 4] = 1.0
    y_pred[0, 0, 0, 4] = 0.5          # exactly at the threshold
    y_true[0, 0, 1, 4] = 1.0
    y_pred[0, 0, 1, 4] = 1.5          # round() would give 2, not 1
    y_pred[0, 1, 1, 4 + (5 + c)] = 0.5000001

    ref_val = float(tf.reduce_mean(
        mod.wrap_obj_acc((s, s), b, c)(
            tf.constant(y_true), tf.constant(y_pred))))
    our_val = float(wrap_obj_acc((s, s), b, c, version=2)(
        y_true, y_pred))
    np.testing.assert_allclose(our_val, ref_val, rtol=1e-6)
