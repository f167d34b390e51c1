"""Weight converter test against a synthetic keras-layout h5 file
shaped exactly like the reference YOLOv4 model's weight file."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax

from tf2_yolo_tpu.convert import (load_h5_weights, convert_yolov4,
                                  merge_into_variables,
                                  _yolov4_body_mapping)
from tf2_yolo_tpu.models import YoloV4

CLASSES = 2
ABOX = 3


def _get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


@pytest.fixture(scope="module")
def model_and_h5(tmp_path_factory):
    """Build the flax model, then synthesize a keras-style h5 whose
    layer names follow the reference builders and whose shapes come
    from the model itself."""
    anchors = np.stack([np.linspace(0.1, 0.9, 9),
                        np.linspace(0.2, 0.8, 9)], 1)
    model = YoloV4(anchors=anchors, class_num=CLASSES)
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    rng = np.random.RandomState(0)
    path = str(tmp_path_factory.mktemp("h5") / "yolov4.h5")
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights")

        def add(layer, weights):
            g = root.create_group(layer).create_group(layer)
            for name, arr in weights.items():
                g.create_dataset(f"{name}:0", data=arr)

        params = variables["params"]
        for mpath, base in _yolov4_body_mapping():
            conv = _get(params, mpath + ("conv",))
            add(f"{base}_conv",
                {"kernel": rng.rand(*conv["kernel"].shape)
                 .astype(np.float32)})
            bn = _get(params, mpath + ("bn",))
            n = bn["scale"].shape[0]
            add(f"{base}_bn",
                {"gamma": rng.rand(n).astype(np.float32),
                 "beta": rng.rand(n).astype(np.float32),
                 "moving_mean": rng.rand(n).astype(np.float32),
                 "moving_variance": rng.rand(n).astype(np.float32)})

        # per-box head convs: channel groups that must concatenate
        # into the fused head conv
        in_ch = {1: 1024, 2: 512, 3: 256}
        for level in range(1, 4):
            for j in range(1, ABOX + 1):
                base = f"out{level}_box{j}"
                for part, ch in (("xy", 2), ("wh", 2), ("conf", 1),
                                 ("prob", CLASSES)):
                    add(f"{base}_{part}_conv",
                        {"kernel": rng.rand(1, 1, in_ch[level], ch)
                         .astype(np.float32),
                         "bias": rng.rand(ch).astype(np.float32)})
                add(f"{base}_anchor",
                    {"Variable": rng.rand(1, 1, 1, 2)
                     .astype(np.float32)})
    return model, variables, path


def test_convert_fills_everything(model_and_h5):
    model, variables, path = model_and_h5
    h5w = load_h5_weights(path)
    params, stats = convert_yolov4(h5w, CLASSES, ABOX)
    merged = merge_into_variables(variables, params, stats)

    # spot-check: backbone stem conv kernel came from the h5
    np.testing.assert_allclose(
        merged["params"]["backbone"]["stem"]["conv"]["kernel"],
        h5w["conv1_conv"]["kernel"])
    # BN stats landed in batch_stats
    np.testing.assert_allclose(
        merged["batch_stats"]["backbone"]["stem"]["bn"]["var"],
        h5w["conv1_bn"]["moving_variance"])
    # fused head channel order: [xy, wh, conf, prob] per box
    k = merged["params"]["head1"]["conv"]["kernel"]
    np.testing.assert_allclose(
        k[..., 0:2], h5w["out1_box1_xy_conv"]["kernel"])
    np.testing.assert_allclose(
        k[..., 2:4], h5w["out1_box1_wh_conv"]["kernel"])
    np.testing.assert_allclose(
        k[..., 4:5], h5w["out1_box1_conf_conv"]["kernel"])
    np.testing.assert_allclose(
        k[..., 5:5 + CLASSES], h5w["out1_box1_prob_conv"]["kernel"])
    per = 5 + CLASSES
    np.testing.assert_allclose(
        k[..., per:per + 2], h5w["out1_box2_xy_conv"]["kernel"])
    # anchors stacked per level
    np.testing.assert_allclose(
        merged["params"]["head2"]["anchors"][0],
        h5w["out2_box1_anchor"]["Variable"].reshape(2))

    # the merged tree still matches the model structure: forward runs
    out = model.apply(merged, np.zeros((1, 64, 64, 3), np.float32),
                      train=False)
    assert len(out) == 3


def test_convert_missing_layer_strict(model_and_h5):
    _, _, path = model_and_h5
    h5w = load_h5_weights(path)
    del h5w["stage3_post_conv"]
    with pytest.raises(KeyError):
        convert_yolov4(h5w, CLASSES, ABOX, strict=True)
    # non-strict: skips the hole
    params, _ = convert_yolov4(h5w, CLASSES, ABOX, strict=False)
    assert "post" not in params["backbone"]["stage3"]


def test_merge_shape_mismatch_raises(model_and_h5):
    _, variables, path = model_and_h5
    h5w = load_h5_weights(path)
    h5w["conv1_conv"]["kernel"] = np.zeros((3, 3, 3, 64), np.float32)[
        :, :, :, :63]
    params, stats = convert_yolov4(h5w, CLASSES, ABOX)
    with pytest.raises(ValueError):
        merge_into_variables(variables, params, stats)


def test_convert_to_cache_roundtrip(model_and_h5, tmp_path,
                                    monkeypatch):
    """convert_to_cache writes a file loadable via the facade's
    named-weights resolution."""
    import os
    from tf2_yolo_tpu.convert import convert_to_cache
    from tf2_yolo_tpu import yolov4

    _, _, h5_path = model_and_h5
    monkeypatch.setenv("TF2_YOLO_TPU_WEIGHTS", str(tmp_path))
    anchors = np.stack([np.linspace(0.1, 0.9, 9),
                        np.linspace(0.2, 0.8, 9)], 1)
    out = convert_to_cache(h5_path, version=4, class_num=CLASSES,
                           name="test_coco", input_shape=(64, 64, 3),
                           anchors=anchors)
    assert os.path.isfile(out)

    yolo = yolov4.Yolo(input_shape=(64, 64, 3),
                       class_names=["a", "b"])
    yolo.create_model(pretrained_weights=out)
    # anchors came from the h5 Anchor layers (random in the fixture)
    got = np.asarray(yolo.anchors)
    assert got.shape == (9, 2)
