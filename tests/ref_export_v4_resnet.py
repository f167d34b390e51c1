"""Subprocess helper: build the ACTUAL reference YOLOv4 with the
ResNet50 backbone (keras.applications, weights=None — offline,
pan_ids [-33, 80] as the facade passes, reference
yolov4/__init__.py:236-239, yolov4/models/backbone.py:188-250),
save h5 weights + train-mode activations.

Usage: python ref_export_v4_resnet.py <outdir> [size] [classes]
Requires TF_USE_LEGACY_KERAS=1 for keras-2 h5 layout.
"""

import importlib.util
import os
import sys

import numpy as np

REF = "/root/reference"


def load_ref_models_pkg():
    pkg_dir = os.path.join(REF, "yolov4", "models")
    spec = importlib.util.spec_from_file_location(
        "refv4models", os.path.join(pkg_dir, "__init__.py"),
        submodule_search_locations=[pkg_dir])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["refv4models"] = pkg
    spec.loader.exec_module(pkg)
    return pkg


def main():
    outdir = sys.argv[1]
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    classes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from tensorflow.keras.applications import ResNet50

    pkg = load_ref_models_pkg()
    anchors = np.stack([np.linspace(0.1, 0.9, 9),
                        np.linspace(0.2, 0.8, 9)],
                       axis=1).astype(np.float32)

    body = pkg.yolo_keras_app_body(ResNet50, (size, size, 3),
                                   pretrained_weights=None,
                                   pan_ids=[-33, 80])
    model = pkg.yolo_head(body, classes, anchors)

    rng = np.random.RandomState(0)
    x = rng.rand(2, size, size, 3).astype(np.float32)
    outs = model(x, training=True)
    outs_eval = model(x, training=False)

    os.makedirs(outdir, exist_ok=True)
    model.save_weights(os.path.join(outdir, "ref_v4_resnet50.h5"))
    np.savez(os.path.join(outdir, "ref_io.npz"), x=x,
             **{f"out{i}": np.asarray(o) for i, o in enumerate(outs)},
             **{f"ev{i}": np.asarray(o)
                for i, o in enumerate(outs_eval)})
    print("saved", outdir, [tuple(o.shape) for o in outs])


if __name__ == "__main__":
    main()
