"""Subprocess helper: build the ACTUAL reference YOLOv2 with the UNet
backbone (tf.keras, legacy keras-2 mode), save h5 weights + a
train-mode activation.

Usage: python ref_export_v2_unet.py <outdir> [size] [classes]
Requires TF_USE_LEGACY_KERAS=1 for keras-2 h5 layout.
"""

import importlib.util
import os
import sys

import numpy as np

REF = "/root/reference"


def load_pkg():
    pkg_dir = os.path.join(REF, "yolov2", "models")
    spec = importlib.util.spec_from_file_location(
        "refv2models", os.path.join(pkg_dir, "__init__.py"),
        submodule_search_locations=[pkg_dir])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["refv2models"] = pkg
    spec.loader.exec_module(pkg)
    return pkg


def main():
    outdir = sys.argv[1]
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    classes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    pkg = load_pkg()
    anchors = np.array([[0.25, 0.25], [0.35, 0.12]],
                       dtype=np.float32)
    body = pkg.yolo_body((size, size, 3), backbone="unet")
    model = pkg.yolo_head(body, classes, anchors)

    rng = np.random.RandomState(0)
    x = rng.rand(2, size, size, 3).astype(np.float32)
    out = model(x, training=True)

    os.makedirs(outdir, exist_ok=True)
    model.save_weights(os.path.join(outdir, "ref_v2_unet.h5"))
    np.savez(os.path.join(outdir, "ref_io.npz"), x=x,
             out=np.asarray(out))
    print("saved", outdir, tuple(out.shape))


if __name__ == "__main__":
    main()
