"""Subprocess helper: build the ACTUAL reference YOLOv1.5 or YOLOv2
(tf.keras, legacy keras-2 mode), save h5 weights + a train-mode
activation.

Usage: python ref_export_v1v2.py <outdir> <version 1|2> [size] [classes]
"""

import importlib.util
import os
import sys

import numpy as np

REF = "/root/reference"


def load_pkg(version):
    name = {1: "yolov1_5", 2: "yolov2"}[version]
    pkg_dir = os.path.join(REF, name, "models")
    spec = importlib.util.spec_from_file_location(
        f"refv{version}models", os.path.join(pkg_dir, "__init__.py"),
        submodule_search_locations=[pkg_dir])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules[f"refv{version}models"] = pkg
    spec.loader.exec_module(pkg)
    return pkg


def main():
    outdir = sys.argv[1]
    version = int(sys.argv[2])
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    classes = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    pkg = load_pkg(version)
    rng = np.random.RandomState(0)
    x = rng.rand(2, size, size, 3).astype(np.float32)

    if version == 1:
        body = pkg.yolo_body((size, size, 3))
        model = pkg.yolo_head(body, bbox_num=2, class_num=classes)
    else:
        anchors = np.array([[0.25, 0.25], [0.35, 0.12]],
                           dtype=np.float32)
        body = pkg.yolo_body((size, size, 3), backbone="darknet")
        model = pkg.yolo_head(body, classes, anchors)

    out = model(x, training=True)
    os.makedirs(outdir, exist_ok=True)
    model.save_weights(os.path.join(outdir, f"ref_v{version}.h5"))
    np.savez(os.path.join(outdir, "ref_io.npz"), x=x,
             out=np.asarray(out))
    print("saved", outdir, tuple(out.shape))


if __name__ == "__main__":
    main()
