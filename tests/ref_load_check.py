"""Subprocess helper: build a FRESH reference model (tf.keras, legacy
keras-2 mode) and load an h5 weight file EXPORTED BY THIS FRAMEWORK
(convert.export_reference_h5) into it, then save an eval-mode forward
on a fixed input — the other half of the reverse-conversion test.

v3/v4 load by_name (structural layer names); v1/v2 also load by_name —
their positional conv2d_N names match because this is the first model
built in this fresh process (keras name counters start at zero, the
same assumption the forward converters make when READING reference
files).

Usage: python ref_load_check.py <h5path> <outdir> <version> [size] [classes]
"""

import importlib.util
import os
import sys

import numpy as np

REF = "/root/reference"


def load_pkg(version):
    name = {1: "yolov1_5", 2: "yolov2", 3: "yolov3", 4: "yolov4"}[version]
    pkg_dir = os.path.join(REF, name, "models")
    spec = importlib.util.spec_from_file_location(
        f"refv{version}models", os.path.join(pkg_dir, "__init__.py"),
        submodule_search_locations=[pkg_dir])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules[f"refv{version}models"] = pkg
    spec.loader.exec_module(pkg)
    return pkg


def main():
    h5path = sys.argv[1]
    outdir = sys.argv[2]
    version = int(sys.argv[3])
    size = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    classes = int(sys.argv[5]) if len(sys.argv) > 5 else 3

    pkg = load_pkg(version)
    anchors9 = np.stack([np.linspace(0.1, 0.9, 9),
                         np.linspace(0.2, 0.8, 9)], axis=1)

    if version == 1:
        model = pkg.yolo_head(pkg.yolo_body((size, size, 3)),
                              bbox_num=2, class_num=classes)
    elif version == 2:
        anchors = np.array([[0.25, 0.25], [0.35, 0.12]], np.float32)
        model = pkg.yolo_head(
            pkg.yolo_body((size, size, 3), backbone="darknet"),
            classes, anchors)
    elif version == 3:
        model = pkg.yolo_head(
            pkg.yolo_body((size, size, 3), pretrained_weights=None),
            classes, anchors9)
    else:
        # anchors deliberately DIFFERENT from the exporter's — the h5
        # Anchor weights must overwrite these at load
        model = pkg.yolo_head(pkg.yolo_body((size, size, 3)),
                              classes, np.full((9, 2), 0.5))

    model.load_weights(h5path, by_name=True)

    rng = np.random.RandomState(7)
    x = rng.rand(2, size, size, 3).astype(np.float32)
    outs = model(x, training=False)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]

    os.makedirs(outdir, exist_ok=True)
    np.savez(os.path.join(outdir, "loaded_io.npz"), x=x,
             **{f"out{i}": np.asarray(o) for i, o in enumerate(outs)})
    print("loaded", h5path, [tuple(o.shape) for o in outs])


if __name__ == "__main__":
    main()
