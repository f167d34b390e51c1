"""Subprocess helper: build the ACTUAL reference tiny-YOLOv3
(tf.keras, legacy keras-2 mode), save h5 weights + train-mode
activations.

Usage: python ref_export_v3_tiny.py <outdir> [size] [classes]
Requires TF_USE_LEGACY_KERAS=1 for keras-2 h5 layout.
"""

import importlib.util
import os
import sys

import numpy as np

REF = "/root/reference"


def load_ref_models_pkg():
    pkg_dir = os.path.join(REF, "yolov3", "models")
    spec = importlib.util.spec_from_file_location(
        "refv3models", os.path.join(pkg_dir, "__init__.py"),
        submodule_search_locations=[pkg_dir])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["refv3models"] = pkg
    spec.loader.exec_module(pkg)
    return pkg


def main():
    outdir = sys.argv[1]
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    classes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    pkg = load_ref_models_pkg()
    # 6 anchors -> 3 per level across the 2 tiny output levels
    # (reference yolov3/models/__init__.py:29-33 splits evenly)
    anchors = np.stack([np.linspace(0.1, 0.9, 6),
                        np.linspace(0.2, 0.8, 6)],
                       axis=1).astype(np.float32)

    body = pkg.tiny_yolo_body((size, size, 3))
    model = pkg.yolo_head(body, classes, anchors)

    rng = np.random.RandomState(0)
    x = rng.rand(2, size, size, 3).astype(np.float32)
    outs = model(x, training=True)

    os.makedirs(outdir, exist_ok=True)
    model.save_weights(os.path.join(outdir, "ref_v3_tiny.h5"))
    np.savez(os.path.join(outdir, "ref_io.npz"), x=x,
             **{f"out{i}": np.asarray(o) for i, o in enumerate(outs)})
    print("saved", outdir, [tuple(o.shape) for o in outs])


if __name__ == "__main__":
    main()
