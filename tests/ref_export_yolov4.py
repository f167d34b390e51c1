"""Subprocess helper: build the ACTUAL reference YOLOv4 (tf.keras,
legacy keras-2 mode), save its h5 weights and a forward activation on
a fixed input.

Run with TF_USE_LEGACY_KERAS=1 so save_weights writes the keras-2 h5
layout the converter targets. Imports the reference model modules via
package injection (the reference __init__ pulls imgaug/bs4 which are
absent; the model files themselves only need tf + numpy).

Usage: python ref_export_yolov4.py <outdir> [size] [classes]
"""

import importlib.util
import os
import sys
import types

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

    pkg = load_ref_models_pkg()
    anchors = np.stack([np.linspace(0.1, 0.9, 9),
                        np.linspace(0.2, 0.8, 9)], axis=1)

    body = pkg.yolo_body((size, size, 3))
    model = pkg.yolo_head(body, classes, anchors)

    rng = np.random.RandomState(0)
    x = rng.rand(2, size, size, 3).astype(np.float32)
    # training=True: batch statistics, so an untrained net stays in a
    # sane numeric range on both sides; eval-mode (moving statistics)
    # additionally saved — it is noise-free and pins wiring exactly
    outs = model(x, training=True)
    outs_eval = model(x, training=False)

    os.makedirs(outdir, exist_ok=True)
    model.save_weights(os.path.join(outdir, "ref_yolov4.h5"))
    np.savez(os.path.join(outdir, "ref_io.npz"), x=x,
             **{f"out{i}": np.asarray(o) for i, o in enumerate(outs)},
             **{f"ev{i}": np.asarray(o)
                for i, o in enumerate(outs_eval)})
    print("saved", outdir, [tuple(o.shape) for o in outs])


if __name__ == "__main__":
    main()
