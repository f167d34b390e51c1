"""Class-name vocabularies (reference ships coco/imagenet name files
next to its models — yolov4/models/coco_classnames.txt)."""

import os

_HERE = os.path.dirname(os.path.abspath(__file__))


def load_class_names(name="coco"):
    """Load a bundled class list: "coco" (80), "voc" (20), or
    "imagenet" (999, fetched — see below), or a path to a
    newline-separated file."""
    path = name
    if not os.path.isfile(path):
        path = os.path.join(_HERE, f"{name}_classnames.txt")
    if not os.path.isfile(path) and name == "imagenet":
        raise FileNotFoundError(
            "imagenet_classnames.txt is not bundled (this box has no "
            "egress); run `python tools/fetch_weights.py --only "
            "imagenet_classnames` once online to install it.")
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]
