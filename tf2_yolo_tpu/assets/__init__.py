"""Class-name vocabularies (reference ships coco/imagenet name files
next to its models — yolov4/models/coco_classnames.txt)."""

import os

_HERE = os.path.dirname(os.path.abspath(__file__))


def load_class_names(name="coco", with_synsets=False):
    """Load a bundled class list: "coco" (80), "voc" (20), or
    "imagenet" (1000 ILSVRC2012 entries, devkit order, lines of
    "synset_id,name" — the public vocabulary the reference ships at
    yolov3/models/imagenet_classnames.txt), or a path to a
    newline-separated file.

    Lines starting with a WordNet synset id ("nNNNNNNNN,") are split
    as "synset,name" and the name part is returned; pass
    ``with_synsets=True`` for (synset, name) tuples. Other
    comma-containing lines (user class names like "tv,monitor") are
    returned whole."""
    import re
    path = name
    if not os.path.isfile(path):
        path = os.path.join(_HERE, f"{name}_classnames.txt")
    if not os.path.isfile(path) and name == "imagenet":
        raise FileNotFoundError(
            "imagenet_classnames.txt missing; run `python "
            "tools/fetch_weights.py --only imagenet_classnames` "
            "(add --from-dir <upstream checkout> when offline).")
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if re.match(r"n\d{8},", line):
                synset, cname = line.split(",", 1)
                out.append((synset, cname) if with_synsets else cname)
            else:
                out.append((None, line) if with_synsets else line)
    return out
