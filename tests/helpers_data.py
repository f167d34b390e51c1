"""Synthetic dataset generator for integration tests: colored
rectangles on black background with labelimg-XML or labelme-JSON
annotations (SURVEY.md §4 'integration tests')."""

import base64
import json
import os
import xml.etree.ElementTree as ET

import numpy as np


def _draw_image(size, boxes, rng):
    img = np.zeros((*size, 3), np.uint8)
    img[:] = rng.randint(0, 40, 3)
    for (x1, y1, x2, y2), color in boxes:
        img[y1:y2, x1:x2] = color
    return img


def make_dataset(root, n_images=6, size=(96, 96),
                 class_names=("square", "bar"),
                 label_format="labelimg", seed=0,
                 max_boxes=3, embed_image_data=False,
                 class_probs=None):
    """Write images + annotations; returns (img_dir, label_dir).

    ``class_probs``: optional per-class sampling distribution for
    class-imbalanced sets (BCCD-shaped: one dominant class, one rare —
    reference README.md BCCD rows). Classes stay visually separable by
    aspect: class 0 square, odd classes wide bars, even classes >0
    tall bars.
    """
    from PIL import Image

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "imgs")
    lab_dir = os.path.join(root, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)

    h, w = size
    for i in range(n_images):
        n_boxes = rng.randint(1, max_boxes + 1)
        boxes, names = [], []
        for _ in range(n_boxes):
            cls = rng.choice(len(class_names), p=class_probs)
            if cls > 0 and cls % 2 == 0:        # tall bar
                bh = rng.randint(h // 8, h // 3)
                bw = rng.randint(w // 8, w // 6)
                x1 = rng.randint(0, w - bw)
                y1 = rng.randint(0, h - bh)
                color = rng.randint(100, 255, 3)
                boxes.append(((x1, y1, x1 + bw, y1 + bh), color))
                names.append(class_names[cls])
                continue
            bw = rng.randint(w // 8, w // 3)
            bh = bw if cls == 0 else rng.randint(h // 8, h // 6)
            x1 = rng.randint(0, w - bw)
            y1 = rng.randint(0, h - bh)
            color = rng.randint(100, 255, 3)
            boxes.append(((x1, y1, x1 + bw, y1 + bh), color))
            names.append(class_names[cls])

        img = _draw_image(size, boxes, rng)
        img_name = f"img_{i:03d}.png"
        Image.fromarray(img).save(os.path.join(img_dir, img_name))

        if label_format == "labelimg":
            root_el = ET.Element("annotation")
            ET.SubElement(root_el, "filename").text = img_name
            sz = ET.SubElement(root_el, "size")
            ET.SubElement(sz, "width").text = str(w)
            ET.SubElement(sz, "height").text = str(h)
            for (x1, y1, x2, y2), name in zip(
                    [b for b, _ in boxes], names):
                obj = ET.SubElement(root_el, "object")
                ET.SubElement(obj, "name").text = name
                bnd = ET.SubElement(obj, "bndbox")
                ET.SubElement(bnd, "xmin").text = str(x1)
                ET.SubElement(bnd, "ymin").text = str(y1)
                ET.SubElement(bnd, "xmax").text = str(x2)
                ET.SubElement(bnd, "ymax").text = str(y2)
            ET.ElementTree(root_el).write(
                os.path.join(lab_dir, f"img_{i:03d}.xml"))
        else:
            shapes = [{"label": name,
                       "points": [[float(x1), float(y1)],
                                  [float(x2), float(y2)]],
                       "shape_type": "rectangle"}
                      for (x1, y1, x2, y2), name in zip(
                          [b for b, _ in boxes], names)]
            data = {"shapes": shapes,
                    "imageHeight": h, "imageWidth": w}
            if embed_image_data:
                from io import BytesIO
                buf = BytesIO()
                Image.fromarray(img).save(buf, format="PNG")
                data["imageData"] = base64.b64encode(
                    buf.getvalue()).decode()
            with open(os.path.join(lab_dir, f"img_{i:03d}.json"),
                      "w", encoding="big5") as f:
                json.dump(data, f)
    return img_dir, lab_dir
