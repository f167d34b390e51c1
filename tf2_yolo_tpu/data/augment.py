"""Lightweight box-aware image augmentation (imgaug replacement).

The reference exposes an ``augmenter`` hook taking an imgaug
``Sequential`` (utils/tools.py:218-228); imgaug is not a dependency
here. An augmenter in this framework is any callable

    augmenter(image, boxes) -> (image, boxes)

with ``image`` an (H, W, 3) uint8/float ndarray and ``boxes`` a float
(N, 4) xyxy array in pixel coordinates of that image. The classes
below compose into a ``Sequential`` that satisfies that contract and
covers the augmentations the reference notebooks used (flips, affine
jitter, color jitter). NumPy-only: augmentation runs on host workers
overlapped with the device step.
"""

import numpy as np


class Sequential:
    """Apply augmenters in order; seedable."""

    def __init__(self, augmenters, seed=None):
        self.augmenters = list(augmenters)
        self.rng = np.random.RandomState(seed)

    def __call__(self, image, boxes):
        for aug in self.augmenters:
            image, boxes = aug(image, boxes, self.rng)
        return image, boxes


class RandomFlipLR:
    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, image, boxes, rng=np.random):
        if rng.rand() < self.prob:
            w = image.shape[1]
            image = image[:, ::-1]
            if len(boxes):
                boxes = boxes.copy()
                boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
        return image, boxes


class RandomFlipUD:
    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, image, boxes, rng=np.random):
        if rng.rand() < self.prob:
            h = image.shape[0]
            image = image[::-1]
            if len(boxes):
                boxes = boxes.copy()
                boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
        return image, boxes


class RandomTranslate:
    """Shift by up to +-max_frac of the image size (zero fill); boxes
    fully shifted outside are dropped."""

    def __init__(self, max_frac=0.1):
        self.max_frac = max_frac

    def __call__(self, image, boxes, rng=np.random):
        h, w = image.shape[:2]
        dx = int(rng.uniform(-self.max_frac, self.max_frac) * w)
        dy = int(rng.uniform(-self.max_frac, self.max_frac) * h)
        out = np.zeros_like(image)
        src_x = slice(max(0, -dx), min(w, w - dx))
        src_y = slice(max(0, -dy), min(h, h - dy))
        dst_x = slice(max(0, dx), min(w, w + dx))
        dst_y = slice(max(0, dy), min(h, h + dy))
        out[dst_y, dst_x] = image[src_y, src_x]
        if len(boxes):
            boxes = boxes.copy()
            boxes[:, [0, 2]] += dx
            boxes[:, [1, 3]] += dy
            boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
            boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
            keep = ((boxes[:, 2] - boxes[:, 0]) > 1) & \
                   ((boxes[:, 3] - boxes[:, 1]) > 1)
            boxes = boxes[keep]
        return out, boxes


class RandomScale:
    """Zoom in/out around the center by a factor in [lo, hi]."""

    def __init__(self, lo=0.9, hi=1.1):
        self.lo, self.hi = lo, hi

    def __call__(self, image, boxes, rng=np.random):
        from PIL import Image
        h, w = image.shape[:2]
        s = rng.uniform(self.lo, self.hi)
        nh, nw = max(1, int(h * s)), max(1, int(w * s))
        arr = np.asarray(Image.fromarray(
            image.astype(np.uint8)).resize((nw, nh)))
        out = np.zeros_like(image)
        if s >= 1:             # crop center
            y0, x0 = (nh - h) // 2, (nw - w) // 2
            out = arr[y0:y0 + h, x0:x0 + w]
            off = (-x0, -y0)
        else:                  # pad center
            y0, x0 = (h - nh) // 2, (w - nw) // 2
            out[y0:y0 + nh, x0:x0 + nw] = arr
            off = (x0, y0)
        if len(boxes):
            boxes = boxes * s
            boxes = boxes.copy()
            boxes[:, [0, 2]] += off[0]
            boxes[:, [1, 3]] += off[1]
            boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
            boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
            keep = ((boxes[:, 2] - boxes[:, 0]) > 1) & \
                   ((boxes[:, 3] - boxes[:, 1]) > 1)
            boxes = boxes[keep]
        return out.astype(image.dtype), boxes


class ColorJitter:
    """Brightness/contrast jitter (box-free)."""

    def __init__(self, brightness=0.2, contrast=0.2):
        self.brightness = brightness
        self.contrast = contrast

    def __call__(self, image, boxes, rng=np.random):
        img = image.astype(np.float32)
        scale = 255.0 if image.dtype == np.uint8 else 1.0
        b = rng.uniform(-self.brightness, self.brightness) * scale
        c = 1.0 + rng.uniform(-self.contrast, self.contrast)
        img = (img - scale / 2) * c + scale / 2 + b
        img = img.clip(0, scale)
        return img.astype(image.dtype), boxes
