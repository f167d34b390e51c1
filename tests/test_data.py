"""Data pipeline tests: parsers, encoder quirks, sequence reading,
augmenter hook, encode->decode round trip."""

import numpy as np
import pytest

from tf2_yolo_tpu.data import (YoloDataSequence, encode_to_grid,
                               parse_labelimg, parse_labelme, augment)
from tf2_yolo_tpu.utils import decode
from tests.helpers_data import make_dataset


def test_encode_basic_and_collision():
    # image 96x96, grid 6x6 -> cell 16px
    boxes = np.array([[8.0, 8.0, 24.0, 24.0],     # center (16,16) cell (1,1)
                      [18.0, 18.0, 30.0, 30.0]])  # center (24,24) cell (1,1)
    labels = [0, 1]
    out = encode_to_grid(boxes, labels, (96, 96), (6, 6), 2)
    cell = out[1, 1]
    # xywh last-write-wins (second box), class bits accumulate
    np.testing.assert_allclose(cell[:4], [24 % 16 / 16, 24 % 16 / 16,
                                          12 / 96, 12 / 96])
    assert cell[4] == 1
    np.testing.assert_array_equal(cell[5:], [1, 1])


def test_encode_out_of_range_dropped():
    boxes = np.array([[90.0, 90.0, 110.0, 110.0]])   # center (100,100) > img
    out = encode_to_grid(boxes, [0], (96, 96), (6, 6), 1)
    assert out.sum() == 0


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    img_hw = (96, 96)
    gh = gw = 6
    boxes, labels = [], []
    taken = set()
    for _ in range(4):
        while True:
            x1, y1 = rng.randint(0, 64, 2)
            bw, bh = rng.randint(16, 30, 2)
            cx, cy = x1 + bw / 2, y1 + bh / 2
            cell = (int(cy // 16), int(cx // 16))
            if cell not in taken:
                taken.add(cell)
                break
        boxes.append([x1, y1, x1 + bw, y1 + bh])
        labels.append(rng.randint(2))
    boxes = np.array(boxes, float)

    grid = encode_to_grid(boxes, labels, img_hw, (gh, gw), 2)
    # append a conf=1-compatible decode: v2-style needs B*(5+C) layout,
    # a (5+C) label IS a single-box v2 layout
    rows = decode(grid, class_num=2, threshold=0.5, version=2)
    assert len(rows) == 4
    got_centers = sorted((round(r[0] * 96), round(r[1] * 96))
                         for r in rows)
    want_centers = sorted(
        (round(b[0] + (b[2] - b[0]) / 2), round(b[1] + (b[3] - b[1]) / 2))
        for b in boxes)
    assert got_centers == want_centers


def test_parse_labelimg_and_labelme(tmp_path):
    img_dir, lab_dir = make_dataset(str(tmp_path / "a"), n_images=2)
    import os
    xmls = sorted(os.listdir(lab_dir))
    boxes, labels = parse_labelimg(
        os.path.join(lab_dir, xmls[0]), ["square", "bar"])
    assert boxes.shape[1] == 4 and len(boxes) == len(labels)
    # unknown classes filtered
    b2, l2 = parse_labelimg(os.path.join(lab_dir, xmls[0]), ["bar"])
    assert len(b2) <= len(boxes)

    img_dir, lab_dir = make_dataset(
        str(tmp_path / "b"), n_images=2, label_format="labelme")
    jsons = sorted(os.listdir(lab_dir))
    boxes, labels, data = parse_labelme(
        os.path.join(lab_dir, jsons[0]), ["square", "bar"])
    assert boxes.shape[1] == 4 and data is None

    img_dir, lab_dir = make_dataset(
        str(tmp_path / "c"), n_images=1, label_format="labelme",
        embed_image_data=True)
    _, _, data = parse_labelme(
        os.path.join(lab_dir, "img_000.json"), ["square", "bar"])
    assert data is not None


def test_sequence_reads_batches(tmp_path):
    img_dir, lab_dir = make_dataset(str(tmp_path), n_images=5)
    seq = YoloDataSequence(
        img_path=img_dir, label_path=lab_dir, batch_size=2,
        size=(96, 96), grid_shape=(6, 6),
        class_names=["square", "bar"], shuffle=False,
        encoding="utf-8")
    assert len(seq) == 3
    img, lab = seq[0]
    assert img.shape == (2, 96, 96, 3) and lab.shape == (2, 6, 6, 7)
    assert img.max() <= 1.0 + 1e-9          # rescale 1/255
    assert (lab[..., 4] == 1).any()
    img, lab = seq[2]                        # remainder batch
    assert img.shape[0] == 1
    with pytest.raises(IndexError):
        seq[3]


def test_sequence_threaded_matches_single(tmp_path):
    img_dir, lab_dir = make_dataset(str(tmp_path), n_images=6)
    kw = dict(img_path=img_dir, label_path=lab_dir, batch_size=6,
              size=(96, 96), grid_shape=(6, 6),
              class_names=["square", "bar"], shuffle=False,
              encoding="utf-8")
    a_img, a_lab = YoloDataSequence(thread_num=1, **kw)[0]
    b_img, b_lab = YoloDataSequence(thread_num=4, **kw)[0]
    np.testing.assert_allclose(a_img, b_img)
    np.testing.assert_allclose(a_lab, b_lab)


def test_sequence_shuffle_seed_reproducible(tmp_path):
    img_dir, lab_dir = make_dataset(str(tmp_path), n_images=6)
    kw = dict(img_path=img_dir, label_path=lab_dir,
              class_names=["square", "bar"], encoding="utf-8")
    s1 = YoloDataSequence(shuffle=True, seed=7, **kw)
    s2 = YoloDataSequence(shuffle=True, seed=7, **kw)
    assert s1.path_list == s2.path_list


def test_sequence_shard_disjoint_exhaustive(tmp_path):
    """shard(n, i): same-seed sequences split the file list into
    disjoint, exhaustive, strided shards (the per-process split for a
    multi-host slice), and sharded batches still load."""
    img_dir, lab_dir = make_dataset(str(tmp_path), n_images=6)
    kw = dict(img_path=img_dir, label_path=lab_dir, batch_size=3,
              size=(96, 96), grid_shape=(6, 6),
              class_names=["square", "bar"], shuffle=True, seed=3,
              encoding="utf-8")
    full = YoloDataSequence(**kw).path_list
    s0 = YoloDataSequence(**kw).shard(2, 0)
    s1 = YoloDataSequence(**kw).shard(2, 1)
    assert len(s0.path_list) == len(s1.path_list) == 3
    assert not set(s0.path_list) & set(s1.path_list)
    assert sorted(s0.path_list + s1.path_list) == sorted(full)
    img, lab = s0[0]
    assert img.shape == (3, 96, 96, 3) and lab.shape == (3, 6, 6, 7)
    with pytest.raises(ValueError):
        YoloDataSequence(**kw).shard(2, 2)


def test_sequence_labelme_embedded(tmp_path):
    _, lab_dir = make_dataset(str(tmp_path), n_images=2,
                              label_format="labelme",
                              embed_image_data=True)
    seq = YoloDataSequence(
        img_path=lab_dir, label_path=None, label_format="labelme",
        batch_size=2, size=(96, 96), grid_shape=(6, 6),
        class_names=["square", "bar"], shuffle=False, encoding="utf-8")
    img, lab = seq[0]
    assert img.shape == (2, 96, 96, 3)
    assert (lab[..., 4] == 1).any()


def test_augmenter_hook_flip(tmp_path):
    img_dir, lab_dir = make_dataset(str(tmp_path), n_images=3)
    aug = augment.Sequential([augment.RandomFlipLR(prob=1.0)], seed=0)
    seq = YoloDataSequence(
        img_path=img_dir, label_path=lab_dir, batch_size=3,
        size=(96, 96), grid_shape=(6, 6),
        class_names=["square", "bar"], shuffle=False,
        augmenter=aug, encoding="utf-8")
    plain = YoloDataSequence(
        img_path=img_dir, label_path=lab_dir, batch_size=3,
        size=(96, 96), grid_shape=(6, 6),
        class_names=["square", "bar"], shuffle=False,
        encoding="utf-8")
    img_a, lab_a = seq[0]
    img_p, lab_p = plain[0]
    np.testing.assert_allclose(img_a, img_p[:, :, ::-1])
    assert lab_a[..., 4].sum() == lab_p[..., 4].sum()


def test_augment_flip_boxes_consistent():
    img = np.zeros((10, 20, 3), np.uint8)
    boxes = np.array([[2.0, 1.0, 6.0, 5.0, 1.0]])   # tagged with label
    out_img, out_boxes = augment.RandomFlipLR(prob=1.0)(img, boxes)
    np.testing.assert_allclose(out_boxes[0, :4], [14, 1, 18, 5])
    assert out_boxes[0, 4] == 1.0


def test_prefetch_to_device_sharded():
    import jax
    from tf2_yolo_tpu.data import prefetch_to_device, threaded_prefetch
    from tf2_yolo_tpu.parallel import make_mesh, batch_sharding

    batches = [(np.ones((8, 4, 4, 3)) * i, np.zeros((8, 2, 2, 6)))
               for i in range(5)]
    mesh = make_mesh(8)
    out = list(prefetch_to_device(iter(batches), size=2,
                                  sharding=batch_sharding(mesh)))
    assert len(out) == 5
    for i, (img, lab) in enumerate(out):
        assert isinstance(img, jax.Array)
        np.testing.assert_allclose(np.asarray(img)[0, 0, 0, 0], i)

    got = list(threaded_prefetch(lambda: iter(batches), size=2))
    assert len(got) == 5


def test_hsv_jitter_preserves_shape_and_boxes():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (16, 16, 3)).astype(np.uint8)
    boxes = np.array([[2.0, 2.0, 8.0, 8.0, 0.0]])
    out, out_boxes = augment.HSVJitter(hue=0.1, sat=0.5, val=0.5)(
        img, boxes, rng)
    assert out.shape == img.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out_boxes, boxes)
    # zero-magnitude jitter is (near-)identity
    same, _ = augment.HSVJitter(hue=0, sat=0, val=0)(img, boxes, rng)
    assert np.abs(same.astype(int) - img.astype(int)).max() <= 1


def test_mosaic_merges_and_remaps_boxes():
    rng = np.random.RandomState(1)
    base = np.full((40, 40, 3), 10, np.uint8)
    base_boxes = np.array([[0.0, 0.0, 40.0, 40.0, 0.0]])
    other = np.full((40, 40, 3), 200, np.uint8)
    other_boxes = np.array([[10.0, 10.0, 30.0, 30.0, 1.0]])

    mosaic = augment.Mosaic(lambda r: (other, other_boxes.copy()),
                            prob=1.0, center=(0.5, 0.5))
    img, boxes = mosaic(base, base_boxes.copy(), rng)
    assert img.shape == base.shape
    # quadrant 0 is the base image, the other three the sampled one
    assert (img[:20, :20] == 10).all()
    assert (img[25:, 25:] == 200).all()
    # 1 base box + 3 sampled boxes survive, labels carried
    assert len(boxes) == 4
    assert sorted(boxes[:, 4].tolist()) == [0.0, 1.0, 1.0, 1.0]
    # base box was stretched into quadrant (0,0)-(20,20)
    np.testing.assert_allclose(boxes[0, :4], [0, 0, 20, 20])
    # sampled box in the bottom-right quadrant: offset by center
    br = boxes[np.argmax(boxes[:, 0] + boxes[:, 1])]
    np.testing.assert_allclose(br[:4], [25, 25, 35, 35])
    assert boxes.shape[1] == 5


def test_mosaic_via_sequence_sample_raw(tmp_path):
    img_dir, lab_dir = make_dataset(str(tmp_path), n_images=4)
    seq = YoloDataSequence(
        img_path=img_dir, label_path=lab_dir, batch_size=4,
        size=(96, 96), grid_shape=(6, 6),
        class_names=["square", "bar"], shuffle=False,
        encoding="utf-8")
    rng = np.random.RandomState(0)
    img, tagged = seq.sample_raw(rng)
    assert img.shape == (96, 96, 3) and tagged.shape[1] == 5

    seq.augmenter = augment.Sequential(
        [augment.Mosaic(seq.sample_raw)], seed=0)
    imgs, labels = seq[0]
    assert imgs.shape == (4, 96, 96, 3)
    assert (labels[..., 4] == 1).any()


def test_imgaug_augmenter_adapted(tmp_path):
    """A reference-style imgaug augmenter object (duck-typed stub:
    to_deterministic + called as aug(image=..., bounding_boxes=...))
    passes through YoloDataSequence unmodified — the adapter converts
    to/from imgaug bounding boxes (reference utils/tools.py:218-228).
    Uses a stub imgaug package so the test runs without the dep."""
    import sys
    import types

    bbs_mod = types.ModuleType("imgaug.augmentables.bbs")

    class BoundingBox:
        def __init__(self, x1, y1, x2, y2):
            self.x1, self.y1, self.x2, self.y2 = x1, y1, x2, y2

    class BoundingBoxesOnImage:
        def __init__(self, bounding_boxes, shape):
            self.bounding_boxes = list(bounding_boxes)
            self.shape = shape

    bbs_mod.BoundingBox = BoundingBox
    bbs_mod.BoundingBoxesOnImage = BoundingBoxesOnImage
    pkg = types.ModuleType("imgaug")
    aug_pkg = types.ModuleType("imgaug.augmentables")
    sys.modules["imgaug"] = pkg
    sys.modules["imgaug.augmentables"] = aug_pkg
    sys.modules["imgaug.augmentables.bbs"] = bbs_mod

    class StubSequential:
        """imgaug-interface horizontal flip."""

        def to_deterministic(self):
            return self

        def __call__(self, image, bounding_boxes):
            w = image.shape[1]
            flipped = [BoundingBox(w - bb.x2, bb.y1, w - bb.x1, bb.y2)
                       for bb in bounding_boxes.bounding_boxes]
            return image[:, ::-1], BoundingBoxesOnImage(
                flipped, bounding_boxes.shape)

    try:
        img_dir, lab_dir = make_dataset(str(tmp_path), n_images=3)
        kw = dict(img_path=img_dir, label_path=lab_dir, batch_size=3,
                  size=(96, 96), grid_shape=(6, 6),
                  class_names=["square", "bar"], shuffle=False,
                  encoding="utf-8")
        seq = YoloDataSequence(augmenter=StubSequential(), **kw)
        ours = YoloDataSequence(
            augmenter=augment.Sequential(
                [augment.RandomFlipLR(prob=1.0)], seed=0), **kw)
        img_a, lab_a = seq[0]
        img_o, lab_o = ours[0]
        np.testing.assert_allclose(img_a, img_o)
        np.testing.assert_allclose(lab_a, lab_o)
        # late assignment adapts too (the documented seq.augmenter= path)
        seq2 = YoloDataSequence(**kw)
        seq2.augmenter = StubSequential()
        img_b, lab_b = seq2[0]
        np.testing.assert_allclose(img_b, img_a)
        np.testing.assert_allclose(lab_b, lab_a)
    finally:
        for name in ("imgaug", "imgaug.augmentables",
                     "imgaug.augmentables.bbs"):
            sys.modules.pop(name, None)
