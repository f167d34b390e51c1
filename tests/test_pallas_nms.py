"""Pallas NMS kernel parity vs the XLA path and host reference.

These tests run in interpret mode on the CPU suite. The compiled-on-TPU
story lives in ``bench_infer.py``, which jits the kernel on real
hardware every bench run; compiled-vs-XLA keep-mask equality on a v5e
was additionally asserted for K in {128, 256, 512} (round 2)."""

import numpy as np
import pytest

from tf2_yolo_tpu.ops.pallas import nms_pallas
from tf2_yolo_tpu.utils import nms as host_nms


def make_sorted_boxes(rng, n_img=2, n_box=20, k=128, classes=2):
    """Random clustered rows -> (N, K, 8) sorted by joint conf."""
    out = np.zeros((n_img, k, 8), np.float32)
    raw = []
    for i in range(n_img):
        rows = rng.rand(n_box, 7)
        rows[:, 2:4] = rows[:, 2:4] * 0.3 + 0.2
        rows[:, :2] = 0.5 + rng.randn(n_box, 2) * 0.08
        rows[:, 4] = rng.rand(n_box)
        rows[:, 5] = rng.randint(0, classes, n_box)
        rows[:, 6] = rng.rand(n_box)
        order = np.argsort(-(rows[:, 4] * rows[:, 6]))
        rows = rows[order]
        out[i, :n_box, :7] = rows
        out[i, :n_box, 7] = 1.0
        raw.append(rows)
    return out, raw


@pytest.mark.parametrize("iou_mode", [1, 2])
def test_pallas_nms_matches_host(iou_mode):
    rng = np.random.RandomState(0)
    boxes, raw = make_sorted_boxes(rng)
    keep = np.asarray(nms_pallas(boxes, threshold=0.45,
                                 iou_mode=iou_mode, interpret=True))
    for i, rows in enumerate(raw):
        dev = boxes[i, keep[i] > 0.5][:, :7]
        host = host_nms(rows, class_num=2, nms_threshold=0.45,
                        iou_mode=iou_mode)
        dev_sorted = dev[np.lexsort(dev.T[::-1])]
        host_sorted = host[np.lexsort(host.T[::-1])]
        np.testing.assert_allclose(dev_sorted, host_sorted,
                                   rtol=1e-4, atol=1e-5)


def test_pallas_nms_chain_semantics():
    base = np.zeros((1, 128, 8), np.float32)
    base[0, 0, :7] = [0.50, 0.50, 0.20, 0.20, 0.9, 0, 1.0]
    base[0, 1, :7] = [0.58, 0.50, 0.20, 0.20, 0.8, 0, 1.0]
    base[0, 2, :7] = [0.66, 0.50, 0.20, 0.20, 0.7, 0, 1.0]
    base[0, :3, 7] = 1.0
    keep = np.asarray(nms_pallas(base, threshold=0.4, interpret=True))
    # A kills B; suppressed B must not kill C
    np.testing.assert_array_equal(keep[0, :3], [1, 0, 1])
    # padding rows stay dead
    assert keep[0, 3:].sum() == 0


def test_apply_nms_device_pallas_route_matches_xla():
    """use_pallas=True must agree with the XLA scan path (interpret
    mode on CPU)."""
    import jax.numpy as jnp
    from unittest import mock
    from tf2_yolo_tpu.ops import apply_nms_device
    from tf2_yolo_tpu.ops.pallas import nms_kernel

    rng = np.random.RandomState(5)
    rows = np.zeros((2, 128, 7), np.float32)
    rows[:, :20] = rng.rand(2, 20, 7)
    rows[:, :20, 2:4] = rows[:, :20, 2:4] * 0.3 + 0.2
    rows[:, :20, 5] = rng.randint(0, 2, (2, 20))
    valid = np.zeros((2, 128), bool)
    valid[:, :20] = True

    xr, xk = apply_nms_device(jnp.asarray(rows), jnp.asarray(valid),
                              nms_mode=1, nms_threshold=0.45)
    orig = nms_kernel.nms_pallas
    with mock.patch.object(
            nms_kernel, "nms_pallas",
            lambda boxes, threshold, iou_mode=1:
            orig(boxes, threshold=threshold, iou_mode=iou_mode,
                 interpret=True)):
        import tf2_yolo_tpu.ops.pallas as pallas_pkg
        with mock.patch.object(
                pallas_pkg, "nms_pallas",
                lambda boxes, threshold, iou_mode=1:
                orig(boxes, threshold=threshold, iou_mode=iou_mode,
                     interpret=True)):
            pr, pk = apply_nms_device(
                jnp.asarray(rows), jnp.asarray(valid), nms_mode=1,
                nms_threshold=0.45, use_pallas=True)

    xs = np.asarray(xr)[np.asarray(xk)]
    ps = np.asarray(pr)[np.asarray(pk)]
    xs = xs[np.lexsort(xs.T[::-1])]
    ps = ps[np.lexsort(ps.T[::-1])]
    np.testing.assert_allclose(ps, xs, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k", [768, 1024])
def test_pallas_nms_blocked_large_k(k):
    # K > 512 dispatches to the row-strip blocked kernel (bf16 mask
    # scratch); keep mask must match the one-shot algorithm exactly
    rng = np.random.RandomState(3)
    boxes, raw = make_sorted_boxes(rng, n_img=2, n_box=200, k=k,
                                   classes=3)
    keep = np.asarray(nms_pallas(boxes, threshold=0.45, interpret=True))
    for i, rows in enumerate(raw):
        dev = boxes[i, keep[i] > 0.5][:, :7]
        host = host_nms(rows, class_num=3, nms_threshold=0.45,
                        iou_mode=1)
        dev_sorted = dev[np.lexsort(dev.T[::-1])]
        host_sorted = host[np.lexsort(host.T[::-1])]
        np.testing.assert_allclose(dev_sorted, host_sorted,
                                   rtol=1e-4, atol=1e-5)


def test_pallas_nms_large_k_requires_multiple_of_128():
    boxes = np.zeros((1, 640 + 64, 8), np.float32)
    with pytest.raises(ValueError, match="multiple of 128"):
        nms_pallas(boxes, interpret=True)


def test_pallas_nms_compiled_k_cap():
    boxes = np.zeros((1, 1152, 8), np.float32)
    with pytest.raises(ValueError, match="K=1024"):
        nms_pallas(boxes, interpret=False)
