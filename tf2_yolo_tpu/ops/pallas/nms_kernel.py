"""Greedy NMS as a single Pallas TPU kernel.

The XLA path (ops/nms.py) materializes the (K, K) IoU matrix in HBM
and runs the suppression scan step by step with HBM round-trips. This
kernel keeps the whole problem resident in VMEM: one pass computes the
pairwise IoU/DIoU lattice (VPU-friendly (K, K) f32 tiles), then a
fori_loop walks the confidence order updating an alive-mask in place —
zero HBM traffic between steps.

Mosaic notes:
  - the overlap matrix is staged through a VMEM scratch ref so the
    suppression loop can dynamic-slice "row i" on the sublane axis
    (O(K) per step, O(K^2) total — a value-level one-hot select would
    cost O(K^2) per step);
  - for K > 512 the one-shot lattice (~8 live (K, K) f32 tiles)
    exceeds the 16 MB scoped VMEM limit, so a blocked variant builds
    the overlap matrix in (block, K) row strips, keeping live data at
    one (K, K) scratch + O(block*K) intermediates (compiled-on-TPU
    supported through K=1024; the scratch alone hits the limit around
    K=2048);
  - the current box's alive flag is read with a lane one-hot reduction
    (dynamic lane indexing is not lowerable), which is O(K) per step;
  - the keep-mask output is written as an (8, K) tile (sublane-padded)
    because a (1, K) block violates the (8, 128) f32 tiling rule; the
    wrapper returns row 0.

Layout: boxes arrive sorted by joint confidence descending, as
(K, 8) f32 [x, y, w, h, conf, cls, prob, valid]; K should be a
multiple of 128 for clean lane tiling (the caller pads). Grid: one
program per image.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-07


def _pairwise_overlap(rows, boxes, row_off, *, threshold, iou_mode):
    """Overlap mask block: (R, K) — rows are suppressors [row_off,
    row_off+R), columns all K candidates. rows/boxes are (R, 8)/(K, 8)."""
    r = rows.shape[0]
    k = boxes.shape[0]

    xa, ya = rows[:, 0:1], rows[:, 1:2]          # R,1
    wa, ha = rows[:, 2:3], rows[:, 3:4]
    cls_a, valid_a = rows[:, 5:6], rows[:, 7:8]
    xb = boxes[:, 0:1].T                         # 1,K
    yb = boxes[:, 1:2].T
    wb, hb = boxes[:, 2:3].T, boxes[:, 3:4].T
    cls_b = boxes[:, 5:6].T

    x1a, x2a = xa - wa / 2, xa + wa / 2
    y1a, y2a = ya - ha / 2, ya + ha / 2
    x1b, x2b = xb - wb / 2, xb + wb / 2
    y1b, y2b = yb - hb / 2, yb + hb / 2

    iw = jnp.maximum(jnp.minimum(x2a, x2b) - jnp.maximum(x1a, x1b), 0.0)
    ih = jnp.maximum(jnp.minimum(y2a, y2b) - jnp.maximum(y1a, y1b), 0.0)
    inter = iw * ih
    union = wa * ha + wb * hb - inter
    iou = inter / (union + EPSILON)

    if iou_mode == 2:                            # DIoU penalty
        ew = jnp.maximum(x2a, x2b) - jnp.minimum(x1a, x1b)
        eh = jnp.maximum(y2a, y2b) - jnp.minimum(y1a, y1b)
        rho2 = (xa - xb) ** 2 + (ya - yb) ** 2
        iou = iou - rho2 / (ew * ew + eh * eh)

    same_class = (cls_a == cls_b).astype(jnp.float32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r, k), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (r, k), 0) + row_off
    later = (col_ids > row_ids).astype(jnp.float32)
    # suppression candidates: same class, overlapping, valid, strictly
    # later in confidence order (upper triangle); invalid rows can
    # never suppress
    return ((iou >= threshold).astype(jnp.float32)
            * same_class * later * valid_a)


def _suppression_scan(overlap_ref, valid_row, k):
    """Greedy alive-mask scan over the precomputed overlap matrix."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, alive):
        # alive flag of box i: lane one-hot reduction (O(K))
        keep_i = jnp.sum(alive * (lane == i).astype(jnp.float32))
        row_i = overlap_ref[pl.ds(i, 1), :].astype(jnp.float32)
        return alive * (1.0 - row_i * keep_i)

    alive = jax.lax.fori_loop(
        0, k, body, jnp.ones((1, k), jnp.float32))
    return alive * valid_row                     # 1,K


def _nms_kernel_blocked(boxes_ref, keep_ref, overlap_ref, *, threshold,
                        iou_mode, block):
    """Large-K variant: the overlap matrix is built in (block, K) row
    strips, so peak live VMEM stays O(block*K) for the intermediates
    plus one (K, K) scratch instead of ~8 concurrent (K, K) tiles
    (which exceeds the 16 MB scoped VMEM limit at K=1024)."""
    boxes = boxes_ref[0]                         # K, 8
    k = boxes.shape[0]

    def fill(j, _):
        off = j * block
        rows = boxes_ref[0, pl.ds(off, block), :]
        overlap_ref[pl.ds(off, block), :] = _pairwise_overlap(
            rows, boxes, off, threshold=threshold,
            iou_mode=iou_mode).astype(overlap_ref.dtype)
        return 0

    jax.lax.fori_loop(0, k // block, fill, 0)

    valid_row = boxes[:, 7:8].T                  # 1,K
    keep = _suppression_scan(overlap_ref, valid_row, k)
    keep_ref[0] = jnp.broadcast_to(keep, (8, k))


def _nms_kernel(boxes_ref, keep_ref, overlap_ref, *, threshold,
                iou_mode):
    boxes = boxes_ref[0]                        # K, 8
    k = boxes.shape[0]

    # whole (K, K) lattice in one shot (fastest; fits VMEM for K<=512)
    overlap_ref[...] = _pairwise_overlap(
        boxes, boxes, 0, threshold=threshold, iou_mode=iou_mode)

    valid_row = boxes[:, 7:8].T                 # 1,K
    keep = _suppression_scan(overlap_ref, valid_row, k)
    keep_ref[0] = jnp.broadcast_to(keep, (8, k))


@functools.partial(
    jax.jit, static_argnames=("threshold", "iou_mode", "interpret"))
def nms_pallas(boxes, threshold=0.45, iou_mode=1, interpret=False):
    """Batched greedy NMS kernel.

    Args:
        boxes: (N, K, 8) f32 [x,y,w,h,conf,cls,prob,valid], each image
            sorted by joint confidence descending, K ideally a
            multiple of 128.
        threshold: IoU suppression threshold.
        iou_mode: 1 IoU, 2 DIoU.
        interpret: run in interpreter mode (CPU tests).

    Returns:
        keep: (N, K) f32 {0,1} mask over the sorted rows.
    """
    n, k, _ = boxes.shape
    if k > 512 and k % 128:
        raise ValueError(
            f"K={k}: the blocked large-K kernel needs K to be a "
            "multiple of 128 (pad the candidate set)")
    if k > 1024 and not interpret:
        raise ValueError(
            f"K={k}: compiled support tops out at K=1024 — the (K, K) "
            "f32 suppression scratch alone approaches the 16 MB "
            "scoped VMEM limit beyond that. Use the XLA path "
            "(use_pallas=False) for larger candidate sets.")
    if k <= 512:
        # one-shot lattice, f32 scratch
        kernel = functools.partial(
            _nms_kernel, threshold=threshold, iou_mode=iou_mode)
        scratch = pltpu.VMEM((k, k), jnp.float32)
    else:
        # row-strip construction: peak VMEM is O(block*K) f32
        # intermediates + one K^2 f32 scratch (K=1024: 4 MB + strips,
        # vs ~8 concurrent 4 MB tiles one-shot). The scratch stays f32:
        # Mosaic cannot prove sublane alignment for the suppression
        # loop's dynamic single-row loads on a bf16 (16, 128)-tiled
        # memref ("index in dimension 0 is a multiple of 8" at K=1024).
        block = 128 if k % 256 else 256
        kernel = functools.partial(
            _nms_kernel_blocked, threshold=threshold,
            iou_mode=iou_mode, block=block)
        scratch = pltpu.VMEM((k, k), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, k, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8, k), jnp.float32),
        scratch_shapes=[scratch],
        interpret=interpret,
    )(boxes)
    return out[:, 0, :]
