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


def _nms_kernel(boxes_ref, keep_ref, overlap_ref, *, threshold,
                iou_mode):
    boxes = boxes_ref[0]                        # K, 8
    k = boxes.shape[0]

    x = boxes[:, 0:1]
    y = boxes[:, 1:2]
    w = boxes[:, 2:3]
    h = boxes[:, 3:4]
    cls = boxes[:, 5:6]
    valid = boxes[:, 7:8]

    # pairwise IoU on the (K, K) lattice; rows = suppressor i,
    # cols = candidate j
    x1a, x2a = x - w / 2, x + w / 2             # K,1
    y1a, y2a = y - h / 2, y + h / 2
    x1b, x2b = x1a.T, x2a.T                     # 1,K
    y1b, y2b = y1a.T, y2a.T

    iw = jnp.maximum(jnp.minimum(x2a, x2b) - jnp.maximum(x1a, x1b), 0.0)
    ih = jnp.maximum(jnp.minimum(y2a, y2b) - jnp.maximum(y1a, y1b), 0.0)
    inter = iw * ih
    area = w * h
    union = area + area.T - inter
    iou = inter / (union + EPSILON)

    if iou_mode == 2:                           # DIoU penalty
        ew = jnp.maximum(x2a, x2b) - jnp.minimum(x1a, x1b)
        eh = jnp.maximum(y2a, y2b) - jnp.minimum(y1a, y1b)
        rho2 = (x - x.T) ** 2 + (y - y.T) ** 2
        iou = iou - rho2 / (ew * ew + eh * eh)

    same_class = (cls == cls.T).astype(jnp.float32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    later = (col_ids > row_ids).astype(jnp.float32)
    # suppression candidates: same class, overlapping, valid, strictly
    # later in confidence order (upper triangle)
    # rows of invalid boxes can never suppress: fold valid into rows
    # here (valid, K,1) and candidates' validity into the final mask
    overlap_ref[...] = ((iou >= threshold).astype(jnp.float32)
                        * same_class * later * valid)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    valid_row = valid[:, 0][None, :]            # 1,K

    def body(i, alive):
        # alive flag of box i: lane one-hot reduction (O(K))
        keep_i = jnp.sum(alive * (lane == i).astype(jnp.float32))
        row_i = overlap_ref[pl.ds(i, 1), :]     # 1,K dynamic sublane
        return alive * (1.0 - row_i * keep_i)

    alive = jax.lax.fori_loop(
        0, k, body, jnp.ones((1, k), jnp.float32))
    keep = alive * valid_row                    # 1,K
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
    kernel = functools.partial(
        _nms_kernel, threshold=threshold, iou_mode=iou_mode)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, k, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        interpret=interpret,
    )(boxes)
    return out[:, 0, :]
