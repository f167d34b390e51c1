"""Batched on-device evaluation matching (IoU assignment + TP/TPP
counting) for ``create_score_mat`` / ``PRfunc``.

The reference runs the whole matching stage as per-image x per-class
host Python loops (/root/reference/utils/measurement.py:107-136,
:252-292). Here the padded decoded detections for a WHOLE image batch
(from ``ops.decode_multi_level`` + ``ops.apply_nms_device``) are
matched in one jitted program: a single (B, T, P) IoU lattice with
class/validity pair masking, best-GT argmax per prediction, and
per-class aggregation as one-hot matmuls (MXU work, no host round
trips per image). The host then only does vectorized NumPy over the
flat result arrays — zero per-image Python.

Semantics match the host path exactly:
  - a prediction matches the GT with the HIGHEST IoU among same-class
    GTs of its image (first on ties, like np.argmax over the
    class-subset — masking with -1 preserves subset order);
  - it counts as TPP if that best IoU >= iou_threshold;
  - TP collapses TPPs sharing a GT to one (unique matched GTs).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .geometry import pair_iou


@partial(jax.jit, static_argnames=("class_num",))
def match_counts(t_rows, t_valid, p_rows, p_valid, class_num,
                 iou_threshold):
    """Per-image, per-class detection-matching counts.

    Args:
        t_rows: (B, T, 7) padded GT rows [x, y, w, h, conf, cls, prob].
        t_valid: (B, T) bool validity of GT rows.
        p_rows: (B, P, 7) padded prediction rows (same layout).
        p_valid: (B, P) bool validity of prediction rows.
        class_num: static number of classes.
        iou_threshold: match threshold.

    Returns:
        dict of (B, class_num) int32 arrays: ``n_true`` / ``n_pred``
        (class-wise GT / prediction counts), ``tpp`` (matched
        predictions), ``tp`` (unique matched GTs).
    """
    t_cls = t_rows[..., 5].astype(jnp.int32)
    p_cls = p_rows[..., 5].astype(jnp.int32)
    t_oh = jax.nn.one_hot(t_cls, class_num, dtype=jnp.float32) \
        * t_valid[..., None]                                # (B, T, C)
    p_oh = jax.nn.one_hot(p_cls, class_num, dtype=jnp.float32) \
        * p_valid[..., None]                                # (B, P, C)

    hit, best_gt = _match(t_rows, t_valid, p_rows, p_valid,
                          t_cls, p_cls, iou_threshold)

    # matched-GT occupancy: scatter hits onto their best GT slot
    # (one-hot matmul), then >0 marks each GT matched at least once
    gt_oh = jax.nn.one_hot(best_gt, t_rows.shape[1],
                           dtype=jnp.float32)               # (B, P, T)
    gt_hits = jnp.einsum("bpt,bp->bt", gt_oh,
                         hit.astype(jnp.float32))           # (B, T)
    matched_gt = (gt_hits > 0).astype(jnp.float32)

    return {
        "n_true": t_oh.sum(axis=1).astype(jnp.int32),
        "n_pred": p_oh.sum(axis=1).astype(jnp.int32),
        "tpp": jnp.einsum("bpc,bp->bc", p_oh,
                          hit.astype(jnp.float32)).astype(jnp.int32),
        "tp": jnp.einsum("btc,bt->bc", t_oh,
                         matched_gt).astype(jnp.int32),
    }


@jax.jit
def match_pred_arrays(t_rows, t_valid, p_rows, p_valid, iou_threshold):
    """Per-prediction matching arrays for the PR sweep.

    Returns (B, P) arrays: ``joint_conf`` (conf x class prob), ``cls``
    int32, ``hit`` bool, ``best_gt`` int32 (row index into the image's
    padded GT rows — globally unique per (image, GT) once offset by
    image * T, which is all the PR sweep needs), and ``valid`` bool.
    """
    t_cls = t_rows[..., 5].astype(jnp.int32)
    p_cls = p_rows[..., 5].astype(jnp.int32)
    hit, best_gt = _match(t_rows, t_valid, p_rows, p_valid,
                          t_cls, p_cls, iou_threshold)
    return {
        "joint_conf": p_rows[..., 4] * p_rows[..., 6],
        "cls": p_cls,
        "hit": hit,
        "best_gt": best_gt,
        "valid": p_valid,
    }


def _match(t_rows, t_valid, p_rows, p_valid, t_cls, p_cls,
           iou_threshold):
    """(hit, best_gt): best same-class GT per prediction via one
    masked (B, T, P) IoU lattice."""
    ious = pair_iou(t_rows[:, :, None, :4],
                    p_rows[:, None, :, :4])                 # (B, T, P)
    pair_ok = (t_valid[:, :, None] & p_valid[:, None, :]
               & (t_cls[:, :, None] == p_cls[:, None, :]))
    # real IoUs are >= 0, so -1 masking keeps argmax == argmax over
    # the valid same-class subset (first-wins on ties, like the host)
    masked = jnp.where(pair_ok, ious, -1.0)
    best_iou = masked.max(axis=1)                           # (B, P)
    best_gt = masked.argmax(axis=1).astype(jnp.int32)       # (B, P)
    hit = (best_iou >= iou_threshold) & p_valid
    return hit, best_gt
