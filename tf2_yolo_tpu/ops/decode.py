"""On-device box decode with static shapes.

The reference decodes on host with ``np.where`` + a Python loop
(utils/tools.py:412-436) — dynamic shapes, CPU-bound. The TPU-native
path keeps everything on device: joint confidences for every
(cell, box, class) lattice point, a top-k selection to a fixed
``max_boxes`` budget, and a validity mask instead of a ragged result
(SURVEY.md §7.4 hard part 1).

Output rows use the same 7-tuple convention as ``utils.decode``:
[x, y, w, h, conf, class_idx, class_prob], x/y normalized to image.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("class_num", "max_boxes", "version"))
def decode_one_level(label_data, class_num=1, threshold=0.5,
                     max_boxes=100, version=2):
    """Decode one level's grid outputs for a batch.

    Args:
        label_data: (N, S, S, B*(5+C)) (v2-4) or (N, S, S, 5B+C) (v1).
        class_num: number of classes.
        threshold: joint-confidence threshold.
        max_boxes: fixed output budget per image.
        version: 1 for the shared-class layout, else per-anchor.

    Returns:
        rows: (N, max_boxes, 7) f32, sorted by joint conf descending.
        valid: (N, max_boxes) bool — above-threshold flags.
    """
    n, gh, gw = label_data.shape[:3]
    label_data = jnp.asarray(label_data, jnp.float32)

    if version == 1:
        bbox_num = (label_data.shape[-1] - class_num) // 5
        xywhc = label_data[..., :-class_num].reshape(
            n, gh, gw, bbox_num, 5)
        prob = jnp.broadcast_to(
            label_data[..., None, -class_num:],
            (n, gh, gw, bbox_num, class_num))
    else:
        bbox_num = label_data.shape[-1] // (5 + class_num)
        shaped = label_data.reshape(n, gh, gw, bbox_num, 5 + class_num)
        xywhc = shaped[..., :5]
        prob = shaped[..., 5:]

    joint = xywhc[..., 4:5] * prob                  # N,gh,gw,B,C

    # decode box geometry once per (cell, box); class axis broadcast
    cols = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1)
    rows_i = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0)
    x = (cols[None, :, :, None] + xywhc[..., 0]) / gw       # N,gh,gw,B
    y = (rows_i[None, :, :, None] + xywhc[..., 1]) / gh
    w, h, conf = xywhc[..., 2], xywhc[..., 3], xywhc[..., 4]

    flat = joint.reshape(n, -1)                     # N, gh*gw*B*C
    k = min(max_boxes, flat.shape[1])
    top_vals, top_idx = jax.lax.top_k(flat, k)

    cls_idx = top_idx % class_num
    cell_box = top_idx // class_num                 # index into N,gh*gw*B

    def gather(field):
        return jnp.take_along_axis(
            field.reshape(n, -1), cell_box, axis=1)

    out = jnp.stack([
        gather(x), gather(y), gather(w), gather(h), gather(conf),
        cls_idx.astype(jnp.float32),
        jnp.take_along_axis(prob.reshape(n, -1), top_idx, axis=1),
    ], axis=-1)                                     # N,k,7

    valid = top_vals >= threshold
    if k < max_boxes:
        pad = max_boxes - k
        out = jnp.pad(out, ((0, 0), (0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    return out, valid


def decode_multi_level(label_datas, class_num=1, threshold=0.5,
                       max_boxes=100, version=3):
    """Decode a list of per-level outputs and merge to one top-k set
    per image (the device equivalent of calling utils.decode with
    multiple label_datas)."""
    rows_all, valid_all, conf_all = [], [], []
    for ld in label_datas:
        rows, valid = decode_one_level(
            ld, class_num=class_num, threshold=threshold,
            max_boxes=max_boxes, version=version)
        rows_all.append(rows)
        valid_all.append(valid)
        conf_all.append(rows[..., 4] * rows[..., 6])
    rows = jnp.concatenate(rows_all, axis=1)
    valid = jnp.concatenate(valid_all, axis=1)
    joint = jnp.concatenate(conf_all, axis=1)

    joint = jnp.where(valid, joint, -1.0)
    _, top_idx = jax.lax.top_k(joint, max_boxes)
    rows = jnp.take_along_axis(rows, top_idx[..., None], axis=1)
    valid = jnp.take_along_axis(valid, top_idx, axis=1)
    return rows, valid
