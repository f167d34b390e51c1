"""On-device NMS family: greedy, DIoU, and Soft-NMS, static shapes.

The reference suppresses with Python whitelist loops over dynamic
arrays (utils/tools.py:719-729, :772-781). On TPU the same semantics
become: sort by joint confidence (descending), one pairwise IoU/DIoU
matrix on the (K, K) lattice (VPU-friendly), and a ``lax.scan``
realizing the sequential suppression/decay — per image via ``vmap``.

Class-wise behavior falls out of masking the IoU matrix to same-class
pairs, so one scan handles all classes at once instead of the
reference's per-class Python loop.

Semantics parity notes:
  - greedy: a suppressed box never suppresses others; earlier
    (higher-conf) boxes are never suppressed by later ones.
  - soft: every box (even one already dropped) decays its later
    overlaps by exp(-iou^2/sigma); survivors keep original rows;
    iteration order is fixed by the ORIGINAL joint confidence.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .geometry import pair_iou


def _sorted_by_conf(rows, valid):
    joint = rows[..., 4] * rows[..., 6]
    joint = jnp.where(valid, joint, -jnp.inf)
    order = jnp.argsort(-joint)
    rows = jnp.take_along_axis(rows, order[..., None], axis=0)
    valid = jnp.take_along_axis(valid, order, axis=0)
    return rows, valid


def _pair_matrix(rows, iou_mode):
    ious = pair_iou(rows[:, None, :4], rows[None, :, :4],
                    mode=iou_mode)                       # K,K
    same_class = rows[:, None, 5] == rows[None, :, 5]
    return jnp.where(same_class, ious, -jnp.inf)


def _nms_single(rows, valid, nms_threshold, iou_mode):
    """One image. rows (K, 7), valid (K,). Returns keep mask (K,)."""
    rows, valid = _sorted_by_conf(rows, valid)
    k = rows.shape[0]
    ious = _pair_matrix(rows, iou_mode)
    later = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
             > jax.lax.broadcasted_iota(jnp.int32, (k, k), 0))

    def body(suppressed, i):
        keep_i = valid[i] & ~suppressed[i]
        newly = keep_i & later[i] & (ious[i] >= nms_threshold)
        return suppressed | newly, None

    suppressed, _ = jax.lax.scan(
        body, jnp.zeros((k,), bool), jnp.arange(k))
    return rows, valid & ~suppressed


def _nms_fixedpoint(rows, valid, nms_threshold, iou_mode):
    """Exact greedy NMS via fixed-point iteration (whole batch at once).

    Greedy keep is the prefix recurrence
    ``g_j = valid_j and not any(O[i, j] and g_i for i < j)`` over the
    confidence order. Instead of a K-step sequential scan, iterate the
    map ``f(a)_j = valid_j and not any(O[:, j] @ a)`` from a0 = valid:
    f is antitone, f*f is monotone, and by induction on the box index
    the iterates pin every box whose suppression-chain depth they
    reach, so the sequence converges to g (the unique fixed point) in
    chain-depth+1 steps — typically a handful, never more than K. Each
    step is ONE (N,K)x(N,K,K) 0/1 matmul on the MXU, so at the
    deployment K=128 this replaces 128 dependent scan steps (~1 ms on
    v5e) with ~4 batched matvecs.

    The overlap lattice is stored bf16 (entries are 0/1 so products
    are exact) and accumulated f32 (integer sums <= K are exact)."""
    rows, valid = jax.vmap(_sorted_by_conf)(rows, valid)
    k = rows.shape[1]
    ious = jax.vmap(lambda r: _pair_matrix(r, iou_mode))(rows)
    later = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
             > jax.lax.broadcasted_iota(jnp.int32, (k, k), 0))
    lattice = ((ious >= nms_threshold) & later[None]).astype(jnp.bfloat16)
    v = valid

    def f(a):
        s = jax.lax.dot_general(
            a.astype(jnp.bfloat16), lattice,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # N,K
        return v & (s < 0.5)

    def cond(c):
        a, nxt, t = c
        return jnp.logical_and(jnp.any(a != nxt), t < k)

    def body(c):
        _, nxt, t = c
        return nxt, f(nxt), t + 1

    a0 = v
    _, keep, _ = jax.lax.while_loop(cond, body, (a0, f(a0), 0))
    return rows, keep


def _soft_nms_single(rows, valid, nms_threshold, conf_threshold, sigma):
    rows, valid = _sorted_by_conf(rows, valid)
    k = rows.shape[0]
    ious = _pair_matrix(rows, 1)
    later = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
             > jax.lax.broadcasted_iota(jnp.int32, (k, k), 0))
    conf0 = rows[..., 4] * rows[..., 6]

    def body(carry, i):
        conf, deleted = carry
        overlap = later[i] & (ious[i] >= nms_threshold) & valid
        decay = jnp.where(overlap,
                          jnp.exp(-(ious[i] ** 2) / sigma), 1.0)
        conf = conf * jnp.where(valid[i], decay, 1.0)
        deleted = deleted | (valid[i] & overlap
                             & (conf < conf_threshold))
        return (conf, deleted), None

    (_, deleted), _ = jax.lax.scan(
        body, (conf0, jnp.zeros((k,), bool)), jnp.arange(k))
    return rows, valid & ~deleted


@partial(jax.jit, static_argnames=("iou_mode",))
def nms(rows, valid, nms_threshold=0.45, iou_mode=1):
    """Batched greedy NMS. rows (N, K, 7) from ``decode``; returns
    (rows_sorted, keep) with the same static shapes. Computed by the
    fixed-point iteration (see :func:`_nms_fixedpoint`); the
    sequential-scan formulation is kept as :func:`nms_scan` (test
    oracle / fallback)."""
    return _nms_fixedpoint(rows, valid, nms_threshold, iou_mode)


@partial(jax.jit, static_argnames=("iou_mode",))
def nms_scan(rows, valid, nms_threshold=0.45, iou_mode=1):
    """Greedy NMS via the literal per-box ``lax.scan`` (K dependent
    steps). Same result as :func:`nms`; kept as the semantics oracle."""
    return jax.vmap(
        lambda r, v: _nms_single(r, v, nms_threshold, iou_mode))(
        rows, valid)


@jax.jit
def soft_nms(rows, valid, nms_threshold=0.45, conf_threshold=0.5,
             sigma=0.5):
    """Batched Soft-NMS (Gaussian decay, original rows kept)."""
    return jax.vmap(
        lambda r, v: _soft_nms_single(
            r, v, nms_threshold, conf_threshold, sigma))(rows, valid)


@partial(jax.jit, static_argnames=("nms_threshold", "iou_mode"))
def _nms_via_pallas(rows, valid, nms_threshold, iou_mode):
    """Greedy NMS through the VMEM-resident Pallas kernel
    (ops/pallas/nms_kernel.py). Rows are conf-sorted first so the
    output aligns with the XLA path's (rows_sorted, keep) contract;
    K is padded up to a lane-tile multiple of 128 (the kernel's
    contract) and the keep mask sliced back."""
    from .pallas import nms_pallas

    rows_s, valid_s = jax.vmap(_sorted_by_conf)(rows, valid)
    k = rows_s.shape[1]
    k_pad = max(128, -(-k // 128) * 128)
    boxes = jnp.concatenate(
        [rows_s, valid_s[..., None].astype(rows_s.dtype)], axis=-1)
    if k_pad != k:
        boxes = jnp.pad(boxes, ((0, 0), (0, k_pad - k), (0, 0)))
    keep = nms_pallas(boxes, threshold=nms_threshold,
                      iou_mode=iou_mode)[:, :k]
    return rows_s, keep > 0.5


def apply_nms_device(rows, valid, class_num=None, nms_mode=1,
                     nms_threshold=0.45, conf_threshold=0.5,
                     nms_sigma=0.5, use_pallas=False):
    """Dispatch matching the host ``utils.tools.apply_nms`` modes:
    0 none, 1 NMS, 2 Soft-NMS, 3 DIoU-NMS. ``class_num`` is implicit
    (class ids ride in rows[..., 5]).

    ``use_pallas=True`` routes greedy/DIoU NMS through the Pallas
    kernel (TPU only; K should be a multiple of 128) — an A/B path
    only: the default batched fixed-point NMS beats it at every K on
    v5e (BASELINE.md round-3 table). Soft-NMS always uses the XLA
    scan path."""
    if nms_mode == 0:
        return rows, valid
    if nms_mode == 1:
        if use_pallas:
            return _nms_via_pallas(rows, valid, nms_threshold, 1)
        return nms(rows, valid, nms_threshold, iou_mode=1)
    if nms_mode == 2:
        return soft_nms(rows, valid, nms_threshold, conf_threshold,
                        nms_sigma)
    if nms_mode == 3:
        if use_pallas:
            return _nms_via_pallas(rows, valid, nms_threshold, 2)
        return nms(rows, valid, nms_threshold, iou_mode=2)
    raise ValueError(f"Invalid nms_mode: {nms_mode}")
