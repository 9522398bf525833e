"""Volumetric (per-frame) trajectory IoU, fully vectorized for TPU.

The reference computes vIoU one trajectory-pair at a time inside python loops
(reference utils/utils_func.py:437-471, models/model_0v10.py:576-581, and the
~1.5-hour Base-C label pre-assignment at tools/train_vidor.py:107-159).  Here
the whole (N proposals x M ground-truths) vIoU matrix is one masked gather +
elementwise reduction that XLA fuses into a single kernel.

Conventions:
  * boxes are stored *relative* to their trajectory: ``boxes[i, k]`` is the
    xyxy box of trajectory i at absolute frame ``dura[i, 0] + k``; frames past
    the trajectory length are zero padding.
  * durations are closed intervals [start, end] of absolute frame ids.
  * box area uses the detection convention ``(x2 - x1 + 1) * (y2 - y1 + 1)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def box_areas_xyxy(boxes):
    """Area of xyxy boxes with the +1 convention.  boxes: (..., 4)."""
    return (boxes[..., 2] - boxes[..., 0] + 1.0) * (boxes[..., 3] - boxes[..., 1] + 1.0)


def _pairwise_frame_inter(b1, b2):
    """Intersection area of aligned per-frame boxes.  b1, b2: (..., 4)."""
    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt + 1.0, 0.0)
    return wh[..., 0] * wh[..., 1]


def viou_aligned(traj1, traj2, mask=None):
    """vIoU of two frame-aligned trajectories (reference utils_func.py:474-490).

    traj1, traj2: (T, 4); mask: optional (T,) validity.
    """
    inter = _pairwise_frame_inter(traj1, traj2)
    a1 = box_areas_xyxy(traj1)
    a2 = box_areas_xyxy(traj2)
    if mask is not None:
        inter = inter * mask
        a1 = a1 * mask
        a2 = a2 * mask
    inter = inter.sum()
    return inter / (a1.sum() + a2.sum() - inter)


def viou_matrix(boxes1, dura1, boxes2, dura2, valid1=None, valid2=None):
    """All-pairs volumetric IoU between two sets of trajectories.

    Args:
      boxes1: (N, T1, 4) relative per-frame boxes (zero padded).
      dura1:  (N, 2) closed absolute [start, end].
      boxes2: (M, T2, 4).
      dura2:  (M, 2).
      valid1/valid2: optional (N,)/(M,) bool trajectory-validity masks.

    Returns:
      (N, M) float32 vIoU, 0 where durations don't overlap or either
      trajectory is padding.  Denominator covers the *full* duration of each
      trajectory (matching reference vIoU_ts which sums areas before slicing).
    """
    n, t1 = boxes1.shape[0], boxes1.shape[1]
    m, t2 = boxes2.shape[0], boxes2.shape[1]
    len1 = dura1[:, 1] - dura1[:, 0] + 1  # (N,)
    len2 = dura2[:, 1] - dura2[:, 0] + 1  # (M,)

    # per-trajectory total areas over their own (unpadded) durations
    fmask1 = jnp.arange(t1)[None, :] < len1[:, None]  # (N, T1)
    fmask2 = jnp.arange(t2)[None, :] < len2[:, None]  # (M, T2)
    area1 = (box_areas_xyxy(boxes1) * fmask1).sum(-1)  # (N,)
    area2 = (box_areas_xyxy(boxes2) * fmask2).sum(-1)  # (M,)

    # intersection window per pair
    inter_s = jnp.maximum(dura1[:, None, 0], dura2[None, :, 0])  # (N, M)
    inter_e = jnp.minimum(dura1[:, None, 1], dura2[None, :, 1])
    inter_len = inter_e - inter_s + 1                             # (N, M)
    has_overlap = inter_len > 0

    # enumerate the intersection window with a static-length frame axis
    tw = min(t1, t2)
    k = jnp.arange(tw)                                            # (Tw,)
    kmask = k[None, None, :] < inter_len[:, :, None]              # (N, M, Tw)
    off1 = jnp.clip(inter_s - dura1[:, None, 0], 0)               # (N, M)
    off2 = jnp.clip(inter_s - dura2[None, :, 0], 0)
    idx1 = jnp.clip(off1[:, :, None] + k[None, None, :], 0, t1 - 1)
    idx2 = jnp.clip(off2[:, :, None] + k[None, None, :], 0, t2 - 1)

    g1 = jnp.take_along_axis(boxes1[:, None, :, :], idx1[:, :, :, None], axis=2)
    g2 = jnp.take_along_axis(
        jnp.broadcast_to(boxes2[None, :, :, :], (n, m, t2, 4)),
        idx2[:, :, :, None], axis=2)
    inter_area = (_pairwise_frame_inter(g1, g2) * kmask).sum(-1)  # (N, M)

    denom = area1[:, None] + area2[None, :] - inter_area
    v = jnp.where(denom > 0, inter_area / denom, 0.0)
    v = jnp.where(has_overlap, v, 0.0)
    if valid1 is not None:
        v = jnp.where(valid1[:, None], v, 0.0)
    if valid2 is not None:
        v = jnp.where(valid2[None, :], v, 0.0)
    return v


def viou_matrix_grid(boxes1, dura1, boxes2, dura2, valid1=None, valid2=None,
                     t_abs: int = 1024):
    """All-pairs vIoU via an absolute time grid (gather-free).

    Semantics match :func:`viou_matrix`; instead of per-pair window gathers
    (slow on TPU), both trajectory sets are placed on a shared absolute frame
    grid with contiguous dynamic-update-slices, and the per-frame
    intersection is one broadcast elementwise reduction.  ~6x faster at
    training shapes.

    Args:
      t_abs: static grid length.  Frames beyond ``min_start + t_abs`` are
        dropped from the intersection sum (exact whenever the video's
        trajectory span fits in t_abs; pick t_abs >= the video-length
        bucket).
    """
    t1, t2 = boxes1.shape[1], boxes2.shape[1]
    len1 = dura1[:, 1] - dura1[:, 0] + 1
    len2 = dura2[:, 1] - dura2[:, 0] + 1
    fmask1 = jnp.arange(t1)[None, :] < len1[:, None]
    fmask2 = jnp.arange(t2)[None, :] < len2[:, None]
    area1 = (box_areas_xyxy(boxes1) * fmask1).sum(-1)
    area2 = (box_areas_xyxy(boxes2) * fmask2).sum(-1)

    starts = jnp.concatenate([dura1[:, 0], dura2[:, 0]])
    if valid1 is not None or valid2 is not None:
        v = jnp.concatenate([
            valid1 if valid1 is not None else jnp.ones_like(dura1[:, 0],
                                                            bool),
            valid2 if valid2 is not None else jnp.ones_like(dura2[:, 0],
                                                            bool)])
        starts = jnp.where(v, starts, jnp.iinfo(starts.dtype).max)
    shift = jnp.min(starts)

    def to_grid(boxes, dura, fmask):
        n, t = boxes.shape[:2]
        pad = jnp.zeros((n, t_abs + t, 5), boxes.dtype)
        x = jnp.concatenate([boxes, fmask[..., None].astype(boxes.dtype)],
                            axis=-1)

        def place(buf, xb, off):
            return jax.lax.dynamic_update_slice(buf, xb, (off, 0))

        off = jnp.clip(dura[:, 0] - shift, 0, t_abs)
        grid = jax.vmap(place)(pad, x, off.astype(jnp.int32))
        return grid[:, :t_abs, :4], grid[:, :t_abs, 4] > 0.5

    g1, m1 = to_grid(boxes1, dura1, fmask1)      # (N, TA, 4), (N, TA)
    g2, m2 = to_grid(boxes2, dura2, fmask2)      # (M, TA, 4), (M, TA)

    inter = _pairwise_frame_inter(g1[:, None], g2[None, :])   # (N, M, TA)
    both = m1[:, None, :] & m2[None, :, :]
    inter_area = (inter * both).sum(-1)                        # (N, M)

    denom = area1[:, None] + area2[None, :] - inter_area
    v = jnp.where(denom > 0, inter_area / denom, 0.0)
    overlap = (jnp.minimum(dura1[:, None, 1], dura2[None, :, 1]) >=
               jnp.maximum(dura1[:, None, 0], dura2[None, :, 0]))
    v = jnp.where(overlap, v, 0.0)
    if valid1 is not None:
        v = jnp.where(valid1[:, None], v, 0.0)
    if valid2 is not None:
        v = jnp.where(valid2[None, :], v, 0.0)
    return v
