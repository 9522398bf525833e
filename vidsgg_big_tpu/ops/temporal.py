"""Temporal-interval (duration) algebra.

All on-device functions are pure JAX, fixed-shape, and mask-based so they can
live inside ``jit``.  Durations are **closed intervals** ``[start, end]`` of
frame ids (the reference converts its half-open ``[start, end)`` annotations
to closed intervals at load time; see reference dataloaders/dataloader_vidvrd.py:34).

Host-side helpers (``merge_duration_list``, ``is_overlap``) operate on python
tuples during data preparation and use the half-open convention, matching the
annotation JSON format.
"""
from __future__ import annotations

import jax.numpy as jnp


def dura_intersection(dura1, dura2, broadcast: bool = True):
    """Pairwise intersection of closed intervals.

    Args:
      dura1: (n1, 2) int/float array of [start, end] (closed).
      dura2: (n2, 2).
      broadcast: if True return all pairs, else elementwise (n1 == n2).

    Returns:
      (intersection, mask): intersection (n1, n2, 2) (or (n1, 2)), and a bool
      mask marking pairs that actually overlap (start <= end).  Non-overlapping
      entries contain an empty (inverted) interval; callers must apply the
      mask.  Mirrors reference utils/utils_func.py:347-373.
    """
    if broadcast:
        inter_s = jnp.maximum(dura1[:, None, 0], dura2[None, :, 0])
        inter_e = jnp.minimum(dura1[:, None, 1], dura2[None, :, 1])
    else:
        inter_s = jnp.maximum(dura1[:, 0], dura2[:, 0])
        inter_e = jnp.minimum(dura1[:, 1], dura2[:, 1])
    intersection = jnp.stack([inter_s, inter_e], axis=-1)
    mask = inter_s <= inter_e
    return intersection, mask


def tiou(duras1, duras2, broadcast: bool = True):
    """Temporal IoU of closed/real intervals; 0 where disjoint.

    Mirrors reference utils/utils_func.py:375-390 (including the division by
    the union span without +1 correction).
    """
    if broadcast:
        a0, a1 = duras1[:, None, 0], duras1[:, None, 1]
        b0, b1 = duras2[None, :, 0], duras2[None, :, 1]
    else:
        a0, a1 = duras1[:, 0], duras1[:, 1]
        b0, b1 = duras2[:, 0], duras2[:, 1]
    mask = (a1 >= b0) & (b1 >= a0)
    t = (jnp.minimum(a1, b1) - jnp.maximum(a0, b0)) / (
        jnp.maximum(a1, b1) - jnp.minimum(a0, b0)
    )
    return jnp.where(mask, t, 0.0)


def generalized_tiou(duras1, duras2, broadcast: bool = True):
    """Generalized 1-D IoU in [-1, 1] (no zeroing of disjoint pairs).

    Mirrors reference utils/utils_func.py:393-408.
    """
    if broadcast:
        a0, a1 = duras1[:, None, 0], duras1[:, None, 1]
        b0, b1 = duras2[None, :, 0], duras2[None, :, 1]
    else:
        a0, a1 = duras1[:, 0], duras1[:, 1]
        b0, b1 = duras2[:, 0], duras2[:, 1]
    return (jnp.minimum(a1, b1) - jnp.maximum(a0, b0)) / (
        jnp.maximum(a1, b1) - jnp.minimum(a0, b0)
    )


def tiou_left_right(lr1, lr2):
    """IoU of (left, right) FCOS-style offsets around a shared anchor point.

    Mirrors reference models/grd_model_v5.py:10-14.
    """
    return (jnp.minimum(lr1[..., 1], lr2[..., 1]) + jnp.minimum(lr1[..., 0], lr2[..., 0])) / (
        jnp.maximum(lr1[..., 1], lr2[..., 1]) + jnp.maximum(lr1[..., 0], lr2[..., 0])
    )


# ---------------------------------------------------------------------------
# host-side (data preparation) helpers — half-open interval convention
# ---------------------------------------------------------------------------

def merge_duration_list(duration_list):
    """Merge overlapping/touching half-open [s, e) durations into maximal runs.

    The VidVRD train annotations split long relations into overlapping 30-frame
    segments; this merges them back (reference utils/utils_func.py:591-621).
    """
    duration_list = sorted(list(duration_list), key=lambda d: d[0])
    merged = [duration_list[0]]
    for cur_start, cur_end in duration_list[1:]:
        former_start, former_end = merged[-1]
        if cur_start <= former_end:
            merged[-1] = (former_start, cur_end)
        else:
            merged.append((cur_start, cur_end))
    return merged


def is_overlap(dura1, dura2) -> bool:
    """Half-open intervals; touching boundaries do not count as overlap."""
    s1, e1 = dura1
    s2, e2 = dura2
    assert s1 < e1 and s2 < e2
    return not (e1 <= s2 or e2 <= s1)
