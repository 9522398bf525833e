"""Grounding-stage data preparation (fixed-shape, on device).

Train path (from GT graphs; reference grd_model_v5.py:253-306): build one
query slot per (padded) GT predicate, identify duplicate-query groups by the
(pred, sub_cat, obj_cat, s∩o-duration) tag, and sample one negative predicate
per unique query without replacement within each (sub, obj, duration) group.

Test path (from stage-1 triplets; reference grd_model_v5.py:310-328).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.types import GraphBatch
from ..ops.segments import pack_rows
from ..ops.segments import unique_max


def _group_structure(keys, valid):
    """keys: (P, W) int32.  Returns (is_rep, group_rep) where group_rep[p] is
    the index of p's group representative (first valid occurrence)."""
    p = keys.shape[0]
    is_rep = unique_max(keys, jnp.zeros((p,)), valid)
    eq = jnp.all(keys[:, None, :] == keys[None, :, :], axis=-1)   # (P, P)
    eq = eq & valid[:, None] & valid[None, :]
    rep_mat = eq & is_rep[None, :]
    group_rep = jnp.argmax(rep_mat, axis=-1).astype(jnp.int32)
    group_rep = jnp.where(valid, group_rep, 0)
    return is_rep & valid, group_rep


def prepare_grounding_gt(gts: GraphBatch, video_len, num_pred_cats: int,
                         rng):
    """Single-video train-time query construction (vmap over batch).

    Returns dict with:
      query_cats (P, 3), temporal (P, 2), target (P, 2) all normalized;
      neg_query_cats (P, 3); is_rep (P,), group_rep (P,), query_mask (P,).
    """
    p = gts.pred_cats.shape[0]
    pred2so = jnp.argmax(gts.adj, axis=-1).T                   # (P, 2)
    sub_dura = gts.traj_durations[pred2so[:, 0]]               # (P, 2)
    obj_dura = gts.traj_durations[pred2so[:, 1]]
    inter_s = jnp.maximum(sub_dura[:, 0], obj_dura[:, 0])
    inter_e = jnp.minimum(sub_dura[:, 1], obj_dura[:, 1])
    inter = jnp.stack([inter_s, inter_e], axis=-1)             # (P, 2)

    so_cats = gts.traj_cats[pred2so]                           # (P, 2)
    tags = jnp.concatenate(
        [gts.pred_cats[:, None], so_cats, inter], axis=-1)     # (P, 5)
    vl = jnp.asarray(video_len, jnp.int32)
    keys = pack_rows(tags, [num_pred_cats, 256, 256, 1 << 15, 1 << 15])
    valid = gts.pred_mask
    is_rep, group_rep = _group_structure(keys, valid)

    query_cats = jnp.stack(
        [so_cats[:, 0], gts.pred_cats, so_cats[:, 1]], axis=-1)  # (P, 3)
    temporal = inter.astype(jnp.float32) / vl.astype(jnp.float32)
    target = gts.pred_durations.astype(jnp.float32) / vl.astype(jnp.float32)

    # --- negative predicate sampling (reference :285-299) ---
    so_keys = pack_rows(tags[:, 1:], [256, 256, 1 << 15, 1 << 15])
    is_so_rep, so_rep = _group_structure(so_keys, valid)
    same_so = jnp.all(so_keys[:, None, :] == so_keys[None, :, :], axis=-1)
    same_so = same_so & valid[:, None] & valid[None, :]
    # positive predicates of each slot's SO-group
    pred_onehot = jax.nn.one_hot(gts.pred_cats, num_pred_cats,
                                 dtype=bool) & valid[:, None]
    group_pos = jnp.einsum("pq,qc->pc", same_so.astype(jnp.float32),
                           pred_onehot.astype(jnp.float32)) > 0   # (P, C)
    # rank of each representative within its SO-group (unique tags only)
    idx = jnp.arange(p)
    earlier = same_so & is_rep[None, :] & (idx[None, :] < idx[:, None])
    rank = earlier.sum(-1)                                      # (P,)
    # shared per-SO-group randomness: take the SO representative's noise row
    noise = jax.random.gumbel(rng, (p, num_pred_cats))
    noise = noise[so_rep]                                       # (P, C)
    noise = jnp.where(group_pos, -jnp.inf, noise)
    order = jnp.argsort(-noise, axis=-1)                        # (P, C)
    neg_pred = jnp.take_along_axis(
        order, jnp.clip(rank, 0, num_pred_cats - 1)[:, None],
        axis=-1)[:, 0].astype(jnp.int32)                        # (P,)
    neg_query_cats = query_cats.at[:, 1].set(neg_pred)

    return {
        "query_cats": query_cats,
        "neg_query_cats": neg_query_cats,
        "temporal": temporal,
        "target": target,
        "is_rep": is_rep,
        "group_rep": group_rep,
        "query_mask": valid,
    }


def prepare_grounding_queries(quintuples, dura_inters, valid, video_len):
    """Test-time query construction from stage-1 triplets (already unique).

    quintuples: (M, 5) [pred, s_cat, o_cat, s_tid, o_tid]; dura_inters:
    (M, 2) closed; returns (query_cats (M,3), temporal (M,2), query_mask).

    Pure numpy on purpose: the stage-B eval loop calls this per video on
    the host (often on a packing thread) — device ops per video would
    serialize against the axon tunnel.  Shared with eval so the query
    conventions can never diverge from :func:`prepare_grounding_gt`.
    """
    import numpy as _np
    q = _np.asarray(quintuples)
    query_cats = _np.stack([q[:, 1], q[:, 0], q[:, 2]], axis=-1)
    temporal = _np.asarray(dura_inters, _np.float32) / _np.float32(video_len)
    return query_cats, temporal, valid
