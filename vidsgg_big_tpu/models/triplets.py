"""Fixed-shape triplet construction (inference post-processing).

Replaces the reference's per-video python post-processing
(reference models/model_0v10.py:707-785): top-k predicate scores per query,
subject/object selection via adjacency argmax, overlap filtering, exact
dedup of (pred_cat, subj_cat, obj_cat, subj_tid, obj_tid) quintuples keeping
the max-score copy, and background removal — all as masked XLA ops with a
static output size of ``num_querys * topk`` candidates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.temporal import dura_intersection
from ..ops.segments import pack_rows, unique_max


@struct.dataclass
class Triplets:
    """Padded candidate triplets of one video (M = Q * topk slots)."""
    quintuples: jnp.ndarray    # (M, 5) [pred_cat, s_cat, o_cat, s_tid, o_tid]
    scores: jnp.ndarray        # (M, 3) [pred_score, s_score, o_score]
    dura_inters: jnp.ndarray   # (M, 2) closed subject∩object duration
    query_ids: jnp.ndarray     # (M,) originating query
    valid: jnp.ndarray         # (M,) bool


def construct_triplets(pred_logits, att, durations, scores, cat_ids,
                       traj_mask, topk: int, num_enti_cats: int,
                       num_pred_cats: int) -> Triplets:
    """Single-video triplet construction (vmap over a batch as needed).

    Args:
      pred_logits: (Q, C) predicate logits.
      att: (2, Q, N) soft adjacency (entity-softmax already masked).
      durations: (N, 2) closed per-tracklet durations.
      scores: (N,) tracklet confidence.
      cat_ids: (N,) tracklet categories.
      traj_mask: (N,) validity.
      topk: predicates kept per query.
    """
    q, c = pred_logits.shape
    n = durations.shape[0]
    m = q * topk

    probs = jnp.exp(pred_logits - jnp.max(pred_logits, -1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    # top_k instead of a full argsort over C; equal tie order (lowest index
    # first, like a stable sort of -probs)
    top_scores, top_cats = jax.lax.top_k(probs, topk)
    pred_scores = top_scores.reshape(m)
    pred_catids = top_cats.reshape(m).astype(jnp.int32)
    query_ids = jnp.repeat(jnp.arange(q, dtype=jnp.int32), topk)

    pred2so = jnp.argmax(att, axis=-1).T                      # (Q, 2)
    pred2so = jnp.repeat(pred2so, topk, axis=0)               # (M, 2)

    inters, overlap = dura_intersection(durations, durations)  # (N, N, ·)
    eye = jnp.eye(n, dtype=bool)
    pair_ok = overlap & ~eye
    pair_ok = pair_ok & traj_mask[:, None] & traj_mask[None, :]
    cand_ok = pair_ok[pred2so[:, 0], pred2so[:, 1]]           # (M,)

    so_cats = cat_ids[pred2so]                                 # (M, 2)
    quint = jnp.concatenate(
        [pred_catids[:, None], so_cats, pred2so], axis=-1).astype(jnp.int32)
    so_scores = scores[pred2so]                                # (M, 2)
    trip_scores = jnp.concatenate(
        [pred_scores[:, None], so_scores], axis=-1)            # (M, 3)

    keys = pack_rows(quint, [num_pred_cats, num_enti_cats, num_enti_cats,
                             n, n])
    keep = unique_max(keys, pred_scores, cand_ok)              # dedup by
    # max *predicate* score per quintuple (reference model_0v10.py:761)
    valid = keep & (quint[:, 0] != 0)

    dura_inters = inters[pred2so[:, 0], pred2so[:, 1]]         # (M, 2)
    return Triplets(quintuples=quint, scores=trip_scores,
                    dura_inters=dura_inters, query_ids=query_ids,
                    valid=valid)


def pairwise_construct_triplets(pred_logits, pair_ids, durations, scores,
                                cat_ids, traj_mask, topk: int,
                                num_enti_cats: int, num_pred_cats: int,
                                rt_topk: int = 0) -> Triplets:
    """Base-C variant: candidates are all ordered tracklet pairs.

    pred_logits: (NP, C) for NP = N*(N-1) ordered pairs; pair_ids: (NP, 2).
    Mirrors reference models/model_pairwise_baseline.py:314-395, including the
    optional mean-score top-k truncation (``rt_triplets_topk``).
    """
    np_, c = pred_logits.shape
    n = durations.shape[0]
    m = np_ * topk

    probs = jnp.exp(pred_logits - jnp.max(pred_logits, -1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    top_scores, order = jax.lax.top_k(probs, topk)
    pred_scores = top_scores.reshape(m)
    pred_catids = order.reshape(m).astype(jnp.int32)
    pred2so = jnp.repeat(pair_ids, topk, axis=0)               # (M, 2)

    inters, overlap = dura_intersection(durations, durations)
    eye = jnp.eye(n, dtype=bool)
    pair_ok = overlap & ~eye & traj_mask[:, None] & traj_mask[None, :]
    cand_ok = pair_ok[pred2so[:, 0], pred2so[:, 1]]

    so_cats = cat_ids[pred2so]
    quint = jnp.concatenate(
        [pred_catids[:, None], so_cats, pred2so], axis=-1).astype(jnp.int32)
    so_scores = scores[pred2so]
    trip_scores = jnp.concatenate([pred_scores[:, None], so_scores], axis=-1)

    keys = pack_rows(quint, [num_pred_cats, num_enti_cats, num_enti_cats,
                             n, n])
    keep = unique_max(keys, pred_scores, cand_ok)
    valid = keep & (quint[:, 0] != 0)

    if rt_topk and rt_topk > 0:
        mean_score = jnp.where(valid, trip_scores.mean(-1), -jnp.inf)
        order = jnp.argsort(-mean_score)
        rank = jnp.zeros((m,), jnp.int32).at[order].set(
            jnp.arange(m, dtype=jnp.int32))
        valid = valid & (rank < rt_topk)

    dura_inters = inters[pred2so[:, 0], pred2so[:, 1]]
    query_ids = jnp.arange(m, dtype=jnp.int32) // topk
    return Triplets(quintuples=quint, scores=trip_scores,
                    dura_inters=dura_inters, query_ids=query_ids,
                    valid=valid)
