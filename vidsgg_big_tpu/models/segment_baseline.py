"""Segment-proposal relation baseline (MM'17 "VidVRD" baseline), TPU-native.

Rebuilds the vendored legacy baseline model (reference
VidVRD-helper/baseline/model.py:25-286): per 30-frame segment, each ordered
pair of object-trajectory proposals carries a handcrafted relation feature
[sub classeme | obj classeme | 8 x BoW motion blocks | 3 x relative-position
blocks]; a single linear layer predicts predicate scores; the triplet
posterior is softmax over the *observed training triplets* of
``s_prob * p_score * o_prob``; test-time keeps the top-k (sub, pred, obj)
products per pair and the top ``seg_topk`` predictions per segment, which the
greedy association stage (evaluation/association.py) links into video-level
relations.

TPU-first rewrites vs the reference:
  * the per-pair python loop over argsorts (reference model.py:266-278) is a
    batched ``lax.top_k`` cube — one jit call per segment bucket;
  * training is a jitted CE step over a fixed-size padded batch instead of a
    Keras ``train_on_batch`` of ragged samples;
  * the observed-triplet "SelectionLayer" gather (reference model.py:168-183)
    is a fixed (3, R) integer gather under jit.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SegmentBaselineConfig:
    feature_dim: int = 11070      # 70 classeme + 8x1000 BoW + 3x1000 relpos
    num_obj_cats: int = 35        # no-background id space (helper dataset)
    num_pred_cats: int = 132
    block_size: int = 1000        # BoW block width (paper feature: 1000)
    num_motion_blocks: int = 8    # l1-normalized blocks after the classemes
    pair_topk: int = 20
    seg_topk: int = 200
    learning_rate: float = 0.001

    @property
    def classeme_dim(self) -> int:
        return 2 * self.num_obj_cats

    @classmethod
    def from_dict(cls, d: dict):
        return cls(**{k: d[k] for k in (
            "feature_dim", "num_obj_cats", "num_pred_cats", "block_size",
            "num_motion_blocks", "pair_topk", "seg_topk", "learning_rate")
            if k in d})


def feature_preprocess(feats: np.ndarray, cfg: SegmentBaselineConfig):
    """L1-normalize the Bag-of-Words motion blocks (reference model.py:25-49).

    Blocks of width ``block_size`` starting after the two classemes are
    normalized to fractions; classeme and relative-position channels pass
    through.  Zero-sum blocks divide by 1 (keras np_utils.normalize
    convention).
    """
    feats = np.array(feats, np.float32, copy=True)
    start = cfg.classeme_dim
    for i in range(cfg.num_motion_blocks):
        lo = start + i * cfg.block_size
        block = feats[:, lo: lo + cfg.block_size]
        norm = np.abs(block).sum(-1, keepdims=True)
        norm[norm == 0] = 1.0
        feats[:, lo: lo + cfg.block_size] = block / norm
    return feats


class SegmentBaseline(nn.Module):
    """Linear predicate head (reference model.py:186-201 ``build_model``)."""
    cfg: SegmentBaselineConfig

    @nn.compact
    def __call__(self, feats):
        # keras Dense default: glorot_uniform kernel, zero bias
        return nn.Dense(self.cfg.num_pred_cats,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="pred_fc")(feats)


def triplet_log_softmax(p_scores, prob_s, prob_o, triplet_ids):
    """Log-softmax over observed training triplets of s*p*o.

    Reference model.py:168-196: ``SelectionLayer`` gathers the subject prob,
    predicate score, and object prob of every observed triplet and multiplies
    them; training softmaxes over that R-way product.

    Args:
      p_scores: (B, num_pred_cats) raw predicate scores.
      prob_s/prob_o: (B, num_obj_cats) classeme probabilities.
      triplet_ids: (R, 3) int (s_cid, pid, o_cid) of observed triplets.
    Returns (B, R) log-probabilities.
    """
    r = (prob_s[:, triplet_ids[:, 0]] * p_scores[:, triplet_ids[:, 1]] *
         prob_o[:, triplet_ids[:, 2]])
    return jax.nn.log_softmax(r, axis=-1)


def baseline_loss(params, model, feats, labels, valid, triplet_ids):
    """Categorical cross-entropy over observed triplets (reference
    model.py:218-226), masked for padded rows."""
    cfg = model.cfg
    p = model.apply(params, feats)
    prob_s = feats[:, :cfg.num_obj_cats]
    prob_o = feats[:, cfg.num_obj_cats: 2 * cfg.num_obj_cats]
    logp = triplet_log_softmax(p, prob_s, prob_o, triplet_ids)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = valid.astype(jnp.float32)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


def build_baseline_train_step(model: "SegmentBaseline", tx):
    """Jitted (state, feats, labels, valid, triplet_ids) -> (state, loss)."""

    @jax.jit
    def step(params, opt_state, feats, labels, valid, triplet_ids):
        loss, grads = jax.value_and_grad(baseline_loss)(
            params, model, feats, labels, valid, triplet_ids)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step


def predict_segment_pairs(params, model: "SegmentBaseline", feats,
                          valid) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top ``seg_topk`` short-term relation predictions for one segment.

    Vectorized form of reference model.py:259-280: for each pair, the top
    ``pair_topk`` subject/predicate/object scores form a k^3 product cube
    whose top ``pair_topk`` entries survive; all pairs' candidates are then
    globally cut to ``seg_topk`` by score.

    Args:
      feats: (P, D) preprocessed pair features (padded rows allowed).
      valid: (P,) bool row validity.
    Returns:
      scores: (seg_topk,) float; -inf on padding.
      sto: (seg_topk, 4) int columns (s_cid, pid, o_cid, pair_row).
    """
    cfg = model.cfg
    k = min(cfg.pair_topk, cfg.num_obj_cats, cfg.num_pred_cats)
    p = model.apply(params, feats)                       # (P, R_pred)
    s = feats[:, :cfg.num_obj_cats]
    o = feats[:, cfg.num_obj_cats: 2 * cfg.num_obj_cats]
    ts, is_ = jax.lax.top_k(s, k)                        # (P, k)
    tp, ip = jax.lax.top_k(p, k)
    to, io = jax.lax.top_k(o, k)
    cube = (ts[:, :, None, None] * tp[:, None, :, None] *
            to[:, None, None, :]).reshape(-1, k * k * k)  # (P, k^3)
    top_sc, flat = jax.lax.top_k(cube, k)                # (P, k)
    si, rem = flat // (k * k), flat % (k * k)
    pi, oi = rem // k, rem % k
    s_cid = jnp.take_along_axis(is_, si, axis=-1)        # (P, k)
    p_cid = jnp.take_along_axis(ip, pi, axis=-1)
    o_cid = jnp.take_along_axis(io, oi, axis=-1)
    pair_row = jnp.broadcast_to(
        jnp.arange(feats.shape[0])[:, None], top_sc.shape)

    top_sc = jnp.where(valid[:, None], top_sc, -jnp.inf)
    n_out = min(cfg.seg_topk, top_sc.size)
    flat_sc, order = jax.lax.top_k(top_sc.reshape(-1), n_out)
    gather = lambda x: x.reshape(-1)[order]
    sto = jnp.stack([gather(s_cid), gather(p_cid), gather(o_cid),
                     gather(pair_row)], axis=-1)
    return flat_sc, sto


def predictions_to_host(scores, sto, pairs) -> list:
    """Convert one segment's device predictions into association-stage tuples
    ``(score, (s_cid, pid, o_cid), (s_traj_idx, o_traj_idx))``."""
    scores = np.asarray(scores)
    sto = np.asarray(sto)
    out = []
    for sc, (s_cid, pid, o_cid, row) in zip(scores, sto):
        if not np.isfinite(sc):
            continue
        t1, t2 = pairs[int(row)]
        out.append((float(sc), (int(s_cid), int(pid), int(o_cid)),
                    (int(t1), int(t2))))
    return out


def sample_positive_pairs(pairs: np.ndarray, iou: np.ndarray,
                          trackid: np.ndarray, gt_insts: list,
                          rng: np.random.Generator, sample_num: int,
                          triplet_index: dict, iou_thres: float = 0.5
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Sample positive (pair_row, triplet_label) training examples.

    Reference model.py:142-165 (``_data_sampling``): a proposal pair is a
    positive for GT relation (tid1, tid2, s, p, o) when both proposals have
    IoU >= ``iou_thres`` with the respective GT trajectories.

    Args:
      pairs: (P, 2) proposal-index pairs.
      iou: (n_traj, n_traj) segment trajectory IoU (proposals + GT columns).
      trackid: (n_traj,) GT track ids (-1 = proposal).
      gt_insts: list of (tid1, tid2, s_cid, pid, o_cid) for this segment.
      triplet_index: (s, p, o) -> observed-triplet label id.
    """
    pair_to_row = {(int(a), int(b)): i for i, (a, b) in enumerate(pairs)}
    tid_to_ind = {int(t): i for i, t in enumerate(trackid) if t >= 0}
    pos = []
    for tid1, tid2, s, p, o in gt_insts:
        if tid1 not in tid_to_ind or tid2 not in tid_to_ind:
            continue
        key = (s, p, o)
        if key not in triplet_index:
            continue
        inds1 = np.where(iou[:, tid_to_ind[tid1]] >= iou_thres)[0]
        inds2 = np.where(iou[:, tid_to_ind[tid2]] >= iou_thres)[0]
        for t1 in inds1:
            for t2 in inds2:
                if t1 != t2 and (int(t1), int(t2)) in pair_to_row:
                    pos.append((pair_to_row[(int(t1), int(t2))],
                                triplet_index[key]))
    if not pos:
        return (np.zeros((0,), np.int64), np.zeros((0,), np.int64))
    pos = np.asarray(pos, np.int64)
    take = min(len(pos), sample_num)
    sel = rng.choice(len(pos), take, replace=False)
    return pos[sel, 0], pos[sel, 1]
