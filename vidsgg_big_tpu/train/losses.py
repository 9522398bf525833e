"""BIG-C training losses: vIoU target alignment, bipartite matching, CE/BCE.

All functions are batched, masked, jit-safe replacements for the reference's
per-video python loops:
  * proposal<->GT-trajectory alignment: reference models/model_0v10.py:559-604
  * Hungarian cost + matching:          reference models/model_0v10.py:606-639
  * classification + adjacency loss:    reference models/model_0v10.py:642-704
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.types import TrackletBatch, GraphBatch
from ..ops.boxes import viou_matrix_grid
from ..ops.matching import hungarian

_EPS = 1e-7


def _bce(p, target):
    p = jnp.clip(p, _EPS, 1.0 - _EPS)
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))


def align_gt_adjacency(props: TrackletBatch, gts: GraphBatch,
                       positive_viou_th: float, t_abs: int = 1024):
    """Map GT adjacency columns from GT trajectories onto proposals.

    For every proposal, find GT trajectories with vIoU above threshold (after
    the "every GT trajectory gets at least its best proposal" rescue), then
    copy the adjacency column of its best-vIoU GT (reference
    model_0v10.py:583-602, including the quirk that the copied column is the
    raw-vIoU argmax, not the masked one).

    Returns:
      aligned: (B, 2, P, N) adjacency over proposals.
      viou: (B, N, G).
    """
    viou = jax.vmap(lambda *a: viou_matrix_grid(*a, t_abs=t_abs))(
        props.boxes, props.durations, gts.traj_boxes, gts.traj_durations,
        props.traj_mask, gts.traj_mask)                      # (B, N, G)

    mask = viou > positive_viou_th                           # (B, N, G)
    # rescue: each valid GT trajectory with no positive proposal claims its
    # argmax-vIoU proposal
    best_prop = jnp.argmax(viou, axis=1)                     # (B, G)
    need = (mask.sum(axis=1) == 0) & gts.traj_mask           # (B, G)
    n = viou.shape[1]
    rescue = (jax.nn.one_hot(best_prop, n, dtype=bool).swapaxes(1, 2)
              & need[:, None, :])
    mask = mask | rescue

    has_any = mask.any(axis=-1) & props.traj_mask            # (B, N)
    gsel = jnp.argmax(viou, axis=-1)                         # (B, N)
    # aligned[:, :, :, n] = adj[:, :, :, gsel[n]] if has_any[n] else 0
    aligned = jnp.take_along_axis(
        gts.adj, gsel[:, None, None, :], axis=-1)            # (B, 2, P, N)
    aligned = aligned * has_any[:, None, None, :]
    return aligned, viou


def matching_cost(pred_logits, att, gts: GraphBatch, aligned_adj, traj_mask,
                  cost_coeff_cls: float, cost_coeff_adj: float):
    """Per-(query, gt) assignment cost (B, Q, P)."""
    logp = jax.nn.log_softmax(pred_logits, axis=-1)          # (B, Q, C)
    cost_cls = -jnp.take_along_axis(
        logp[:, :, None, :],
        gts.pred_cats[:, None, :, None].astype(jnp.int32),
        axis=-1)[..., 0]                                      # (B, Q, P)

    # masked-mean BCE between att (B,2,Q,N) and aligned adj (B,2,P,N)
    bce = _bce(att[:, :, :, None, :], aligned_adj[:, :, None, :, :])
    bce = bce * traj_mask[:, None, None, None, :]
    n_valid = jnp.maximum(traj_mask.sum(-1), 1)              # (B,)
    cost_adj = bce.sum(axis=(1, -1)) / (2.0 * n_valid[:, None, None])

    return cost_coeff_cls * cost_cls + cost_coeff_adj * cost_adj


def bigc_losses(pred_logits, att, gts: GraphBatch, aligned_adj, traj_mask,
                query4gt, num_querys: int, neg_weight: float,
                loss_coeff_cls: float, loss_coeff_adj: float):
    """Classification (pos/neg CE) + weighted adjacency BCE.

    Args:
      query4gt: (B, P) assigned query per gt (-1 = unmatched/padding).

    Reference semantics (model_0v10.py:642-704): CE over *all* queries with
    background target for unmatched queries, positive/negative means taken
    over the whole batch; BCE only on matched (query, gt) adjacency rows with
    ``neg_weight`` on zero targets, mean over batch x roles x entities.
    """
    b, q, c = pred_logits.shape
    matched = query4gt >= 0                                  # (B, P)
    qidx = jnp.clip(query4gt, 0)

    # scatter gt cats onto their assigned queries; unmatched/padding gts are
    # routed to an overflow slot (index q) so they can never collide with a
    # real match at query 0 (matched queries are distinct by construction)
    qsafe = jnp.where(matched, query4gt, q)
    upd = jnp.where(matched, gts.pred_cats.astype(jnp.int32), 0)
    tgt = jax.vmap(
        lambda qq, u: jnp.zeros((q + 1,), jnp.int32).at[qq].set(u))(
            qsafe, upd)[:, :q]

    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]  # (B, Q)
    # fully-masked batch slots (remainder-padding repeats from the bucketer)
    # contribute no queries to either CE mean
    video_valid = traj_mask.any(-1)                          # (B,)
    pos = tgt != 0
    neg = (~pos) & video_valid[:, None]
    n_pos = jnp.maximum(pos.sum(), 1)
    n_neg = jnp.maximum(neg.sum(), 1)
    cls_pos = (ce * pos).sum() / n_pos
    cls_neg = (ce * neg).sum() / n_neg

    # adjacency BCE on matched pairs
    att_m = jnp.take_along_axis(
        att, qidx[:, None, :, None], axis=2)                  # (B, 2, P, N)
    bce = _bce(att_m, aligned_adj)
    w = jnp.where(aligned_adj > 0.5, 1.0, neg_weight)
    sel = (matched[:, None, :, None] & traj_mask[:, None, None, :]).astype(
        bce.dtype)
    # reference means over every (role, matched gt, valid entity) element
    elem = jnp.maximum((sel * jnp.ones_like(bce)).sum(), 1.0)
    adj_loss = (bce * w * sel).sum() / elem

    loss_dict = {
        "cls_pos": loss_coeff_cls * cls_pos,
        "cls_neg": loss_coeff_cls * cls_neg,
        "adj": loss_coeff_adj * adj_loss,
    }
    total = sum(loss_dict.values())
    return total, loss_dict


def bigc_train_loss(outputs, props: TrackletBatch, gts: GraphBatch, cfg,
                    t_abs: int = 1024):
    """Full training loss from model outputs (cfg: BigCConfig).

    ``t_abs`` must cover the video-length bound of the dataset (vIoU grid
    anchoring, ops/boxes.viou_matrix_grid): VidOR trains on videos up to
    2700 frames, so its driver passes 4096; the 1024 default covers
    VidVRD."""
    aligned, _ = align_gt_adjacency(props, gts, cfg.positive_viou_th,
                                    t_abs=t_abs)
    cost = matching_cost(
        outputs["pred_logits"], outputs["att"], gts, aligned,
        props.traj_mask, cfg.cost_coeff_cls, cfg.cost_coeff_adj)
    n_gt = gts.pred_mask.sum(-1).astype(jnp.int32)
    query4gt = jax.lax.stop_gradient(hungarian(cost, n_gt))
    return bigc_losses(
        outputs["pred_logits"], outputs["att"], gts, aligned,
        props.traj_mask, query4gt, cfg.num_querys, cfg.neg_weight,
        cfg.loss_coeff_cls, cfg.loss_coeff_adj)
