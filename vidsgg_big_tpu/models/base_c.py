"""Base-C: the non-query pairwise relation baseline.

Rebuilds the reference ``Base_C`` (reference
models/model_pairwise_baseline.py:8-396): a shared tracklet encoder (no
transformer), then for every ordered tracklet pair a classeme+feature concat
MLP plus the frequency-bias matrix.  Fixed shape: all N*(N-1) ordered pairs
of the bucket are computed with a pair-validity mask.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.types import TrackletBatch, GraphBatch
from ..ops.boxes import viou_matrix_grid
from .big_c import TrackletEncoder
from .layers import MLP, xavier_normal


@dataclasses.dataclass(frozen=True)
class BaseCConfig:
    num_pred_cats: int
    num_enti_cats: int
    dim_feat: int
    dim_clsme: int = 300
    dim_enti: int = 512
    dim_ffn: int = 512
    enco_pool_len: int = 4
    use_clsme: bool = True
    use_name_emb: bool = False     # True -> EntiNameEmb lookup
    rt_triplets_topk: int = 0
    positive_viou_th: float = 0.5
    compute_dtype: str = "float32"   # lowers the tracklet-encoder matmuls

    @classmethod
    def from_dict(cls, d: dict):
        return cls(
            num_pred_cats=d["num_pred_cats"],
            num_enti_cats=d["num_enti_cats"], dim_feat=d["dim_feat"],
            dim_clsme=d.get("dim_clsme", 300), dim_enti=d["dim_enti"],
            dim_ffn=d["dim_ffn"], enco_pool_len=d["enco_pool_len"],
            use_clsme=d.get("use_clsme", True),
            use_name_emb=d.get("EntiNameEmb_path") is not None,
            rt_triplets_topk=d.get("rt_triplets_topk", 0),
            positive_viou_th=d.get("positive_vIoU_th", 0.5),
            compute_dtype=d.get("compute_dtype", "float32"))


def ordered_pair_ids(n: int) -> np.ndarray:
    """All ordered (i, j), i != j — reference pairwise_baseline.py:104-111."""
    ids = [(i, j) for i in range(n) for j in range(n) if i != j]
    return np.asarray(ids, np.int32)


class BaseC(nn.Module):
    cfg: BaseCConfig
    enti_name_emb: Optional[np.ndarray] = None

    def load_tables(self, params, bias_matrix: np.ndarray):
        """Overwrite the trainable bias_matrix with a precomputed prior
        (same contract as BigC.load_tables)."""
        from .big_c import load_bias_matrix
        return load_bias_matrix(params, bias_matrix)

    @nn.compact
    def __call__(self, batch: TrackletBatch, deterministic: bool = True):
        """Returns dict with pred_logits (B, NP, C), pair_ids (NP, 2),
        pair_mask (B, NP), enti_feat (B, N, E)."""
        cfg = self.cfg
        consumed = cfg.dim_clsme if (cfg.use_clsme and
                                     not cfg.use_name_emb) else 0
        # same width contract as BigC: exact when the classeme tail is
        # consumed, tolerant of unread tail channels otherwise (the VidOR
        # loaders always concatenate the 300-d classeme)
        if consumed:
            assert batch.feats.shape[-1] == cfg.dim_feat + consumed, (
                batch.feats.shape[-1], cfg.dim_feat, consumed)
        else:
            assert batch.feats.shape[-1] >= cfg.dim_feat, (
                batch.feats.shape[-1], cfg.dim_feat)
        enti2enco, extra = TrackletEncoder(
            cfg.dim_enti, cfg.dim_feat, cfg.enco_pool_len,
            kernel_init=xavier_normal, compute_dtype=cfg.compute_dtype,
            name="tracklet_encoder")(batch)
        b, n = enti2enco.shape[:2]
        pair_ids = jnp.asarray(ordered_pair_ids(n))            # (NP, 2)
        pair_mask = (jnp.take(batch.traj_mask, pair_ids[:, 0], axis=-1) &
                     jnp.take(batch.traj_mask, pair_ids[:, 1], axis=-1))

        so_cats = jnp.take_along_axis(
            batch.cat_ids[:, None, :],
            jnp.broadcast_to(pair_ids.T[None], (b, 2, pair_ids.shape[0])),
            axis=-1)                                            # (B, 2, NP)
        bias_matrix = self.param(
            "bias_matrix", nn.initializers.zeros,
            (cfg.num_enti_cats, cfg.num_enti_cats, cfg.num_pred_cats))
        pred_bias = bias_matrix[so_cats[:, 0], so_cats[:, 1]]   # (B, NP, C)

        sub_feat = enti2enco[:, pair_ids[:, 0]]                 # (B, NP, E)
        obj_feat = enti2enco[:, pair_ids[:, 1]]
        parts = []
        if cfg.use_clsme:
            if cfg.use_name_emb:
                emb = jnp.asarray(self.enti_name_emb)
                sub_clsme = emb[so_cats[:, 0]]
                obj_clsme = emb[so_cats[:, 1]]
            else:
                from ..ops.segments import stretch_weighted_mean
                from .big_c import dequantize_extra
                lengths = (batch.durations[..., 1]
                           - batch.durations[..., 0] + 1)
                # int8 feature storage: same dequant guard as BigC
                # (big_c.py dequantize_extra) — without it the classeme
                # channels stay unscaled int8.
                extra = dequantize_extra(extra, batch.feat_scale)
                clsme_avg = stretch_weighted_mean(extra, lengths)
                sub_clsme = clsme_avg[:, pair_ids[:, 0]]
                obj_clsme = clsme_avg[:, pair_ids[:, 1]]
            parts += [sub_clsme, obj_clsme]
        parts += [sub_feat, obj_feat]
        combined = jnp.concatenate(parts, axis=-1)
        logits = MLP((cfg.dim_ffn, cfg.num_pred_cats), final_relu=False,
                     kernel_init=xavier_normal,
                     name="fc_pred2logits")(combined)
        return {
            "pred_logits": logits + pred_bias,
            "pair_ids": pair_ids,
            "pair_mask": pair_mask,
            "enti_feat": enti2enco,
        }


def basec_label_assignment(props: TrackletBatch, gts: GraphBatch,
                           positive_viou_th: float, t_abs: int = 1024):
    """Vectorized replacement for the reference's ~1.5 h label pre-assignment
    (reference tools/train_vidor.py:80-170).

    For every ordered proposal pair (i, j) and GT predicate p with subject
    gs / object go: the pair gets label pred_cat[p] iff vIoU(i, gs) > th and
    vIoU(j, go) > th.

    Returns:
      multihot: (B, N, N, C) float32 (diagonal zeroed).
      pair_pos: (B, N, N) bool — pairs with at least one positive label
                (the reference trains only on these).
    """
    viou = jax.vmap(lambda *a: viou_matrix_grid(*a, t_abs=t_abs))(
        props.boxes, props.durations, gts.traj_boxes, gts.traj_durations,
        props.traj_mask, gts.traj_mask)                        # (B, N, G)
    hits = viou > positive_viou_th                             # (B, N, G)

    pred2so = jnp.argmax(gts.adj, axis=-1)                     # (B, 2, P)
    gather = lambda r: jnp.take_along_axis(
        hits, pred2so[:, r, None, :], axis=-1)                 # (B, N, P)
    hit_s = gather(0) & gts.pred_mask[:, None, :]              # (B, N, P)
    hit_o = gather(1) & gts.pred_mask[:, None, :]
    return hits, hit_s, hit_o


def basec_multihot(props: TrackletBatch, gts: GraphBatch,
                   num_pred_cats: int, positive_viou_th: float,
                   t_abs: int = 1024):
    _, hit_s, hit_o = basec_label_assignment(props, gts, positive_viou_th,
                                             t_abs=t_abs)
    onehot = jax.nn.one_hot(gts.pred_cats, num_pred_cats)      # (B, P, C)
    onehot = onehot * gts.pred_mask[..., None]
    multihot = jnp.einsum("bip,bjp,bpc->bijc", hit_s.astype(jnp.float32),
                          hit_o.astype(jnp.float32), onehot)
    multihot = (multihot > 0).astype(jnp.float32)
    n = multihot.shape[1]
    eye = jnp.eye(n, dtype=bool)
    multihot = jnp.where(eye[None, :, :, None], 0.0, multihot)
    pair_pos = multihot.any(-1)
    pair_pos = pair_pos & props.traj_mask[:, :, None] & \
        props.traj_mask[:, None, :]
    return multihot, pair_pos


def basec_train_loss(outputs, props: TrackletBatch, gts: GraphBatch,
                     cfg: BaseCConfig, t_abs: int = 1024):
    """Multi-label BCE over positive pairs only (reference
    pairwise_baseline.py:276-310 with the positive-pair label maps).
    ``t_abs`` must cover the dataset video-length bound (VidOR: 4096)."""
    multihot, pair_pos = basec_multihot(
        props, gts, cfg.num_pred_cats, cfg.positive_viou_th, t_abs=t_abs)
    logits = outputs["pred_logits"]                            # (B, NP, C)
    pair_ids = outputs["pair_ids"]
    labels = multihot[:, pair_ids[:, 0], pair_ids[:, 1]]       # (B, NP, C)
    pos = pair_pos[:, pair_ids[:, 0], pair_ids[:, 1]]          # (B, NP)
    bce = jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    w = pos[..., None].astype(jnp.float32)
    denom = jnp.maximum(w.sum() * logits.shape[-1], 1.0)
    cls = (bce * w).sum() / denom
    return cls, {"cls": cls}
