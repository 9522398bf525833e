"""BIG-C: the predicate-query classification model, TPU-native.

Rebuilds the capabilities of the reference's BIG-C family
(reference models/model_0v10.py:239-786 — the "vidvrd"/i3d variant — and
models/model_0v7.py — the "vidor"/classeme variant) as one batched, masked,
fixed-shape flax module.  One call processes a whole bucket of B videos:

  tracklet geometry+RoI features (B, N, T, ·)
    -> per-frame MLPs -> stride-2 temporal conv -> adaptive-max-pool to
       ``enco_pool_len`` -> per-tracklet node embedding (B, N, E)
    -> transformer encoder over the N tracklet tokens (masked)
    -> role-factored query decoder producing soft adjacency (B, 2, Q, N)
    -> prediction head (classeme/i3d gathers + frequency-bias logits)

Variant crossover note: the reference exports file 0v10 as ``BIG_C_vidvrd``
and file 0v7 as ``BIG_C_vidor`` (reference models/__init__.py:1-4); we keep
those public aliases via ``variant='v10'|'v7'``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ..data.types import TrackletBatch
from ..ops.segments import (stretch_conv_patches, adaptive_max_pool1d,
                            stretch_weighted_mean)
from .layers import (
    MLP, TransformerEncoderLayer, RoleAttnDecoderLayer, sine_pos_embedding,
    xavier_normal, xavier_uniform,
)


@dataclasses.dataclass(frozen=True)
class BigCConfig:
    num_pred_cats: int
    num_enti_cats: int
    dim_feat: int                 # RoI feature dim (2048 vidvrd / 1024 vidor)
    dim_clsme: int = 300
    dim_enti: int = 512
    dim_pred: int = 512
    dim_att: int = 512
    dim_ffn: int = 512
    dim_i3d: Optional[int] = None     # v10: extra I3D channels after dim_feat
    enco_pool_len: int = 4
    n_enco_layers: int = 2
    n_deco_layers: int = 6
    n_att_head: int = 8
    num_querys: int = 192
    dropout: float = 0.1
    variant: str = "v10"          # "v10" (learned pos-emb, linear head)
    #                               "v7" (sine pos-emb, MLP head, clsme switch)
    use_clsme: bool = True        # v7 only: include classeme in the head
    use_name_emb: bool = True     # v7: True -> EntiNameEmb lookup,
    #                               False -> per-frame soft classeme channels
    # training
    neg_weight: float = 0.1
    positive_viou_th: float = 0.5
    cost_coeff_cls: float = 1.0
    cost_coeff_adj: float = 30.0
    loss_coeff_cls: float = 1.0
    loss_coeff_adj: float = 30.0
    # compute dtype of the heavy per-frame encoder matmuls (params stay
    # float32; activations cast, accumulation in float32 by XLA default)
    compute_dtype: str = "float32"
    # route decoder role attention through the fused Pallas kernel (TPU
    # only; numerically equivalent — see ops/pallas_role_attn.py)
    use_pallas_attention: bool = False

    @property
    def clsme_in_feats(self) -> bool:
        """Whether per-frame classeme channels ride after dim_feat in feats."""
        return self.variant == "v7" and self.use_clsme and not self.use_name_emb

    @classmethod
    def from_dict(cls, d: dict, variant: str = "v10", **arrays):
        """Build from a reference-style ``model_config`` dict (same keys)."""
        return cls(
            num_pred_cats=d["num_pred_cats"],
            num_enti_cats=d["num_enti_cats"],
            dim_feat=d["dim_feat"], dim_clsme=d.get("dim_clsme", 300),
            dim_enti=d["dim_enti"], dim_pred=d["dim_pred"],
            dim_att=d["dim_att"], dim_ffn=d["dim_ffn"],
            dim_i3d=d.get("dim_i3d"),
            enco_pool_len=d["enco_pool_len"],
            n_enco_layers=d["n_enco_layers"],
            n_deco_layers=d["n_deco_layers"],
            n_att_head=d["n_att_head"], num_querys=d["num_querys"],
            variant=variant,
            use_clsme=d.get("use_clsme", True),
            use_name_emb=d.get("EntiNameEmb_path") is not None
            if variant == "v7" else True,
            neg_weight=d.get("neg_weight", 0.1),
            positive_viou_th=d.get("positive_vIoU_th", 0.5),
            cost_coeff_cls=d.get("cost_coeff_dict", {}).get("classification", 1.0),
            cost_coeff_adj=d.get("cost_coeff_dict", {}).get("adj_matrix", 30.0),
            loss_coeff_cls=d.get("loss_coeff_dict", {}).get("classification", 1.0),
            loss_coeff_adj=d.get("loss_coeff_dict", {}).get("adj_matrix", 30.0),
            compute_dtype=d.get("compute_dtype", "float32"),
        )


def dequantize_extra(extra, feat_scale):
    """Dequantize int8-stored aux feature channels with the per-video scale.

    No-op for float inputs.  Shared by BigC and BaseC so both tracklet-head
    paths honor ``--feat_dtype int8`` feature storage.
    """
    if extra.dtype != jnp.int8:
        return extra
    scale = feat_scale.reshape(
        feat_scale.shape + (1,) * (extra.ndim - feat_scale.ndim))
    return extra.astype(jnp.float32) * scale


def geometry_features(batch: TrackletBatch):
    """Per-frame 8-dim box geometry, stretched to the bucket length.

    Matches reference model_0v10.py:391-430: normalized center/size plus
    *forward* frame differences zero-padded at the trajectory's last frame,
    computed on raw frames and then repeat-stretched.
    """
    w = batch.video_wh[..., 0][..., None, None]
    h = batch.video_wh[..., 1][..., None, None]
    b = batch.boxes                                   # (..., N, T, 4)
    x1, y1, x2, y2 = b[..., 0] / w, b[..., 1] / h, b[..., 2] / w, b[..., 3] / h
    ctx, cty = (x2 + x1) / 2, (y2 + y1) / 2
    bw, bh = x2 - x1, y2 - y1
    vals = jnp.stack([ctx, cty, bw, bh], axis=-1)     # (..., N, T, 4)
    diffs = jnp.concatenate(
        [vals[..., 1:, :] - vals[..., :-1, :], jnp.zeros_like(vals[..., :1, :])],
        axis=-2)
    lengths = batch.durations[..., 1] - batch.durations[..., 0] + 1
    t = b.shape[-2]
    diff_ok = jnp.arange(t) < (lengths[..., None] - 1)
    diffs = diffs * diff_ok[..., None]
    geo = jnp.stack(
        [vals[..., 0], diffs[..., 0], vals[..., 1], diffs[..., 1],
         vals[..., 2], diffs[..., 2], vals[..., 3], diffs[..., 3]], axis=-1)
    return geo


class ConvAsMatmul(nn.Module):
    """k=3/s=2/p=1 temporal conv applied to pre-extracted patches.

    Parameters keep the flax ``nn.Conv`` layout ((k, C_in, F) kernel + (F,)
    bias) so checkpoints and torch transplants are unaffected; the apply is
    one (..., k*C_in) x (k*C_in, F) matmul.
    """
    features: int
    kernel_init: callable = xavier_normal

    @nn.compact
    def __call__(self, patches):
        kd = patches.shape[-1]
        k = 3
        c_in = kd // k
        kernel = self.param("kernel", self.kernel_init,
                            (k, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w = kernel.reshape(kd, self.features).astype(patches.dtype)
        return patches @ w + bias.astype(patches.dtype)


class TrackletEncoder(nn.Module):
    """Per-tracklet node embedding shared by BIG-C and Base-C.

    geometry + RoI MLPs -> stride-2 temporal conv -> adaptive max pool ->
    flatten -> MLP (reference model_0v10.py:289-309, 446-458).  Returns
    (enti2enco (B, N, E), extra (B, N, T, D_extra) stretched aux channels).

    ``compute_dtype`` lowers the per-frame matmuls (the FLOPs bulk of the
    whole model) to bfloat16 on the MXU; outputs are cast back to float32
    before the pooled node embedding.
    """
    dim_enti: int
    dim_feat: int
    enco_pool_len: int
    kernel_init: callable = xavier_normal
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, batch: TrackletBatch):
        # The repeat-stretch gather commutes with the per-frame MLPs (both are
        # rowwise), so we run the heavy matmuls on the *raw* frames and only
        # stretch their dim_enti-wide outputs — ~6x less gather traffic than
        # stretching the 2048+ wide inputs, with bit-identical results.
        geo = geometry_features(batch)                        # (B, N, T, 8)
        visual = batch.feats[..., :self.dim_feat]
        extra = batch.feats[..., self.dim_feat:]              # i3d or classeme

        cdt = jnp.dtype(self.compute_dtype)
        x_geo = MLP((self.dim_enti, self.dim_enti), kernel_init=self.kernel_init,
                    name="fc_bbox2enti")(geo.astype(cdt))
        if visual.dtype == jnp.int8:
            # int8 feature storage: first layer on the int8 MXU path with the
            # per-video dequant scale; later layers continue in bfloat16
            scale = batch.feat_scale.reshape(
                batch.feat_scale.shape + (1,) * (visual.ndim -
                                                 batch.feat_scale.ndim))
            x_vis = MLP((self.dim_enti, self.dim_enti),
                        kernel_init=self.kernel_init,
                        name="fc_feat2enti")(visual, input_scale=scale)
        else:
            x_vis = MLP((self.dim_enti, self.dim_enti),
                        kernel_init=self.kernel_init,
                        name="fc_feat2enti")(visual.astype(cdt))
        x = jnp.concatenate([x_geo, x_vis], axis=-1)          # (B, N, T, 2E)

        bsz, n, t, _ = x.shape
        idx = batch.stretch_idx.reshape(bsz * n, t)
        # fused stretch+conv: the repeat-stretch gather and the k3/s2 conv's
        # patch extraction compose into one exact one-hot selection matmul,
        # and the conv itself becomes a single (k*D -> E) matmul — no
        # stretched (N, T, D) intermediate, everything MXU-shaped
        patches = stretch_conv_patches(x.reshape(bsz * n, t, -1), idx)
        x = ConvAsMatmul(self.dim_enti, kernel_init=self.kernel_init,
                         name="conv_feat2enti")(patches)
        x = x.astype(jnp.float32)
        x = adaptive_max_pool1d(x, self.enco_pool_len, axis=-2)
        x = x.reshape(bsz, n, self.enco_pool_len * self.dim_enti)
        enti2enco = MLP((self.dim_enti, self.dim_enti),
                        kernel_init=self.kernel_init,
                        name="fc_enti2enco")(x)               # (B, N, E)
        return enti2enco, extra


class BigC(nn.Module):
    """Batched BIG-C forward.  Apply with a leading batch axis on the input."""
    cfg: BigCConfig
    # frozen (non-trainable) tables
    enti_name_emb: Optional[np.ndarray] = None   # (num_enti_cats, dim_clsme)
    # v7 frozen query pos-embedding override.  Reference quirk: model_0v7
    # builds a sine table but its _reset_parameters xavier-uniform-overwrites
    # it (pos_embedding is missing from the skip list, model_0v7.py:345-358),
    # so every trained v7 checkpoint carries a *random* frozen table — weight
    # transplant must load it.  Fresh training defaults to the (intended)
    # sine table.
    pos_emb_table: Optional[np.ndarray] = None   # (num_querys, dim_pred)

    @property
    def kinit(self):
        return xavier_uniform if self.cfg.variant == "v7" else xavier_normal

    @nn.compact
    def __call__(self, batch: TrackletBatch, deterministic: bool = True):
        """Returns dict with pred_queries (B,Q,Dp), pred_logits (B,Q,C),
        att (B,2,Q,N), enti_feat (B,N,E)."""
        cfg = self.cfg
        consumed = (cfg.dim_i3d or 0) + (
            cfg.dim_clsme if cfg.clsme_in_feats else 0)
        expect = cfg.dim_feat + consumed
        if consumed:
            # paths that consume the tail (v10 i3d, v7 classeme) ship at
            # exactly the on-disk width — keep the strict misconfig guard
            assert batch.feats.shape[-1] == expect, (
                f"feature dim {batch.feats.shape[-1]} != dim_feat"
                f"+dim_i3d/clsme = {expect}; check dataset fmt vs config")
        else:
            # no extras consumed: the reference slices [:, :, :dim_feat]
            # and ignores tail channels (reference model_0v7.py:441-447) —
            # VidOR files always carry the 300-d classeme concat, which the
            # exp4 head (use_clsme=False) never reads
            assert batch.feats.shape[-1] >= expect, (
                f"feature dim {batch.feats.shape[-1]} < dim_feat = "
                f"{expect}; check dataset fmt vs model config")
        if batch.feats.dtype == jnp.int8 and not deterministic:
            # int8 storage is an inference path (the quantized kernel has no
            # useful gradient); training dequantizes once up front
            scale = batch.feat_scale.reshape(
                batch.feat_scale.shape + (1,) * (batch.feats.ndim -
                                                 batch.feat_scale.ndim))
            batch = batch.replace(feats=batch.feats.astype(
                jnp.dtype(cfg.compute_dtype)) * scale.astype(
                    jnp.dtype(cfg.compute_dtype)))
        enti2enco, extra = TrackletEncoder(
            cfg.dim_enti, cfg.dim_feat, cfg.enco_pool_len,
            kernel_init=self.kinit, compute_dtype=cfg.compute_dtype,
            name="tracklet_encoder")(batch)
        bsz, n = enti2enco.shape[:2]

        out = enti2enco
        for i in range(cfg.n_enco_layers):
            out = TransformerEncoderLayer(
                cfg.dim_enti, cfg.n_att_head, cfg.dim_ffn, cfg.dropout,
                kernel_init=self.kinit, name=f"encoder{i}")(
                    out, key_mask=batch.traj_mask,
                    deterministic=deterministic)
        enco_output = out                                     # (B, N, E)

        q_init = self.param("pred_query_init",
                            nn.initializers.normal(0.1),
                            (cfg.num_querys, cfg.dim_pred))
        if cfg.variant == "v7":
            pos_emb = jnp.asarray(
                self.pos_emb_table if self.pos_emb_table is not None
                else sine_pos_embedding(cfg.num_querys, cfg.dim_pred))
        else:
            pos_emb = self.param("pos_embedding",
                                 nn.initializers.normal(0.1),
                                 (cfg.num_querys, cfg.dim_pred))

        pred_queries = jnp.broadcast_to(
            q_init[None], (bsz, cfg.num_querys, cfg.dim_pred))
        att = None
        for i in range(cfg.n_deco_layers):
            pred_queries, att = RoleAttnDecoderLayer(
                cfg.dim_pred, cfg.n_att_head, cfg.dim_enti, cfg.dim_att,
                cfg.dim_ffn, cfg.dropout, kernel_init=self.kinit,
                use_pallas=cfg.use_pallas_attention,
                name=f"decoder{i}")(
                    pred_queries, pos_emb, enco_output, batch.traj_mask,
                    deterministic=deterministic)

        # time-averaged auxiliary per-tracklet features for the head; the
        # reference averages over the *stretched* axis (model_0v10.py:470) —
        # equivalent to a repeat-counts-weighted mean over raw frames
        if cfg.dim_i3d or cfg.clsme_in_feats:
            lengths = batch.durations[..., 1] - batch.durations[..., 0] + 1
            extra = dequantize_extra(extra[..., :consumed], batch.feat_scale)
            extra_avg = stretch_weighted_mean(extra, lengths)  # (B, N, D_x)
        else:
            extra_avg = None

        pred_logits = self._prediction_head(
            pred_queries, att, batch.cat_ids, extra_avg, enti2enco)
        return {
            "pred_queries": pred_queries,
            "pred_logits": pred_logits,
            "att": att,
            "enti_feat": enti2enco,
        }

    def _prediction_head(self, pred_queries, att, cat_ids, extra_avg,
                         enti_feat):
        """Reference model_0v10.py:478-507 / model_0v7.py:483-511, batched."""
        cfg = self.cfg
        pred_soid = jnp.argmax(att, axis=-1)                  # (B, 2, Q)
        pred_socat = jnp.take_along_axis(
            cat_ids[:, None, :], pred_soid, axis=-1)          # (B, 2, Q)

        bias_matrix = self.param(
            "bias_matrix", nn.initializers.zeros,
            (cfg.num_enti_cats, cfg.num_enti_cats, cfg.num_pred_cats))
        pred_bias = bias_matrix[pred_socat[:, 0], pred_socat[:, 1]]  # (B,Q,C)

        gather_traj = lambda x, ids: jnp.take_along_axis(
            x, ids[..., None], axis=1)
        sub_feat = gather_traj(enti_feat, pred_soid[:, 0])    # (B, Q, E)
        obj_feat = gather_traj(enti_feat, pred_soid[:, 1])

        parts = [pred_queries]
        if cfg.dim_i3d:  # v10 + I3D: reference model_0v10.py:495-501
            fc_i3d = MLP((cfg.dim_enti,), kernel_init=self.kinit,
                         name="fc_i3d")
            sub_i3d = fc_i3d(gather_traj(extra_avg, pred_soid[:, 0]))
            obj_i3d = fc_i3d(gather_traj(extra_avg, pred_soid[:, 1]))
            name_emb = jnp.asarray(self.enti_name_emb)
            sub_clsme = name_emb[pred_socat[:, 0]]
            obj_clsme = name_emb[pred_socat[:, 1]]
            parts += [sub_i3d, obj_i3d, sub_feat, obj_feat,
                      sub_clsme, obj_clsme]
        elif cfg.variant == "v7" and not cfg.use_clsme:
            parts += [sub_feat, obj_feat]
        else:
            if cfg.clsme_in_feats:
                sub_clsme = gather_traj(extra_avg, pred_soid[:, 0])
                obj_clsme = gather_traj(extra_avg, pred_soid[:, 1])
            else:
                name_emb = jnp.asarray(self.enti_name_emb)
                sub_clsme = name_emb[pred_socat[:, 0]]
                obj_clsme = name_emb[pred_socat[:, 1]]
            parts += [sub_clsme, obj_clsme, sub_feat, obj_feat]
        combined = jnp.concatenate(parts, axis=-1)

        if cfg.variant == "v7":
            logits = MLP((cfg.dim_ffn, cfg.num_pred_cats), final_relu=False,
                         kernel_init=self.kinit, name="fc_pred2logits")(
                             combined)
        else:
            logits = nn.Dense(cfg.num_pred_cats, kernel_init=self.kinit,
                              name="fc_pred2logits")(combined)
        return logits + pred_bias

    def load_tables(self, params, bias_matrix: np.ndarray):
        """Overwrite the trainable bias_matrix with a precomputed prior."""
        return load_bias_matrix(params, bias_matrix)


def load_bias_matrix(params, bias_matrix):
    """Overwrite every ``bias_matrix`` leaf with the precomputed prior
    (shared by BigC/BaseC ``load_tables`` and the CLIs/exporter)."""
    import flax
    flat = flax.traverse_util.flatten_dict(params)
    for k in list(flat):
        if k[-1] == "bias_matrix":
            assert flat[k].shape == bias_matrix.shape
            flat[k] = jnp.asarray(bias_matrix)
    return flax.traverse_util.unflatten_dict(flat)
