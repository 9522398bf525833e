"""Multi-bin temporal grounding model (stage 2 of BIG).

Rebuilds the reference grounding network (class ``DEBUG``, reference
models/grd_model_v5.py:140-737 — QANet-style encoders + video/query
similarity fusion + per-bin FCOS-style heads) as a batched, masked flax
module.  Queries of one video are padded to a fixed ``Q`` and clips to a
fixed ``T``; clip validity is carried through attention softmaxes, pooling,
and every loss denominator.

Design deviation from the reference: instead of deduplicating GT queries and
re-expanding per-duplicate predictions (reference grd_model_v5.py:273,
391-442), every (possibly duplicated) query slot runs through the network —
duplicates produce identical activations to their group representative, and
the negative-bin / negative-query loss terms are restricted to group
representatives so the loss weighting matches the reference exactly.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.temporal import tiou, tiou_left_right
from ..ops.attention import (attn_chunked_stored, composed_qkvo,
                             attn_composed_flash)
from ..ops.pallas_attention import fused_composed_attention

kaiming = nn.initializers.he_normal()
# torch.nn.Linear default init: U(+-1/sqrt(fan_in)) — the reference leaves all
# its Linear layers (video_fc/query_fc/temp_fc/vq_fc/proj2sim/QANet fc) at
# this default; only the depthwise-separable convs are kaiming-initialized
# (reference grd_model_v5.py:47-51).  Matching it keeps init-time activation
# scales sane through the residual stacks and similarity products.
torch_linear = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                "uniform")
xavier_u = nn.initializers.xavier_uniform()


@dataclasses.dataclass(frozen=True)
class GroundingConfig:
    dim_feat: int = 1024          # I3D clip-feature dim
    dim_clsme: int = 300          # GloVe word-embedding dim
    dim_hidden: int = 128
    num_bins: int = 10
    num_pred_cats: int = 51
    num_enti_cats: int = 81
    dropout: float = 0.1
    loss_cls: float = 1.0
    loss_ctn: float = 1.0
    loss_reg: float = 1.0
    # compute dtype of the conv/attention stacks (the grounding stage is
    # HBM-bandwidth bound; bfloat16 roughly halves its traffic).  Params stay
    # float32; layernorms and softmaxes compute in float32.
    compute_dtype: str = "float32"
    # Attention lowering knobs, threaded into the three QANet encoders
    # (defaults exactly reproduce QANetEncoderLayer's hardcoded behavior;
    # see that class for what each controls).
    attn_dropout: float = 0.1
    attn_bytes_budget: int = 1 << 30
    fused_attention: bool = True
    fused_interpret: bool = False      # run the fused Pallas kernel in
    #                                    interpret mode (CPU testing only)
    # Opt-in (beyond the reference): down-scale the three heads' final conv
    # kernels at init.  At the reference's default init the head logits are
    # saturated (mean |regr logit| ≈ 34 measured on the torch reference
    # itself — the concat-of-products sim fusion amplifies activations;
    # docs/ROUND3.md), which stalls from-scratch regression learning until
    # the BCE losses have descaled the trunk.  Default False = reference-
    # faithful init; transplanted checkpoints are unaffected either way.
    stable_head_init: bool = False

    @classmethod
    def from_dict(cls, d: dict):
        lf = d.get("loss_factor", {})
        return cls(dim_feat=d["dim_feat"], dim_clsme=d["dim_clsme"],
                   dim_hidden=d["dim_hidden"], num_bins=d["num_bins"],
                   num_pred_cats=d.get("num_pred_cats", 51),
                   num_enti_cats=d.get("num_enti_cats", 81),
                   loss_cls=lf.get("classification", 1.0),
                   loss_ctn=lf.get("centerness", 1.0),
                   loss_reg=lf.get("regression", 1.0),
                   compute_dtype=d.get("compute_dtype", "float32"),
                   attn_dropout=d.get("attn_dropout", 0.1),
                   attn_bytes_budget=d.get("attn_bytes_budget", 1 << 30),
                   fused_attention=d.get("fused_attention", True),
                   fused_interpret=d.get("fused_interpret", False),
                   stable_head_init=d.get("stable_head_init", False))


def _dg_init(base, n_in_axes: int):
    """Wrap an initializer the way nn.DenseGeneral does: draw on the
    2-D (prod(in_axes), prod(out_axes)) shape, then reshape — so raw
    ``self.param`` declarations get bit-identical init to the DenseGeneral
    modules they replace (checkpoints are unaffected either way)."""
    def init(rng, shape, dtype=jnp.float32):
        flat = (int(np.prod(shape[:n_in_axes])),
                int(np.prod(shape[n_in_axes:])))
        return base(rng, flat, dtype).reshape(shape)
    return init


class _DenseGeneralParams(nn.Module):
    """{kernel, bias} container with nn.DenseGeneral's scope layout + init,
    for paths that need the raw projection kernels (ops/attention.py's
    head-composed lowering folds W_q W_k^T / W_v W_o into d-width
    composites before the contraction)."""
    kernel_shape: tuple
    bias_shape: tuple
    n_in_axes: int = 1
    kernel_init: callable = xavier_u

    @nn.compact
    def __call__(self):
        return (self.param("kernel", _dg_init(self.kernel_init,
                                              self.n_in_axes),
                           self.kernel_shape),
                self.param("bias", nn.initializers.zeros, self.bias_shape))


class _ConvParams(nn.Module):
    """Parameter container matching nn.Conv's {kernel, bias} scope layout."""
    kernel_shape: tuple
    bias_shape: tuple
    kernel_init: callable = kaiming

    @nn.compact
    def __call__(self):
        return (self.param("kernel", self.kernel_init, self.kernel_shape),
                self.param("bias", nn.initializers.zeros, self.bias_shape))


class DepthwiseSeparableConv(nn.Module):
    """Depthwise + pointwise 1-D conv over the last-but-one (time) axis.

    Reference grd_model_v5.py:36-56 (kaiming-normal weights, zero bias).
    Input/output: (B, T, C_in) -> (B, T, C_out).

    ``fuse_dense``: compose the two linear kernels into one dense (k, C_in,
    C_out) conv — same math (F[k,i,o] = dw[k,0,i]*pw[0,i,o], bias folded),
    measured 1.18x faster on TPU (MXU instead of the VPU-bound depthwise
    lowering; scripts/sepconv_experiment.py).  Engaged only in bfloat16
    compute (TPU dense convs multiply in bf16, so the f32 path keeps the
    exactly-reproducible separable lowering).
    """
    out_channels: int
    kernel_size: int
    dtype: Optional[jnp.dtype] = None
    fuse_dense: bool = True
    pw_kernel_init: callable = kaiming   # point-wise kernel init

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        k = self.kernel_size
        if self.fuse_dense and \
                jnp.dtype(self.dtype or x.dtype) == jnp.bfloat16:
            # params keep nn.Conv's exact scopes/names/shapes
            # (checkpoints and torch transplants are unaffected)
            dwk, dwb = _ConvParams((k, 1, c_in), (c_in,), name="depth_wise")()
            pwk, pwb = _ConvParams((1, c_in, self.out_channels),
                                   (self.out_channels,),
                                   kernel_init=self.pw_kernel_init,
                                   name="point_wise")()
            cdt = self.dtype or x.dtype
            full = (dwk[:, 0, :, None] * pwk[0][None]).astype(cdt)
            bias = (dwb @ pwk[0] + pwb).astype(cdt)
            dn = jax.lax.conv_dimension_numbers(
                x.shape, full.shape, ("NWC", "WIO", "NWC"))
            y = jax.lax.conv_general_dilated(
                x.astype(cdt), full, (1,), [(k // 2, k // 2)],
                dimension_numbers=dn)
            return y + bias
        x = nn.Conv(c_in, kernel_size=(k,), padding=[(k // 2, k // 2)],
                    feature_group_count=c_in, kernel_init=kaiming,
                    dtype=self.dtype, name="depth_wise")(x)
        x = nn.Conv(self.out_channels, kernel_size=(1,),
                    kernel_init=self.pw_kernel_init,
                    dtype=self.dtype, name="point_wise")(x)
        return x


def _sine_pos(t: int, d_model: int):
    i = np.arange(d_model)
    freqs = np.where(i % 2 == 0, 10000.0 ** (-i / d_model),
                     -(10000.0 ** ((1 - i) / d_model)))
    phases = np.where(i % 2 == 0, 0.0, np.pi / 2)
    pos = np.arange(t)[:, None].astype(np.float64)
    return jnp.asarray(np.sin(pos * freqs[None] + phases[None]),
                       jnp.float32)            # (T, D)


class QANetEncoderLayer(nn.Module):
    """QANet block: pos-enc -> convs(+res) -> self-attn(+res) -> fc(+res).

    Mirrors reference grd_model_v5.py:81-137 step for step, with a clip
    validity mask for the attention.  Input/output: (B, T, D).
    """
    d_model: int
    num_conv: int
    kernel_size: int
    dropout: float = 0.1
    attn_dropout: float = 0.1          # on the attention weights (ref :0.1)
    attn_bytes_budget: int = 1 << 30   # logits bigger than this never
    #                                    materialize (Pallas / chunking)
    fused_attention: bool = True       # custom fused head-composed Pallas
    #                                    kernel (ops/pallas_attention.py) on
    #                                    big TPU shapes, train + eval — the
    #                                    (BQ, h, T, T) tensor never touches
    #                                    HBM and dropout draws from the
    #                                    on-core PRNG; falls back to the
    #                                    chunked path off-TPU / at
    #                                    non-128-aligned shapes
    fused_interpret: bool = False      # run the fused kernel in Pallas
    #                                    interpret mode — engages it on CPU
    #                                    (tests: trajectory + transplant
    #                                    parity of the exact kernel math)
    flash_attention: bool = False      # head-composed stock Pallas flash
    #                                    kernel on big deterministic shapes —
    #                                    measured 2.7x SLOWER than chunked
    #                                    XLA at (BQ=1024, T=512): the stock
    #                                    kernel wants per-head K/V operands
    #                                    (8x broadcast of x) and its b*h grid
    #                                    is pathological here
    #                                    (scripts/attn_fwd_compare.py) — kept
    #                                    as an option, off by default
    dtype: Optional[jnp.dtype] = None  # compute dtype (norms/softmax in f32)

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        b, t, d = x.shape
        cdt = self.dtype or x.dtype
        x = x.astype(cdt)
        # layernorms compute in float32 regardless of the compute dtype
        ln = lambda nm: (lambda o: nn.LayerNorm(
            dtype=jnp.float32, name=nm)(o).astype(cdt))
        # Padded positions are re-zeroed after every sublayer (positional
        # encoding, conv residuals, norms, attention, fc) so that the valid
        # positions' receptive fields see a fixed zero boundary — outputs are
        # then invariant to the clip-bucket size.  At t == n_clips this is a
        # no-op, matching the unpadded reference exactly.
        z = ((lambda o: jnp.where(mask[:, :, None], o, 0.0))
             if mask is not None else (lambda o: o))
        out = z(x + _sine_pos(t, d)[None].astype(cdt))
        res = out
        out = z(ln("normb")(out))
        for i in range(self.num_conv):
            out = DepthwiseSeparableConv(d, self.kernel_size, dtype=cdt,
                                         name=f"conv{i}")(out)
            out = nn.relu(out)
            out = z(out + res)
            if (i + 1) % 2 == 0:
                p = self.dropout * (i + 1) / self.num_conv
                out = nn.Dropout(p)(out, deterministic=deterministic)
            res = out
            out = z(ln(f"norm{i}")(out))

        # self-attention over time
        h = 8
        hd = d // h
        # raw {kernel, bias} with nn.DenseGeneral's exact scopes + init: the
        # head-composed lowering below folds the kernels together before the
        # contraction, so it needs them unapplied (ops/attention.py)
        wq, bq = _DenseGeneralParams((d, h, hd), (h, hd), name="attn_q")()
        wk, bk = _DenseGeneralParams((d, h, hd), (h, hd), name="attn_k")()
        wv, bv = _DenseGeneralParams((d, h, hd), (h, hd), name="attn_v")()
        wo, bo = _DenseGeneralParams((h, hd, d), (d,), n_in_axes=2,
                                     kernel_init=torch_linear,
                                     name="attn_out")()
        proj = lambda w, bias: jnp.einsum(
            "btc,chd->bthd", out, w.astype(cdt)) + bias.astype(cdt)
        # Long clip sequences: the (B, h, T, T) attention tensor is the
        # grounding stage's memory/time bound.  Four lowerings:
        #   * direct XLA einsum (default; fastest at small shapes)
        #   * fused head-composed Pallas kernel (big TPU shapes, train +
        #     eval): logits factor through the d x d composites Wq Wk^T /
        #     Wv Wo so the contraction runs at d=128 (full MXU width), one
        #     (row, q-block) tile at a time entirely in VMEM — the attention
        #     tensor never reaches HBM, and dropout keep-masks come from the
        #     on-core PRNG (reseeded identically in the backward).  See
        #     ops/pallas_attention.py.
        #   * chunked stored-A (ops/attention.py attn_chunked_stored): when
        #     the materialized logits would exceed ~1 GB (e.g. the B x Q
        #     flattened combined encoder at Q=256, T=512), the batch axis is
        #     processed in lax.map blocks — identical numerics, bounded
        #     memory.  Each block's softmax output is stored (in the value
        #     dtype) through a custom VJP, so the backward recomputes
        #     nothing — replacing round-3's whole-block rematerialization
        #     (2.8x-forward backward, docs/ROUND3.md).
        #   * head-composed flash (deterministic only): per-head Wq Wk^T /
        #     Wv Wo fold into (d, d) composites so the contraction runs at
        #     d=128 instead of head_dim=16, exactly the shape the stock
        #     Pallas TPU flash kernel wants — no (B, h, T, T) tensor at all.
        #     (The round-2 Pallas postmortem was about head_dim-16 kernels;
        #     composition removes the tiny minor dim instead of tiling it.)
        attn_bytes = 4 * b * h * t * t
        chunk = b
        while chunk * h * t * t * 4 > self.attn_bytes_budget and \
                chunk % 2 == 0:
            chunk //= 2
        drop = (not deterministic) and self.attn_dropout > 0.0
        if chunk < b and attn_bytes > self.attn_bytes_budget:
            # Pallas constraints: 128-aligned seq blocks, d on lanes
            aligned = t % 128 == 0 and d % 128 == 0
            on_tpu = jax.default_backend() == "tpu"
            use_fused = self.fused_attention and aligned and \
                (on_tpu or self.fused_interpret)
            use_flash = (not drop) and self.flash_attention and aligned \
                and on_tpu
            m = mask if mask is not None else jnp.ones((b, t), bool)
            if use_fused:
                wqk, wb, wvo, cb = composed_qkvo(wq, bq, wk, wv, wo, bv, bo)
                rng = self.make_rng("dropout") if drop else None
                out = fused_composed_attention(
                    out, m, wqk, wb, wvo, cb, hd=hd,
                    dropout=self.attn_dropout if drop else 0.0, rng=rng,
                    interpret=self.fused_interpret)
            elif use_flash:
                wqk, wb, wvo, cb = composed_qkvo(wq, bq, wk, wv, wo, bv, bo)
                out = attn_composed_flash(out, m, wqk, wb, wvo, cb, hd=hd)
            else:
                qh, kh, vh = proj(wq, bq), proj(wk, bk), proj(wv, bv)
                rng = self.make_rng("dropout") if drop else None
                out = attn_chunked_stored(
                    qh, kh, vh, m, chunk=chunk,
                    dropout=self.attn_dropout if drop else 0.0, rng=rng)
                out = jnp.einsum("bqhd,hdc->bqc", out, wo.astype(cdt)) + \
                    bo.astype(cdt)
        else:
            qh, kh, vh = proj(wq, bq), proj(wk, bk), proj(wv, bv)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(
                jnp.float32) / np.sqrt(hd)
            if mask is not None:
                neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
                logits = jnp.where(mask[:, None, None, :], logits, neg)
            attn = nn.softmax(logits, axis=-1)
            if mask is not None:
                attn = jnp.where(mask[:, None, None, :], attn, 0.0)
            attn = nn.Dropout(self.attn_dropout)(attn,
                                                 deterministic=deterministic)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(vh.dtype), vh)
            out = jnp.einsum("bqhd,hdc->bqc", out, wo.astype(cdt)) + \
                bo.astype(cdt)
        out = z(out + res)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        res = out
        out = z(ln("norme")(out))
        out = nn.Dense(d, kernel_init=torch_linear, dtype=cdt,
                       name="fc")(out)
        out = nn.relu(out)
        out = z(out + res)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class ConvHead(nn.Module):
    """4x (dw-sep conv + relu) + final dw-sep conv (reference :182-193).

    Padded positions are re-zeroed between convs (see QANetEncoderLayer)."""
    d_model: int
    out_channels: int
    sigmoid: bool = False
    dtype: Optional[jnp.dtype] = None
    out_kernel_init: callable = kaiming

    @nn.compact
    def __call__(self, x, mask=None):
        cdt = self.dtype or x.dtype
        z = ((lambda o: jnp.where(mask[:, :, None], o, 0.0))
             if mask is not None else (lambda o: o))
        for i in range(4):
            x = z(nn.relu(DepthwiseSeparableConv(self.d_model, 3, dtype=cdt,
                                                 name=f"conv{i}")(x)))
        x = DepthwiseSeparableConv(self.out_channels, 3, dtype=cdt,
                                   pw_kernel_init=self.out_kernel_init,
                                   name="out")(x)
        x = x.astype(jnp.float32)       # heads feed losses/decoding in f32
        return nn.sigmoid(x) if self.sigmoid else x


class GroundingModel(nn.Module):
    """Batched grounding forward.

    Inputs (one video per batch row):
      video_feats: (B, T, dim_feat) I3D clip features (zero padded).
      clip_mask:   (B, T) validity.
      query_cats:  (B, Q, 3) int [sub_cat, pred_cat, obj_cat] ids; embedded
                   through *trainable* GloVe-initialized tables (the reference
                   trains EntiNameEmb/PredNameEmb, grd_model_v5.py:158-168).
      temporal:    (B, Q, 2) normalized subject∩object duration.
      query_mask:  (B, Q) validity.
    Returns regrs (B,Q,T,2,K), conf_logits (B,Q,T,K), cls_logits (B,Q,T,K).
    """
    cfg: GroundingConfig
    enti_emb_init: Optional[np.ndarray] = None   # (num_enti_cats, dim_clsme)
    pred_emb_init: Optional[np.ndarray] = None   # (num_pred_cats, dim_clsme)

    def _table(self, name, init_array, shape):
        if init_array is not None:
            arr = np.asarray(init_array, np.float32)
            assert arr.shape == shape, (name, arr.shape, shape)
            return self.param(name, lambda rng: jnp.asarray(arr))
        return self.param(name, nn.initializers.normal(0.02), shape)

    @nn.compact
    def __call__(self, video_feats, clip_mask, query_cats, temporal,
                 query_mask, deterministic=True):
        cfg = self.cfg
        cdt = jnp.dtype(cfg.compute_dtype)
        b, t, _ = video_feats.shape
        q = query_cats.shape[1]
        enti_emb = self._table("EntiNameEmb", self.enti_emb_init,
                               (cfg.num_enti_cats, cfg.dim_clsme))
        pred_emb = self._table("PredNameEmb", self.pred_emb_init,
                               (cfg.num_pred_cats, cfg.dim_clsme))
        words_emb = jnp.stack(
            [enti_emb[query_cats[..., 0]], pred_emb[query_cats[..., 1]],
             enti_emb[query_cats[..., 2]]], axis=2)           # (B, Q, 3, H)

        video = nn.Dense(cfg.dim_hidden, kernel_init=torch_linear, dtype=cdt,
                         name="video_fc")(video_feats)         # (B, T, H)
        words = nn.Dense(cfg.dim_hidden, kernel_init=torch_linear, dtype=cdt,
                         name="query_fc")(words_emb)           # (B, Q, 3, H)
        temp = nn.Dense(cfg.dim_hidden, kernel_init=torch_linear, dtype=cdt,
                        name="temp_fc")(temporal)              # (B, Q, H)
        query = words + temp[:, :, None, :]                    # (B, Q, 3, H)

        attn_kw = dict(attn_dropout=cfg.attn_dropout,
                       attn_bytes_budget=cfg.attn_bytes_budget,
                       fused_attention=cfg.fused_attention,
                       fused_interpret=cfg.fused_interpret)
        video = QANetEncoderLayer(cfg.dim_hidden, 4, 7, dtype=cdt,
                                  name="video_encoder", **attn_kw)(
            video, mask=clip_mask, deterministic=deterministic)
        query = QANetEncoderLayer(cfg.dim_hidden, 4, 3, dtype=cdt,
                                  name="query_encoder", **attn_kw)(
            query.reshape(b * q, 3, cfg.dim_hidden),
            deterministic=deterministic).reshape(b, q, 3, cfg.dim_hidden)

        # similarity fusion (reference :331-368)
        vproj = nn.Dense(cfg.dim_hidden, use_bias=False, dtype=cdt,
                         kernel_init=torch_linear,
                         name="proj2sim")(video)               # (B, T, H)
        sim = jnp.einsum("bth,bqlh->bqtl", vproj,
                         query).astype(jnp.float32)            # (B, Q, T, 3)
        sim_r = nn.softmax(sim, axis=-1).astype(cdt)           # over words
        neg = jnp.asarray(jnp.finfo(sim.dtype).min, sim.dtype)
        sim_masked = jnp.where(clip_mask[:, None, :, None], sim, neg)
        sim_c = nn.softmax(sim_masked, axis=-2)                # over clips
        sim_c = jnp.where(clip_mask[:, None, :, None], sim_c,
                          0.0).astype(cdt)

        mat_a = jnp.einsum("bqtl,bqlh->bqth", sim_r, query)    # (B, Q, T, H)
        # the reference materializes sim_rc = sim_r @ sim_c^T (a (Q, T, T)
        # tensor, reference grd_model_v5.py:353) before multiplying by the
        # video; matmul associativity gives the identical result through the
        # tiny (Q, L, H) contraction instead — O(T^2) memory/compute -> O(T)
        cv = jnp.einsum("bqsl,bsh->bqlh", sim_c, video)        # (B, Q, L, H)
        mat_b = jnp.einsum("bqtl,bqlh->bqth", sim_r, cv)       # (B, Q, T, H)
        vexp = video[:, None]                                  # (B, 1, T, H)
        combined = jnp.concatenate(
            [jnp.broadcast_to(vexp, mat_a.shape), mat_a, mat_a * vexp,
             mat_b * vexp], axis=-1)                           # (B, Q, T, 4H)
        combined = nn.Dense(cfg.dim_hidden, kernel_init=torch_linear,
                            dtype=cdt, name="vq_fc")(combined)
        combined = QANetEncoderLayer(
            cfg.dim_hidden, 4, 7, dtype=cdt, name="combined_encoder",
            **attn_kw)(
                combined.reshape(b * q, t, cfg.dim_hidden),
                mask=jnp.repeat(clip_mask, q, axis=0),
                deterministic=deterministic
            ).reshape(b, q, t, cfg.dim_hidden)

        flat = combined.reshape(b * q, t, cfg.dim_hidden)
        flat_mask = jnp.repeat(clip_mask, q, axis=0)
        if cfg.stable_head_init:
            # final-kernel down-scaling keeps head logits O(1) at init (the
            # reference's default init saturates them; see GroundingConfig)
            oki = lambda rng, shape, dtype=jnp.float32: \
                kaiming(rng, shape, dtype) * 0.02
        else:
            oki = kaiming
        regrs = ConvHead(cfg.dim_hidden, 2 * cfg.num_bins, sigmoid=True,
                         out_kernel_init=oki,
                         name="regr_head")(flat, mask=flat_mask)
        conf = ConvHead(cfg.dim_hidden, cfg.num_bins, out_kernel_init=oki,
                        name="conf_head")(flat, mask=flat_mask)
        cls = ConvHead(cfg.dim_hidden, cfg.num_bins, out_kernel_init=oki,
                       name="cls_head")(flat, mask=flat_mask)
        k = cfg.num_bins
        regrs = regrs.reshape(b, q, t, 2, k)
        return regrs, conf.reshape(b, q, t, k), cls.reshape(b, q, t, k)


# ---------------------------------------------------------------------------
# ground-truth label geometry (reference :224-250)
# ---------------------------------------------------------------------------

def grounding_gt_labels(target, n_clips, t: int, num_bins: int):
    """FCOS-style labels for normalized target spans.

    Args:
      target: (Q, 2) normalized [start, end] in [0, 1].
      n_clips: () true clip count of this video.
      t: static clip bucket.

    Returns (gt_regrs (Q,T,2), gt_ctness (Q,T), gt_scores (Q,T),
    bin_ids (Q,)); positions >= n_clips are all-zero.
    """
    denom = jnp.maximum(n_clips - 1, 1)
    clip_range = jnp.arange(t) / denom                         # (T,)
    clip_valid = jnp.arange(t) < n_clips
    bins = jnp.linspace(0.0, 1.0, num_bins + 1)
    target_ct = target.mean(-1)                                # (Q,)
    offset = target_ct[:, None] - bins[None, :]
    bin_ids = jnp.clip((offset > 0).sum(-1) - 1, 0, num_bins - 1)

    left = clip_range[None, :] - target[:, 0, None]            # (Q, T)
    right = target[:, 1, None] - clip_range[None, :]
    inside = (left > 0) & (right > 0) & clip_valid[None, :]
    ratio = jnp.where(inside, jnp.minimum(left, right) /
                      jnp.maximum(jnp.maximum(left, right), 1e-12), 0.0)
    gt_ctness = jnp.sqrt(jnp.maximum(ratio, 0.0))
    gt_scores = inside.astype(jnp.float32)
    gt_regrs = jnp.stack([left, right], axis=-1)               # (Q, T, 2)
    return gt_regrs, gt_ctness, gt_scores, bin_ids


# ---------------------------------------------------------------------------
# training loss (reference :375-527, fixed shape)
# ---------------------------------------------------------------------------

def _bce_logits(logits, target):
    return jnp.maximum(logits, 0) - logits * target + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def grounding_loss(outputs, neg_outputs, labels, group_rep, is_rep,
                   query_mask, clip_mask, cfg: GroundingConfig):
    """Loss over one padded batch.

    Args:
      outputs: (regrs, conf, cls) for the positive query slots — one slot per
        (possibly duplicated) GT predicate; duplicates carry identical network
        outputs to their group representative by construction.
      neg_outputs: same shapes for the sampled negative-predicate queries
        (valid only on representative slots).
      labels: (gt_regrs (B,Q,T,2), gt_ctness, gt_scores, bin_ids) per slot.
      group_rep: (B, Q) index of each slot's dedup-group representative.
      is_rep: (B, Q) bool, True on group representatives.
      query_mask: (B, Q); clip_mask: (B, T).
    """
    regrs, conf, cls = outputs                 # (B,Q,T,2,K), (B,Q,T,K)
    n_regrs, n_conf, n_cls = neg_outputs
    gt_regrs, gt_ctness, gt_scores, bin_ids = labels
    k = cfg.num_bins
    b, qn, t = conf.shape[:3]

    take_rep = lambda x: jnp.take_along_axis(
        x, group_rep.reshape(b, qn, *([1] * (x.ndim - 2))), axis=1)
    take_bin = lambda x: jnp.take_along_axis(
        x, bin_ids.reshape(b, qn, *([1] * (x.ndim - 2))).astype(jnp.int32),
        axis=-1)[..., 0]

    # --- positives: slot q reads its representative's outputs at its bin ---
    pos_conf = take_bin(take_rep(conf))                        # (B, Q, T)
    pos_cls = take_bin(take_rep(cls))
    pos_regr = jnp.take_along_axis(
        take_rep(regrs),
        bin_ids.reshape(b, qn, 1, 1, 1).astype(jnp.int32), axis=-1)[..., 0]
    # (B, Q, T, 2)

    valid_qc = query_mask[:, :, None] & clip_mask[:, None, :]  # (B, Q, T)
    wq = valid_qc.astype(jnp.float32)
    n_pos = jnp.maximum(wq.sum(), 1.0)
    pos_cls_loss = (_bce_logits(pos_cls, gt_scores) * wq).sum() / n_pos

    ct_mask = (gt_ctness > 0) & valid_qc
    wct = ct_mask.astype(jnp.float32)
    n_ct = jnp.maximum(wct.sum(), 1.0)
    pos_ct_loss = (_bce_logits(pos_conf, gt_ctness) * wct).sum() / n_ct
    reg_iou = tiou_left_right(pos_regr, jnp.where(ct_mask[..., None],
                                                  gt_regrs, 1.0))
    reg_iou = jnp.where(ct_mask, reg_iou, 1.0)                 # (B, Q, T)
    regr_loss = (-jnp.log(jnp.maximum(reg_iou, 0.0) + 1e-6) * wct
                 ).sum() / n_ct

    # --- negatives ---
    # (a) representative slots, bins outside the group's positive-bin set
    bins_onehot = jax.nn.one_hot(bin_ids, k, dtype=bool) & \
        query_mask[..., None]                                  # (B, Q, K)
    # group bin set lives on the representative: OR over members
    group_bins = jnp.zeros((b, qn, k), bool)
    group_bins = jax.vmap(
        lambda g, r, o: g.at[r].max(o))(group_bins, group_rep, bins_onehot)
    neg_bins = (~group_bins) & is_rep[..., None] & query_mask[..., None]
    w_nb = (neg_bins[:, :, None, :] & valid_qc[..., None]).astype(jnp.float32)
    # (b) negative-predicate queries (representative slots), all bins
    w_nq = (is_rep[:, :, None, None] & valid_qc[..., None]).astype(
        jnp.float32) * jnp.ones((1, 1, 1, k))
    n_neg = jnp.maximum(w_nb.sum() + w_nq.sum(), 1.0)
    neg_cls_loss = ((_bce_logits(cls, 0.0) * w_nb).sum() +
                    (_bce_logits(n_cls, 0.0) * w_nq).sum()) / n_neg
    neg_ct_loss = ((_bce_logits(conf, 0.0) * w_nb).sum() +
                   (_bce_logits(n_conf, 0.0) * w_nq).sum()) / n_neg

    loss_dict = {
        "pos_cls": cfg.loss_cls * pos_cls_loss,
        "neg_cls": cfg.loss_cls * neg_cls_loss,
        "pos_ct": cfg.loss_ctn * pos_ct_loss,
        "neg_ct": cfg.loss_ctn * neg_ct_loss,
        "regr": cfg.loss_reg * regr_loss,
    }
    return sum(loss_dict.values()), loss_dict


# ---------------------------------------------------------------------------
# test-time multi-bin decoding (reference :530-576, 667-737, vectorized)
# ---------------------------------------------------------------------------

def temporal_pooling(regrs, scores, n_clips, clip_mask, score_th: float,
                     tiou_th: float):
    """Pool per-clip FCOS spans into one span per (query, bin).

    regrs: (Q, T, 2, K); scores: (Q, T, K); returns (Q, K, 2).
    Vectorized form of reference grd_model_v5.py:697-737: only the
    top-scoring clip's gIoU row is needed, not the full TxT matrix.
    """
    q, t, _, k = regrs.shape
    denom = jnp.maximum(n_clips - 1, 1)
    clip_range = jnp.arange(t) / denom                          # (T,)
    start = clip_range[None, :, None] - regrs[:, :, 0, :]       # (Q, T, K)
    end = clip_range[None, :, None] + regrs[:, :, 1, :]
    duras = jnp.stack([start, end], axis=-1)                    # (Q, T, K, 2)

    neg = -jnp.inf
    s = jnp.where(clip_mask[None, :, None], scores, neg)        # (Q, T, K)
    top = jnp.max(s, axis=1)                                    # (Q, K)
    top_id = jnp.argmax(s, axis=1)                              # (Q, K)
    mask1 = s > score_th * top[:, None, :]

    top_dura = jnp.take_along_axis(
        duras, top_id[:, None, :, None], axis=1)[:, 0]          # (Q, K, 2)
    # gIoU of every clip's span vs the top clip's span
    a0, a1 = duras[..., 0], duras[..., 1]                       # (Q, T, K)
    b0, b1 = top_dura[:, None, :, 0], top_dura[:, None, :, 1]
    g = (jnp.minimum(a1, b1) - jnp.maximum(a0, b0)) / (
        jnp.maximum(a1, b1) - jnp.minimum(a0, b0))
    mask2 = g > tiou_th
    m = mask1 & mask2 & clip_mask[None, :, None]
    pooled_s = jnp.min(jnp.where(m, start, jnp.inf), axis=1)    # (Q, K)
    pooled_e = jnp.max(jnp.where(m, end, -jnp.inf), axis=1)
    # top clip is always in its own mask, so the where never stays empty
    return jnp.stack([pooled_s, pooled_e], axis=-1)             # (Q, K, 2)


def temporal_nms(spans, probs, nms_th: float):
    """Per-query greedy 1-D NMS over the K+1 bins (reference :667-695).

    spans: (Q, K1, 2); probs: (Q, K1).  Returns kept mask (Q, K1).
    """
    q, k1, _ = spans.shape
    t = tiou(spans.reshape(-1, 2), spans.reshape(-1, 2))
    t = t.reshape(q, k1, q, k1)
    tioum = jax.vmap(lambda i: t[i, :, i, :])(jnp.arange(q))    # (Q, K1, K1)

    def body(_, state):
        alive, kept = state
        p = jnp.where(alive, probs, -jnp.inf)
        best = jnp.argmax(p, axis=-1)                           # (Q,)
        has = jnp.any(alive, axis=-1)
        onehot = jax.nn.one_hot(best, k1, dtype=bool) & has[:, None]
        kept = kept | onehot
        row = jnp.take_along_axis(tioum, best[:, None, None], axis=1)[:, 0]
        alive = alive & ~onehot & (row < nms_th)
        return alive, kept

    alive = jnp.ones((q, k1), bool)
    kept = jnp.zeros((q, k1), bool)
    _, kept = jax.lax.fori_loop(0, k1, body, (alive, kept))
    return kept


def grounding_decode(regrs, conf_logits, cls_logits, inter_dura, n_clips,
                     clip_mask, query_mask, *, score_th=0.5, tiou_th=0.5,
                     bins_th=0.1, nms_th=0.5):
    """Full single-video test-time decoding (reference :530-576).

    inter_dura: (Q, 2) normalized subject∩object spans.
    Returns pooled_se (Q, K+1, 2), bins_probs (Q, K+1), bins_mask (Q, K+1).
    """
    k = conf_logits.shape[-1]
    scores = jax.nn.sigmoid(conf_logits) * jax.nn.sigmoid(cls_logits)
    scores = jnp.where(clip_mask[None, :, None], scores, 0.0)
    bins_probs = jnp.max(scores, axis=1)                        # (Q, K)
    bins_probs = jnp.concatenate(
        [bins_probs, jnp.ones_like(bins_probs[:, :1])], axis=-1)  # (Q, K+1)
    bins_mask = bins_probs > bins_th

    pooled = temporal_pooling(regrs, scores, n_clips, clip_mask,
                              score_th, tiou_th)                # (Q, K, 2)
    # clamp each pooled span to the subject∩object window; spans that do not
    # intersect it fall back to the window itself
    s = jnp.maximum(pooled[..., 0], inter_dura[:, None, 0])
    e = jnp.minimum(pooled[..., 1], inter_dura[:, None, 1])
    overlap = s <= e
    pooled = jnp.where(
        overlap[..., None], jnp.stack([s, e], -1),
        jnp.broadcast_to(inter_dura[:, None, :], pooled.shape))
    overlap = jnp.concatenate(
        [overlap, jnp.ones_like(overlap[:, :1])], axis=-1)      # (Q, K+1)
    pooled = jnp.concatenate([pooled, inter_dura[:, None, :]], axis=1)

    bins_mask = bins_mask & overlap & temporal_nms(pooled, bins_probs, nms_th)
    # every query keeps at least its best bin
    none_kept = ~jnp.any(bins_mask, axis=-1)
    best = jnp.argmax(bins_probs, axis=-1)
    bins_mask = bins_mask | (jax.nn.one_hot(best, k + 1, dtype=bool) &
                             none_kept[:, None])
    # "grounding corrects classification": if every regression bin is weak,
    # zero the fallback subject∩object bin's score (reference :568-573)
    weak = jnp.max(bins_probs[:, :-1], axis=-1) <= bins_th
    bins_probs = bins_probs.at[:, -1].set(
        jnp.where(weak, 0.0, bins_probs[:, -1]))
    bins_mask = bins_mask & query_mask[:, None]
    return pooled, bins_probs, bins_mask
