"""Torch-reference -> flax weight transplants (BIG-C and grounding).

Converts a reference ``BIG_C`` state_dict (reference models/model_0v10.py:239-
366 / models/model_0v7.py) into the parameter pytree of :class:`BigC`, and a
reference ``DEBUG`` state_dict (reference models/grd_model_v5.py:140-193)
into the pytree of :class:`GroundingModel`, so whole-model forward/loss
parity can be asserted numerically without any retraining.  Layout
conversions only — no reference code is executed here:

  * ``nn.Linear``      weight (out, in)        -> Dense kernel (in, out)
  * ``nn.Conv1d``      weight (out, in, k)     -> Conv kernel (k, in, out)
  * ``nn.MultiheadAttention`` packed in_proj   -> per-head q/k/v DenseGeneral
    kernels (D, h, hd); out_proj (D, D)        -> out kernel (h, hd, D)
  * ``nn.LayerNorm``   weight/bias             -> scale/bias
  * ``nn.Sequential``  indices {0, 2, ...}     -> MLP dense{0, 1, ...}
"""
from __future__ import annotations

import numpy as np


def _np(x):
    # torch tensor or ndarray -> float32 numpy without importing torch here
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      dtype=np.float32)


def _dense(sd, name):
    return {"kernel": _np(sd[f"{name}.weight"]).T,
            "bias": _np(sd[f"{name}.bias"])}


def _mlp(sd, prefix, torch_ids):
    """torch nn.Sequential(Linear, ReLU, Linear, ...) -> MLP dense{k}."""
    return {f"dense{k}": _dense(sd, f"{prefix}.{t}")
            for k, t in enumerate(torch_ids)}


def _layernorm(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _mha(sd, prefix, num_heads):
    """Packed torch MultiheadAttention -> flax per-head projections."""
    w = _np(sd[f"{prefix}.in_proj_weight"])          # (3D, D)
    b = _np(sd[f"{prefix}.in_proj_bias"])            # (3D,)
    d = w.shape[1]
    hd = d // num_heads
    out = {}
    for i, nm in enumerate(("q", "k", "v")):
        out[nm] = {
            "kernel": w[i * d:(i + 1) * d].T.reshape(d, num_heads, hd),
            "bias": b[i * d:(i + 1) * d].reshape(num_heads, hd),
        }
    out["out"] = {
        "kernel": _np(sd[f"{prefix}.out_proj.weight"]).T.reshape(
            num_heads, hd, d),
        "bias": _np(sd[f"{prefix}.out_proj.bias"]),
    }
    return out


def _enti2enco(sd, cfg):
    """fc_enti2enco with the pooled-feature flatten-order permutation.

    The reference flattens the pooled node tensor channel-major —
    ``(n, E, pool).reshape(n, -1)`` (reference models/model_0v10.py:455-457) —
    while :class:`BigC` flattens bin-major ``(n, pool, E)``.  The two differ
    by a fixed permutation of the first Dense's input rows, absorbed here.
    """
    out = _mlp(sd, "fc_enti2enco", (0, 2))
    k = out["dense0"]["kernel"]                     # (E*pool, E) torch order
    e, pool = cfg.dim_enti, cfg.enco_pool_len
    out["dense0"]["kernel"] = (
        k.reshape(e, pool, -1).transpose(1, 0, 2).reshape(pool * e, -1))
    return out


def bigc_params_from_torch(state_dict, cfg):
    """Build the flax ``{"params": ...}`` tree of :class:`BigC` from a torch
    reference BIG_C state_dict.

    Args:
      state_dict: mapping of reference parameter names to tensors/arrays
        (``module.`` DataParallel prefixes must be stripped by the caller).
      cfg: the matching :class:`BigCConfig`.

    Returns:
      (variables, tables): flax variables dict plus the frozen constructor
      tables — ``{"enti_name_emb": ..., "pos_emb_table": ...}`` with ``None``
      for absent ones.  ``pos_emb_table`` is set for v7 checkpoints, whose
      frozen pos-embedding is a random table (the reference's init
      xavier-overwrites the sine values, model_0v7.py:345-358).
    """
    sd = dict(state_dict)
    h = cfg.n_att_head
    p = {
        "tracklet_encoder": {
            "fc_bbox2enti": _mlp(sd, "fc_bbox2enti", (0, 2)),
            "fc_feat2enti": _mlp(sd, "fc_feat2enti", (0, 2)),
            "conv_feat2enti": {
                "kernel": _np(sd["conv_feat2enti.weight"]).transpose(2, 1, 0),
                "bias": _np(sd["conv_feat2enti.bias"]),
            },
            "fc_enti2enco": _enti2enco(sd, cfg),
        },
        "pred_query_init": _np(sd["pred_query_init"]),
        "bias_matrix": _np(sd["bias_matrix"]),
    }
    if cfg.variant == "v7":
        p["fc_pred2logits"] = _mlp(sd, "fc_pred2logits", (0, 2))
    else:
        p["pos_embedding"] = _np(sd["pos_embedding"])
        p["fc_pred2logits"] = _dense(sd, "fc_pred2logits")
    if cfg.dim_i3d:
        p["fc_i3d"] = _mlp(sd, "fc_i3d", (0,))

    for i in range(cfg.n_enco_layers):
        t = f"encoder_layers.{i}"
        p[f"encoder{i}"] = {
            "self_attn": _mha(sd, f"{t}.self_attn", h),
            "linear1": _dense(sd, f"{t}.linear1"),
            "linear2": _dense(sd, f"{t}.linear2"),
            "norm1": _layernorm(sd, f"{t}.norm1"),
            "norm2": _layernorm(sd, f"{t}.norm2"),
        }
    for i in range(cfg.n_deco_layers):
        t = f"decoder_layers.{i}"
        p[f"decoder{i}"] = {
            "self_attn": _mha(sd, f"{t}.self_attn", h),
            "fc_enti2att": _dense(sd, f"{t}.fc_enti2att"),
            "fc_pred2att": _dense(sd, f"{t}.fc_pred2att"),
            "fc_rolewise0": _mlp(sd, f"{t}.fc_rolewise.0", (0, 2)),
            "fc_rolewise1": _mlp(sd, f"{t}.fc_rolewise.1", (0, 2)),
            "fc2_0": _dense(sd, f"{t}.fc2.0"),
            "fc2_1": _dense(sd, f"{t}.fc2.3"),
            "norm1": _layernorm(sd, f"{t}.norm1"),
            "norm2": _layernorm(sd, f"{t}.norm2"),
            "norm3": _layernorm(sd, f"{t}.norm3"),
        }

    tables = {
        "enti_name_emb": _np(sd["EntiNameEmb"]) if "EntiNameEmb" in sd
        else None,
        "pos_emb_table": _np(sd["pos_embedding"])
        if cfg.variant == "v7" and "pos_embedding" in sd else None,
    }
    return {"params": p}, tables


def basec_params_from_torch(state_dict, cfg):
    """Build the flax ``{"params": ...}`` tree of :class:`BaseC` from a torch
    reference ``Base_C`` state_dict (reference
    models/model_pairwise_baseline.py:8-98).  Shares the tracklet-encoder
    layout (and its channel-major pooled-flatten quirk) with BIG-C.

    Returns (variables, tables) like :func:`bigc_params_from_torch`.
    """
    sd = dict(state_dict)
    p = {
        "tracklet_encoder": {
            "fc_bbox2enti": _mlp(sd, "fc_bbox2enti", (0, 2)),
            "fc_feat2enti": _mlp(sd, "fc_feat2enti", (0, 2)),
            "conv_feat2enti": {
                "kernel": _np(sd["conv_feat2enti.weight"]).transpose(2, 1, 0),
                "bias": _np(sd["conv_feat2enti.bias"]),
            },
            "fc_enti2enco": _enti2enco(sd, cfg),
        },
        "bias_matrix": _np(sd["bias_matrix"]),
        "fc_pred2logits": _mlp(sd, "fc_pred2logits", (0, 2)),
    }
    tables = {"enti_name_emb": _np(sd["EntiNameEmb"])
              if "EntiNameEmb" in sd else None}
    return {"params": p}, tables


def _dwconv(sd, prefix):
    """torch DepthWiseSeparableConv1d -> flax DepthwiseSeparableConv.

    Conv1d weights are (out, in/groups, k); flax Conv kernels are
    (k, in/groups, out) — the same transpose for both sub-convs
    (reference models/grd_model_v5.py:36-56).
    """
    return {
        "depth_wise": {
            "kernel": _np(sd[f"{prefix}.depth_wise.weight"]).transpose(
                2, 1, 0),
            "bias": _np(sd[f"{prefix}.depth_wise.bias"]),
        },
        "point_wise": {
            "kernel": _np(sd[f"{prefix}.point_wise.weight"]).transpose(
                2, 1, 0),
            "bias": _np(sd[f"{prefix}.point_wise.bias"]),
        },
    }


def _qanet_layer(sd, prefix, num_conv, num_heads=8):
    """torch QANetEncoderLayer -> flax QANetEncoderLayer params
    (reference models/grd_model_v5.py:81-137)."""
    mha = _mha(sd, f"{prefix}.mh_attn", num_heads)
    out = {
        "normb": _layernorm(sd, f"{prefix}.normb"),
        "norme": _layernorm(sd, f"{prefix}.norme"),
        "fc": _dense(sd, f"{prefix}.fc"),
        "attn_q": mha["q"], "attn_k": mha["k"], "attn_v": mha["v"],
        "attn_out": mha["out"],
    }
    for i in range(num_conv):
        out[f"conv{i}"] = _dwconv(sd, f"{prefix}.convs.{i}")
        out[f"norm{i}"] = _layernorm(sd, f"{prefix}.norm_seq.{i}")
    return out


def _conv_head(sd, prefix):
    """torch Sequential([DWConv, ReLU] x4 + DWConv) -> flax ConvHead
    (reference models/grd_model_v5.py:182-193; torch indices i.0 / 4)."""
    out = {f"conv{i}": _dwconv(sd, f"{prefix}.{i}.0") for i in range(4)}
    out["out"] = _dwconv(sd, f"{prefix}.4")
    return out


def grounding_params_from_torch(state_dict):
    """Build the flax ``{"params": ...}`` tree of :class:`GroundingModel`
    from a torch reference ``DEBUG`` state_dict
    (reference models/grd_model_v5.py:140-193).

    The embedding tables (EntiNameEmb/PredNameEmb) are trainable parameters
    in both implementations and transplant directly.
    """
    sd = dict(state_dict)
    p = {
        "EntiNameEmb": _np(sd["EntiNameEmb"]),
        "PredNameEmb": _np(sd["PredNameEmb"]),
        "video_fc": _dense(sd, "video_fc"),
        "query_fc": _dense(sd, "query_fc"),
        "temp_fc": _dense(sd, "temp_fc"),
        "vq_fc": _dense(sd, "vq_fc"),
        "proj2sim": {"kernel": _np(sd["proj2sim.weight"]).T},
        "video_encoder": _qanet_layer(sd, "video_encoder", num_conv=4),
        "query_encoder": _qanet_layer(sd, "query_encoder", num_conv=4),
        "combined_encoder": _qanet_layer(sd, "combined_encoder", num_conv=4),
        "cls_head": _conv_head(sd, "cls_head"),
        "conf_head": _conv_head(sd, "conf_head"),
        "regr_head": _conv_head(sd, "regr_head"),
    }
    return {"params": p}


def strip_module_prefix(state_dict):
    """Remove DataParallel ``module.`` prefixes (reference
    tools/eval_vidvrd.py:82-87)."""
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in state_dict.items()}
