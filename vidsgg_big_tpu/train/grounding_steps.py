"""Jitted grounding-stage train / inference steps."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.grounding import (
    GroundingModel, grounding_gt_labels, grounding_loss, grounding_decode)
from .grounding_data import prepare_grounding_gt
from .train_state import TrainState


def grounding_train_loss(model: GroundingModel, params, video_feats,
                         clip_mask, n_clips, gts, video_len, rng,
                         deterministic=False):
    """Full grounding loss for a batch (video_feats (B,T,D), gts GraphBatch)."""
    cfg = model.cfg
    b = video_feats.shape[0]
    rng_neg, rng_do = jax.random.split(rng)
    prep = jax.vmap(
        functools.partial(prepare_grounding_gt,
                          num_pred_cats=cfg.num_pred_cats))(
        gts, video_len, rng=jax.random.split(rng_neg, b))

    t = video_feats.shape[1]
    # One forward over [positive ++ negative] query slots, like the
    # reference's torch.cat (reference grd_model_v5.py:302).  Queries are
    # row-independent so the split outputs equal two separate applies;
    # step time is unchanged (XLA already CSE'd the query-independent
    # video encoder across the two applies), but dropout now draws one
    # stream over the concatenated queries as the reference does.
    p = prep["query_cats"].shape[1]
    cats2 = jnp.concatenate(
        [prep["query_cats"], prep["neg_query_cats"]], axis=1)
    temp2 = jnp.concatenate([prep["temporal"]] * 2, axis=1)
    qm2 = jnp.concatenate([prep["query_mask"]] * 2, axis=1)
    regrs, conf, cls = model.apply(params, video_feats, clip_mask, cats2,
                                   temp2, qm2, deterministic=deterministic,
                                   rngs={"dropout": rng_do})
    out = (regrs[:, :p], conf[:, :p], cls[:, :p])
    neg_out = (regrs[:, p:], conf[:, p:], cls[:, p:])
    labels = jax.vmap(
        functools.partial(grounding_gt_labels, t=t, num_bins=cfg.num_bins))(
        prep["target"], n_clips)
    return grounding_loss(out, neg_out, labels, prep["group_rep"],
                          prep["is_rep"], prep["query_mask"], clip_mask,
                          cfg)


def build_grounding_train_step(model: GroundingModel, tx, mesh=None,
                               donate: bool = True):
    def step(state: TrainState, video_feats, clip_mask, n_clips, gts,
             video_len, rng):
        def loss_fn(params):
            return grounding_train_loss(
                model, params, video_feats, clip_mask, n_clips, gts,
                video_len, rng)
        (total, d), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads, tx)
        return new_state, dict(d, total=total)

    kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        kwargs = dict(in_shardings=(repl, data, data, data, data, data, repl),
                      out_shardings=(repl, repl))
    if donate:
        kwargs["donate_argnums"] = (0,)
    return jax.jit(step, **kwargs)


def build_grounding_infer_step(model: GroundingModel, *, score_th, tiou_th,
                               bins_th, nms_th, mesh=None):
    """infer(params, video_feats (B,T,D), clip_mask, n_clips (B,), query_cats
    (B,Q,3), temporal (B,Q,2), query_mask) -> (pooled, bins_probs, bins_mask)
    each (B, Q, K+1, ...).

    With ``mesh`` (stage-B eval's ``--mesh`` path): params replicated, every
    batch operand and output sharded on its leading (video) axis over the
    ``data`` mesh axis — queries are row-independent, so no cross-device
    collective is needed at all."""

    def infer(params, video_feats, clip_mask, n_clips, query_cats, temporal,
              query_mask):
        regrs, conf, cls = model.apply(
            params, video_feats, clip_mask, query_cats, temporal, query_mask)
        decode = functools.partial(grounding_decode, score_th=score_th,
                                   tiou_th=tiou_th, bins_th=bins_th,
                                   nms_th=nms_th)
        return jax.vmap(decode)(regrs, conf, cls, temporal, n_clips,
                                clip_mask, query_mask)

    kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        kwargs = dict(in_shardings=(repl,) + (data,) * 6,
                      out_shardings=(data, data, data))
    return jax.jit(infer, **kwargs)
