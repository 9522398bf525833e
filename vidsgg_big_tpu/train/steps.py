"""Jitted train / inference steps, data-parallel over a device mesh.

One compiled step per bucket shape.  Batches are sharded on the leading
(video) axis; parameters/optimizer state are replicated; loss denominators
are global sums so GSPMD inserts the cross-replica reductions automatically
(no hand-written collectives — the ICI-native replacement for the reference's
DataParallel scatter/gather, reference utils/DataParallel.py:42-90).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.big_c import BigC
from ..models.triplets import construct_triplets
from .losses import bigc_train_loss
from .train_state import TrainState


def build_train_step(model: BigC, tx, mesh=None, donate: bool = True,
                     state_shardings=None, t_abs: int = 1024):
    """Returns step(state, props, gts, dropout_rng) -> (state, metrics).

    With ``mesh`` alone: pure data parallelism (replicated params).  Pass
    ``state_shardings`` (from ``parallel.sharding.state_shardings`` of a
    TP-sharded state) to keep tensor-parallel parameter layouts across the
    step boundary on a 2-D (data, model) mesh.
    """
    cfg = model.cfg

    def step(state: TrainState, props, gts, rng):
        def loss_fn(params):
            out = model.apply(params, props, deterministic=False,
                              rngs={"dropout": rng})
            total, d = bigc_train_loss(out, props, gts, cfg, t_abs=t_abs)
            return total, d

        (total, d), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads, tx)
        metrics = dict(d, total=total,
                       grad_norm=optax_global_norm(grads))
        return new_state, metrics

    kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        st = state_shardings if state_shardings is not None else repl
        kwargs = dict(
            in_shardings=(st, data, data, repl),
            out_shardings=(st, repl),
        )
    if donate:
        kwargs["donate_argnums"] = (0,)
    return jax.jit(step, **kwargs)


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.vdot(x, x).real for x in leaves))


def build_infer_step(model: BigC, topk: int, mesh=None,
                     param_shardings=None):
    """Returns infer(params, props) -> Triplets (batched).

    ``param_shardings``: pass the concrete shardings of a TP-sharded params
    tree (``parallel.sharding.state_shardings(params)``) to serve with
    tensor-parallel parameters on a 2-D (data, model) mesh; default
    replicates the parameters."""
    cfg = model.cfg

    def infer(params, props):
        out = model.apply(params, props, deterministic=True)
        trip = jax.vmap(
            functools.partial(construct_triplets, topk=topk,
                              num_enti_cats=cfg.num_enti_cats,
                              num_pred_cats=cfg.num_pred_cats))(
            out["pred_logits"], out["att"], props.durations, props.scores,
            props.cat_ids, props.traj_mask)
        return trip

    kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ps = param_shardings if param_shardings is not None \
            else NamedSharding(mesh, P())
        kwargs = dict(in_shardings=(ps, NamedSharding(mesh, P("data"))),
                      out_shardings=NamedSharding(mesh, P("data")))
    return jax.jit(infer, **kwargs)


def build_basec_infer_step(model, topk: int):
    """Returns infer(params, props) -> Triplets (batched) for Base-C, the
    pairwise baseline: forward logits over all ordered tracklet pairs, then
    fixed-shape triplet construction with the optional rt_triplets_topk
    truncation (reference model_pairwise_baseline.py:314-395)."""
    from ..models.triplets import pairwise_construct_triplets
    cfg = model.cfg

    def infer(params, props):
        out = model.apply(params, props)
        trip = jax.vmap(functools.partial(
            pairwise_construct_triplets, topk=topk,
            num_enti_cats=cfg.num_enti_cats,
            num_pred_cats=cfg.num_pred_cats,
            rt_topk=cfg.rt_triplets_topk))(
            out["pred_logits"],
            jnp.broadcast_to(out["pair_ids"][None],
                             (props.traj_mask.shape[0],) +
                             out["pair_ids"].shape),
            props.durations, props.scores, props.cat_ids, props.traj_mask)
        return trip

    return jax.jit(infer)
