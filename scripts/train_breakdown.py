"""Where does the BIG-C train step's time go?  (exp2 geometry, B=8)

Measures separately jitted stages on the TPU:
  fwd            model forward only
  fwd+align      + vIoU alignment & Hungarian matching (lap_jv)
  fwd+loss       + full loss (no backward)
  fwd+bwd        gradient only
  full step      value_and_grad + Adam update (the production step)

plus isolated submodule fwd / fwd+bwd timings (tracklet encoder, encoder
stack, decoder stack, Adam update alone) so the 38% train MFU has a
per-component attribution (VERDICT r4 #3).

Stage selection: ``--only main`` / ``--only parts`` (the full run holds
many compiled executables alive; on the axon client that once ballooned
host RSS past the container limit — prefer two invocations).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_breakdown.py
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

N_BUCKET, T_BUCKET = 50, 256
DIM_FEAT, DIM_I3D = 2048, 832
BATCH = 8


def main(only=None):
    import jax
    import ml_dtypes
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.data.types import (pack_proposal, pack_gt,
                                           stack_batches)
    from vidsgg_big_tpu.models import BigC, BigCConfig
    from vidsgg_big_tpu.train.losses import (
        bigc_train_loss, align_gt_adjacency, matching_cost)
    from vidsgg_big_tpu.ops.matching import hungarian
    from vidsgg_big_tpu.train.train_state import (make_optimizer,
                                                  create_train_state)
    from vidsgg_big_tpu.train.steps import build_train_step

    print(jax.devices(), flush=True)
    cfg = BigCConfig(
        num_pred_cats=133, num_enti_cats=36, dim_feat=DIM_FEAT,
        dim_clsme=300, dim_enti=512, dim_pred=512, dim_att=512, dim_ffn=512,
        dim_i3d=DIM_I3D, enco_pool_len=4, n_enco_layers=2, n_deco_layers=6,
        n_att_head=8, num_querys=192, compute_dtype="bfloat16")
    model = BigC(cfg, enti_name_emb=np.zeros((36, 300), np.float32))
    vids = [make_video(i, video_len=480, n_gt_trajs=12, n_preds=16,
                       n_distractors=34, feat_dim=DIM_FEAT + DIM_I3D,
                       num_enti_cats=36, num_pred_cats=133)
            for i in range(BATCH)]
    props = stack_batches([
        pack_proposal(p, N_BUCKET, T_BUCKET, DIM_FEAT + DIM_I3D,
                      dtype=ml_dtypes.bfloat16) for p, _ in vids])
    gts = stack_batches([
        pack_gt(g, g_bucket=16, tg_bucket=T_BUCKET, p_bucket=32)
        for _, g in vids])
    # Device-put ONCE: the packed batch is ~590 MB bf16; leaving it host-side
    # makes every timing dispatch re-ship it through the ~0.05 GB/s tunnel
    # (measured 6.7 s/call — 1000x the device step).
    props, gts = jax.device_put((props, gts))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), props)

    def timeit(fn, *a, n=40, label=""):
        out = fn(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        best = float("inf")
        for _ in range(3):               # tunnel oscillates; best of 3
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*a)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
            best = min(best, (time.perf_counter() - t0) / n * 1e3)
        print(f"{label:20s} {best:7.2f} ms", flush=True)
        return best

    if only in (None, "main"):
        fwd = jax.jit(lambda p, b: model.apply(p, b)["pred_logits"])
        timeit(fwd, params, props, label="fwd")

        def fwd_align(p, b, g):
            out = model.apply(p, b)
            aligned, _ = align_gt_adjacency(b, g, cfg.positive_viou_th)
            cost = matching_cost(out["pred_logits"], out["att"], g, aligned,
                                 b.traj_mask, cfg.cost_coeff_cls,
                                 cfg.cost_coeff_adj)
            n_gt = g.pred_mask.sum(-1).astype(np.int32)
            return hungarian(cost, n_gt)

        timeit(jax.jit(fwd_align), params, props, gts, label="fwd+match")

        loss = jax.jit(
            lambda p, b, g: bigc_train_loss(model.apply(p, b), b, g, cfg)[0])
        timeit(loss, params, props, gts, label="fwd+loss")

        grad = jax.jit(jax.grad(
            lambda p, b, g: bigc_train_loss(model.apply(p, b), b, g,
                                            cfg)[0]))
        timeit(grad, params, props, gts, label="fwd+bwd")

        tx, _ = make_optimizer(1e-4, 0.2, [10_000])
        state = create_train_state(params, tx)
        step = build_train_step(model, tx, donate=False)
        rng = jax.random.PRNGKey(1)

        def full(s):
            s2, m = step(s, props, gts, rng)
            return m["total"]

        timeit(full, state, n=20, label="full step")

        # Adam update alone on the real grads
        grads = grad(params, props, gts)

        def adam_only(s, g):
            import optax
            ups, _ = tx.update(g, s.opt_state, s.params)
            return optax.apply_updates(s.params, ups)

        timeit(jax.jit(adam_only), state, grads, label="adam only")

    if only in (None, "parts"):
        # ---- isolated submodules (fwd and fwd+bwd) -----------------------
        import jax.numpy as jnp
        from vidsgg_big_tpu.models.big_c import TrackletEncoder
        from vidsgg_big_tpu.models.layers import (TransformerEncoderLayer,
                                                  RoleAttnDecoderLayer)

        te = TrackletEncoder(cfg.dim_enti, cfg.dim_feat, cfg.enco_pool_len,
                             compute_dtype=cfg.compute_dtype)
        p_te = jax.jit(te.init)(jax.random.PRNGKey(0), props)
        timeit(jax.jit(lambda p, b: te.apply(p, b)[0]), p_te, props,
               label="tracklet enc fwd")
        timeit(jax.jit(jax.grad(
            lambda p, b: te.apply(p, b)[0].sum())), p_te, props,
            label="tracklet enc f+b")

        rngs = np.random.default_rng(0)
        nodes = jnp.asarray(rngs.normal(size=(BATCH, N_BUCKET,
                                              cfg.dim_enti)), jnp.float32)
        tmask = props.traj_mask

        def enco_stack(p, x):
            for i in range(cfg.n_enco_layers):
                x = TransformerEncoderLayer(
                    cfg.dim_enti, cfg.n_att_head, cfg.dim_ffn,
                    name=f"encoder{i}").apply(
                        {"params": p["params"][f"encoder{i}"]}, x,
                        key_mask=tmask)
            return x

        one_enc = TransformerEncoderLayer(cfg.dim_enti, cfg.n_att_head,
                                          cfg.dim_ffn)
        enc_p = jax.jit(one_enc.init)(jax.random.PRNGKey(0), nodes,
                                      key_mask=tmask)["params"]
        enco_params = {"params": {f"encoder{i}": enc_p
                                  for i in range(cfg.n_enco_layers)}}
        timeit(jax.jit(enco_stack), enco_params, nodes,
               label="enco stack fwd")
        timeit(jax.jit(jax.grad(lambda p, x: enco_stack(p, x).sum())),
               enco_params, nodes, label="enco stack f+b")

        queries = jnp.asarray(rngs.normal(size=(BATCH, cfg.num_querys,
                                                cfg.dim_pred)), jnp.float32)
        pos = jnp.asarray(rngs.normal(size=(cfg.num_querys, cfg.dim_pred)),
                          jnp.float32)
        layer = RoleAttnDecoderLayer(cfg.dim_pred, cfg.n_att_head,
                                     cfg.dim_enti, cfg.dim_att, cfg.dim_ffn)
        p_l = jax.jit(layer.init)(jax.random.PRNGKey(0), queries, pos,
                                  nodes, tmask)

        def deco_stack(p, q, x):
            for _ in range(cfg.n_deco_layers):
                q, att = layer.apply(p, q, pos, x, tmask)
            return q

        timeit(jax.jit(deco_stack), p_l, queries, nodes,
               label="deco stack fwd")
        timeit(jax.jit(jax.grad(
            lambda p, q, x: deco_stack(p, q, x).sum())), p_l, queries,
            nodes, label="deco stack f+b")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=("main", "parts"), default=None)
    main(ap.parse_args().only)
