"""Is the BIG-C step's non-matmul tail (Adam ~3.4 ms, match ~2.3 ms of a
21.9 ms step) fixable or a roofline?  (VERDICT r4 #3)

The optimizer state has 233 leaves (27.8M params, 111 MB f32).  The update
chain (clip_by_global_norm + adam + apply_updates + grad_norm metric) makes
~8 elementwise passes, each lowered per-leaf -> ~1800 tiny TPU kernels; the
bandwidth roofline for those passes is ~1.9 ms but we measure 3.4 ms
in-step / 6.3 ms isolated.  Candidates measured here, all threaded-state
(state flows through the loop, so donation is valid, like production
train/loop.py):

  step/tree/nodonate    current bench configuration (donate=False)
  step/tree/donate      production configuration
  step/flat/donate      optax.flatten'd chain (one fused vector per pass)
  adam only tree/flat   the update in isolation
  match parts           align_gt_adjacency vs cost build vs lap_jv

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/adam_fusion_experiment.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

N_BUCKET, T_BUCKET = 50, 256
DIM_FEAT, DIM_I3D = 2048, 832
BATCH = 8


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    import optax
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
    props, gts = jax.device_put((props, gts))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), props)
    rng = jax.random.PRNGKey(1)

    def time_step(step, state, n=40, label=""):
        """Threaded-state timing (valid under donation)."""
        state, m = step(state, props, gts, rng)
        float(np.asarray(m["total"]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = step(state, props, gts, rng)
            float(np.asarray(m["total"]))
            best = min(best, (time.perf_counter() - t0) / n * 1e3)
        print(f"{label:28s} {best:7.2f} ms", flush=True)
        return best

    def timeit(fn, *a, n=40, label=""):
        out = fn(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*a)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
            best = min(best, (time.perf_counter() - t0) / n * 1e3)
        print(f"{label:28s} {best:7.2f} ms", flush=True)
        return best

    tx, _ = make_optimizer(1e-4, 0.2, [10_000])
    tx_flat = optax.flatten(optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adam(optax.piecewise_constant_schedule(1e-4, {10_000: 0.2}))))
    # donated steps consume their input state (and with it the shared
    # params buffers) — build every state from a fresh device copy
    copy = jax.jit(lambda t: jax.tree_util.tree_map(jnp.array, t))
    state = create_train_state(copy(params), tx)
    state_flat = create_train_state(copy(params), tx_flat)

    # ---- the update in isolation (non-donated; params stay alive) ----------
    grad = jax.jit(jax.grad(
        lambda p, b, g: bigc_train_loss(model.apply(p, b), b, g, cfg)[0]))
    grads = grad(params, props, gts)

    def upd(tx_):
        def f(s, g):
            ups, opt = tx_.update(g, s.opt_state, s.params)
            return optax.apply_updates(s.params, ups)
        return jax.jit(f)

    timeit(upd(tx), state, grads, label="adam only tree")
    timeit(upd(tx_flat), state_flat, grads, label="adam only flat")

    # parity: one update through both forms
    p_tree = upd(tx)(state, grads)
    p_flat = upd(tx_flat)(state_flat, grads)
    errs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p_tree, p_flat)
    print("max |tree-flat| param delta:",
          max(jax.tree_util.tree_leaves(errs)), flush=True)

    # ---- match/loss decomposition ------------------------------------------
    fwd = jax.jit(lambda p, b: model.apply(p, b)["pred_logits"])
    t_fwd = timeit(fwd, params, props, label="fwd")

    align = jax.jit(lambda b, g: align_gt_adjacency(
        b, g, cfg.positive_viou_th)[0])
    timeit(align, props, gts, label="align (vIoU grid)")

    def cost_only(p, b, g):
        out = model.apply(p, b)
        aligned, _ = align_gt_adjacency(b, g, cfg.positive_viou_th)
        return matching_cost(out["pred_logits"], out["att"], g, aligned,
                             b.traj_mask, cfg.cost_coeff_cls,
                             cfg.cost_coeff_adj)
    t_cost = timeit(jax.jit(cost_only), params, props, gts,
                    label="fwd+align+cost")

    cost = jax.jit(cost_only)(params, props, gts)
    n_gt = jax.device_put(
        np.asarray(gts.pred_mask.sum(-1), np.int32))
    timeit(jax.jit(hungarian), cost, n_gt, label="hungarian (lap_jv) only")

    full_loss = jax.jit(
        lambda p, b, g: bigc_train_loss(model.apply(p, b), b, g, cfg)[0])
    timeit(full_loss, params, props, gts, label="fwd+loss")
    print(f"(cost-build alone ~ {t_cost - t_fwd:.2f} ms over fwd)",
          flush=True)

    # ---- full step variants LAST (donation consumes the state) -------------
    time_step(build_train_step(model, tx, donate=False),
              create_train_state(copy(params), tx),
              label="step/tree/nodonate")
    time_step(build_train_step(model, tx, donate=True), state,
              label="step/tree/donate")
    time_step(build_train_step(model, tx_flat, donate=True), state_flat,
              label="step/flat/donate")


if __name__ == "__main__":
    main()
