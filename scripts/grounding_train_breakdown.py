"""Where does the grounding train step's time go?  (bench geometry: B=8,
T=512 clips, Q=64 query slots, dim_hidden=128, bf16.)

Measures separately jitted stages on the TPU:
  fwd pos        one model.apply (positive queries only)
  fwd pos+neg    grounding_train_loss's forward work, no backward
  full step      value_and_grad + Adam update (the production step)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/grounding_train_breakdown.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.data.types import pack_gt, stack_batches
    from vidsgg_big_tpu.models.grounding import (GroundingConfig,
                                                 GroundingModel)
    from vidsgg_big_tpu.train.train_state import (make_optimizer,
                                                  create_train_state)
    from vidsgg_big_tpu.train.grounding_steps import (
        build_grounding_train_step, grounding_train_loss)

    print(jax.devices(), flush=True)
    b, t, p = 8, 512, 64
    rng = np.random.default_rng(5)
    vids = [make_video(40 + i, video_len=1000, n_gt_trajs=10, n_preds=24,
                       num_enti_cats=81, num_pred_cats=51, feat_dim=4)
            for i in range(b)]
    gts = stack_batches([pack_gt(g, 12, 64, p) for _, g in vids])
    video_len = jnp.asarray([v[1].video_len for v in vids], jnp.int32)
    n_clips = jnp.full((b,), t, jnp.int32)
    clip_mask = jnp.ones((b, t), bool)
    feats = jnp.asarray(rng.normal(size=(b, t, 1024)), jnp.float32)

    cfg = GroundingConfig(dim_feat=1024, dim_clsme=300, dim_hidden=128,
                          num_bins=10, num_pred_cats=51, num_enti_cats=81,
                          compute_dtype="bfloat16")
    model = GroundingModel(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, clip_mask,
                        jnp.zeros((b, p, 3), jnp.int32),
                        jnp.zeros((b, p, 2), jnp.float32),
                        jnp.ones((b, p), bool))
    gts = jax.device_put(gts)
    key = jax.random.PRNGKey(1)

    def timeit(fn, *a, n=20, label=""):
        t0 = time.perf_counter()
        out = fn(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        print(f"  [compile {time.perf_counter() - t0:6.1f} s] {label}",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        dt = (time.perf_counter() - t0) / n * 1000.0
        print(f"  {label:28s} {dt:8.2f} ms", flush=True)
        return dt

    qc = jnp.zeros((b, p, 3), jnp.int32)
    tc = jnp.zeros((b, p, 2), jnp.float32)
    qm = jnp.ones((b, p), bool)

    fwd_pos = jax.jit(lambda pr: model.apply(pr, feats, clip_mask, qc, tc,
                                             qm)[1])
    timeit(fwd_pos, params, label="fwd pos only (determ, Q=64)")

    fwd_train = jax.jit(lambda pr, k: grounding_train_loss(
        model, pr, feats, clip_mask, n_clips, gts, video_len, k)[0])
    timeit(fwd_train, params, key, label="train fwd (pos+neg+loss)")

    tx, _ = make_optimizer(1e-4, 0.2, [10_000])
    state = create_train_state(params, tx)
    step = build_grounding_train_step(model, tx, donate=False)
    dt = timeit(lambda s, k: step(s, feats, clip_mask, n_clips, gts,
                                  video_len, k)[1]["total"],
                state, key, label="full step (fwd+bwd+adam)")
    print(f"  -> {b / dt * 1000:.1f} videos/sec")


if __name__ == "__main__":
    main()
