"""Where does the grounding *inference* step's time go?  (VERDICT r4 #4)

Bench geometry (bench.py bench_grounding): B=4, Q=256, T=512, H=128, bf16,
the stage-B worst-case bucket.  BENCH_r04 reported 10.59 ms/video at 17.9%
MFU with no attribution.  This times the full jitted infer step and then
each submodule in isolation (separately jitted, scalar-fetch synced):

  full infer        build_grounding_infer_step (model fwd + decode)
  model fwd         GroundingModel.apply only
  decode            grounding_decode only (on precomputed maps)
  video encoder     QANet over (B=4, T=512)
  query encoder     QANet over (BQ=1024, L=3)   <- tiny-T tile-padding tax
  sim fusion        proj2sim + 3 einsums + concat + vq_fc
  combined encoder  QANet over (BQ=1024, T=512) (fused-kernel eligible)
  conv heads x3     ConvHead over (BQ=1024, T=512)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/grounding_infer_breakdown.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B, Q, T, H = 4, 256, 512, 128


def main():
    import jax
    import jax.numpy as jnp
    from vidsgg_big_tpu.models.grounding import (
        GroundingConfig, GroundingModel, QANetEncoderLayer, ConvHead,
        grounding_decode)
    from vidsgg_big_tpu.train.grounding_steps import (
        build_grounding_infer_step)

    print(jax.devices(), flush=True)
    cfg = GroundingConfig(dim_feat=1024, dim_clsme=300, dim_hidden=128,
                          num_bins=10, compute_dtype="bfloat16")
    model = GroundingModel(cfg)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(B, T, 1024)), jnp.float32)
    clip_mask = jnp.ones((B, T), bool)
    n_clips = jnp.full((B,), T, jnp.int32)
    qc = jnp.asarray(rng.integers(1, 50, size=(B, Q, 3)), jnp.int32)
    lo = rng.uniform(0, 0.5, size=(B, Q, 1))
    temp = jnp.asarray(np.concatenate(
        [lo, lo + rng.uniform(0.1, 0.5, size=(B, Q, 1))], -1), jnp.float32)
    qm = jnp.ones((B, Q), bool)
    params = model.init(jax.random.PRNGKey(0), feats, clip_mask, qc, temp,
                        qm)

    def timeit(raw_fn, *a, n=20, label=""):
        fn = jax.jit(lambda *args: jnp.asarray(
            jax.tree_util.tree_leaves(raw_fn(*args))[0],
            jnp.float32).sum())
        t0 = time.perf_counter()
        out = fn(*a)
        float(np.asarray(out))
        c = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):                    # tunnel oscillates; best of 3
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*a)
            float(np.asarray(out))
            best = min(best, (time.perf_counter() - t0) / n * 1000.0)
        print(f"  {label:46s} {best:8.2f} ms   (compile {c:5.1f} s)",
              flush=True)
        return best

    # ---- full step --------------------------------------------------------
    infer = build_grounding_infer_step(model, score_th=0.9, tiou_th=0.5,
                                       bins_th=0.2, nms_th=0.8)
    timeit(lambda p: infer(p, feats, clip_mask, n_clips, qc, temp, qm),
           params, label=f"full infer step (B={B}, Q={Q}, T={T})")

    # ---- model fwd only ---------------------------------------------------
    timeit(lambda p: model.apply(p, feats, clip_mask, qc, temp, qm),
           params, label="model fwd only")

    # ---- decode only (on live maps) ----------------------------------------
    regrs, conf, cls = jax.jit(model.apply)(params, feats, clip_mask, qc,
                                            temp, qm)

    import functools
    dec = functools.partial(grounding_decode, score_th=0.9, tiou_th=0.5,
                            bins_th=0.2, nms_th=0.8)
    timeit(lambda r, c_, s: jax.vmap(dec)(r, c_, s, temp, n_clips,
                                          clip_mask, qm),
           regrs, conf, cls, label="decode only (pool+NMS)")

    # ---- submodules ---------------------------------------------------------
    cdt = jnp.bfloat16
    xb = jnp.asarray(rng.normal(size=(B, T, H)), cdt)          # video enc in
    xq = jnp.asarray(rng.normal(size=(B * Q, 3, H)), cdt)      # query enc in
    xc = jnp.asarray(rng.normal(size=(B * Q, T, H)), cdt)      # combined in
    mb = jnp.ones((B, T), bool)
    mc = jnp.ones((B * Q, T), bool)

    enc_v = QANetEncoderLayer(H, 4, 7, dtype=cdt)
    pv = enc_v.init(jax.random.PRNGKey(0), xb, mask=mb)
    timeit(lambda p, v: enc_v.apply(p, v, mask=mb), pv, xb,
           label="video encoder (B=4, T=512)")

    enc_q = QANetEncoderLayer(H, 4, 3, dtype=cdt)
    pq = enc_q.init(jax.random.PRNGKey(0), xq)
    timeit(lambda p, v: enc_q.apply(p, v), pq, xq,
           label="query encoder (BQ=1024, L=3)")

    enc_c = QANetEncoderLayer(H, 4, 7, dtype=cdt)
    pc = enc_c.init(jax.random.PRNGKey(0), xc, mask=mc)
    timeit(lambda p, v: enc_c.apply(p, v, mask=mc), pc, xc,
           label="combined encoder (BQ=1024, T=512) fused")
    enc_c2 = QANetEncoderLayer(H, 4, 7, dtype=cdt, fused_attention=False)
    timeit(lambda p, v: enc_c2.apply(p, v, mask=mc), pc, xc,
           label="combined encoder chunked (ablation)")

    # sim fusion + vq_fc in isolation (video (B,T,H) x query (B,Q,3,H))
    video = jnp.asarray(rng.normal(size=(B, T, H)), cdt)
    query = jnp.asarray(rng.normal(size=(B, Q, 3, H)), cdt)
    wsim = jnp.asarray(rng.normal(size=(H, H)) * 0.05, jnp.float32)
    wvq = jnp.asarray(rng.normal(size=(4 * H, H)) * 0.05, jnp.float32)

    def sim_fusion(video, query):
        vproj = video @ wsim.astype(cdt)
        sim = jnp.einsum("bth,bqlh->bqtl", vproj, query).astype(jnp.float32)
        sim_r = jax.nn.softmax(sim, axis=-1).astype(cdt)
        sim_c = jax.nn.softmax(sim, axis=-2).astype(cdt)
        mat_a = jnp.einsum("bqtl,bqlh->bqth", sim_r, query)
        cv = jnp.einsum("bqsl,bsh->bqlh", sim_c, video)
        mat_b = jnp.einsum("bqtl,bqlh->bqth", sim_r, cv)
        vexp = video[:, None]
        combined = jnp.concatenate(
            [jnp.broadcast_to(vexp, mat_a.shape), mat_a, mat_a * vexp,
             mat_b * vexp], axis=-1)
        return combined @ wvq.astype(cdt)
    timeit(sim_fusion, video, query, label="sim fusion + vq_fc")

    head = ConvHead(H, 2 * cfg.num_bins, sigmoid=True, dtype=cdt)
    ph = head.init(jax.random.PRNGKey(0), xc, mask=mc)
    t1 = timeit(lambda p, v: head.apply(p, v, mask=mc), ph, xc,
                label="one ConvHead (BQ=1024, T=512)")
    print(f"  {'3 heads (extrapolated)':46s} {3 * t1:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
