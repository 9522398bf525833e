"""Benchmark: per-video relation-inference throughput (BIG-C, flagship size).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "videos/sec", "vs_baseline": N}

value       = our jitted BIG-C forward + triplet construction on the TPU,
              flagship VidVRD exp2 geometry (N=50 tracklets, T=256 frames,
              RoI 2048 + I3D 832, Q=192, dims 512, 2 enc / 6 dec layers).
vs_baseline = speedup vs the reference PyTorch implementation executing the
              same per-video workload on this host's CPU (the only reference
              runtime measurable in this container; no GPU numbers are
              published by the reference — see BASELINE.md "Throughput").
"""
import json
import os
import sys
import time
import types

import numpy as np

N_BUCKET, T_BUCKET = 50, 256
DIM_FEAT, DIM_I3D = 2048, 832
BATCH = 8
N_TIMED = 60          # timed iterations (of BATCH videos each); the single
#                       end-of-loop fetch costs one ~25 ms tunnel RTT,
#                       amortized to <0.5 ms per iteration at 60
N_REF_VIDEOS = 3      # torch-CPU reference videos to time
N_WINDOWS = 3         # repeat each timed window and credit the fastest: the
#                       axon tunnel's throughput oscillates ~5x over tens of
#                       minutes (docs/ROUND2.md), and a single window can
#                       land in a slow phase; the fastest of three is the
#                       compute-bound number (each extra window costs <5 s)


def best_window(run_window, n_windows=N_WINDOWS):
    """Return the smallest wall time of ``run_window()`` over n windows."""
    return min(run_window() for _ in range(n_windows))


V5E_PEAK_TFLOPS = 197.0   # one v5e chip, bf16 MXU peak


def mfu_fields(extra, name, jitted, args_, dt_s, peak_tf=V5E_PEAK_TFLOPS,
               pallas_flops=0.0):
    """Per-stage achieved TFLOP/s and MFU into the bench JSON.

    FLOPs come from XLA's compiled cost analysis (algorithmic FLOPs of the
    whole program — matmuls counted unpadded, so head-dim/feature-dim MXU
    padding waste shows up as LOW MFU rather than being flattered away);
    time is the stage's measured per-call wall time; peak is the v5e bf16
    MXU rate.  Best-effort: silently skipped where the backend can't report.

    ``pallas_flops``: analytic matmul FLOPs of Mosaic custom calls in the
    program — cost analysis reports 0 for those, so stages that engage a
    Pallas kernel must add them or their MFU under-counts (round 4 reported
    grounding inference at 17.9% MFU when ~44% of its FLOPs ran inside the
    fused attention kernel).  Helpers: ops.pallas_attention.
    fused_attention_flops, ops.pallas_role_attn.role_attention_flops; the
    added amount is recorded as ``{name}_pallas_tflop`` for auditability.
    """
    try:
        ca = jitted.lower(*args_).compile().cost_analysis()
        if not isinstance(ca, dict):
            ca = ca[0]
        fl = float(ca.get("flops", 0.0))
        if fl > 0.0 and dt_s > 0.0:
            if pallas_flops > 0.0:
                extra[f"{name}_pallas_tflop"] = round(pallas_flops / 1e12, 3)
                fl += pallas_flops
            tf = fl / dt_s / 1e12
            extra[f"{name}_tflops"] = round(tf, 2)
            extra[f"{name}_mfu_pct"] = round(100.0 * tf / peak_tf, 2)
    except Exception as e:
        print(f"[mfu] {name}: cost analysis unavailable: {e!r}",
              file=sys.stderr)


def make_records(n_videos):
    from vidsgg_big_tpu.data.synthetic import make_video
    recs = []
    for i in range(n_videos):
        p, _ = make_video(i, video_len=480, n_gt_trajs=12, n_preds=16,
                          n_distractors=34, feat_dim=DIM_FEAT + DIM_I3D,
                          num_enti_cats=36, num_pred_cats=133)
        recs.append(p)
    return recs


def bench_ours(recs, extra=None):
    import jax
    from vidsgg_big_tpu.data.types import pack_proposal, stack_batches
    from vidsgg_big_tpu.models import BigC, BigCConfig
    from vidsgg_big_tpu.train.steps import build_infer_step

    cfg = BigCConfig(
        num_pred_cats=133, num_enti_cats=36, dim_feat=DIM_FEAT,
        dim_clsme=300, dim_enti=512, dim_pred=512, dim_att=512, dim_ffn=512,
        dim_i3d=DIM_I3D, enco_pool_len=4, n_enco_layers=2, n_deco_layers=6,
        n_att_head=8, num_querys=192,
        compute_dtype="bfloat16")   # heavy per-frame matmuls on the MXU in bf16
    model = BigC(cfg, enti_name_emb=np.zeros((36, 300), np.float32))

    import ml_dtypes
    batch = stack_batches([
        pack_proposal(r, N_BUCKET, T_BUCKET, DIM_FEAT + DIM_I3D,
                      dtype=ml_dtypes.bfloat16)   # bf16 feature storage
        for r in recs[:BATCH]])
    params = model.init(jax.random.PRNGKey(0), batch)
    infer = build_infer_step(model, topk=10)

    # NOTE: on the axon TPU backend jax.block_until_ready does NOT wait for
    # execution, and a host fetch costs a ~25 ms tunnel round trip.  Dispatch
    # the timed iterations asynchronously and fetch only the final result —
    # the device stream is FIFO, so the last fetch bounds all executions and
    # the round trip is amortized across the loop.
    def measure(b):
        b = jax.device_put(b)   # features device-resident: the timed loop
        #                         measures compute, not tunnel H2D replays
        float(np.asarray(infer(params, b).scores).sum())      # compile+warm

        def window():
            t0 = time.perf_counter()
            out = None
            for _ in range(N_TIMED):
                out = infer(params, b)
            float(np.asarray(out.scores).sum())
            return time.perf_counter() - t0

        return BATCH * N_TIMED / best_window(window)

    v_bf16 = measure(batch)
    if extra is not None:
        mfu_fields(extra, "infer", infer, (params, jax.device_put(batch)),
                   BATCH / v_bf16)
    # opt-in int8 feature storage (4x less feature traffic, int8 MXU first
    # layer); reported separately — the headline number stays bf16
    batch_i8 = stack_batches([
        pack_proposal(r, N_BUCKET, T_BUCKET, DIM_FEAT + DIM_I3D,
                      dtype=np.int8) for r in recs[:BATCH]])
    v_int8 = measure(batch_i8)
    return v_bf16, v_int8


def bench_train(recs, extra=None):
    """Full BIG-C train step (fwd+bwd+Hungarian+Adam), exp2 geometry."""
    import jax
    import ml_dtypes
    from vidsgg_big_tpu.data.types import (pack_proposal, pack_gt,
                                           stack_batches)
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.models import BigC, BigCConfig
    from vidsgg_big_tpu.train.train_state import (make_optimizer,
                                                  create_train_state)
    from vidsgg_big_tpu.train.steps import build_train_step

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
    params = model.init(jax.random.PRNGKey(0), props)
    tx, _ = make_optimizer(1e-4, 0.2, [10_000])
    state = create_train_state(params, tx)
    # donate=True is the production config (train/loop.py); the timing
    # window threads state through the step, so donation is valid here —
    # measured worth ~0.15 ms/step (scripts/adam_fusion_experiment.py)
    step = build_train_step(model, tx, donate=True)
    rng = jax.random.PRNGKey(1)
    props, gts = jax.device_put((props, gts))   # exclude H2D from the loop

    state, metrics = step(state, props, gts, rng)          # compile+warm
    float(np.asarray(metrics["total"]))
    n = max(N_TIMED // 2, 1)

    def window():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, props, gts, rng)
        float(np.asarray(metrics["total"]))
        return time.perf_counter() - t0

    dt = best_window(window) / n
    if extra is not None:
        mfu_fields(extra, "train", step, (state, props, gts, rng), dt)
    return dt * 1000.0, BATCH / dt                          # ms/step, v/s


def bench_grounding(extra=None):
    """Grounding (stage 2) batched inference at the worst-case bucket
    (Q=256 unique triplets x T=512 clips, paper-scale dims)."""
    import jax
    import jax.numpy as jnp
    from vidsgg_big_tpu.models.grounding import (GroundingConfig,
                                                 GroundingModel)
    from vidsgg_big_tpu.train.grounding_steps import (
        build_grounding_infer_step)

    b, q, t = 4, 256, 512
    cfg = GroundingConfig(dim_feat=1024, dim_clsme=300, dim_hidden=128,
                          num_bins=10, compute_dtype="bfloat16")
    model = GroundingModel(cfg)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(b, t, 1024)), jnp.float32)
    clip_mask = jnp.ones((b, t), bool)
    n_clips = jnp.full((b,), t, jnp.int32)
    qc = jnp.asarray(rng.integers(1, 50, size=(b, q, 3)), jnp.int32)
    lo = rng.uniform(0, 0.5, size=(b, q, 1))
    temp = jnp.asarray(np.concatenate(
        [lo, lo + rng.uniform(0.1, 0.5, size=(b, q, 1))], -1), jnp.float32)
    qm = jnp.ones((b, q), bool)
    params = model.init(jax.random.PRNGKey(0), feats, clip_mask, qc, temp, qm)
    infer = build_grounding_infer_step(model, score_th=0.9, tiou_th=0.5,
                                       bins_th=0.2, nms_th=0.8)
    out = infer(params, feats, clip_mask, n_clips, qc, temp, qm)
    float(np.asarray(out[1]).sum())                        # compile+warm
    n = max(N_TIMED // 2, 1)

    def window():
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = infer(params, feats, clip_mask, n_clips, qc, temp, qm)
        float(np.asarray(out[1]).sum())
        return time.perf_counter() - t0

    dt = best_window(window) / n
    if extra is not None:
        # the combined encoder runs the fused Pallas attention kernel once
        # per forward at (rows=B*Q, T, e=dim_hidden); the video encoder's
        # (B, T) attention stays on the XLA-visible direct path
        from vidsgg_big_tpu.ops.pallas_attention import fused_attention_flops
        pf = fused_attention_flops(b * q, t, cfg.dim_hidden, 8) \
            if jax.default_backend() == "tpu" else 0.0
        mfu_fields(extra, "grounding_infer", infer,
                   (params, feats, clip_mask, n_clips, qc, temp, qm), dt,
                   pallas_flops=pf)
    return dt / b * 1000.0                                  # ms/video


def bench_grounding_train(extra=None):
    """Grounding (stage 2) train step at paper scale: B=8 videos, T=512
    clips, up to 64 GT predicates/video, bf16 compute."""
    import jax
    import jax.numpy as jnp
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.data.types import pack_gt, stack_batches
    from vidsgg_big_tpu.models.grounding import (GroundingConfig,
                                                 GroundingModel)
    from vidsgg_big_tpu.train.train_state import (make_optimizer,
                                                  create_train_state)
    from vidsgg_big_tpu.train.grounding_steps import (
        build_grounding_train_step)

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
    tx, _ = make_optimizer(1e-4, 0.2, [10_000])
    state = create_train_state(params, tx)
    step = build_grounding_train_step(model, tx, donate=True)
    key = jax.random.PRNGKey(1)
    gts = jax.device_put(gts)                   # exclude H2D from the loop
    state, metrics = step(state, feats, clip_mask, n_clips, gts, video_len,
                          key)
    float(np.asarray(metrics["total"]))                    # compile+warm
    n = max(N_TIMED // 4, 1)

    def window():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, feats, clip_mask, n_clips, gts,
                                  video_len, key)
        float(np.asarray(metrics["total"]))
        return time.perf_counter() - t0

    dt = best_window(window, 2) / n
    if extra is not None:
        # one fused-kernel forward + backward per step over the
        # concatenated pos+neg queries (rows=B*2P, T, e=dim_hidden)
        from vidsgg_big_tpu.ops.pallas_attention import fused_attention_flops
        pf = fused_attention_flops(b * 2 * p, t, cfg.dim_hidden, 8,
                                   backward=True) \
            if jax.default_backend() == "tpu" else 0.0
        mfu_fields(extra, "grounding_train", step,
                   (state, feats, clip_mask, n_clips, gts, video_len, key),
                   dt, pallas_flops=pf)
    return dt * 1000.0, b / dt                              # ms/step, v/s


def bench_vidor(feat_dtype=None, extra=None):
    """BIG-C v7 inference at the VidOR exp4 geometry: N=180 proposals,
    T=512 bucket, RoI(1024)+classeme(300) features, 81/51 vocab, and the
    published 6-enc/4-dec depth (reference experiments/exp4/config_.py:14-15).

    ``feat_dtype=np.int8`` measures the opt-in int8 feature-storage path at
    this production geometry (4x less feature traffic; round-2 measured
    +13-14 % at both geometries)."""
    import jax
    import ml_dtypes
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.data.types import pack_proposal, stack_batches
    from vidsgg_big_tpu.models import BigC, BigCConfig
    from vidsgg_big_tpu.train.steps import build_infer_step

    cfg = BigCConfig(
        num_pred_cats=51, num_enti_cats=81, dim_feat=1024, dim_clsme=300,
        dim_enti=512, dim_pred=512, dim_att=512, dim_ffn=512, dim_i3d=None,
        enco_pool_len=4, n_enco_layers=6, n_deco_layers=4, n_att_head=8,
        num_querys=192, compute_dtype="bfloat16", variant="v7",
        use_clsme=True, use_name_emb=False)
    model = BigC(cfg, enti_name_emb=np.zeros((81, 300), np.float32))
    feat_total = 1024 + 300
    recs = [make_video(i, video_len=1000, n_gt_trajs=12, n_preds=16,
                       n_distractors=60, feat_dim=feat_total,
                       num_enti_cats=81, num_pred_cats=51)[0]
            for i in range(BATCH)]
    batch = stack_batches([
        pack_proposal(r, 180, 512, feat_total,
                      dtype=feat_dtype or ml_dtypes.bfloat16)
        for r in recs])
    params = model.init(jax.random.PRNGKey(0), batch)
    infer = build_infer_step(model, topk=10)
    batch = jax.device_put(batch)               # exclude H2D from the loop
    float(np.asarray(infer(params, batch).scores).sum())   # compile+warm
    n = max(N_TIMED // 2, 1)

    def window():
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = infer(params, batch)
        float(np.asarray(out.scores).sum())
        return time.perf_counter() - t0

    thr = BATCH * n / best_window(window)
    if extra is not None and feat_dtype is None:
        mfu_fields(extra, "vidor_infer", infer, (params, batch), BATCH / thr)
    return thr


def bench_serving_b32(extra=None):
    """Large-batch serving at exp2 geometry (B=32): the regime where the
    fused Pallas role-attention kernel auto-engages (layers.py:219-222,
    measured 1.3x over XLA from B~24).  This stage makes the kernel's
    auto-engage threshold part of a shipped workload, not only a
    microbenchmark."""
    import jax
    import ml_dtypes
    from vidsgg_big_tpu.data.types import pack_proposal, stack_batches
    from vidsgg_big_tpu.models import BigC, BigCConfig
    from vidsgg_big_tpu.train.steps import build_infer_step

    b = 32
    cfg = BigCConfig(
        num_pred_cats=133, num_enti_cats=36, dim_feat=DIM_FEAT,
        dim_clsme=300, dim_enti=512, dim_pred=512, dim_att=512, dim_ffn=512,
        dim_i3d=DIM_I3D, enco_pool_len=4, n_enco_layers=2, n_deco_layers=6,
        n_att_head=8, num_querys=192, compute_dtype="bfloat16")
    model = BigC(cfg, enti_name_emb=np.zeros((36, 300), np.float32))
    recs = make_records(b)
    batch = stack_batches([
        pack_proposal(r, N_BUCKET, T_BUCKET, DIM_FEAT + DIM_I3D,
                      dtype=ml_dtypes.bfloat16) for r in recs])
    params = model.init(jax.random.PRNGKey(0), batch)
    infer = build_infer_step(model, topk=10)
    batch = jax.device_put(batch)
    float(np.asarray(infer(params, batch).scores).sum())   # compile+warm
    n = max(N_TIMED // 2, 1)

    def window():
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = infer(params, batch)
        float(np.asarray(out.scores).sum())
        return time.perf_counter() - t0

    thr = b * n / best_window(window, 2)
    if extra is not None:
        # at B=32 every decoder layer runs the fused role-attention kernel
        # (auto-engaged from B>=24); its FLOPs are invisible to cost analysis
        from vidsgg_big_tpu.ops.pallas_role_attn import role_attention_flops
        pf = cfg.n_deco_layers * role_attention_flops(
            b, cfg.num_querys, N_BUCKET, cfg.dim_att // 2, cfg.dim_enti) \
            if jax.default_backend() == "tpu" else 0.0
        mfu_fields(extra, "serving_b32", infer, (params, batch), b / thr,
                   pallas_flops=pf)
    return thr


def bench_reference(recs):
    """Reference BIG-C (_forward_test) on torch CPU, same workload."""
    import torch

    # torchvision is absent; stub the single unused import in reference utils
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")
        tv_ops.roi_pool = None
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
    sys.path.insert(0, "/root/reference")
    try:
        import tempfile, os
        from models.model_0v10 import BIG_C

        tmp = tempfile.mkdtemp()
        np.save(os.path.join(tmp, "emb.npy"),
                np.zeros((36, 300), np.float32))
        np.save(os.path.join(tmp, "bias.npy"),
                np.zeros((36, 36, 133), np.float32))
        config = dict(
            num_pred_cats=133, num_enti_cats=36, dim_feat=DIM_FEAT,
            dim_clsme=300, dim_enti=512, dim_pred=512, dim_att=512,
            dim_ffn=512, dim_i3d=DIM_I3D, enco_pool_len=4, n_enco_layers=2,
            n_deco_layers=6, n_att_head=8, num_querys=192, neg_weight=0.1,
            positive_vIoU_th=0.5,
            EntiNameEmb_path=os.path.join(tmp, "emb.npy"),
            bias_matrix_path=os.path.join(tmp, "bias.npy"),
            cost_coeff_dict=dict(classification=1.0, adj_matrix=30.0),
            loss_coeff_dict=dict(classification=1.0, adj_matrix=30.0))
        model = BIG_C(config, is_train=False)
        model.eval()

        class P:  # duck-typed TrajProposal
            pass

        def to_proposal(rec):
            p = P()
            p.video_name = rec.video_name
            p.video_len = rec.video_len
            p.video_wh = rec.video_wh
            p.num_proposals = min(rec.num_proposals, N_BUCKET)
            p.cat_ids = torch.tensor(rec.cat_ids[:p.num_proposals],
                                     dtype=torch.long)
            p.scores = torch.tensor(rec.scores[:p.num_proposals])
            p.traj_durations = torch.tensor(
                rec.durations[:p.num_proposals], dtype=torch.long)
            p.bboxes_list = [torch.tensor(b) for b in
                             rec.boxes[:p.num_proposals]]
            p.features_list = [torch.tensor(f) for f in
                               rec.features[:p.num_proposals]]
            return p

        proposals = [to_proposal(r) for r in recs[:N_REF_VIDEOS]]
        with torch.no_grad():
            model([proposals[0]], topk=10)   # warm-up
            times = []
            for _ in range(5):               # host CPU timing is noisy on
                t0 = time.perf_counter()     # this contended single core:
                for p in proposals:          # round-3/4 best-of-2 swung the
                    model([p], topk=10)      # headline ratio ~60%; use the
                times.append(time.perf_counter() - t0)   # median of 5
            times.sort()
            med = times[len(times) // 2]
            spread = (times[-1] - times[0]) / med
        return len(proposals) / med, round(100.0 * spread, 1)
    finally:
        sys.path.remove("/root/reference")


def _git_rev():
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        return "unknown"


STAGE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_stage_cache.json")


def load_stage_cache():
    try:
        with open(STAGE_CACHE) as f:
            return json.load(f)
    except Exception:
        return {}


def save_stage_cache(cache):
    try:
        with open(STAGE_CACHE, "w") as f:
            json.dump(cache, f, indent=1)
    except Exception as e:
        print(f"[stage-cache] save failed: {e!r}", file=sys.stderr)


def main():
    t_start = time.perf_counter()
    # persistent compile cache: cold bench runs pay ~60-300 s per jitted
    # program through the axon compile helper; repeat runs then hit disk
    from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    # Cold-compile runs can take minutes per stage; never let an extra stage
    # push past the harness budget without printing the headline JSON.
    budget = float(os.environ.get("VIDSGG_BENCH_BUDGET", 1500))
    left = lambda: budget - (time.perf_counter() - t_start)
    stage = lambda name: print(
        f"[bench +{time.perf_counter() - t_start:.0f}s] {name}",
        file=sys.stderr, flush=True)
    recs = make_records(max(BATCH, N_REF_VIDEOS))
    trace_dir = os.environ.get("VIDSGG_PROFILE_DIR")
    extra = {}
    stage("BIG-C inference")
    if trace_dir:
        import jax
        with jax.profiler.trace(trace_dir):
            ours, ours_i8 = bench_ours(recs, extra)
        print(f"profiler trace written to {trace_dir}", file=sys.stderr)
    else:
        ours, ours_i8 = bench_ours(recs, extra)
    extra["infer_int8_feats_videos_per_sec"] = round(ours_i8, 1)

    # Per-stage result cache (VERDICT r4 #2): every successful stage
    # persists the extra-fields it produced, keyed by stage name + git rev.
    # A stage gated out by the budget (tunnel slow window) falls back to its
    # most recent cached result instead of leaving a hole in BENCH_r*.json;
    # `extra["stages_from_cache"]` names them so a reader can tell measured
    # from carried-over values.
    rev = _git_rev()
    cache = load_stage_cache()
    extra["stages_from_cache"] = []

    def run_stage(name, min_left, fn):
        """Budget-gate a stage; retry once on transient failures (the axon
        remote-compile helper occasionally drops a response mid-read —
        observed 'response body closed before all bytes were read' — and a
        retry hits the persistent compile cache and succeeds in seconds)."""
        before = dict(extra)
        for attempt in (1, 2):
            try:
                if left() < min_left:
                    raise TimeoutError(f"{left():.0f}s left")
                stage(name if attempt == 1 else f"{name} (retry)")
                fn()
                new = {k: v for k, v in extra.items()
                       if k not in before or before[k] != v}
                if new:
                    cache[name] = {"rev": rev, "ts": time.time(),
                                   "fields": new}
                    save_stage_cache(cache)
                return
            except TimeoutError as e:
                print(f"{name} bench skipped: {e!r}", file=sys.stderr)
                break
            except Exception as e:
                print(f"{name} bench attempt {attempt} failed: {e!r}",
                      file=sys.stderr)
        ent = cache.get(name)
        if ent:
            for k, v in ent["fields"].items():
                extra.setdefault(k, v)
            extra["stages_from_cache"].append(
                {"stage": name, "rev": ent["rev"]})
            print(f"{name}: using cached result from rev {ent['rev']}",
                  file=sys.stderr)

    def _train():
        train_ms, train_vs = bench_train(recs, extra)
        extra["train_step_ms"] = round(train_ms, 2)
        extra["train_videos_per_sec"] = round(train_vs, 1)

    def _grounding():
        extra["grounding_infer_ms_per_video_q256_t512"] = round(
            bench_grounding(extra), 2)

    def _grounding_train():
        g_ms, g_vs = bench_grounding_train(extra)
        extra["grounding_train_step_ms"] = round(g_ms, 2)
        extra["grounding_train_videos_per_sec"] = round(g_vs, 1)

    def _vidor():
        extra["infer_vidor_n180_t512_videos_per_sec"] = round(
            bench_vidor(extra=extra), 1)

    def _serving():
        extra["serving_b32_videos_per_sec"] = round(
            bench_serving_b32(extra), 1)

    # Measure the torch reference immediately after the headline stage: it is
    # CPU-only and cheap (~1 min), and vs_baseline depends on nothing else —
    # when it ran last, a slow tunnel window could eat the whole budget and
    # gate out the denominator of the headline ratio.
    try:
        if left() < 150:
            raise TimeoutError(f"{left():.0f}s left")
        stage("torch reference")
        ref, ref_spread = bench_reference(recs)
        extra["ref_videos_per_sec"] = round(ref, 3)
        extra["ref_pass_spread_pct"] = ref_spread
        cache["torch reference"] = {
            "rev": rev, "ts": time.time(),
            "fields": {"ref_videos_per_sec": round(ref, 3),
                       "ref_pass_spread_pct": ref_spread}}
        save_stage_cache(cache)
    except Exception as e:
        print(f"reference baseline skipped/failed: {e!r}", file=sys.stderr)
        ref = None
        ent = cache.get("torch reference")
        if ent:
            ref = ent["fields"]["ref_videos_per_sec"]
            extra.update(ent["fields"])
            extra["stages_from_cache"].append(
                {"stage": "torch reference", "rev": ent["rev"]})

    # Denominator stabilization (VERDICT r4 #2b): the reference code never
    # changes, yet its measured median swung ~2x across rounds (0.456, 0.723,
    # 0.727, 0.896 v/s) — this host's single core is intermittently stolen by
    # the axon compile helper, so slow medians measure *our* contention, not
    # torch.  The least-contended (fastest) median ever recorded on this host
    # is the best estimate of the true reference rate; pin the ratio's
    # denominator to it (persisted in the stage cache, updated only upward —
    # conservative for vs_baseline).  With the denominator pinned, the
    # consecutive-run vs_baseline spread reduces to the spread of our own
    # best-of-3-window TPU measurement (~1.3% across rounds 3-5).
    best_ent = cache.get("torch reference best", {"fields": {}})
    ref_best = best_ent["fields"].get("ref_videos_per_sec_best", 0.0)
    if ref and ref > ref_best:
        ref_best = ref
        cache["torch reference best"] = {
            "rev": rev, "ts": time.time(),
            "date": time.strftime("%Y-%m-%d"),
            "fields": {"ref_videos_per_sec_best": round(ref, 3)}}
        save_stage_cache(cache)
    if ref_best:
        ref = ref_best
        extra["vs_baseline_denominator"] = round(ref_best, 3)
        extra["vs_baseline_denominator_date"] = cache[
            "torch reference best"].get("date", "")

    def _vidor_int8():
        extra["infer_vidor_int8_feats_videos_per_sec"] = round(
            bench_vidor(feat_dtype=np.int8), 1)

    # soak results (scripts/soak_train.py writes SOAK_*.json at the repo
    # root) ride along so the driver-captured bench records the sustained
    # on-chip numbers, not just steady-state step timings
    import glob
    for soak_path in sorted(glob.glob(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "SOAK_*.json"))):
        try:
            with open(soak_path) as f:
                soak = json.load(f)
            mode = soak.get("mode", "unknown")
            for k in ("steps", "step_ms_p50", "step_ms_p95",
                      "videos_per_s_p50",
                      "compiles_post_warmup", "resume_bit_equal"):
                if k in soak:
                    extra[f"soak_{mode}_{k}"] = soak[k]
        except Exception as e:
            print(f"[soak] {soak_path}: {e!r}", file=sys.stderr)

    # Order = most-recently-changed first (VERDICT r4 #2: the round's
    # headline stage must never be the one gated out); every stage also has
    # the cache fallback above, so a slow tunnel window can no longer leave
    # holes in BENCH_r*.json.
    run_stage("grounding train step", 350, _grounding_train)
    run_stage("train step", 400, _train)
    run_stage("grounding inference", 300, _grounding)
    run_stage("VidOR-geometry inference", 250, _vidor)
    run_stage("serving B=32 (Pallas role-attn auto-engaged)", 250, _serving)
    # lowest priority: gated out first when the tunnel window is slow
    run_stage("VidOR-geometry int8 feature storage", 200, _vidor_int8)
    if ref:
        vs = round(ours / ref, 2)
    else:
        # reference not re-measured this run: report the headline ratio as
        # null and put the cached round-1 torch-CPU rate (BENCH_r01.json:
        # 998.7 v/s at 1373.9x => 0.727 v/s) in a clearly-labeled side field
        vs = None
        extra["vs_baseline_cached_round1"] = round(ours / 0.727, 2)
        extra["vs_baseline_note"] = (
            "reference not re-measured; ratio uses round-1 cached 0.727 v/s")
    print(json.dumps({
        "metric": "BIG-C relation inference throughput (N=50,T=256,"
                  "RoI2048+I3D832,Q=192; vs reference PyTorch on host CPU)",
        "value": round(ours, 3),
        "unit": "videos/sec",
        "vs_baseline": vs,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
