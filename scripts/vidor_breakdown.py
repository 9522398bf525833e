"""Per-stage on-chip breakdown of the VidOR exp4-geometry inference.

Same methodology as scripts/encoder_breakdown.py (isolated jits,
device-resident inputs, slice-fetch sync, best-of-3 windows) at the
published exp4 shapes: B=8, N=180 proposals, T=512 bucket, RoI(1024)+
classeme(300) features, 81/51 vocab, 6-enc/4-dec (reference
experiments/exp4/config_.py:14-15).  Locates where the 224 v/s goes —
the frame grid is 7.2x exp2's rows, so the encoder dominates even more.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/vidor_breakdown.py
"""
import time
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import ml_dtypes  # noqa: E402

from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402
from vidsgg_big_tpu.data.synthetic import make_video  # noqa: E402
from vidsgg_big_tpu.data.types import pack_proposal, stack_batches  # noqa: E402
from vidsgg_big_tpu.models import BigC, BigCConfig  # noqa: E402
from vidsgg_big_tpu.models.big_c import (TrackletEncoder,  # noqa: E402
                                         geometry_features)
from vidsgg_big_tpu.ops.segments import (stretch_conv_patches,  # noqa: E402
                                         adaptive_max_pool1d,
                                         stretch_weighted_mean)
from vidsgg_big_tpu.train.steps import build_infer_step  # noqa: E402

B, N, T, DF, DX, E, Q = 8, 180, 512, 1024, 300, 512, 192


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf[(slice(0, 1),) * leaf.ndim]).sum())


def timeit(fn, *args, n=20):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / n * 1000.0


def main():
    enable_compilation_cache()
    cfg = BigCConfig(
        num_pred_cats=51, num_enti_cats=81, dim_feat=DF, dim_clsme=DX,
        dim_enti=E, dim_pred=E, dim_att=E, dim_ffn=E, dim_i3d=None,
        enco_pool_len=4, n_enco_layers=6, n_deco_layers=4, n_att_head=8,
        num_querys=Q, compute_dtype="bfloat16", variant="v7",
        use_clsme=True, use_name_emb=False)
    model = BigC(cfg, enti_name_emb=np.zeros((81, DX), np.float32))
    recs = [make_video(i, video_len=1000, n_gt_trajs=12, n_preds=16,
                       n_distractors=60, feat_dim=DF + DX,
                       num_enti_cats=81, num_pred_cats=51)[0]
            for i in range(B)]
    batch = stack_batches([pack_proposal(r, N, T, DF + DX,
                                         dtype=ml_dtypes.bfloat16)
                           for r in recs])
    batch = jax.device_put(batch)
    params = model.init(jax.random.PRNGKey(0), batch)
    p_enc = params["params"]["tracklet_encoder"]

    rng = np.random.default_rng(0)
    bf = ml_dtypes.bfloat16
    vis = jnp.asarray(np.asarray(batch.feats[..., :DF]))      # (B,N,T,1024)
    extra = jnp.asarray(np.asarray(batch.feats[..., DF:]))    # (B,N,T,300)
    x2e = jnp.asarray(rng.normal(size=(B, N, T, 2 * E)).astype(bf))
    idx = jnp.asarray(np.asarray(batch.stretch_idx.reshape(B * N, T)))
    w_vis1 = jnp.asarray(rng.normal(size=(DF, E)).astype(bf) / 32)
    w_vis2 = jnp.asarray(rng.normal(size=(E, E)).astype(bf) / 23)
    w_conv = jnp.asarray(rng.normal(size=(3 * 2 * E, E)).astype(bf) / 55)
    lengths = jnp.asarray(np.asarray(
        batch.durations[..., 1] - batch.durations[..., 0] + 1))

    rows = []

    def stage(name, ms):
        rows.append((name, ms))
        print(f"{name:<46} {ms:8.3f} ms", flush=True)

    f = jax.jit(lambda v: jnp.maximum(
        jnp.maximum(v.reshape(-1, DF) @ w_vis1, 0) @ w_vis2, 0))
    stage("bare visual MLP matmuls (737280x1024->512..)", timeit(f, vis))

    from vidsgg_big_tpu.models.layers import MLP, xavier_normal

    geo_mlp = MLP((E, E), kernel_init=xavier_normal)
    vg = {"params": p_enc["fc_bbox2enti"]}
    stage("geometry feats + geo MLP", timeit(
        jax.jit(lambda b: geo_mlp.apply(
            vg, geometry_features(b).astype(bf))), batch))

    stage("stretch+conv (selection + conv matmul, 1 jit)", timeit(
        jax.jit(lambda x, i: stretch_conv_patches(
            x.reshape(B * N, T, -1), i) @ w_conv), x2e, idx))

    stage("classeme stretch_weighted_mean (300ch)", timeit(
        jax.jit(lambda e, ln: stretch_weighted_mean(e, ln)), extra, lengths))

    conv_out = jnp.asarray(
        rng.normal(size=(B * N, T // 2, E)).astype(np.float32))
    node_mlp = MLP((E, E), kernel_init=xavier_normal)
    vn = {"params": p_enc["fc_enti2enco"]}
    stage("pool + node MLP", timeit(
        jax.jit(lambda c: node_mlp.apply(vn, adaptive_max_pool1d(
            c, 4, axis=-2).reshape(B, N, 4 * E))), conv_out))

    enc = TrackletEncoder(E, DF, 4, compute_dtype="bfloat16",
                          name="tracklet_encoder")
    stage("full tracklet encoder (fused)", timeit(
        jax.jit(lambda b: enc.apply({"params": p_enc}, b)[0]), batch))

    t_fwd = timeit(jax.jit(
        lambda p, b: model.apply(p, b)["pred_logits"]), params, batch)
    stage("full forward (enc + 6 enco + 4 deco + head)", t_fwd)

    infer = build_infer_step(model, topk=10)
    t_inf = timeit(lambda p, b: infer(p, b).scores, params, batch)
    stage("full infer (+ triplet construction)", t_inf)
    print(f"\nthroughput: {B / t_inf * 1000:.1f} videos/sec "
          f"({t_inf / B:.2f} ms/video)")


if __name__ == "__main__":
    main()
