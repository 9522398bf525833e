"""Fine-grained on-chip breakdown of the exp2 inference pipeline.

Times each pipeline piece in isolation (own jit, device-resident inputs,
fetch-once timing) to locate the gap between the 41%-MFU full forward and
the encoder's bare-matmul parity: geometry MLP, visual MLP, fused
stretch+conv selection, conv matmul, pool+node MLP, transformer encoder,
decoder stack, triplet construction.  Run on the TPU:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/encoder_breakdown.py
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
from vidsgg_big_tpu.models.big_c import geometry_features  # noqa: E402
from vidsgg_big_tpu.models.triplets import construct_triplets  # noqa: E402
from vidsgg_big_tpu.ops.segments import (stretch_conv_patches,  # noqa: E402
                                         adaptive_max_pool1d)
from vidsgg_big_tpu.train.steps import build_infer_step  # noqa: E402

B, N, T, DF, DI, E, Q = 8, 50, 256, 2048, 832, 512, 192


def _sync(out):
    # fetch a 1-element slice: the axon stream is FIFO so this bounds all
    # prior executions while shipping ~nothing over the tunnel (fetching a
    # full intermediate, e.g. 300 MB of patches, would swamp the timing)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf[(slice(0, 1),) * leaf.ndim]).sum())


def timeit(fn, *args, n=40):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    enable_compilation_cache()
    cfg = BigCConfig(num_pred_cats=133, num_enti_cats=36, dim_feat=DF,
                     dim_clsme=300, dim_enti=E, dim_pred=E, dim_att=E,
                     dim_ffn=E, dim_i3d=DI, enco_pool_len=4, n_enco_layers=2,
                     n_deco_layers=6, n_att_head=8, num_querys=Q,
                     compute_dtype="bfloat16")
    model = BigC(cfg, enti_name_emb=np.zeros((36, 300), np.float32))
    recs = [make_video(i, video_len=480, n_gt_trajs=12, n_preds=16,
                       n_distractors=34, feat_dim=DF + DI,
                       num_enti_cats=36, num_pred_cats=133)[0]
            for i in range(B)]
    batch = stack_batches([pack_proposal(r, N, T, DF + DI,
                                         dtype=ml_dtypes.bfloat16)
                           for r in recs])
    batch = jax.device_put(batch)
    params = model.init(jax.random.PRNGKey(0), batch)
    p_enc = params["params"]["tracklet_encoder"]

    rng = np.random.default_rng(0)
    bf = ml_dtypes.bfloat16
    vis = jnp.asarray(np.asarray(batch.feats[..., :DF]))          # (B,N,T,DF)
    geo_in = jax.jit(geometry_features)(batch)
    x2e = jnp.asarray(rng.normal(size=(B, N, T, 2 * E)).astype(bf))
    idx = batch.stretch_idx.reshape(B * N, T)
    patches_shape = jax.eval_shape(
        lambda x, i: stretch_conv_patches(x, i), x2e.reshape(B * N, T, -1),
        idx)
    patches = jnp.asarray(rng.normal(size=patches_shape.shape).astype(bf))

    w_vis1 = jnp.asarray(rng.normal(size=(DF, E)).astype(bf) / 45)
    w_vis2 = jnp.asarray(rng.normal(size=(E, E)).astype(bf) / 23)
    w_conv = jnp.asarray(rng.normal(size=(3 * 2 * E, E)).astype(bf) / 55)

    rows = []

    def stage(name, ms):
        rows.append((name, ms))
        print(f"{name:<42} {ms:8.3f} ms", flush=True)

    # speed-of-light: the visual MLP as two bare matmuls
    f = jax.jit(lambda v: jnp.maximum(
        jnp.maximum(v.reshape(-1, DF) @ w_vis1, 0) @ w_vis2, 0))
    stage("bare visual MLP matmuls (B*N*T,2048)x..", timeit(f, vis))

    # encoder pieces
    from flax import linen as nn
    from vidsgg_big_tpu.models.layers import MLP, xavier_normal

    geo_mlp = MLP((E, E), kernel_init=xavier_normal)
    vg = {"params": p_enc["fc_bbox2enti"]}
    stage("geometry feats + geo MLP", timeit(
        jax.jit(lambda b: geo_mlp.apply(
            vg, geometry_features(b).astype(bf))), batch))

    vis_mlp = MLP((E, E), kernel_init=xavier_normal)
    vv = {"params": p_enc["fc_feat2enti"]}
    stage("visual MLP (module)", timeit(
        jax.jit(lambda v: vis_mlp.apply(vv, v)), vis))

    stage("stretch+conv selection (patches)", timeit(
        jax.jit(lambda x, i: stretch_conv_patches(
            x.reshape(B * N, T, -1), i)), x2e, idx))

    stage("conv matmul (3*1024 -> 512)", timeit(
        jax.jit(lambda p: p @ w_conv), patches))

    conv_out = jnp.asarray(
        rng.normal(size=(B * N, T // 2, E)).astype(np.float32))
    node_mlp = MLP((E, E), kernel_init=xavier_normal)
    vn = {"params": p_enc["fc_enti2enco"]}
    stage("pool + node MLP", timeit(
        jax.jit(lambda c: node_mlp.apply(vn, adaptive_max_pool1d(
            c, 4, axis=-2).reshape(B, N, 4 * E))), conv_out))

    from vidsgg_big_tpu.models.big_c import TrackletEncoder
    enc = TrackletEncoder(E, DF, 4, compute_dtype="bfloat16",
                          name="tracklet_encoder")
    stage("full tracklet encoder", timeit(
        jax.jit(lambda b: enc.apply({"params": p_enc}, b)[0]), batch))

    t_fwd = timeit(jax.jit(
        lambda p, b: model.apply(p, b)["pred_logits"]), params, batch)
    stage("full forward (enc+trans+dec+head)", t_fwd)

    infer = build_infer_step(model, topk=10)
    t_inf = timeit(lambda p, b: infer(p, b).scores, params, batch)
    stage("full infer (+triplet construction)", t_inf)
    print(f"\nthroughput: {B / t_inf * 1000:.1f} videos/sec")

    # decoder-only: drive the decoder stack with a fixed encoder output
    enco_out = jnp.asarray(rng.normal(size=(B, N, E)).astype(np.float32))

    from vidsgg_big_tpu.models.layers import (RoleAttnDecoderLayer,
                                              sine_pos_embedding)

    def dec_stack(p, eo, mask):
        pe = sine_pos_embedding(Q, E)
        pq = jnp.zeros((B, Q, E))
        att = None
        for i in range(cfg.n_deco_layers):
            layer = RoleAttnDecoderLayer(E, 8, E, E, E, 0.1,
                                         name=f"decoder{i}")
            pq, att = layer.apply(
                {"params": p["params"][f"decoder{i}"]}, pq, pe, eo, mask)
        return pq, att

    stage("decoder stack alone (6 layers)", timeit(
        jax.jit(dec_stack), params, enco_out, batch.traj_mask))

    logits = jnp.asarray(rng.normal(size=(B, Q, 133)).astype(np.float32))
    att = jnp.abs(jnp.asarray(
        rng.normal(size=(B, 2, Q, N)).astype(np.float32)))
    trip_fn = jax.jit(jax.vmap(
        lambda lg, at, du, sc, ci, ma: construct_triplets(
            lg, at, du, sc, ci, ma, topk=10, num_enti_cats=36,
            num_pred_cats=133)))
    stage("triplet construction alone", timeit(
        trip_fn, logits, att, batch.durations, batch.scores,
        batch.cat_ids, batch.traj_mask))


if __name__ == "__main__":
    main()
