"""Ad-hoc perf breakdown of BIG-C inference on the real chip.

Times progressively larger prefixes of the forward (tracklet encoder ->
+transformer encoder -> +decoder -> full infer incl. triplets) and batch
scaling, using the fetch-once timing recipe (axon: block_until_ready is a
no-op; one host fetch bounds the FIFO stream).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from vidsgg_big_tpu.data.synthetic import make_video
from vidsgg_big_tpu.data.types import pack_proposal, stack_batches
from vidsgg_big_tpu.models import BigC, BigCConfig
from vidsgg_big_tpu.models.big_c import TrackletEncoder
from vidsgg_big_tpu.train.steps import build_infer_step
import ml_dtypes

N, T, DF, DI = 50, 256, 2048, 832


def make_batch(b):
    recs = [make_video(i, video_len=480, n_gt_trajs=12, n_preds=16,
                       n_distractors=34, feat_dim=DF + DI,
                       num_enti_cats=36, num_pred_cats=133)[0]
            for i in range(b)]
    return stack_batches([pack_proposal(r, N, T, DF + DI,
                                        dtype=ml_dtypes.bfloat16)
                          for r in recs])


def timeit(fn, *args, n=40):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(np.asarray(x).sum()) if
                           hasattr(x, 'sum') else x,
                           jax.tree_util.tree_leaves(out)[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    cfg = BigCConfig(num_pred_cats=133, num_enti_cats=36, dim_feat=DF,
                     dim_clsme=300, dim_enti=512, dim_pred=512, dim_att=512,
                     dim_ffn=512, dim_i3d=DI, enco_pool_len=4,
                     n_enco_layers=2, n_deco_layers=6, n_att_head=8,
                     num_querys=192, compute_dtype="bfloat16")
    model = BigC(cfg, enti_name_emb=np.zeros((36, 300), np.float32))
    for b in (8, 16, 32):
        batch = make_batch(b)
        params = model.init(jax.random.PRNGKey(0), batch)

        enc = TrackletEncoder(cfg.dim_enti, cfg.dim_feat, cfg.enco_pool_len,
                              compute_dtype=cfg.compute_dtype,
                              name="tracklet_encoder")
        enc_params = {"params": params["params"]["tracklet_encoder"]}
        t_enc = timeit(jax.jit(lambda p, x: enc.apply(p, x)[0]),
                       enc_params, batch)

        t_fwd = timeit(jax.jit(lambda p, x: model.apply(p, x)["pred_logits"]),
                       params, batch)

        infer = build_infer_step(model, topk=10)
        t_inf = timeit(lambda p, x: infer(p, x).scores, params, batch)

        print(f"B={b:3d}: encoder {t_enc:7.2f} ms | forward {t_fwd:7.2f} ms |"
              f" +triplets {t_inf:7.2f} ms | {b / t_inf * 1000:7.1f} v/s")


if __name__ == "__main__":
    main()
