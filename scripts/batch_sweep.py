"""Inference throughput vs batch size + VidOR-geometry (N=180) measurement.

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/batch_sweep.py
"""
import time

import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def build(n_bucket, t_bucket, dim_feat, dim_i3d, num_enti, num_pred,
          num_querys, batch, n_gt=12, n_preds=16, n_distractors=34,
          video_len=480, variant="v10", **kw):
    import jax
    import ml_dtypes
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.data.types import pack_proposal, stack_batches
    from vidsgg_big_tpu.models import BigC, BigCConfig
    from vidsgg_big_tpu.train.steps import build_infer_step

    cfg = BigCConfig(
        num_pred_cats=num_pred, num_enti_cats=num_enti, dim_feat=dim_feat,
        dim_clsme=300, dim_enti=512, dim_pred=512, dim_att=512, dim_ffn=512,
        dim_i3d=dim_i3d, enco_pool_len=4, n_enco_layers=2, n_deco_layers=6,
        n_att_head=8, num_querys=num_querys, compute_dtype="bfloat16",
        variant=variant, **kw)
    model = BigC(cfg, enti_name_emb=np.zeros((num_enti, 300), np.float32))
    feat_total = dim_feat + (dim_i3d or 0) + (
        300 if cfg.clsme_in_feats else 0)
    recs = [make_video(i, video_len=video_len, n_gt_trajs=n_gt,
                       n_preds=n_preds, n_distractors=n_distractors,
                       feat_dim=feat_total, num_enti_cats=num_enti,
                       num_pred_cats=num_pred)[0] for i in range(batch)]
    b = stack_batches([
        pack_proposal(r, n_bucket, t_bucket, feat_total,
                      dtype=ml_dtypes.bfloat16) for r in recs])
    params = model.init(jax.random.PRNGKey(0), b)
    infer = build_infer_step(model, topk=10)
    return infer, params, b


def measure(infer, params, b, batch, n=40):
    float(np.asarray(infer(params, b).scores).sum())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = infer(params, b)
    float(np.asarray(out.scores).sum())
    return batch * n / (time.perf_counter() - t0)


def main():
    import jax
    print(jax.devices(), flush=True)
    # exp2 geometry batch sweep
    for batch in (8, 16, 32):
        infer, params, b = build(50, 256, 2048, 832, 36, 133, 192, batch)
        v = measure(infer, params, b, batch)
        print(f"exp2 N=50 T=256 B={batch}: {v:.1f} videos/sec", flush=True)
    # VidOR geometry (exp4, v7/classeme variant): N=180 proposals, T=512,
    # RoI(1024)+classeme(300) features
    for batch in (8, 16):
        infer, params, b = build(180, 512, 1024, None, 81, 51, 192, batch,
                                 n_distractors=60, video_len=1000,
                                 variant="v7", use_clsme=True,
                                 use_name_emb=False)
        v = measure(infer, params, b, batch)
        print(f"vidor N=180 T=512 B={batch}: {v:.1f} videos/sec", flush=True)


if __name__ == "__main__":
    main()
