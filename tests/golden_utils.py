"""Shared fixed-seed pipeline for the frozen golden test.

The golden test pins the end-to-end triplet output of the flagship model on
fixed-seed synthetic videos, so post-hoc refactors cannot silently shift
outputs (tolerances absorb cross-version float drift; structure must match
exactly).  Regenerate with scripts/regen_golden.py after an *intentional*
output change, and say why in the commit.
"""
import numpy as np


def golden_outputs():
    import jax
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.data.types import pack_proposal, stack_batches
    from vidsgg_big_tpu.models import BigC, BigCConfig
    from vidsgg_big_tpu.train.steps import build_infer_step

    cfg = BigCConfig(
        num_pred_cats=14, num_enti_cats=10, dim_feat=48, dim_clsme=300,
        dim_enti=32, dim_pred=32, dim_att=32, dim_ffn=48, dim_i3d=16,
        enco_pool_len=4, n_enco_layers=2, n_deco_layers=2, n_att_head=4,
        num_querys=24)
    model = BigC(cfg, enti_name_emb=np.zeros((10, 300), np.float32))
    recs = [make_video(1000 + i, video_len=64, feat_dim=64, n_gt_trajs=4,
                       n_preds=5, num_enti_cats=10, num_pred_cats=14)[0]
            for i in range(3)]
    batch = stack_batches([pack_proposal(r, 8, 64, 64) for r in recs])
    params = model.init(jax.random.PRNGKey(7), batch)
    trip = jax.device_get(build_infer_step(model, topk=3)(params, batch))

    out = {}
    for i, r in enumerate(recs):
        valid = np.asarray(trip.valid[i])
        order = np.lexsort(np.asarray(trip.quintuples[i])[valid].T)
        out[r.video_name] = {
            "quintuples": np.asarray(trip.quintuples[i])[valid][order]
            .astype(int).tolist(),
            "scores": [[round(float(x), 6) for x in row] for row in
                       np.asarray(trip.scores[i])[valid][order]],
            "dura": np.asarray(trip.dura_inters[i])[valid][order]
            .astype(int).tolist(),
        }
    return out
