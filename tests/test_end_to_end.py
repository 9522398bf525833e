"""End-to-end learning test: overfitting BIG-C on a tiny synthetic set must
drive the full challenge-metric pipeline (vIoU alignment -> Hungarian ->
losses -> triplet construction -> format conversion -> mAP) close to 1."""
import numpy as np
import jax
import pytest

from vidsgg_big_tpu.data.synthetic import make_video
from vidsgg_big_tpu.data.types import pack_proposal, pack_gt, stack_batches
from vidsgg_big_tpu.models import BigC, BigCConfig
from vidsgg_big_tpu.train.train_state import make_optimizer, create_train_state
from vidsgg_big_tpu.train.steps import build_train_step, build_infer_step
from vidsgg_big_tpu.evaluation.convert import EvalFmtCvtor
from vidsgg_big_tpu.evaluation.metrics import evaluate


@pytest.mark.slow
def test_bigc_overfit_reaches_high_map():
    feat = 48
    cfg = BigCConfig(
        num_pred_cats=16, num_enti_cats=10, dim_feat=32, dim_clsme=16,
        dim_enti=64, dim_pred=64, dim_att=64, dim_ffn=64, dim_i3d=16,
        enco_pool_len=4, n_enco_layers=1, n_deco_layers=2, n_att_head=4,
        num_querys=32, dropout=0.0)
    model = BigC(cfg, enti_name_emb=np.random.default_rng(0).normal(
        0, 0.1, (10, 16)).astype(np.float32))
    vids = [make_video(s, video_len=80, feat_dim=feat, n_gt_trajs=3,
                       n_preds=4, n_distractors=1, num_enti_cats=10,
                       num_pred_cats=16) for s in range(2)]
    props = stack_batches([pack_proposal(p, 6, 128, feat) for p, _ in vids])
    gts = stack_batches([pack_gt(g, 4, 128, 6) for _, g in vids])
    params = model.init(jax.random.PRNGKey(0), props)
    tx, _ = make_optimizer(3e-4, 0.2, [100000])
    state = create_train_state(params, tx)
    step = build_train_step(model, tx, donate=False)
    infer = build_infer_step(model, topk=5)

    cvt = EvalFmtCvtor("vidvrd")
    gt_all = {}
    for p, g in vids:
        gt_all.update(cvt.to_eval_format_gt(g))

    rng = jax.random.PRNGKey(1)
    for _ in range(120):
        rng, sub = jax.random.split(rng)
        state, m = step(state, props, gts, sub)
    assert np.isfinite(float(m["total"]))

    trip = jax.device_get(infer(state.params, props))
    preds = {}
    for i, (p, g) in enumerate(vids):
        one = jax.tree_util.tree_map(lambda x: x[i], trip)
        preds.update(cvt.to_eval_format_pr(p, one))
    mAP, rec, prec = evaluate(gt_all, preds)
    assert mAP > 0.5, (mAP, rec, prec)
    assert prec[1] > 0.5
