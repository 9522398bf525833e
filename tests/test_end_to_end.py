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

pytestmark = pytest.mark.slow  # smoke tier: -m 'not slow' (see pytest.ini)


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


def _toy_graph(spans, video_len, num_enti_cats, seed):
    """Hand-built GraphBatch: full-length trajectories (so the subject∩object
    window spans the whole video) and predicate durations strictly inside it
    — the grounding model must *localize*, not echo the fallback window."""
    from vidsgg_big_tpu.data.types import GraphBatch

    g_bucket, tg_bucket, p_bucket = 6, 8, 8
    p = len(spans)
    rng = np.random.default_rng(seed)
    traj_cats = np.zeros((g_bucket,), np.int32)
    traj_cats[:4] = rng.permutation(np.arange(1, num_enti_cats))[:4]
    traj_durations = np.zeros((g_bucket, 2), np.int32)
    traj_durations[:4] = [0, video_len - 1]
    adj = np.zeros((2, p_bucket, g_bucket), np.float32)
    pred_cats = np.zeros((p_bucket,), np.int32)
    pred_durations = np.zeros((p_bucket, 2), np.float32)
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    for i, span in enumerate(spans):
        pred_cats[i] = 1 + i                       # distinct predicates
        pred_durations[i] = span
        adj[0, i, pairs[i][0]] = 1.0
        adj[1, i, pairs[i][1]] = 1.0
    traj_mask = np.arange(g_bucket) < 4
    pred_mask = np.arange(p_bucket) < p
    return GraphBatch(
        traj_cats=traj_cats, traj_durations=traj_durations,
        traj_boxes=np.zeros((g_bucket, tg_bucket, 4), np.float32),
        traj_mask=traj_mask, pred_cats=pred_cats,
        pred_durations=pred_durations, pred_mask=pred_mask, adj=adj)


@pytest.mark.slow
def test_grounding_overfit_localizes_spans():
    """Grounding-stage learning test: overfitting the DEBUG-equivalent model
    on two tiny synthetic videos must localize GT predicate durations that
    are strictly inside the subject∩object window.

    The assertions target the *classification/centerness* localization
    signal, which is what this architecture learns first: at default init
    the regression sigmoids are saturated (measured mean |logit| 34 on the
    torch reference itself at the same dims — the concat-of-products
    sim-fusion amplifies; the reference escapes over its 80-epoch horizon
    after the BCE losses descale the trunk), so regression tIoU is not a
    unit-test-sized signal.  What is: (a) per-clip foreground scores inside
    vs outside the GT span, and (b) the decode's bin probabilities selecting
    each query's GT bin and rejecting the other.
    """
    import jax.numpy as jnp
    from vidsgg_big_tpu.models.grounding import (
        GroundingModel, GroundingConfig, grounding_gt_labels)
    from vidsgg_big_tpu.train.grounding_steps import (
        build_grounding_train_step, build_grounding_infer_step)
    from vidsgg_big_tpu.train.grounding_data import prepare_grounding_gt

    b, t, d, k, video_len = 2, 16, 16, 2, 60
    cfg = GroundingConfig(dim_feat=d, dim_clsme=8, dim_hidden=64, num_bins=k,
                          num_pred_cats=8, num_enti_cats=6)
    model = GroundingModel(cfg)
    spans = [[[5, 20], [25, 40], [8, 28], [35, 55]],
             [[2, 14], [30, 50], [16, 33], [44, 58]]]
    gts = stack_batches([_toy_graph(s, video_len, cfg.num_enti_cats, i)
                         for i, s in enumerate(spans)])
    video_len_arr = np.full((b,), video_len, np.int32)
    rng0 = np.random.default_rng(3)
    feats = jnp.asarray(rng0.normal(size=(b, t, d)).astype(np.float32))
    clip_mask = np.ones((b, t), bool)
    n_clips = np.full((b,), t, np.int32)

    prep = jax.vmap(lambda g, vl, r: prepare_grounding_gt(
        g, vl, cfg.num_pred_cats, r))(
        gts, jnp.asarray(video_len_arr),
        jax.random.split(jax.random.PRNGKey(7), b))
    labels = jax.vmap(lambda tg, nc: grounding_gt_labels(
        tg, nc, t=t, num_bins=k))(prep["target"], jnp.asarray(n_clips))
    gt_scores, bin_ids = np.asarray(labels[2]), np.asarray(labels[3])
    qm = np.asarray(prep["query_mask"])

    params = model.init(jax.random.PRNGKey(0), feats, clip_mask,
                        prep["query_cats"], prep["temporal"],
                        prep["query_mask"])

    tx, _ = make_optimizer(3e-3, 0.2, [100000])
    state = create_train_state(params, tx)
    step = build_grounding_train_step(model, tx, donate=False)
    infer = build_grounding_infer_step(model, score_th=0.5, tiou_th=0.5,
                                       bins_th=0.1, nms_th=0.5)

    def fg_bg_margin(variables):
        """Mean per-clip score (sigmoid(conf)*sigmoid(cls) at each query's
        GT bin) inside the GT span minus outside it."""
        _, conf, cls = model.apply(
            variables, feats, clip_mask, prep["query_cats"],
            prep["temporal"], prep["query_mask"])
        s = np.asarray(jax.nn.sigmoid(conf) * jax.nn.sigmoid(cls))
        s = np.take_along_axis(
            s, bin_ids[:, :, None, None].astype(int), axis=-1)[..., 0]
        fg = gt_scores > 0.5
        fgm = fg & qm[:, :, None]
        bgm = ~fg & qm[:, :, None]
        return float(s[fgm].mean() - s[bgm].mean())

    before = fg_bg_margin(params)
    rng = jax.random.PRNGKey(1)
    first = last = None
    for i in range(800):
        rng, sub = jax.random.split(rng)
        state, m = step(state, feats, clip_mask, n_clips, gts,
                        jnp.asarray(video_len_arr), sub)
        if i == 0:
            first = float(m["total"])
        last = float(m["total"])
    assert np.isfinite(last) and last < 0.25 * first, (first, last)

    # (a) clip-level localization: fg clips score far above bg clips
    after = fg_bg_margin(state.params)
    assert after > 0.4, (before, after)
    assert after > before + 0.2, (before, after)

    # (b) decode-level bin selection: each query's GT bin survives with a
    # high probability, the other regression bin is rejected
    _, probs, _ = jax.device_get(infer(
        state.params, feats, clip_mask, n_clips, prep["query_cats"],
        prep["temporal"], prep["query_mask"]))
    gt_bin_p = np.take_along_axis(
        probs, bin_ids[:, :, None].astype(int), axis=-1)[..., 0]
    other_p = np.take_along_axis(
        probs, (1 - bin_ids)[:, :, None].astype(int), axis=-1)[..., 0]
    assert gt_bin_p[qm].min() > 0.3, gt_bin_p[qm]
    assert gt_bin_p[qm].mean() > 0.5, gt_bin_p[qm]
    assert other_p[qm].max() < 0.1, other_p[qm]
