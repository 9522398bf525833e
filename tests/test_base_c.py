import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vidsgg_big_tpu.data.synthetic import make_video
from vidsgg_big_tpu.data.types import pack_proposal, pack_gt, stack_batches
from vidsgg_big_tpu.models.base_c import (
    BaseC, BaseCConfig, basec_multihot, basec_train_loss, ordered_pair_ids)
from vidsgg_big_tpu.models import pairwise_construct_triplets
from vidsgg_big_tpu.ops.boxes import viou_matrix

FEAT = 36
CFG = BaseCConfig(num_pred_cats=14, num_enti_cats=10, dim_feat=24,
                  dim_clsme=12, dim_enti=24, dim_ffn=24, enco_pool_len=4,
                  use_clsme=True, use_name_emb=False)


def _pack(n=2, n_bucket=10, t_bucket=64):
    vids = [make_video(100 + s, video_len=70, feat_dim=FEAT, n_gt_trajs=4,
                       n_preds=5, num_enti_cats=10, num_pred_cats=14)
            for s in range(n)]
    props = stack_batches(
        [pack_proposal(p, n_bucket, t_bucket, FEAT) for p, _ in vids])
    gts = stack_batches(
        [pack_gt(g, 6, t_bucket, 8) for _, g in vids])
    return vids, props, gts


@pytest.mark.slow
def test_basec_forward_and_loss():
    vids, props, gts = _pack()
    model = BaseC(CFG)
    params = model.init(jax.random.PRNGKey(0), props)
    out = model.apply(params, props)
    n = props.traj_mask.shape[1]
    assert out["pred_logits"].shape == (2, n * (n - 1), CFG.num_pred_cats)

    def loss_fn(p):
        return basec_train_loss(model.apply(p, props), props, gts, CFG)

    (total, d), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total)) and float(total) > 0
    gmax = max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gmax) and gmax > 0


def test_basec_int8_feature_storage_close_to_f32():
    """--use_baseline with --feat_dtype int8: the classeme extra channels
    must be dequantized by feat_scale before stretch_weighted_mean (same
    guard as BigC, big_c.py dequantize_extra) and the stretch weights must
    not be computed in int8 (count overflow at T>127)."""
    vids = [make_video(7 + s, video_len=70, feat_dim=FEAT, n_gt_trajs=4,
                       n_preds=5, num_enti_cats=10, num_pred_cats=14)
            for s in range(2)]
    b32 = stack_batches(
        [pack_proposal(p, 10, 256, FEAT) for p, _ in vids])
    b8 = stack_batches(
        [pack_proposal(p, 10, 256, FEAT, dtype=np.int8) for p, _ in vids])
    assert b8.feats.dtype == jnp.int8

    model = BaseC(CFG)
    params = model.init(jax.random.PRNGKey(0), b32)
    out32 = np.asarray(model.apply(params, b32)["pred_logits"], np.float64)
    out8 = np.asarray(model.apply(params, b8)["pred_logits"], np.float64)
    cos = (out32 * out8).sum() / (
        np.linalg.norm(out32) * np.linalg.norm(out8))
    assert cos > 0.999, cos
    np.testing.assert_allclose(out32, out8, atol=0.15 * np.abs(out32).max())


def test_label_assignment_matches_reference_loop():
    """Replay the reference prop_pair_to_gt_pred python loops in numpy and
    compare with the vectorized assignment."""
    vids, props, gts = _pack()
    multihot, pair_pos = basec_multihot(props, gts, CFG.num_pred_cats, 0.5)
    multihot = np.asarray(multihot)
    pair_pos = np.asarray(pair_pos)
    viou = np.asarray(jax.vmap(viou_matrix)(
        props.boxes, props.durations, gts.traj_boxes, gts.traj_durations,
        props.traj_mask, gts.traj_mask))

    for b, (prop, gt) in enumerate(vids):
        n = prop.num_proposals
        adj = np.asarray(gt.adj)
        pred2so = adj.argmax(-1)                     # (2, P)
        expect = np.zeros_like(multihot[b])
        for p in range(gt.num_preds):
            gs, go = pred2so[0, p], pred2so[1, p]
            for i in range(n):
                for j in range(n):
                    if i == j:
                        continue
                    if viou[b, i, gs] > 0.5 and viou[b, j, go] > 0.5:
                        expect[i, j, gt.pred_cat_ids[p]] = 1
        np.testing.assert_array_equal(multihot[b], expect)
        np.testing.assert_array_equal(pair_pos[b], expect.any(-1))


def test_pairwise_triplets_rt_topk():
    rng = np.random.default_rng(5)
    n, c, topk = 5, 8, 2
    pair_ids = jnp.asarray(ordered_pair_ids(n))
    np_ = pair_ids.shape[0]
    logits = jnp.asarray(rng.normal(size=(np_, c)), jnp.float32)
    durs = jnp.asarray(
        np.stack([np.zeros(n), np.full(n, 30)], 1), jnp.int32)
    trip = pairwise_construct_triplets(
        logits, pair_ids, durs, jnp.asarray(rng.uniform(size=n), jnp.float32),
        jnp.asarray(rng.integers(1, 5, n), jnp.int32), jnp.ones(n, bool),
        topk=topk, num_enti_cats=5, num_pred_cats=c, rt_topk=6)
    assert int(np.asarray(trip.valid).sum()) <= 6
