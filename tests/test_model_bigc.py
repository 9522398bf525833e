import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidsgg_big_tpu.data.synthetic import make_video
from vidsgg_big_tpu.data.types import pack_proposal, pack_gt, stack_batches
from vidsgg_big_tpu.models import BigC, BigCConfig, construct_triplets
from vidsgg_big_tpu.train.losses import (
    align_gt_adjacency, bigc_train_loss)

FEAT = 48
CFG = BigCConfig(
    num_pred_cats=20, num_enti_cats=12, dim_feat=32, dim_clsme=16,
    dim_enti=32, dim_pred=32, dim_att=32, dim_ffn=32, dim_i3d=16,
    enco_pool_len=4, n_enco_layers=1, n_deco_layers=2, n_att_head=4,
    num_querys=24)


def _pack(seed_lo, seed_hi, n_bucket=12, t_bucket=64):
    vids = [make_video(s, video_len=80, feat_dim=FEAT, n_gt_trajs=4,
                       n_preds=6, num_enti_cats=12, num_pred_cats=20)
            for s in range(seed_lo, seed_hi)]
    props = stack_batches([
        pack_proposal(p, n_bucket, t_bucket, FEAT) for p, _ in vids])
    gts = stack_batches([
        pack_gt(g, g_bucket=6, tg_bucket=t_bucket, p_bucket=8)
        for _, g in vids])
    return vids, props, gts


@pytest.fixture(scope="module")
def model_and_params():
    model = BigC(CFG, enti_name_emb=np.random.default_rng(0).normal(
        size=(12, 16)).astype(np.float32))
    _, props, _ = _pack(0, 2)
    params = model.init(jax.random.PRNGKey(0), props)
    return model, params


def test_forward_shapes_and_masks(model_and_params):
    model, params = model_and_params
    _, props, _ = _pack(0, 2)
    out = model.apply(params, props)
    b, n = props.traj_mask.shape
    assert out["pred_logits"].shape == (b, CFG.num_querys, CFG.num_pred_cats)
    assert out["att"].shape == (b, 2, CFG.num_querys, n)
    att = np.asarray(out["att"])
    mask = np.asarray(props.traj_mask)
    # padded tracklets receive exactly zero attention
    assert np.abs(att[~np.broadcast_to(mask[:, None, None, :], att.shape)]).max() == 0
    # entity softmax x role softmax stays within (0, 1)
    assert att.min() >= 0 and att.max() <= 1
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_padding_invariance(model_and_params):
    """Same video in a wider bucket must give identical outputs."""
    model, params = model_and_params
    vids, props_a, _ = _pack(0, 2, n_bucket=12)
    _, props_b, _ = _pack(0, 2, n_bucket=16)
    out_a = model.apply(params, props_a)
    out_b = model.apply(params, props_b)
    np.testing.assert_allclose(
        np.asarray(out_a["pred_logits"]), np.asarray(out_b["pred_logits"]),
        rtol=2e-4, atol=2e-5)
    n = props_a.traj_mask.shape[1]
    np.testing.assert_allclose(
        np.asarray(out_a["att"]), np.asarray(out_b["att"])[:, :, :, :n],
        rtol=2e-4, atol=2e-5)


def test_align_gt_adjacency_properties():
    _, props, gts = _pack(0, 2)
    aligned, viou = align_gt_adjacency(props, gts, 0.5)
    aligned = np.asarray(aligned)
    viou = np.asarray(viou)
    mask = np.asarray(props.traj_mask)
    gt_mask = np.asarray(gts.traj_mask)
    pred_mask = np.asarray(gts.pred_mask)
    # no adjacency on padded proposals
    assert aligned[:, :, :, :][..., ~mask[0]].sum() == 0 or True
    for b in range(aligned.shape[0]):
        assert aligned[b][:, :, ~mask[b]].sum() == 0
        # synthetic proposals are jittered GT copies: every valid gt pred
        # should keep at least one subject and object anchor
        p = pred_mask[b]
        assert (aligned[b, 0, p, :].sum(-1) >= 1).all()
        assert (aligned[b, 1, p, :].sum(-1) >= 1).all()
        # vIoU zero against padded gt trajs
        assert viou[b][:, ~gt_mask[b]].sum() == 0


def test_train_loss_and_grads(model_and_params):
    model, params = model_and_params
    _, props, gts = _pack(0, 2)

    @jax.jit
    def loss_fn(params):
        out = model.apply(params, props)
        total, d = bigc_train_loss(out, props, gts, CFG)
        return total, d

    (total, d), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert set(d) == {"cls_pos", "cls_neg", "adj"}
    leaf_norms = [float(jnp.abs(g).max())
                  for g in jax.tree_util.tree_leaves(grads)]
    assert np.isfinite(leaf_norms).all()
    assert max(leaf_norms) > 0


@pytest.mark.slow
def test_remainder_padding_no_loss_effect(model_and_params):
    """A bucket flushed with repeat-padding must produce the identical
    gradient as the unpadded batch (repeats are masked out of the loss)."""
    from vidsgg_big_tpu.data.bucketing import BucketSpec, bucketed_batches
    model, params = model_and_params
    vids = [make_video(s, video_len=80, feat_dim=FEAT, n_gt_trajs=4,
                       n_preds=6, num_enti_cats=12, num_pred_cats=20)
            for s in range(3)]
    spec = BucketSpec(feat_dim=FEAT, n_ladder=(12,), t_ladder=(64,),
                      g_bucket=6, p_bucket=8)

    def grad_of(batch_size):
        (key, rows, props, gts), = bucketed_batches(vids, spec, batch_size)
        assert len(rows) == 3          # only real videos are reported

        def loss_fn(p):
            out = model.apply(p, props)
            total, _ = bigc_train_loss(out, props, gts, CFG)
            return total
        return jax.grad(loss_fn)(params)

    g3, g4 = grad_of(3), grad_of(4)    # exact batch vs one repeated video
    for a, b in zip(jax.tree_util.tree_leaves(g3),
                    jax.tree_util.tree_leaves(g4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_construct_triplets_matches_reference_logic():
    """Cross-check the fixed-shape dedup against a direct numpy replay of the
    reference post-processing semantics."""
    rng = np.random.default_rng(9)
    q, c, n, topk = 10, 8, 6, 3
    logits = rng.normal(size=(q, c)).astype(np.float32)
    att = rng.uniform(0.01, 0.99, size=(2, q, n)).astype(np.float32)
    durs = np.stack([rng.integers(0, 30, n),
                     rng.integers(40, 80, n)], axis=1).astype(np.int32)
    scores = rng.uniform(size=n).astype(np.float32)
    cats = rng.integers(1, 5, size=n).astype(np.int32)
    mask = np.ones(n, bool)

    trip = construct_triplets(
        jnp.asarray(logits), jnp.asarray(att), jnp.asarray(durs),
        jnp.asarray(scores), jnp.asarray(cats), jnp.asarray(mask),
        topk, num_enti_cats=5, num_pred_cats=c)
    got = {}
    tq = np.asarray(trip.quintuples)
    ts = np.asarray(trip.scores)
    tv = np.asarray(trip.valid)
    for i in range(tq.shape[0]):
        if tv[i]:
            got[tuple(tq[i])] = ts[i]

    # numpy replay of reference construct_triplet
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    so = att.argmax(-1).T           # (Q, 2)
    best = {}
    for qq in range(q):
        order = np.argsort(-probs[qq])[:topk]
        for cat in order:
            s, o = so[qq]
            if s == o:
                continue
            inter_s = max(durs[s, 0], durs[o, 0])
            inter_e = min(durs[s, 1], durs[o, 1])
            if inter_s > inter_e or cat == 0:
                continue
            key = (cat, cats[s], cats[o], s, o)
            sc = probs[qq, cat]
            if key not in best or sc > best[key][0]:
                best[key] = (sc, scores[s], scores[o])
    expect = {tuple(int(x) for x in k): np.array(v, np.float32)
              for k, v in best.items()}
    assert set(got) == set(expect)
    for k in expect:
        np.testing.assert_allclose(got[k], expect[k], rtol=1e-5)


@pytest.mark.slow
def test_int8_feature_storage_close_to_f32():
    """int8 feature storage (opt-in serving path): forward logits stay close
    to the f32 reference and the param tree is unchanged; training-mode apply
    dequantizes and keeps nonzero grads into the first visual layer."""
    import jax
    import __graft_entry__ as ge
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.data.types import pack_proposal, stack_batches

    model, cfg = ge._flagship(feat_dim=64, dim=32, n_enco=1, n_deco=2,
                              num_querys=16, heads=4, dim_i3d=16,
                              num_enti=12, num_pred=10)
    recs = [make_video(i, video_len=64, feat_dim=80, n_gt_trajs=4, n_preds=6,
                       num_enti_cats=12, num_pred_cats=10)[0]
            for i in range(2)]
    b32 = stack_batches([pack_proposal(r, 8, 32, 80) for r in recs])
    b8 = stack_batches([pack_proposal(r, 8, 32, 80, dtype=np.int8)
                        for r in recs])
    assert b8.feats.dtype == jnp.int8

    params32 = model.init(jax.random.PRNGKey(0), b32)
    params8 = model.init(jax.random.PRNGKey(0), b8)
    assert (jax.tree_util.tree_structure(params32) ==
            jax.tree_util.tree_structure(params8))

    out32 = model.apply(params32, b32)["pred_logits"]
    out8 = model.apply(params32, b8)["pred_logits"]
    a, b = np.asarray(out32, np.float64), np.asarray(out8, np.float64)
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos
    np.testing.assert_allclose(a, b, atol=0.15 * np.abs(a).max())

    # training mode: grads flow into the quantized-at-inference layer
    def loss(p):
        o = model.apply(p, b8, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        return (o["pred_logits"].astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(params32)
    gk = g["params"]["tracklet_encoder"]["fc_feat2enti"]["dense0"]["kernel"]
    assert float(np.abs(np.asarray(gk)).max()) > 0.0


def test_unconsumed_feature_tail_ignored():
    """exp4 regression: VidOR tracklet files always carry the 300-d classeme
    concat, but the exp4 head (v7, use_clsme=False) never reads it — the
    reference slices traj_features[:, :, :dim_feat] and ignores the tail
    (reference model_0v7.py:441-447).  Extra trailing channels must not
    change any output."""
    cfg = BigCConfig(
        num_pred_cats=20, num_enti_cats=12, dim_feat=32, dim_clsme=16,
        dim_enti=32, dim_pred=32, dim_att=32, dim_ffn=32, dim_i3d=None,
        enco_pool_len=4, n_enco_layers=1, n_deco_layers=2, n_att_head=4,
        num_querys=24, variant="v7", use_clsme=False, use_name_emb=False)
    assert not cfg.clsme_in_feats
    model = BigC(cfg)
    vids = [make_video(s, video_len=80, feat_dim=48, n_gt_trajs=4,
                       n_preds=6, num_enti_cats=12, num_pred_cats=20)
            for s in range(2)]
    wide = stack_batches([pack_proposal(p, 12, 64, 48) for p, _ in vids])
    narrow = wide.replace(feats=wide.feats[..., :32])
    params = model.init(jax.random.PRNGKey(0), narrow)
    out_w = model.apply(params, wide)
    out_n = model.apply(params, narrow)
    np.testing.assert_array_equal(np.asarray(out_w["pred_logits"]),
                                  np.asarray(out_n["pred_logits"]))
    np.testing.assert_array_equal(np.asarray(out_w["att"]),
                                  np.asarray(out_n["att"]))


def test_bf16_wire_parity():
    """--feat_dtype bfloat16 under bf16 compute: packing features as bf16 on
    the host rounds exactly like the model's own .astype(compute_dtype), so
    trunk logits are BIT-identical to shipping f32 and casting on device —
    the 2x H2D saving is numerics-free for the visual trunk.  (With an aux
    tail the time-average accumulates from bf16-rounded frames instead; that
    variant is covered by the loss-proximity check below.)"""
    import dataclasses
    import ml_dtypes

    cfg = dataclasses.replace(CFG, dim_i3d=None, compute_dtype="bfloat16")
    model = BigC(cfg, enti_name_emb=np.random.default_rng(0).normal(
        size=(12, 16)).astype(np.float32))
    vids = [make_video(s, video_len=80, feat_dim=FEAT, n_gt_trajs=4,
                       n_preds=6, num_enti_cats=12, num_pred_cats=20)
            for s in range(2)]
    f32 = stack_batches([pack_proposal(p, 12, 64, FEAT) for p, _ in vids])
    bf16 = stack_batches([
        pack_proposal(p, 12, 64, FEAT, dtype=ml_dtypes.bfloat16)
        for p, _ in vids])
    # pack-level contract: the bf16 wire IS the f32 wire rounded once
    np.testing.assert_array_equal(
        np.asarray(bf16.feats),
        np.asarray(f32.feats).astype(ml_dtypes.bfloat16))

    params = model.init(jax.random.PRNGKey(0), f32)
    out_a = model.apply(params, f32)
    out_b = model.apply(params, bf16)
    np.testing.assert_array_equal(np.asarray(out_a["pred_logits"]),
                                  np.asarray(out_b["pred_logits"]))
    np.testing.assert_array_equal(np.asarray(out_a["att"]),
                                  np.asarray(out_b["att"]))

    # i3d-tail variant: extra_avg accumulates from bf16-rounded frames —
    # not bit-equal, but the train loss must stay within bf16 rounding
    cfg_i = dataclasses.replace(CFG, compute_dtype="bfloat16")
    model_i = BigC(cfg_i, enti_name_emb=np.random.default_rng(0).normal(
        size=(12, 16)).astype(np.float32))
    gts = stack_batches([
        pack_gt(g, g_bucket=6, tg_bucket=64, p_bucket=8) for _, g in vids])
    params_i = model_i.init(jax.random.PRNGKey(0), f32)
    la, _ = bigc_train_loss(model_i.apply(params_i, f32), f32, gts, cfg_i)
    lb, _ = bigc_train_loss(model_i.apply(params_i, bf16), f32, gts, cfg_i)
    assert np.isfinite(float(la)) and np.isfinite(float(lb))
    assert abs(float(la) - float(lb)) <= 0.02 * (1.0 + abs(float(la)))
