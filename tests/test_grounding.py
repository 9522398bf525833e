import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidsgg_big_tpu.models.grounding import (
    GroundingConfig, GroundingModel, grounding_gt_labels, temporal_pooling,
    temporal_nms, grounding_decode)
from vidsgg_big_tpu.train.grounding_data import prepare_grounding_gt
from vidsgg_big_tpu.train.grounding_steps import grounding_train_loss
from vidsgg_big_tpu.data.synthetic import make_video
from vidsgg_big_tpu.data.types import pack_gt, stack_batches

CFG = GroundingConfig(dim_feat=24, dim_clsme=16, dim_hidden=16, num_bins=4,
                      num_pred_cats=10, num_enti_cats=8)


@pytest.fixture(scope="module")
def ref_debug_cls(reference_utils):
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from models.grd_model_v5 import DEBUG
    finally:
        sys.path.remove("/root/reference")
    return DEBUG


def test_gt_labels_match_reference(ref_debug_cls):
    import torch
    rng = np.random.default_rng(0)
    qn, n_clips = 7, 23
    s = rng.uniform(0, 0.6, qn)
    e = s + rng.uniform(0.05, 0.39, qn)
    target = np.stack([s, e], 1).astype(np.float32)

    dummy = types.SimpleNamespace(num_bins=4)
    ref = ref_debug_cls.get_gt_labels(dummy, torch.tensor(target), n_clips)
    ref_regr, ref_ct, ref_sc, ref_bins = [x.numpy() for x in ref]

    ours = grounding_gt_labels(jnp.asarray(target), jnp.asarray(n_clips),
                               t=n_clips, num_bins=4)
    regr, ct, sc, bins = [np.asarray(x) for x in ours]
    np.testing.assert_array_equal(bins, ref_bins)
    np.testing.assert_allclose(ct, ref_ct, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sc, ref_sc, rtol=1e-6)
    # regr targets only matter where ctness > 0 (masked in the loss)
    m = ref_ct > 0
    np.testing.assert_allclose(regr[m], ref_regr[m], rtol=1e-5)


def test_temporal_pooling_matches_reference(ref_debug_cls):
    import torch
    rng = np.random.default_rng(1)
    qn, t, k = 3, 17, 4
    regrs = rng.uniform(0.0, 0.4, size=(qn, t, 2, k)).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, size=(qn, t, k)).astype(np.float32)

    dummy = types.SimpleNamespace(num_bins=k, score_th=0.5, tiou_th=0.5)
    ref = ref_debug_cls.temporal_pooling(
        dummy, torch.tensor(regrs.reshape(qn, t, 2 * k)),
        torch.tensor(scores)).numpy()
    # reference reshapes (T, 2k) -> (T, 2, k); match that memory layout
    ours = temporal_pooling(
        jnp.asarray(regrs), jnp.asarray(scores), jnp.asarray(t),
        jnp.ones((t,), bool), score_th=0.5, tiou_th=0.5)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_temporal_nms_matches_reference(ref_debug_cls):
    import torch
    rng = np.random.default_rng(2)
    qn, k1 = 5, 6
    s = rng.uniform(0, 0.7, size=(qn, k1, 1))
    spans = np.concatenate([s, s + rng.uniform(0.05, 0.3, size=(qn, k1, 1))],
                           axis=-1).astype(np.float32)
    probs = rng.uniform(size=(qn, k1)).astype(np.float32)
    dummy = types.SimpleNamespace(nms_th=0.5,
                                  _nms=ref_debug_cls._nms)
    ref = ref_debug_cls.temporal_nms(
        types.SimpleNamespace(nms_th=0.5, _nms=lambda b, p, th:
                              ref_debug_cls._nms(dummy, b, p, th)),
        torch.tensor(spans), torch.tensor(probs)).numpy()
    ours = np.asarray(temporal_nms(jnp.asarray(spans), jnp.asarray(probs),
                                   nms_th=0.5))
    np.testing.assert_array_equal(ours, ref)


def _toy_batch(b=2, t=20, feat=24, p_bucket=8):
    rng = np.random.default_rng(3)
    vids = [make_video(7 + i, video_len=60, n_gt_trajs=4, n_preds=6,
                       num_enti_cats=8, num_pred_cats=10, feat_dim=4)
            for i in range(b)]
    gts = stack_batches([pack_gt(g, 6, 64, p_bucket) for _, g in vids])
    n_clips = np.array([t - 4, t], np.int32)
    clip_mask = np.arange(t)[None, :] < n_clips[:, None]
    video_feats = rng.normal(size=(b, t, feat)).astype(np.float32)
    video_feats *= clip_mask[..., None]
    video_len = np.array([v[1].video_len for v in vids], np.int32)
    return (jnp.asarray(video_feats), jnp.asarray(clip_mask),
            jnp.asarray(n_clips), gts, jnp.asarray(video_len))


def test_prepare_grounding_gt_groups():
    video_feats, clip_mask, n_clips, gts, video_len = _toy_batch()
    prep = jax.vmap(
        lambda g, vl, r: prepare_grounding_gt(g, vl, 10, r))(
        gts, video_len, jax.random.split(jax.random.PRNGKey(0), 2))
    qm = np.asarray(prep["query_mask"])
    rep = np.asarray(prep["group_rep"])
    is_rep = np.asarray(prep["is_rep"])
    cats = np.asarray(prep["query_cats"])
    neg = np.asarray(prep["neg_query_cats"])
    for b in range(qm.shape[0]):
        for p in np.where(qm[b])[0]:
            r = rep[b, p]
            assert qm[b, r] and is_rep[b, r]
            # representative has identical query content
            np.testing.assert_array_equal(cats[b, p], cats[b, r])
            # negative predicate differs from the positive of its group
            assert neg[b, p, 1] != cats[b, p, 1]
            assert neg[b, p, 0] == cats[b, p, 0]
            assert neg[b, p, 2] == cats[b, p, 2]


@pytest.mark.slow
def test_grounding_forward_and_loss():
    model = GroundingModel(CFG)
    video_feats, clip_mask, n_clips, gts, video_len = _toy_batch()
    prep = jax.vmap(
        lambda g, vl, r: prepare_grounding_gt(g, vl, 10, r))(
        gts, video_len, jax.random.split(jax.random.PRNGKey(0), 2))
    params = model.init(jax.random.PRNGKey(1), video_feats, clip_mask,
                        prep["query_cats"], prep["temporal"],
                        prep["query_mask"])

    def loss_fn(params):
        total, d = grounding_train_loss(
            model, params, video_feats, clip_mask, n_clips, gts, video_len,
            jax.random.PRNGKey(2), deterministic=True)
        return total, d

    (total, d), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert set(d) == {"pos_cls", "neg_cls", "pos_ct", "neg_ct", "regr"}
    gmax = max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gmax) and gmax > 0


@pytest.mark.slow
def test_grounding_remainder_padding_masked():
    """Epoch-remainder batches pad by repeating the last video with its GT
    masks zeroed (tools/train_vidor.py make_batch); the repeat must
    contribute nothing: loss and grads equal the unpadded batch exactly."""
    model = GroundingModel(CFG)
    video_feats, clip_mask, n_clips, gts, video_len = _toy_batch()
    prep = jax.vmap(
        lambda g, vl, r: prepare_grounding_gt(g, vl, 10, r))(
        gts, video_len, jax.random.split(jax.random.PRNGKey(0), 2))
    params = model.init(jax.random.PRNGKey(1), video_feats, clip_mask,
                        prep["query_cats"], prep["temporal"],
                        prep["query_mask"])

    def loss2(p):
        return grounding_train_loss(
            model, p, video_feats, clip_mask, n_clips, gts, video_len,
            jax.random.PRNGKey(2), deterministic=True)

    pad = lambda x: jnp.concatenate([x, x[-1:]], axis=0)
    gts3 = jax.tree_util.tree_map(pad, gts)
    real = jnp.arange(3) < 2
    gts3 = gts3.replace(traj_mask=gts3.traj_mask & real[:, None],
                        pred_mask=gts3.pred_mask & real[:, None])

    def loss3(p):
        return grounding_train_loss(
            model, p, pad(video_feats), pad(clip_mask), pad(n_clips), gts3,
            pad(video_len), jax.random.PRNGKey(2), deterministic=True)

    (t2, _), g2 = jax.value_and_grad(loss2, has_aux=True)(params)
    (t3, _), g3 = jax.value_and_grad(loss3, has_aux=True)(params)
    np.testing.assert_allclose(float(t2), float(t3), rtol=1e-6)
    # The loss is bit-equal, so the pad row contributes exactly zero; the
    # weight grads differ only by f32 reduction-order noise (the B=2 and
    # B=3 programs tile the batch-sum contraction differently; observed
    # max |diff| ~8e-6 on grads of magnitude ~50, relative ~2e-7).
    for a, b in zip(jax.tree_util.tree_leaves(g2),
                    jax.tree_util.tree_leaves(g3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_grounding_decode_shapes_and_fallback():
    rng = np.random.default_rng(4)
    qn, t, k = 4, 16, 4
    regrs = jnp.asarray(rng.uniform(0, 0.3, (qn, t, 2, k)), jnp.float32)
    conf = jnp.asarray(rng.normal(size=(qn, t, k)), jnp.float32)
    cls = jnp.asarray(rng.normal(size=(qn, t, k)), jnp.float32)
    inter = jnp.asarray(
        np.stack([np.full(qn, 0.2), np.full(qn, 0.8)], -1), jnp.float32)
    pooled, probs, mask = grounding_decode(
        regrs, conf, cls, inter, jnp.asarray(t), jnp.ones((t,), bool),
        jnp.ones((qn,), bool), score_th=0.5, tiou_th=0.5, bins_th=0.2,
        nms_th=0.5)
    assert pooled.shape == (qn, k + 1, 2)
    assert probs.shape == (qn, k + 1) and mask.shape == (qn, k + 1)
    # each valid query keeps at least one bin
    assert bool(np.asarray(mask).any(-1).all())
    # all pooled spans clamped into the subj∩obj window or equal to it
    p = np.asarray(pooled)
    assert (p[..., 0] >= 0.2 - 1e-6).all() and (p[..., 1] <= 0.8 + 1e-6).all()


def test_grounding_self_eval_matches_reference(ref_debug_cls):
    import torch
    rng = np.random.default_rng(13)
    u, k1, p = 3, 5, 7
    spans = np.stack([rng.uniform(0, 0.5, (u, k1)),
                      rng.uniform(0.5, 1.0, (u, k1))], -1).astype(np.float32)
    mask = rng.uniform(size=(u, k1)) > 0.3
    mask[:, 0] = True
    groups = [np.array([0, 1]), np.array([2, 3, 4]), np.array([5, 6])]
    tgt = np.stack([rng.uniform(0, 0.5, p),
                    rng.uniform(0.5, 1.0, p)], -1).astype(np.float32)

    from vidsgg_big_tpu.evaluation.grounding_eval import (
        grounding_tiou, grounding_f1)
    ours_t = grounding_tiou(spans, mask, tgt, groups)
    dummy = types.SimpleNamespace(num_bins=k1)
    ref_t = ref_debug_cls.eval_tiou(
        dummy, torch.tensor(spans), torch.tensor(mask), torch.tensor(tgt),
        [torch.tensor(g) for g in groups]).numpy()
    np.testing.assert_allclose(np.sort(ours_t), np.sort(ref_t), rtol=1e-5)

    ours_f = grounding_f1(spans, mask, tgt, groups, tiou_ths=(0.5,))
    ref_r, ref_p, ref_f = ref_debug_cls.eval_f1score(
        dummy, torch.tensor(spans), torch.tensor(mask), torch.tensor(tgt),
        [torch.tensor(g) for g in groups], tiou_ths=[0.5])
    np.testing.assert_allclose(ours_f[0.5]["recall"], ref_r[0.5], rtol=1e-6)
    np.testing.assert_allclose(ours_f[0.5]["precision"], ref_p[0.5],
                               rtol=1e-6)


def test_grounding_clip_padding_invariance():
    """Same video in a wider clip bucket must give identical head outputs on
    the valid clips (attention/sim-softmax masking correctness)."""
    model = GroundingModel(CFG)
    rng = np.random.default_rng(21)
    n_clips, q = 12, 5
    feats_raw = rng.normal(size=(1, n_clips, CFG.dim_feat)).astype(np.float32)
    qc = rng.integers(1, 8, size=(1, q, 3)).astype(np.int32)
    temp = rng.uniform(0, 1, size=(1, q, 2)).astype(np.float32)
    qm = np.ones((1, q), bool)

    outs = []
    for t in (16, 32):
        feats = np.zeros((1, t, CFG.dim_feat), np.float32)
        feats[:, :n_clips] = feats_raw
        cm = (np.arange(t) < n_clips)[None]
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                            jnp.asarray(cm), jnp.asarray(qc),
                            jnp.asarray(temp), jnp.asarray(qm))
        regrs, conf, cls = model.apply(params, jnp.asarray(feats),
                                       jnp.asarray(cm), jnp.asarray(qc),
                                       jnp.asarray(temp), jnp.asarray(qm))
        outs.append((np.asarray(conf)[:, :, :n_clips],
                     np.asarray(cls)[:, :, :n_clips]))
    # NOTE: conv kernels at the valid/padding boundary see zero padding in
    # both buckets (zero-padded features), so valid-clip outputs must agree
    # atol covers per-shape XLA reassociation of the f32 projections (the
    # explicit-einsum attention projections fuse differently per bucket);
    # masking bugs would show as O(1) errors, not 1e-4.
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=2e-4, atol=2e-4)


def test_chunked_attention_matches_direct():
    """The lax.map-chunked exact attention (memory relief for huge B*Q x T
    shapes) must equal the direct einsum path bit-for-bit in math."""
    import jax
    from vidsgg_big_tpu.models.grounding import QANetEncoderLayer

    rng = np.random.default_rng(5)
    b, t, d = 8, 16, 32
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, t)) < 0.8)
    mask = mask.at[:, 0].set(True)

    direct = QANetEncoderLayer(d, 2, 3)
    params = direct.init(jax.random.PRNGKey(0), x, mask=mask)
    chunked = QANetEncoderLayer(d, 2, 3, attn_bytes_budget=8192)
    out_d = direct.apply(params, x, mask=mask)
    out_c = chunked.apply(params, x, mask=mask)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d),
                               rtol=1e-5, atol=1e-6)


def test_chunked_attention_training_mode():
    """The chunked path now also covers training: with attention dropout off
    it equals the direct path exactly; with dropout on, gradients flow and
    stay finite through the rematerialized lax.map blocks."""
    import jax
    from vidsgg_big_tpu.models.grounding import QANetEncoderLayer

    rng = np.random.default_rng(6)
    b, t, d = 8, 16, 32
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, t)) < 0.8)
    mask = mask.at[:, 0].set(True)
    key = jax.random.PRNGKey(0)

    # deterministic numerics: dropout disabled, non-deterministic mode
    direct = QANetEncoderLayer(d, 2, 3, dropout=0.0, attn_dropout=0.0)
    params = direct.init(key, x, mask=mask)
    chunked = QANetEncoderLayer(d, 2, 3, dropout=0.0, attn_dropout=0.0,
                                attn_bytes_budget=8192)
    out_d = direct.apply(params, x, mask=mask, deterministic=False,
                         rngs={"dropout": key})
    out_c = chunked.apply(params, x, mask=mask, deterministic=False,
                          rngs={"dropout": key})
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d),
                               rtol=1e-5, atol=1e-6)

    # with dropout: grads finite, and the dropout actually perturbs outputs
    stoch = QANetEncoderLayer(d, 2, 3, attn_bytes_budget=8192)
    sp = stoch.init(key, x, mask=mask)

    def loss(p, k):
        o = stoch.apply(p, x, mask=mask, deterministic=False,
                        rngs={"dropout": k})
        return (o ** 2).sum()

    g = jax.grad(loss)(sp, jax.random.PRNGKey(1))
    finite = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a: bool(np.isfinite(a).all()), g))
    assert finite
    o1 = stoch.apply(sp, x, mask=mask, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = stoch.apply(sp, x, mask=mask, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_grounding_loss_parity(ref_debug_cls):
    """Our masked batched grounding loss == the reference map2bins+loss on
    shared random predictions (reference grd_model_v5.py:390-527).

    Exercises duplicate groups (shared representative outputs), per-group
    negative bins, negative-predicate queries, and all five components'
    mean-reduction denominators across a 2-video batch.
    """
    import torch
    from vidsgg_big_tpu.models.grounding import (GroundingConfig,
                                                 grounding_gt_labels,
                                                 grounding_loss)

    rng = np.random.default_rng(13)
    k = 4
    t = 13                                   # n_clips, no padding
    lf = dict(classification=1.0, centerness=1.0, regression=1.0)
    cfg = GroundingConfig(dim_feat=8, dim_clsme=8, dim_hidden=8, num_bins=k,
                          num_pred_cats=10, num_enti_cats=8,
                          loss_cls=1.0, loss_ctn=1.0, loss_reg=1.0)

    # two videos with duplicate groups: index_map[i] lists the GT-target ids
    # served by unique query i (ordering defines our slot order)
    index_maps = [[[0, 2], [1]], [[0], [1], [2, 3]]]
    ref_losses, our_inputs = [], []
    for index_map in index_maps:
        n_gt = sum(len(g) for g in index_map)
        n_uniq = len(index_map)
        s = rng.uniform(0, 0.55, n_gt)
        tgt = np.stack([s, s + rng.uniform(0.15, 0.4, n_gt)], 1).astype(
            np.float32)
        regrs = rng.uniform(0.01, 0.6, (2 * n_uniq, t, 2 * k)).astype(
            np.float32)
        conf = rng.normal(size=(2 * n_uniq, t, k)).astype(np.float32)
        cls = rng.normal(size=(2 * n_uniq, t, k)).astype(np.float32)

        ns = types.SimpleNamespace(num_bins=k, loss_factor=lf)
        label = ref_debug_cls.get_gt_labels(ns, torch.tensor(tgt), t)
        imp = [torch.tensor(g, dtype=torch.long) for g in index_map]
        mapped = ref_debug_cls.map2bins(
            ns, torch.tensor(regrs), torch.tensor(conf), torch.tensor(cls),
            label[-1], imp)
        ref_losses.append((mapped, label, imp))
        our_inputs.append((index_map, tgt, regrs, conf, cls))

    ld_ref = ref_debug_cls.loss(
        types.SimpleNamespace(num_bins=k, loss_factor=lf),
        [m for m, _, _ in ref_losses], [l for _, l, _ in ref_losses],
        [i for _, _, i in ref_losses])

    # ---- ours: pack both videos into a padded (B, Q, ...) batch ----
    b = len(our_inputs)
    qmax = max(sum(len(g) for g in im) for im, *_ in our_inputs)
    Z = lambda *s: np.zeros(s, np.float32)
    o_regr, o_conf, o_cls = Z(b, qmax, t, 2, k), Z(b, qmax, t, k), \
        Z(b, qmax, t, k)
    n_regr, n_conf, n_cls = Z(b, qmax, t, 2, k), Z(b, qmax, t, k), \
        Z(b, qmax, t, k)
    targets = Z(b, qmax, 2)
    group_rep = np.zeros((b, qmax), np.int32)
    is_rep = np.zeros((b, qmax), bool)
    qmask = np.zeros((b, qmax), bool)
    for v, (index_map, tgt, regrs, conf, cls) in enumerate(our_inputs):
        slot = 0
        for i, grp in enumerate(index_map):
            rep = slot
            for gid in grp:
                targets[v, slot] = tgt[gid]
                group_rep[v, slot] = rep
                qmask[v, slot] = True
                slot += 1
            is_rep[v, rep] = True
            o_regr[v, rep] = regrs[i].reshape(t, 2, k)
            o_conf[v, rep], o_cls[v, rep] = conf[i], cls[i]
            n_uniq = len(index_map)
            n_regr[v, rep] = regrs[n_uniq + i].reshape(t, 2, k)
            n_conf[v, rep], n_cls[v, rep] = conf[n_uniq + i], \
                cls[n_uniq + i]

    labels = jax.vmap(
        lambda tg: grounding_gt_labels(jnp.asarray(tg), jnp.asarray(t),
                                       t=t, num_bins=k))(targets)
    total, ld = grounding_loss(
        (jnp.asarray(o_regr), jnp.asarray(o_conf), jnp.asarray(o_cls)),
        (jnp.asarray(n_regr), jnp.asarray(n_conf), jnp.asarray(n_cls)),
        labels, jnp.asarray(group_rep), jnp.asarray(is_rep),
        jnp.asarray(qmask), jnp.ones((b, t), bool), cfg)

    for key in ("pos_cls", "neg_cls", "pos_ct", "neg_ct", "regr"):
        np.testing.assert_allclose(float(ld[key]), float(ld_ref[key]),
                                   rtol=2e-4, atol=1e-6, err_msg=key)
    np.testing.assert_allclose(
        float(total), float(torch.stack(list(ld_ref.values())).sum()),
        rtol=2e-4)


@pytest.mark.slow
def test_grounding_bf16_compute_close_to_f32():
    """compute_dtype='bfloat16' (bandwidth relief for the conv/attention
    stacks): same params, outputs close to the f32 path."""
    import jax
    from vidsgg_big_tpu.models.grounding import (GroundingConfig,
                                                 GroundingModel)

    rng = np.random.default_rng(7)
    b, t, q = 2, 24, 6
    base = dict(dim_feat=32, dim_clsme=16, dim_hidden=32, num_bins=4,
                num_pred_cats=10, num_enti_cats=12)
    feats = jnp.asarray(rng.normal(size=(b, t, 32)), jnp.float32)
    cm = jnp.asarray(rng.uniform(size=(b, t)) < 0.8).at[:, 0].set(True)
    qc = jnp.asarray(rng.integers(1, 10, size=(b, q, 3)), jnp.int32)
    lo = rng.uniform(0, 0.5, size=(b, q, 1))
    temp = jnp.asarray(np.concatenate(
        [lo, lo + rng.uniform(0.1, 0.5, size=(b, q, 1))], -1), jnp.float32)
    qm = jnp.ones((b, q), bool)

    m32 = GroundingModel(GroundingConfig(**base))
    m16 = GroundingModel(GroundingConfig(**base, compute_dtype="bfloat16"))
    params = m32.init(jax.random.PRNGKey(0), feats, cm, qc, temp, qm)
    o32 = m32.apply(params, feats, cm, qc, temp, qm)
    o16 = m16.apply(params, feats, cm, qc, temp, qm)
    # conf/cls are raw logits: cosine + bulk-relative closeness
    for a, b_ in zip(o32[1:], o16[1:]):
        a, b_ = np.asarray(a, np.float64), np.asarray(b_, np.float64)
        assert np.isfinite(b_).all()
        cos = (a * b_).sum() / (np.linalg.norm(a) * np.linalg.norm(b_))
        assert cos > 0.999, cos
        err = np.abs(a - b_)
        assert np.quantile(err, 0.99) < 0.05 * np.abs(a).max()
    # regrs is a sigmoid output: a random-init stack saturates it, so bf16
    # shifts flip a small tail of elements — bound the bulk, not the max
    a, b_ = np.asarray(o32[0], np.float64), np.asarray(o16[0], np.float64)
    assert np.isfinite(b_).all()
    err = np.abs(a - b_)
    assert np.median(err) < 0.01
    assert (err > 0.2).mean() < 0.01, (err > 0.2).mean()


@pytest.mark.slow
def test_grounding_stable_head_init_defuses_saturation():
    """Opt-in ``stable_head_init`` (beyond the reference): at the reference's
    default init the head sigmoids are saturated — measured mean |logit| ≈ 34
    on the torch reference itself (docs/ROUND3.md) — which stalls
    from-scratch regression; the flag down-scales the final head kernels so
    logits start O(1) and regression converges immediately.  Default off =
    reference-faithful bit-for-bit (pinned by the transplant parity tests).
    """
    from vidsgg_big_tpu.train.grounding_steps import (
        build_grounding_train_step)
    from vidsgg_big_tpu.train.train_state import (make_optimizer,
                                                  create_train_state)

    b, t, q = 2, 12, 3
    rng0 = np.random.default_rng(3)
    feats = jnp.asarray(rng0.normal(size=(b, t, CFG.dim_feat)).astype(
        np.float32))
    clip_mask = np.ones((b, t), bool)
    qc = jnp.asarray(rng0.integers(1, 7, size=(b, q, 3)).astype(np.int32))
    lo = rng0.uniform(0, 0.4, size=(b, q, 1))
    temp = jnp.asarray(np.concatenate(
        [lo, lo + rng0.uniform(0.2, 0.5, size=(b, q, 1))], -1).astype(
            np.float32))
    qm = np.ones((b, q), bool)

    def init_logit_mag(cfg):
        model = GroundingModel(cfg)
        params = model.init(jax.random.PRNGKey(0), feats, clip_mask, qc,
                            temp, qm)
        rr = np.asarray(model.apply(params, feats, clip_mask, qc, temp, qm)[0],
                        np.float64)
        lg = np.log(np.clip(rr, 1e-30, 1 - 1e-7) /
                    np.clip(1 - rr, 1e-30, None))
        return np.abs(lg).mean(), model, params

    sat_mag, _, _ = init_logit_mag(CFG)
    assert sat_mag > 8.0, sat_mag            # the documented reference regime

    cfg = GroundingConfig(dim_feat=24, dim_clsme=16, dim_hidden=16,
                          num_bins=4, num_pred_cats=10, num_enti_cats=8,
                          stable_head_init=True)
    stable_mag, model, params = init_logit_mag(cfg)
    # O(1)-ish logits (this test's trunk is tiny, dim_hidden=16, which
    # amplifies more per unit than the real 128-d config, where the same
    # probe measures ≈1); the contrast vs the saturated regime is the point
    assert stable_mag < 6.0, stable_mag
    assert stable_mag < sat_mag / 3.0, (stable_mag, sat_mag)

    # from-scratch regression moves immediately (it is stuck ~flat in the
    # saturated regime — measured over 1200 steps, docs/ROUND3.md)
    vids = [make_video(s, video_len=40, feat_dim=8, n_gt_trajs=3, n_preds=3,
                       n_distractors=0, num_enti_cats=8, num_pred_cats=10)
            for s in range(b)]
    gts = stack_batches([pack_gt(g, g_bucket=6, tg_bucket=48, p_bucket=4)
                         for _, g in vids])
    video_len = jnp.asarray([g.video_len for _, g in vids], jnp.int32)
    n_clips = np.full((b,), t, np.int32)
    qprep = jax.vmap(lambda g, vl, r: prepare_grounding_gt(
        g, vl, cfg.num_pred_cats, r))(
        gts, video_len, jax.random.split(jax.random.PRNGKey(7), b))
    params = model.init(jax.random.PRNGKey(0), feats, clip_mask,
                        qprep["query_cats"], qprep["temporal"],
                        qprep["query_mask"])
    tx, _ = make_optimizer(3e-3, 0.2, [100000])
    state = create_train_state(params, tx)
    step = build_grounding_train_step(model, tx, donate=False)
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(100):
        rng, sub = jax.random.split(rng)
        state, m = step(state, feats, clip_mask, n_clips, gts, video_len, sub)
        if i == 0:
            first = float(m["regr"])
    assert float(m["regr"]) < min(1.0, 0.7 * first), (first, float(m["regr"]))
