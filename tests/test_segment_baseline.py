"""Tests for the MM'17 segment baseline (model + association).

The reference baseline is Python-2-era code (cPickle/keras) that cannot be
imported as an oracle; numerics are pinned instead by naive-loop replays of
its documented semantics (reference VidVRD-helper/baseline/*).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidsgg_big_tpu.evaluation.association import (
    Trajectory, cubic_iou, traj_iou_windowed, merge_trajs, segment_video,
    greedy_relational_association)
from vidsgg_big_tpu.models.segment_baseline import (
    SegmentBaseline, SegmentBaselineConfig, feature_preprocess,
    predict_segment_pairs, sample_positive_pairs, triplet_log_softmax)


def _naive_cubic_iou(b1, b2):
    """Per-frame loop replay of reference baseline/trajectory.py:85-141."""
    n, t, _ = b1.shape
    m = b2.shape[0]
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            inter = 0.0
            for k in range(t):
                w = min(b1[i, k, 2], b2[j, k, 2]) - \
                    max(b1[i, k, 0], b2[j, k, 0]) + 1
                h = min(b1[i, k, 3], b2[j, k, 3]) - \
                    max(b1[i, k, 1], b2[j, k, 1]) + 1
                inter += max(w, 0) * max(h, 0)
            a1 = sum((b1[i, k, 2] - b1[i, k, 0] + 1) *
                     (b1[i, k, 3] - b1[i, k, 1] + 1) for k in range(t))
            a2 = sum((b2[j, k, 2] - b2[j, k, 0] + 1) *
                     (b2[j, k, 3] - b2[j, k, 1] + 1) for k in range(t))
            out[i, j] = inter / (a1 + a2 - inter)
    return out


def test_cubic_iou_matches_naive_loop():
    rng = np.random.default_rng(0)
    def boxes(n, t):
        lt = rng.uniform(0, 100, (n, t, 2))
        wh = rng.uniform(5, 60, (n, t, 2))
        return np.concatenate([lt, lt + wh], -1)
    b1, b2 = boxes(4, 7), boxes(3, 7)
    np.testing.assert_allclose(cubic_iou(b1, b2), _naive_cubic_iou(b1, b2),
                               rtol=1e-6)


def test_segment_video_30_15():
    # reference baseline/__init__.py:35-41
    assert segment_video(0, 60) == [(0, 30), (15, 45), (30, 60)]
    assert segment_video(0, 30) == [(0, 30)]
    assert segment_video(0, 29) == []
    assert segment_video(10, 70) == [(10, 40), (25, 55), (40, 70)]


def test_windowed_traj_iou_and_merge():
    rois_a = np.tile(np.array([0.0, 0.0, 9.0, 9.0]), (30, 1))
    rois_b = np.tile(np.array([0.0, 0.0, 9.0, 9.0]), (30, 1))
    a = Trajectory(0, 30, rois_a)
    b = Trajectory(15, 45, rois_b)
    assert traj_iou_windowed(a, b) == pytest.approx(1.0)
    # identical boxes in the overlap -> merge keeps them and extends to 45
    m = merge_trajs(a, b)
    assert (m.pstart, m.pend) == (0, 45)
    assert m.rois.shape == (45, 4)
    np.testing.assert_allclose(m.rois, np.tile([0, 0, 9, 9], (45, 1)))
    # disjoint windows -> IoU 0
    c = Trajectory(100, 130, rois_b.copy())
    assert traj_iou_windowed(a, c) == 0.0
    # shifted boxes: overlap window IoU < 1
    d = Trajectory(15, 45, rois_b + np.array([5.0, 0, 5.0, 0]))
    assert 0.0 < traj_iou_windowed(Trajectory(0, 30, rois_a), d) < 1.0


def test_greedy_association_merges_and_scores():
    """Three segments; the same triplet continues through all three."""
    box = np.tile(np.array([0.0, 0.0, 9.0, 9.0]), (30, 1))
    far = np.tile(np.array([200.0, 200.0, 230.0, 230.0]), (30, 1))
    segs = [(0, 30), (15, 45), (30, 60)]
    trajs_lookup = {("v", fs, fe): [Trajectory(fs, fe, box.copy()),
                                    Trajectory(fs, fe, far.copy())]
                    for fs, fe in segs}
    st = [(("v", fs, fe), [(0.9 - 0.1 * i, (1, 2, 3), (0, 1))])
          for i, (fs, fe) in enumerate(segs)]
    objs = [f"o{i}" for i in range(5)]
    preds = [f"p{i}" for i in range(5)]
    out = greedy_relational_association(st, trajs_lookup, objs, preds)
    assert len(out) == 1
    r = out[0]
    assert r["triplet"] == ["o1", "p2", "o3"]
    assert r["duration"] == [0, 60]
    assert len(r["sub_traj"]) == 60
    assert r["score"] == pytest.approx(np.mean([0.9, 0.8, 0.7]))

    # different triplet in segment 2 -> separate relation, quirk score 1.0
    st2 = [(("v", 0, 30), [(0.9, (1, 2, 3), (0, 1))]),
           (("v", 15, 45), [(0.8, (2, 2, 3), (0, 1))])]
    out2 = greedy_relational_association(st2, trajs_lookup, objs, preds)
    assert len(out2) == 2
    by_trip = {tuple(r["triplet"]): r for r in out2}
    assert by_trip[("o2", "p2", "o3")]["score"] == pytest.approx(1.0)

    # same triplet but subject far away -> no merge
    st3 = [(("v", 0, 30), [(0.9, (1, 2, 3), (0, 1))]),
           (("v", 15, 45), [(0.8, (1, 2, 3), (1, 0))])]
    out3 = greedy_relational_association(st3, trajs_lookup, objs, preds)
    assert len(out3) == 2


def test_feature_preprocess_l1_blocks():
    cfg = SegmentBaselineConfig(feature_dim=2 * 6 + 11 * 16, num_obj_cats=6,
                                num_pred_cats=8, block_size=16)
    rng = np.random.default_rng(1)
    f = rng.uniform(0, 2, (5, cfg.feature_dim)).astype(np.float32)
    f[3, 12: 12 + 16] = 0.0                     # zero block passes through
    out = feature_preprocess(f, cfg)
    for i in range(8):
        lo = 12 + i * 16
        s = np.abs(out[:, lo:lo + 16]).sum(-1)
        if i == 0:
            assert s[3] == 0.0          # zero block stays zero (norm -> 1)
            s = np.delete(s, 3)
        np.testing.assert_allclose(s, 1.0, rtol=1e-5)
    # classeme + relpos channels untouched
    np.testing.assert_array_equal(out[:, :12], f[:, :12])
    np.testing.assert_array_equal(out[:, 12 + 8 * 16:], f[:, 12 + 8 * 16:])


def test_predict_segment_pairs_matches_naive():
    """Vectorized top-k cube == naive per-pair enumeration
    (reference model.py:259-280)."""
    cfg = SegmentBaselineConfig(feature_dim=2 * 6 + 11 * 16, num_obj_cats=6,
                                num_pred_cats=8, block_size=16,
                                pair_topk=3, seg_topk=10)
    model = SegmentBaseline(cfg)
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(7, cfg.feature_dim)).astype(np.float32)
    feats[:, :12] = np.abs(feats[:, :12])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    valid = np.ones((7,), bool)
    valid[5:] = False

    scores, sto = predict_segment_pairs(params, model,
                                        jnp.asarray(feats), jnp.asarray(valid))
    scores, sto = np.asarray(scores), np.asarray(sto)

    p = np.asarray(model.apply(params, jnp.asarray(feats)))
    s, o = feats[:, :6], feats[:, 6:12]
    naive = []
    k = cfg.pair_topk
    for i in range(5):
        top_s = np.argsort(s[i])[-k:]
        top_p = np.argsort(p[i])[-k:]
        top_o = np.argsort(o[i])[-k:]
        cube = (s[i][top_s, None, None] * p[i][None, top_p, None] *
                o[i][None, None, top_o])
        flat = np.argsort(cube, axis=None)[-k:]
        si, pi, oi = np.unravel_index(flat, cube.shape)
        naive += [(cube.ravel()[f], (top_s[a], top_p[b], top_o[c]), i)
                  for f, a, b, c in zip(flat, si, pi, oi)]
    naive.sort(key=lambda x: -x[0])
    naive = naive[:cfg.seg_topk]
    got = [(sc, tuple(row[:3]), row[3]) for sc, row in zip(scores, sto)
           if np.isfinite(sc)]
    assert len(got) == len(naive)
    np.testing.assert_allclose([g[0] for g in got], [n[0] for n in naive],
                               rtol=1e-5)
    assert set((g[1], g[2]) for g in got) == \
        set((tuple(int(v) for v in n[1]), n[2]) for n in naive)


def test_sample_positive_pairs_iou_gate():
    pairs = np.asarray([(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)])
    # rows 0,1,2 proposals; rows 3,4 GT (tids 7, 9)
    trackid = np.asarray([-1, -1, -1, 7, 9])
    iou = np.zeros((5, 5), np.float32)
    iou[0, 3] = 0.9            # proposal 0 matches GT tid 7
    iou[1, 4] = 0.8            # proposal 1 matches GT tid 9
    iou[2, 4] = 0.3            # below threshold
    gt_insts = [(7, 9, 2, 4, 1)]
    tindex = {(2, 4, 1): 5}
    rng = np.random.default_rng(0)
    rows, labels = sample_positive_pairs(pairs, iou, trackid, gt_insts, rng,
                                         10, tindex)
    assert list(rows) == [0] and list(labels) == [5]   # only pair (0, 1)


def test_triplet_softmax_and_training_learns():
    """End-to-end on the synthetic store: loss decreases, detect finds GT."""
    import optax
    from vidsgg_big_tpu.models.segment_baseline import (
        build_baseline_train_step, baseline_loss)
    cfg = SegmentBaselineConfig(feature_dim=2 * 6 + 11 * 16, num_obj_cats=6,
                                num_pred_cats=8, block_size=16)
    model = SegmentBaseline(cfg)
    rng = np.random.default_rng(3)
    trips = np.asarray([(0, 1, 2), (3, 4, 5), (2, 0, 1), (1, 7, 0)])
    n = 64
    labels = rng.integers(0, len(trips), n)
    feats = np.abs(rng.normal(0.1, 0.2,
                              (n, cfg.feature_dim))).astype(np.float32)
    for i, l in enumerate(labels):
        s, p, o = trips[l]
        feats[i, s] = 1.0
        feats[i, 6 + o] = 1.0
        feats[i, 2 * 6 + 8 * 16 + p] = 3.0      # predicate signature channel
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = build_baseline_train_step(model, tx)
    f, l = jnp.asarray(feats), jnp.asarray(labels)
    v, t = jnp.ones((n,), bool), jnp.asarray(trips)
    first = float(baseline_loss(params, model, f, l, v, t))
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state, f, l, v, t)
    assert float(loss) < first * 0.5
    lp = triplet_log_softmax(model.apply(params, f), f[:, :6], f[:, 6:12], t)
    acc = (np.asarray(lp).argmax(-1) == labels).mean()
    assert acc > 0.9
