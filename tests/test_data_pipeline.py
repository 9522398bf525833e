import json
import os
import sys
import types

import numpy as np
import pytest

from vidsgg_big_tpu.data import parse
from vidsgg_big_tpu.data.interpolate import linear_interpolation
from vidsgg_big_tpu.data.dataset import VidVRDDataset
from vidsgg_big_tpu.data.bucketing import BucketSpec, bucketed_batches
from vidsgg_big_tpu.data.synthetic import make_video
from vidsgg_big_tpu.utils.categories import (
    VIDVRD_ENTITIES, VIDVRD_PREDICATES, vidvrd_CatName2Id,
    vidvrd_PredName2Id)

DIM = 16


def _make_raw_tracklets(rng, video_len=60, n_tracks=4, fmt="mega"):
    """Rows in the reference .npy format with gaps and background rows."""
    rows = []
    for tid in range(n_tracks):
        s = int(rng.integers(0, 20))
        e = int(rng.integers(s + 8, min(s + 45, video_len)))
        cat = int(rng.integers(1, 35))
        for f in range(s, e):
            if rng.uniform() < 0.15 and s < f < e - 1:
                continue  # gap -> exercises interpolation
            xywh = rng.uniform(10, 100, 4).round(2).tolist()
            if fmt == "mega" and rng.uniform() < 0.2:
                rows.append([f, tid] + xywh)       # len-6 background row
            elif fmt == "pku" and rng.uniform() < 0.2:
                rows.append([f, tid] + xywh + [0.0, -1]
                            + rng.uniform(10, 100, 4).round(2).tolist()
                            + [0.0] * DIM)
            else:
                det = rng.uniform(10, 100, 4).round(2).tolist()
                feat = rng.normal(size=DIM).round(3).tolist()
                rows.append([f, tid] + xywh + [float(rng.uniform(0.3, 1)),
                                               cat] + det + feat)
    # one too-short track -> must become background and be dropped
    for f in range(3):
        xywh = rng.uniform(10, 100, 4).round(2).tolist()
        det = rng.uniform(10, 100, 4).round(2).tolist()
        rows.append([f, n_tracks] + xywh + [0.9, 3] + det
                    + rng.normal(size=DIM).round(3).tolist())
    return np.array(rows, dtype=object)


def _make_annotation(rng, video_len=60, n_trajs=3, n_rels=4):
    trajs = []
    frames = [[] for _ in range(video_len)]
    durs = []
    for tid in range(n_trajs):
        cat = VIDVRD_ENTITIES[int(rng.integers(1, 36))]
        trajs.append({"tid": tid, "category": cat})
        s = int(rng.integers(0, 10))
        e = int(rng.integers(s + 30, video_len))
        durs.append((s, e))
        for f in range(s, e):
            if rng.uniform() < 0.1 and s < f < e - 1:
                continue
            x, y = rng.uniform(0, 200, 2)
            w, h = rng.uniform(20, 100, 2)
            frames[f].append({"tid": tid, "bbox": {
                "xmin": float(x), "ymin": float(y),
                "xmax": float(x + w), "ymax": float(y + h)}})
    rels = []
    for _ in range(n_rels):
        si, oi = rng.choice(n_trajs, 2, replace=False)
        s = max(durs[si][0], durs[oi][0])
        e = min(durs[si][1], durs[oi][1])
        if e - s < 10:
            continue
        pred = VIDVRD_PREDICATES[int(rng.integers(1, 133))]
        # split into overlapping segments to exercise merge_duration_list
        mid = (s + e) // 2
        rels.append({"subject_tid": int(si), "object_tid": int(oi),
                     "predicate": pred, "begin_fid": int(s),
                     "end_fid": int(mid + 2)})
        rels.append({"subject_tid": int(si), "object_tid": int(oi),
                     "predicate": pred, "begin_fid": int(mid),
                     "end_fid": int(e)})
    return {"trajectories": frames, "subject/objects": trajs,
            "relation_instances": rels, "width": 480, "height": 270}


@pytest.fixture(scope="module")
def reference_dataset_cls(reference_utils):
    np.float = float    # the reference uses removed numpy aliases
    np.int = int
    sys.path.insert(0, "/root/reference")
    try:
        from dataloaders import dataloader_vidvrd as ref_dl
    finally:
        sys.path.remove("/root/reference")
    return ref_dl


def test_proposal_parser_matches_reference(tmp_path, reference_dataset_cls):
    ref_dl = reference_dataset_cls
    rng = np.random.default_rng(0)
    raw = _make_raw_tracklets(rng, fmt="mega")
    np.save(tmp_path / "vid0.npy", raw, allow_pickle=True)

    ns = types.SimpleNamespace(proposal_dir=str(tmp_path), dim_boxfeature=DIM,
                               min_frames_th=5, max_proposal=50)
    ref_prop = ref_dl.Dataset._get_proposal(ns, "vid0")

    parsed = parse.parse_tracklets_mega(raw, DIM, 5)
    ours = parse.build_proposal_record("vid0", parsed, 50)

    assert ours.num_proposals == ref_prop.num_proposals
    np.testing.assert_array_equal(ours.cat_ids, ref_prop.cat_ids.numpy())
    np.testing.assert_allclose(ours.scores, ref_prop.scores.numpy(),
                               rtol=1e-6)
    np.testing.assert_array_equal(ours.durations,
                                  ref_prop.traj_durations.numpy())
    for i in range(ours.num_proposals):
        np.testing.assert_allclose(
            ours.boxes[i], ref_prop.bboxes_list[i].numpy(), rtol=1e-6)
        np.testing.assert_allclose(
            ours.features[i], ref_prop.features_list[i].numpy(), rtol=1e-6)


def test_pku_parser_matches_reference(tmp_path, reference_dataset_cls):
    ref_dl = reference_dataset_cls
    rng = np.random.default_rng(1)
    raw = _make_raw_tracklets(rng, fmt="pku")
    np.save(tmp_path / "vidp.npy", raw, allow_pickle=True)
    ns = types.SimpleNamespace(proposal_dir=str(tmp_path), dim_boxfeature=DIM,
                               min_frames_th=5, max_proposal=50)
    ref_prop = ref_dl.Dataset_pku._get_proposal(ns, "vidp")
    parsed = parse.parse_tracklets_pku(raw, DIM, 5)
    ours = parse.build_proposal_record("vidp", parsed, 50)
    assert ours.num_proposals == ref_prop.num_proposals
    np.testing.assert_allclose(ours.scores, ref_prop.scores.numpy(),
                               rtol=1e-6)
    for i in range(ours.num_proposals):
        np.testing.assert_allclose(
            ours.boxes[i], ref_prop.bboxes_list[i].numpy(), rtol=1e-6)
        np.testing.assert_allclose(
            ours.features[i], ref_prop.features_list[i].numpy(), rtol=1e-6)


def test_gt_parser_matches_reference(tmp_path, reference_dataset_cls):
    ref_dl = reference_dataset_cls
    rng = np.random.default_rng(2)
    anno = _make_annotation(rng)
    ann_dir = tmp_path / "test"
    ann_dir.mkdir()
    with open(ann_dir / "vidg.json", "w") as f:
        json.dump(anno, f)
    ns = types.SimpleNamespace(video_ann_dir=str(ann_dir), split="test",
                               max_preds=100)
    ref_gt = ref_dl.Dataset._get_gt_graph(ns, "vidg")

    ours = parse.parse_gt_annotation("vidg", anno, vidvrd_CatName2Id,
                                     vidvrd_PredName2Id, max_preds=100)
    assert ours.num_trajs == ref_gt.num_trajs
    assert ours.num_preds == ref_gt.num_preds
    np.testing.assert_array_equal(ours.traj_cat_ids,
                                  ref_gt.traj_cat_ids.numpy())
    np.testing.assert_array_equal(ours.traj_durations,
                                  ref_gt.traj_durations.numpy())
    np.testing.assert_array_equal(ours.pred_cat_ids,
                                  ref_gt.pred_cat_ids.numpy())
    np.testing.assert_allclose(ours.pred_durations,
                               ref_gt.pred_durations.numpy())
    np.testing.assert_array_equal(ours.adj, ref_gt.adj_matrix.numpy())
    for i in range(ours.num_trajs):
        np.testing.assert_allclose(ours.traj_boxes[i],
                                   ref_gt.traj_bboxes[i].numpy(), rtol=1e-6)


def test_linear_interpolation_matches_reference(reference_utils):
    rng = np.random.default_rng(3)
    frame_ids = [2, 3, 4, 8, 9, 15]
    vecs = rng.normal(size=(len(frame_ids), 6))
    ours = linear_interpolation(vecs.copy(), frame_ids)
    ref = reference_utils.linear_interpolation(vecs.copy(), frame_ids)
    np.testing.assert_allclose(ours, ref, rtol=1e-9)
    assert ours.shape[0] == 15 - 2 + 1


def test_dataset_end_to_end_with_cache(tmp_path):
    rng = np.random.default_rng(4)
    prop_dir = tmp_path / "props"
    ann_dir = tmp_path / "anns" / "test"
    cache_dir = tmp_path / "cache"
    prop_dir.mkdir()
    ann_dir.mkdir(parents=True)
    for v in range(3):
        np.save(prop_dir / f"vid{v}.npy", _make_raw_tracklets(rng),
                allow_pickle=True)
        with open(ann_dir / f"vid{v}.json", "w") as f:
            json.dump(_make_annotation(rng), f)

    kw = dict(split="test", ann_dir=str(tmp_path / "anns"),
              proposal_dir=str(prop_dir), dim_boxfeature=DIM,
              min_frames_th=5, max_proposal=50, max_preds=100,
              cache_tag="t", cache_dir=str(cache_dir))
    ds = VidVRDDataset(**kw)
    assert len(ds) == 3
    items = list(ds)
    # second pass loads from cache and must be identical
    ds2 = VidVRDDataset(**kw)
    for (p1, g1), (p2, g2) in zip(items, ds2):
        np.testing.assert_allclose(p1.scores, p2.scores, rtol=1e-6)
        np.testing.assert_array_equal(p1.durations, p2.durations)
        for b1, b2 in zip(p1.boxes, p2.boxes):
            np.testing.assert_allclose(b1, b2, rtol=1e-6)
        np.testing.assert_array_equal(g1.adj, g2.adj)

    spec = BucketSpec(n_ladder=(8, 16), t_ladder=(64, 128), g_bucket=8,
                      p_bucket=16, feat_dim=DIM)
    batches = list(bucketed_batches(items, spec, batch_size=2))
    total = sum(len(rows) for _, rows, _, _ in batches)
    assert total >= 3
    for key, rows, props, gts in batches:
        assert props.feats.shape[0] == 2
        assert props.feats.shape[1] == key[0]
        assert props.feats.shape[2] == key[1]


def test_bucketed_batches_streams_with_bounded_pending():
    """The bucketer must (a) yield full batches before the source iterator
    is exhausted (streaming — bounded-memory drivers depend on it), (b)
    flush the fullest bucket early once max_pending records are held, and
    (c) deliver every record exactly once with padding repeats masked."""
    from vidsgg_big_tpu.data.synthetic import make_video

    recs = []
    for i in range(24):
        # alternate shapes so multiple buckets stay partially filled
        p, g = make_video(i, video_len=40 if i % 3 else 100,
                          n_preds=3, n_gt_trajs=3,
                          feat_dim=16, num_enti_cats=8, num_pred_cats=10)
        recs.append((p, g))
    spec = BucketSpec(n_ladder=(8, 16), t_ladder=(64, 128), g_bucket=8,
                      p_bucket=8, feat_dim=16)

    pulled = {"n": 0}

    def source():
        for r in recs:
            pulled["n"] += 1
            yield r

    gen = bucketed_batches(source(), spec, batch_size=4, max_pending=8)
    first = next(gen)
    assert pulled["n"] < len(recs), "first batch must stream, not buffer all"

    batches = [first] + list(gen)
    seen = [p.video_name for _, rows, _, _ in batches for p, _ in rows]
    assert sorted(seen) == sorted(p.video_name for p, _ in recs)
    for key, rows, props, gts in batches:
        assert props.feats.shape[0] == 4          # fixed compiled batch size
        # rows beyond the real count are masked out entirely
        mask = np.asarray(props.traj_mask)
        assert mask[len(rows):].sum() == 0
        assert all(mask[i].any() for i in range(len(rows)))


def test_bucketed_batches_drop_last_keeps_early_flushes():
    """drop_last governs only the end-of-stream remainder: records flushed
    early by the max_pending cap must still be yielded (padded+masked), not
    silently discarded mid-epoch."""
    from vidsgg_big_tpu.data.synthetic import make_video

    recs = []
    for i in range(24):
        p, g = make_video(i, video_len=40 if i % 3 else 100,
                          n_preds=3, n_gt_trajs=3,
                          feat_dim=16, num_enti_cats=8, num_pred_cats=10)
        recs.append((p, g))
    spec = BucketSpec(n_ladder=(8, 16), t_ladder=(64, 128), g_bucket=8,
                      p_bucket=8, feat_dim=16)

    batches = list(bucketed_batches(iter(recs), spec, batch_size=4,
                                    max_pending=8, drop_last=True))
    seen = [p.video_name for _, rows, _, _ in batches for p, _ in rows]
    assert len(seen) == len(set(seen))
    all_names = {p.video_name for p, _ in recs}
    # without drop_last every record appears; with it, only the final
    # (post-cap) partial buckets may be missing — strictly fewer than one
    # batch per bucket key in flight at stream end
    missing = all_names - set(seen)
    n_buckets = len({spec.bucket_of(p) for p, _ in recs})
    assert len(missing) < 4 * n_buckets
    # the early-flush path must have fired and its records been kept:
    # more than (24 - max_pending) records must survive
    assert len(seen) >= len(recs) - 4 * n_buckets


def test_prepare_bias_matrix_and_classeme():
    from vidsgg_big_tpu.data import prepare
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.utils import categories as cats
    gts = [make_video(s, num_enti_cats=36, num_pred_cats=133)[1]
           for s in range(3)]
    trips = prepare.collect_triplet_names(
        gts, cats.vidvrd_CatId2name, cats.vidvrd_PredId2name)
    bias = prepare.build_bias_matrix(trips, cats.vidvrd_CatName2Id,
                                     cats.vidvrd_PredName2Id)
    assert bias.shape == (36, 36, 133)
    # rows are log-probabilities of a normalized distribution (+1e-3 offset)
    p = np.exp(bias) - 1e-3
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-4)
    # unseen pairs put all mass on background
    assert bias[0, 0, 0] > bias[0, 0, 1]

    # classeme: one-hot logits recover the word embedding
    emb = np.random.default_rng(0).normal(size=(35, 300)).astype(np.float32)
    logits = np.full((4, 36), -20.0, np.float32)
    for i in range(4):
        logits[i, i + 1] = 20.0
    cls = prepare.extract_classeme(logits, emb)
    np.testing.assert_allclose(cls, emb[:4], rtol=1e-4, atol=1e-5)


def test_name_embedding_rules():
    from vidsgg_big_tpu.data import prepare
    glove = {w: np.full(3, float(i)) for i, w in
             enumerate(["ball", "sports", "play", "hold", "hand", "of"])}
    e = prepare.name_embedding("ball/sports_ball", glove, dim=3)
    np.testing.assert_allclose(e, (0 + (1 + 0) / 2) / 2)
    e = prepare.name_embedding("play(instrument)", glove, dim=3)
    np.testing.assert_allclose(e, 2.0)
    e = prepare.name_embedding("hold_hand_of", glove, dim=3)
    np.testing.assert_allclose(e, 4.0)
    assert (prepare.name_embedding("__background__", glove, 3) == 0).all()


def test_merge_gt_into_proposals():
    from vidsgg_big_tpu.data.dataset import merge_gt_into_proposals
    prop, gt = make_video(30, feat_dim=8)
    gt_feats = [np.random.default_rng(0).normal(
        size=(b.shape[0], 8)).astype(np.float32) for b in gt.traj_boxes]
    merged = merge_gt_into_proposals(prop, gt, gt_feats, max_proposal=50)
    assert merged.num_proposals == prop.num_proposals + gt.num_trajs
    # GT trajectories carry score 1.0 -> sorted first
    assert merged.scores[:gt.num_trajs] == pytest.approx(1.0)


def test_visualizer_renders(tmp_path):
    from vidsgg_big_tpu.utils.visualize import render_video_annotations
    _, gt = make_video(31)
    insts = [{"tid": i, "category": "obj",
              "trajectory": {int(gt.traj_durations[i][0]) + k: b.tolist()
                             for k, b in enumerate(gt.traj_boxes[i])}}
             for i in range(gt.num_trajs)]
    frames = render_video_annotations(10, insts)
    assert len(frames) == 10
    assert any((f != 255).any() for f in frames)   # something was drawn


def test_prefetch_preserves_order_and_propagates_errors():
    from vidsgg_big_tpu.data.prefetch import prefetch
    assert list(prefetch(range(10), device_put=False)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("boom")
    it = prefetch(boom(), device_put=False)
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_vidor_test_split_annotation_free(tmp_path):
    """Test-split ingestion: names + video_len/wh come from the video files
    (reference dataloader_vidor.py:447-455), GT is None."""
    from vidsgg_big_tpu.data.synthetic_raw import write_synthetic_vidor
    from vidsgg_big_tpu.data.dataset import VidORDataset

    cfg = write_synthetic_vidor(str(tmp_path), n_videos=3, split="test",
                                video_len=40, wh=(64, 48))
    assert cfg["video_dir"] is not None
    ds = VidORDataset(**cfg)
    assert len(ds) == 3
    seen = 0
    for vf, prop, gt in ds:
        assert gt is None
        assert prop.video_len == 40
        assert tuple(prop.video_wh) == (64, 48)
        assert prop.num_proposals > 0
        assert vf.ndim == 2                      # I3D clip features
        seen += 1
    assert seen == 3
    # second pass must hit the per-video .npz cache (incl. the None GT)
    vf, prop, gt = ds[0]
    assert gt is None and prop.video_len == 40


def test_vidor_v3_ingestion_matches_reference(tmp_path, reference_utils):
    """End-to-end VidOR-val ingestion parity vs the reference v3 loader:
    per-video proposals (classeme-concat features, score clipping, top-k)
    and GT graphs from the same on-disk files must match
    ``dataloader_vidor_v3.Dataset._get_proposal`` / ``_get_gt_graph``
    (reference dataloaders/dataloader_vidor_v3.py:389-621) exactly."""
    from vidsgg_big_tpu.data.synthetic_raw import write_synthetic_vidor
    from vidsgg_big_tpu.data.dataset import VidORDataset

    np.float = float
    np.int = int
    sys.path.insert(0, "/root/reference")
    try:
        from dataloaders import dataloader_vidor_v3 as ref_v3
    finally:
        sys.path.remove("/root/reference")

    dim_feat = 24
    cfg = write_synthetic_vidor(str(tmp_path), n_videos=4, split="val",
                                dim_feat=dim_feat, video_len=70,
                                with_video_features=False)
    ds = VidORDataset(**cfg)
    assert len(ds) == 4

    ns = types.SimpleNamespace(
        videoname2trackres=lambda vn: os.path.join(
            cfg["proposal_dir"], vn + ".npy"),
        classeme_dir=cfg["classeme_dir"], dim_boxfeature=dim_feat,
        min_frames_th=cfg["min_frames_th"],
        max_proposal=cfg["max_proposal"], score_th=cfg["score_th"],
        max_preds=cfg["max_preds"], split="val",
        video_ann_dir=os.path.join(cfg["ann_dir"], "validation"),
        enti_CatName2Id=ref_v3.vidor_CatName2Id,
        pred_CatName2Id=ref_v3.vidor_PredName2Id)

    for name in ds.video_name_list:
        ref_prop = ref_v3.Dataset._get_proposal(ns, name)
        ref_gt = ref_v3.Dataset._get_gt_graph(ns, name)
        prop, gt = ds.get_data(name)

        assert prop.num_proposals == ref_prop.num_proposals, name
        np.testing.assert_array_equal(prop.cat_ids,
                                      ref_prop.cat_ids.numpy())
        np.testing.assert_allclose(prop.scores, ref_prop.scores.numpy(),
                                   rtol=1e-6)
        np.testing.assert_array_equal(prop.durations,
                                      ref_prop.traj_durations.numpy())
        for i in range(prop.num_proposals):
            np.testing.assert_allclose(
                prop.boxes[i], ref_prop.bboxes_list[i].numpy(), rtol=1e-6)
            # features carry the classeme concat (roi dim_feat + 300 glove)
            assert prop.features[i].shape[1] == dim_feat + 300
            np.testing.assert_allclose(
                prop.features[i], ref_prop.features_list[i].numpy(),
                rtol=1e-6)

        assert gt.num_trajs == ref_gt.num_trajs
        assert gt.num_preds == ref_gt.num_preds
        assert gt.video_len == ref_gt.video_len
        assert tuple(gt.video_wh) == tuple(ref_gt.video_wh)
        np.testing.assert_array_equal(gt.traj_cat_ids,
                                      ref_gt.traj_cat_ids.numpy())
        np.testing.assert_array_equal(gt.traj_durations,
                                      ref_gt.traj_durations.numpy())
        np.testing.assert_array_equal(gt.pred_cat_ids,
                                      ref_gt.pred_cat_ids.numpy())
        np.testing.assert_allclose(gt.pred_durations,
                                   ref_gt.pred_durations.numpy())
        np.testing.assert_array_equal(gt.adj, ref_gt.adj_matrix.numpy())
        for i in range(gt.num_trajs):
            np.testing.assert_allclose(
                gt.traj_boxes[i], ref_gt.traj_bboxes[i].numpy(), rtol=1e-6)


def test_pack_gt_keeps_true_durations_and_zero_proposal_videos_pack():
    """Two real-data regressions from review: (a) pack_gt must keep TRUE GT
    temporal extents even when per-frame boxes are truncated by the bucket
    (clamping corrupted grounding queries and vIoU targets for any
    trajectory longer than the bucket); (b) zero-proposal videos must pack
    to feat_dim-sized empty arrays, not (N, T, 0)."""
    from vidsgg_big_tpu.data.types import (VideoProposalRecord, pack_gt,
                                           pack_proposal, stack_batches)
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.data.bucketing import BucketSpec, bucketed_batches

    prop, gt = make_video(0, video_len=470, feat_dim=16, n_gt_trajs=3,
                          n_preds=4, num_enti_cats=10, num_pred_cats=16)
    long_dura = np.asarray(gt.traj_durations)
    packed = pack_gt(gt, g_bucket=6, tg_bucket=64, p_bucket=8)
    np.testing.assert_array_equal(packed.traj_durations[:gt.num_trajs],
                                  long_dura)          # never clamped to 64

    # the streaming bucketer sizes the GT box bucket to cover every
    # trajectory, so the vIoU alignment never reads zero-padded boxes
    spec = BucketSpec(feat_dim=16, g_bucket=2)        # force the g-growth too
    (key, rows, props, gts), = list(bucketed_batches([(prop, gt)], spec, 1))
    # gts leaves carry a leading batch axis: (B, G, Tg, 4)
    assert gts.traj_boxes.shape[2] >= max(
        b.shape[0] for b in gt.traj_boxes)
    assert gts.traj_boxes.shape[1] >= gt.num_trajs    # grown past g_bucket=2
    np.testing.assert_array_equal(gts.traj_durations[0, :gt.num_trajs],
                                  long_dura)

    empty = VideoProposalRecord(
        video_name="e", video_len=40, video_wh=(64, 48),
        cat_ids=np.zeros((0,), np.int32), scores=np.zeros((0,), np.float32),
        durations=np.zeros((0, 2), np.int32), boxes=[], features=[])
    pe = pack_proposal(empty, 16, 32, 16)
    assert pe.feats.shape == (16, 32, 16)
    assert pe.boxes.shape == (16, 32, 4)
    pe8 = pack_proposal(empty, 16, 32, 16, dtype=np.int8)  # no empty-max crash
    assert pe8.feats.dtype == np.int8
    # an empty and a real video in the same bucket must stack cleanly
    nonempty = pack_proposal(prop, 16, 32, 16)
    stacked = stack_batches([pe, nonempty])
    assert stacked.feats.shape == (2, 16, 32, 16)
