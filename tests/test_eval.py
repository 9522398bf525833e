import os
import sys

import numpy as np
import pytest

from vidsgg_big_tpu.evaluation.metrics import viou, voc_ap, evaluate
from vidsgg_big_tpu.evaluation.convert import EvalFmtCvtor, traj_cutoff
from vidsgg_big_tpu.data.synthetic import make_video


@pytest.fixture(scope="module")
def reference_eval():
    ref_root = "/root/reference"
    if not os.path.isdir(ref_root):
        pytest.skip("reference repo not available")
    sys.path.insert(0, ref_root)
    try:
        from VidVRDhelperEvalAPIs import common as ref_common
        from VidVRDhelperEvalAPIs import visual_relation_detection as ref_vrd
    finally:
        sys.path.remove(ref_root)
    return ref_common, ref_vrd


def _random_relations(rng, n, video_len, names, with_score):
    rels = []
    for _ in range(n):
        s = int(rng.integers(0, video_len - 6))
        e = int(rng.integers(s + 3, min(s + 40, video_len)))
        L = e - s
        def traj():
            xy = rng.uniform(0, 200, size=(L, 2))
            wh = rng.uniform(20, 120, size=(L, 2))
            return np.concatenate([xy, xy + wh], -1).round(1).tolist()
        r = {
            "triplet": [str(rng.choice(names)), str(rng.choice(names)),
                        str(rng.choice(names))],
            "duration": (s, e),
            "sub_traj": traj(),
            "obj_traj": traj(),
        }
        if with_score:
            r["score"] = float(rng.uniform())
        rels.append(r)
    return rels


def _noisy_copy(rng, gt_rels, jitter):
    preds = []
    for g in gt_rels:
        p = {k: (list(v) if isinstance(v, (list, tuple)) else v)
             for k, v in g.items()}
        p["score"] = float(rng.uniform())
        p["sub_traj"] = [[c + rng.normal(0, jitter) for c in b]
                         for b in g["sub_traj"]]
        p["obj_traj"] = [[c + rng.normal(0, jitter) for c in b]
                         for b in g["obj_traj"]]
        preds.append(p)
    return preds


def test_viou_matches_reference(reference_eval):
    ref_common, _ = reference_eval
    rng = np.random.default_rng(0)
    for _ in range(30):
        d1 = sorted(rng.integers(0, 50, size=2).tolist())
        d1 = (d1[0], d1[1] + 2)
        d2 = sorted(rng.integers(0, 50, size=2).tolist())
        d2 = (d2[0], d2[1] + 2)
        t1 = rng.uniform(0, 100, size=(d1[1] - d1[0], 4))
        t1[:, 2:] += t1[:, :2]
        t2 = rng.uniform(0, 100, size=(d2[1] - d2[0], 4))
        t2[:, 2:] += t2[:, :2]
        ours = viou(t1.tolist(), d1, t2.tolist(), d2)
        ref = ref_common.viou(t1.tolist(), d1, t2.tolist(), d2)
        np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_voc_ap_matches_reference(reference_eval):
    ref_common, _ = reference_eval
    rng = np.random.default_rng(1)
    rec = np.sort(rng.uniform(size=40))
    prec = rng.uniform(size=40)
    for use07 in (False, True):
        np.testing.assert_allclose(
            voc_ap(rec, prec, use07), ref_common.voc_ap(rec, prec, use07),
            rtol=1e-9)


def test_evaluate_matches_reference_end_to_end(reference_eval):
    _, ref_vrd = reference_eval
    rng = np.random.default_rng(2)
    names = ["dog", "person", "ride", "next_to", "car"]
    gt, pred = {}, {}
    for v in range(6):
        g = _random_relations(rng, 8, 100, names, with_score=False)
        gt[f"v{v}"] = g
        # predictions: noisy copies + pure noise
        p = _noisy_copy(rng, g[:5], jitter=2.0)
        p += _random_relations(rng, 10, 100, names, with_score=True)
        pred[f"v{v}"] = p

    ours = evaluate(gt, pred)
    ref = ref_vrd.evaluate(gt, pred)
    np.testing.assert_allclose(ours[0], ref[0], rtol=1e-7)
    for k in (50, 100):
        np.testing.assert_allclose(ours[1][k], ref[1][k], rtol=1e-7)
    for k in (1, 5, 10):
        np.testing.assert_allclose(ours[2][k], ref[2][k], rtol=1e-7)
    # hit infos parity
    ours_hits = evaluate(gt, pred, return_hit_infos=True)[3]
    ref_hits = ref_vrd.evaluate_v2(gt, pred)[3]
    for v in gt:
        np.testing.assert_array_equal(ours_hits[v][1], ref_hits[v][1])


def test_gt_self_evaluation_perfect():
    """Converting GT to challenge format and evaluating against itself must
    give mAP == 1 (sanity of the converter + metric plumbing)."""
    cvt = EvalFmtCvtor("vidvrd")
    gt_all, pred_all = {}, {}
    for s in range(4):
        _, gt = make_video(s, video_len=60, n_gt_trajs=4, n_preds=6,
                           num_enti_cats=36, num_pred_cats=133)
        d = cvt.to_eval_format_gt(gt)
        (k, rels), = d.items()
        gt_all[k] = rels
        pred_all[k] = [dict(r, score=0.9) for r in rels]
    mean_ap, rec, prec = evaluate(gt_all, pred_all)
    assert mean_ap == pytest.approx(1.0)


def test_traj_cutoff_contract():
    traj = np.arange(40).reshape(10, 4)
    out = traj_cutoff(traj, (5, 15), (7, 12))
    assert out.shape == (5, 4)
    np.testing.assert_array_equal(out[0], traj[2])
    with pytest.raises(AssertionError):
        traj_cutoff(traj, (5, 15), (4, 12))


def test_annotation_dataset_and_gt_generation(tmp_path):
    import json as _json
    from vidsgg_big_tpu.data.annotations import VidVRD, prepare_gts_for_eval
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.data.synthetic_raw import _annotation_from_gt
    ann = tmp_path / "test"
    ann.mkdir()
    names = []
    for s in range(3):
        _, gt = make_video(s, num_enti_cats=36, num_pred_cats=133)
        a = _annotation_from_gt(gt)
        a["video_id"] = gt.video_name
        names.append(gt.video_name)
        with open(ann / f"{gt.video_name}.json", "w") as f:
            _json.dump(a, f)
    ds = VidVRD(str(tmp_path), splits=["test"])
    assert ds.get_index("test") == sorted(names)
    assert ds.get_object_num() > 0 and ds.get_predicate_num() > 0
    insts = ds.get_relation_insts(names[0])
    assert all(len(i["sub_traj"]) == i["duration"][1] - i["duration"][0]
               for i in insts)
    gts = prepare_gts_for_eval(ds, "test", str(tmp_path / "gts.json"))
    assert set(gts) == set(names)
    # the generated GT evaluates perfectly against itself
    preds = {v: [dict(r, score=0.9, sub_traj=[list(b) for b in r["sub_traj"]],
                      obj_traj=[list(b) for b in r["obj_traj"]])
                 for r in rels] for v, rels in gts.items()}
    mAP, _, _ = evaluate(gts, preds)
    assert mAP == pytest.approx(1.0)


def test_traj_map_matches_reference():
    """Trajectory-mAP == reference video_object_detection.evaluate on random
    per-frame trajectory dicts (3-threshold overlap, VOC-07 AP, greedy
    per-class matching)."""
    import sys

    from vidsgg_big_tpu.evaluation.traj_map import eval_video_object

    sys.path.insert(0, "/root/reference")
    try:
        from VidVRDhelperEvalAPIs import video_object_detection as ref_vod
    finally:
        sys.path.remove("/root/reference")

    rng = np.random.default_rng(17)
    cats = ["dog", "car", "person", "bicycle"]

    def traj(lo, hi):
        fids = [str(f) for f in range(int(lo), int(hi))]
        xy = rng.uniform(0, 200, size=(len(fids), 2))
        wh = rng.uniform(20, 120, size=(len(fids), 2))
        boxes = np.concatenate([xy, xy + wh], -1).round(1).tolist()
        return dict(zip(fids, boxes))

    gt, pred = {}, {}
    for v in range(4):
        vid = f"v{v}"
        gt[vid] = [
            {"category": str(rng.choice(cats)),
             "trajectory": traj(rng.integers(0, 10), rng.integers(20, 40))}
            for _ in range(int(rng.integers(2, 5)))]
        preds = []
        for g in gt[vid]:
            t = {f: [c + rng.normal(0, 3.0) for c in b]
                 for f, b in g["trajectory"].items()}
            preds.append({"category": g["category"],
                          "score": float(rng.uniform()), "trajectory": t})
        # distractors: wrong class / random boxes
        preds.append({"category": str(rng.choice(cats)),
                      "score": float(rng.uniform()),
                      "trajectory": traj(0, 25)})
        pred[vid] = preds

    ours_map, ours_ap = eval_video_object(gt, pred, use_07_metric=True,
                                          thresh_t=0.5)
    ref_map, ref_ap = ref_vod.evaluate(gt, pred, use_07_metric=True,
                                       thresh_t=0.5)
    np.testing.assert_allclose(ours_map, ref_map, rtol=1e-12)
    assert ours_ap == ref_ap


def test_fraction_recall_matches_reference(reference_utils):
    """fraction_recall == the reference eval_fraction_recall pipeline
    (reference tools/eval_fraction_recall.py:14-178) on random GT graphs
    with duplicated 5-tuples and random hit assignments.

    (reference_utils installs the torchvision stub the reference imports.)"""
    import sys
    import types as _types
    import importlib

    import torch

    from vidsgg_big_tpu.data.types import VideoGTRecord
    from vidsgg_big_tpu.evaluation.fraction_recall import fraction_recall

    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/tools")
    try:
        ref = importlib.import_module("eval_fraction_recall")
        from utils.utils_func import unique_with_idx_nd
    finally:
        sys.path.remove("/root/reference/tools")
        sys.path.remove("/root/reference")

    rng = np.random.default_rng(23)
    n_recalls = (50, 100, 150, 1000)
    gts, hit_infos = [], {}
    for v in range(5):
        n, p = int(rng.integers(3, 6)), int(rng.integers(4, 10))
        adj = np.zeros((2, p, n), np.float32)
        # force duplicate 5-tuples: reuse a few (sub, obj) pairs + cats
        pred_cats = rng.integers(1, 4, p)
        subs = rng.integers(0, n, p)
        objs = (subs + 1 + rng.integers(0, n - 1, p)) % n
        if p >= 3:                       # guaranteed "multiple" group
            pred_cats[1] = pred_cats[0]
            subs[1], objs[1] = subs[0], objs[0]
        adj[0, np.arange(p), subs] = 1
        adj[1, np.arange(p), objs] = 1
        duras = np.stack([np.zeros(p), np.full(p, 20)], 1).astype(np.int64)
        gt = VideoGTRecord(
            video_name=f"g_{v:010d}", video_len=30, video_wh=(64, 48),
            traj_cat_ids=rng.integers(1, 6, n).astype(np.int64),
            traj_durations=np.stack(
                [np.zeros(n), np.full(n, 25)], 1).astype(np.int64),
            traj_boxes=[np.zeros((26, 4), np.float32) for _ in range(n)],
            pred_cat_ids=pred_cats.astype(np.int64), pred_durations=duras,
            adj=adj)
        gts.append(gt)
        hits = rng.integers(-1, 130, p).astype(np.int64)
        hit_infos[gt.video_name] = (rng.uniform(size=p), hits)

    ours = fraction_recall(gts, hit_infos, n_recalls)

    # replay the reference aggregation with the reference's own functions
    total_hit = {s: {k: 0.0 for k in n_recalls} for s in range(3)}
    total_gt = {s: 0 for s in range(3)}
    per_video = {s: {k: [] for k in n_recalls} for s in range(3)}
    for gt in gts:
        duck = _types.SimpleNamespace(
            num_trajs=gt.num_trajs, num_preds=gt.num_preds,
            video_len=gt.video_len,
            traj_bboxes=[torch.tensor(b) for b in gt.traj_boxes],
            traj_cat_ids=torch.tensor(gt.traj_cat_ids),
            traj_durations=torch.tensor(gt.traj_durations),
            pred_durations=torch.tensor(gt.pred_durations),
            pred_cat_ids=torch.tensor(gt.pred_cat_ids),
            adj_matrix=torch.tensor(gt.adj))
        five = ref.prepare_gt_data(duck)
        _, gt2hit = hit_infos[gt.video_name]
        gt2hit = torch.tensor(gt2hit)
        _, index_map = unique_with_idx_nd(five)
        singles, multiples = [], []
        for im in index_map:
            (singles if len(im) == 1 else multiples).append(im)
        cat = lambda ims: (torch.cat(ims) if ims
                           else torch.empty(0, dtype=torch.long))
        for s, ids in ((0, torch.arange(five.shape[0])), (1, cat(singles)),
                       (2, cat(multiples))):
            n_gt, n_hits = ref.calculate_n_hits(five[ids], gt2hit[ids],
                                                list(n_recalls))
            total_gt[s] += n_gt
            for k, h in n_hits.items():
                total_hit[s][k] += h
                if n_gt > 0:
                    per_video[s][k].append(h / n_gt)

    names = {0: "overall", 1: "single", 2: "multiple"}
    for s, nm in names.items():
        for k in n_recalls:
            np.testing.assert_allclose(
                ours["video_level"][nm][k],
                float(np.mean(per_video[s][k])) if per_video[s][k] else 0.0,
                rtol=1e-9, err_msg=f"video {nm}@{k}")
            np.testing.assert_allclose(
                ours["dataset_level"][nm][k],
                (total_hit[s][k] / total_gt[s]) if total_gt[s] else 0.0,
                rtol=1e-9, err_msg=f"dataset {nm}@{k}")


def test_zero_shot_eval():
    from vidsgg_big_tpu.evaluation.zero_shot import evaluate_zero_shot
    rng = np.random.default_rng(11)
    names = ["dog", "person", "ride", "car"]
    gt = {"v0": _random_relations(rng, 6, 80, names, with_score=False)}
    pred = {"v0": _noisy_copy(rng, gt["v0"], jitter=0.5)}
    all_triplets = {tuple(r["triplet"]) for r in gt["v0"]}
    seen = set(list(all_triplets)[:len(all_triplets) // 2])
    mAP, rec, prec = evaluate_zero_shot(gt, pred, seen)
    assert 0.0 <= mAP <= 1.0
    # with every triplet seen at train time there is nothing to evaluate
    mAP0, _, _ = evaluate_zero_shot(gt, pred, all_triplets)
    assert mAP0 == 0.0


def test_zero_shot_matches_reference_protocol(reference_eval):
    """evaluate_zero_shot == the reference's zero-shot relation evaluation
    (reference VidVRD-helper/evaluate.py:22-53): triplet filtering replicated
    step for step, metrics from the reference evaluate() as oracle — for both
    the 'new' and 'old' protocols."""
    _, ref_vrd = reference_eval
    from vidsgg_big_tpu.evaluation.zero_shot import evaluate_zero_shot

    rng = np.random.default_rng(13)
    names = ["dog", "person", "ride", "next_to", "car", "bicycle"]
    gt, pred = {}, {}
    for v in range(5):
        g = _random_relations(rng, 7, 90, names, with_score=False)
        gt[f"v{v}"] = g
        pred[f"v{v}"] = _noisy_copy(rng, g[:4], jitter=1.5) + \
            _random_relations(rng, 6, 90, names, with_score=True)
    test_triplets = {tuple(r["triplet"]) for rels in gt.values()
                     for r in rels}
    train_triplets = set(sorted(test_triplets)[: len(test_triplets) // 2])

    for use_old in (False, True):
        # reference evaluate_relation's zero-shot body, replicated verbatim
        zeroshot_triplets = test_triplets.difference(train_triplets)
        ref_gt, zs_prediction = {}, {}
        for vid in gt:
            zs_gt_relations = [r for r in gt[vid]
                               if tuple(r["triplet"]) in zeroshot_triplets]
            if len(zs_gt_relations) > 0:
                ref_gt[vid] = zs_gt_relations
                if use_old:
                    zs_prediction[vid] = pred[vid]
                else:
                    zs_prediction[vid] = [
                        r for r in pred.get(vid, [])
                        if tuple(r["triplet"]) in zeroshot_triplets]
        ref_out = ref_vrd.evaluate(ref_gt, zs_prediction)
        ours = evaluate_zero_shot(gt, pred, train_triplets,
                                  use_old_zeroshot_eval=use_old)
        np.testing.assert_allclose(ours[0], ref_out[0], rtol=1e-9)
        for k in (50, 100):
            np.testing.assert_allclose(ours[1][k], ref_out[1][k], rtol=1e-9)
        for k in (1, 5, 10):
            np.testing.assert_allclose(ours[2][k], ref_out[2][k], rtol=1e-9)


def test_zero_shot_eval_cli(tmp_path):
    """tools/eval_vidvrd.py --zeroshot end-to-end on synthetic data: train
    triplets collected from annotation JSONs, zero-shot block in the metrics
    JSON."""
    import argparse
    import json as _json

    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    sys.path.insert(0, tools)
    try:
        import eval_vidvrd
    finally:
        sys.path.remove(tools)

    from vidsgg_big_tpu.data.synthetic_raw import write_synthetic_vidvrd
    root = str(tmp_path / "syn")
    os.makedirs(root, exist_ok=True)
    # train split written first; the CLI's --synthetic writes the test split
    # into the same root (shared ann_dir => default --train_anno_rpath works)
    write_synthetic_vidvrd(root, n_videos=3, split="train", seed=9)

    repo = os.path.dirname(tools)
    demo_cfg = os.path.join(repo, "experiments", "demo", "config_smoke_.py")
    mj = str(tmp_path / "metrics.json")
    res = eval_vidvrd.inference_then_eval(argparse.Namespace(
        cfg_path=demo_cfg, ckpt_path=None, tables_path=None,
        use_pku=True, fmt="pku_i3d", save_tag="zs",
        output_dir=str(tmp_path), topk=3, batch_size=2,
        gt_json=None, json_results_path=None, metrics_json=mj,
        save_infer_result=False, save_json_results=False,
        data_parallel=False, feat_dtype="float32",
        synthetic=3, synthetic_root=root, synthetic_model_dims=False,
        compute_dtype=None, zeroshot=True, old_zeroshot_eval=False,
        train_anno_rpath=None))
    assert np.isfinite(res[0])
    with open(mj) as f:
        m = _json.load(f)
    assert "zero_shot" in m
    assert 0.0 <= m["zero_shot"]["mAP"] <= 1.0
    assert set(m["zero_shot"]["recall"]) == {"50", "100"}


def test_visualize_cli(tmp_path):
    """tools/visualize.py renders GT annotations and prediction JSONs to
    video files (reference VidVRD-helper/visualize.py equivalent)."""
    import argparse

    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    sys.path.insert(0, tools)
    try:
        import visualize as viz
    finally:
        sys.path.remove(tools)

    base = dict(anno=None, prediction_json=None, video_dir=None,
                topk=5, max_videos=1, fps=25, canvas="320x240",
                synthetic=0, synthetic_root=None)
    # GT mode via --synthetic
    outs = viz.main(argparse.Namespace(
        **dict(base, out_dir=str(tmp_path / "gt"), synthetic=2,
               synthetic_root=str(tmp_path / "syn"))))
    assert len(outs) == 1 and os.path.getsize(outs[0]) > 0

    # prediction mode from a challenge-format JSON (blank canvas)
    import json as _json
    rel = {"triplet": ["dog", "chase", "person"], "score": 0.9,
           "duration": [2, 6],
           "sub_traj": [[10, 10, 50, 50]] * 4,
           "obj_traj": [[60, 60, 120, 120]] * 4}
    pj = tmp_path / "preds.json"
    with open(pj, "w") as f:
        _json.dump({"results": {"v0": [rel]}}, f)
    outs = viz.main(argparse.Namespace(
        **dict(base, out_dir=str(tmp_path / "pr"),
               prediction_json=str(pj))))
    assert len(outs) == 1 and os.path.getsize(outs[0]) > 0


def test_action_detection_eval():
    from vidsgg_big_tpu.evaluation.action_detection import eval_action
    rng = np.random.default_rng(12)
    def traj(L):
        xy = rng.uniform(0, 100, size=(L, 2))
        return np.concatenate([xy, xy + 50], -1).tolist()
    gt = {"v0": [{"category": "run", "duration": (0, 10),
                  "trajectory": traj(10)}]}
    pred = {"v0": [{"category": "run", "duration": (0, 10),
                    "trajectory": gt["v0"][0]["trajectory"], "score": 0.9}]}
    mAP, ap = eval_action(gt, pred)
    assert mAP == pytest.approx(1.0)
    mAP2, _ = eval_action(gt, {"v0": []})
    assert mAP2 == 0.0
