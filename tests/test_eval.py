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
