"""Train/detect driver for the MM'17 segment-proposal baseline.

Mirrors the vendored reference driver (reference VidVRD-helper/baseline.py:
61-123): ``--train`` fits the linear predicate model over observed training
triplets; ``--detect`` predicts short-term relations per 30-frame segment,
links them with greedy relational association, evaluates against the GT, and
writes ``baseline_relation_prediction.json``.

With ``--synthetic N`` a learnable synthetic dataset is fabricated on disk in
the segment-store layout first (the reference's offline dlib/iDT feature
extraction is out-of-repo, like the MEGA tracklets of the main models).

Example:
  python tools/segment_baseline.py --train --detect --synthetic 6 \
      --synthetic_root datasets/synthetic_segments --output_dir out_segbase
"""
import argparse
import json
import os
import time
from collections import defaultdict

import common  # noqa: F401  (sys.path bootstrap)
import numpy as np
import jax
import jax.numpy as jnp
import optax

from vidsgg_big_tpu.data.segment_store import (SegmentStore,
                                               write_synthetic_segments)
from vidsgg_big_tpu.models.segment_baseline import (
    SegmentBaseline, SegmentBaselineConfig, feature_preprocess,
    build_baseline_train_step, predict_segment_pairs, predictions_to_host,
    sample_positive_pairs)
from vidsgg_big_tpu.evaluation.association import (
    Trajectory, greedy_relational_association)
from vidsgg_big_tpu.evaluation.metrics import evaluate
from vidsgg_big_tpu.utils.categories import (VIDVRD_ENTITIES,
                                             VIDVRD_PREDICATES)
from vidsgg_big_tpu.utils.logger import create_logger


def _names(cfg: SegmentBaselineConfig):
    """Category-id -> name tables for the no-background baseline id space."""
    objs = (VIDVRD_ENTITIES[1:] * 3)[:cfg.num_obj_cats]
    preds = (VIDVRD_PREDICATES[1:] * 3)[:cfg.num_pred_cats]
    return objs, preds


def train(store: SegmentStore, args, logger):
    cfg = store.cfg
    model = SegmentBaseline(cfg)
    triplet_ids = store.observed_train_triplets()
    triplet_index = {tuple(t): i for i, t in enumerate(triplet_ids)}
    logger.info(f"{len(triplet_ids)} observed training triplets")

    params = model.init(jax.random.PRNGKey(args.rng_seed),
                        jnp.zeros((1, cfg.feature_dim)))
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)
    step = build_baseline_train_step(model, tx)
    tids = jnp.asarray(triplet_ids)

    rng = np.random.default_rng(args.rng_seed)
    segs = store.segments("train")
    bs = args.batch_size
    feats_buf = np.zeros((bs, cfg.feature_dim), np.float32)
    labels_buf = np.zeros((bs,), np.int64)
    fill = 0
    it = 0
    t0 = time.time()
    while it < args.max_iter:
        vid, fs, fe = segs[int(rng.integers(len(segs)))]
        seg = store.load(vid, fs, fe)
        rows, labels = sample_positive_pairs(
            seg["pairs"], seg["iou"], seg["trackid"],
            [tuple(int(x) for x in r) for r in seg["gt_insts"]],
            rng, min(args.max_sampling_in_batch, bs - fill), triplet_index)
        if len(rows) == 0:
            continue
        f = feature_preprocess(seg["feats"][rows], cfg)
        feats_buf[fill:fill + len(rows)] = f
        labels_buf[fill:fill + len(rows)] = labels
        fill += len(rows)
        if fill < bs:
            continue
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(feats_buf),
            jnp.asarray(labels_buf), jnp.ones((bs,), bool), tids)
        fill = 0
        it += 1
        if it % args.display_freq == 0 or it == args.max_iter:
            logger.info(f"iter {it}/{args.max_iter} loss {float(loss):.4f} "
                        f"({(time.time() - t0):.1f}s)")

    os.makedirs(args.output_dir, exist_ok=True)
    kernel = np.asarray(params["params"]["pred_fc"]["kernel"])
    bias = np.asarray(params["params"]["pred_fc"]["bias"])
    np.savez(os.path.join(args.output_dir, "segment_baseline_weights.npz"),
             kernel=kernel, bias=bias, triplet_ids=triplet_ids)
    logger.info(f"saved weights to {args.output_dir}")
    return params


def detect(store: SegmentStore, args, logger):
    cfg = store.cfg
    model = SegmentBaseline(cfg)
    w = np.load(os.path.join(args.output_dir,
                             "segment_baseline_weights.npz"))
    params = {"params": {"pred_fc": {"kernel": jnp.asarray(w["kernel"]),
                                     "bias": jnp.asarray(w["bias"])}}}

    # one jitted predictor per padded pair-count bucket (powers of two)
    jitted = {}

    def predict(feats, valid):
        p = len(feats)
        bucket = 1 << max(p - 1, 1).bit_length()
        if bucket not in jitted:
            jitted[bucket] = jax.jit(
                lambda pa, f, v: predict_segment_pairs(pa, model, f, v))
        fpad = np.zeros((bucket, cfg.feature_dim), np.float32)
        fpad[:p] = feats
        vpad = np.zeros((bucket,), bool)
        vpad[:p] = valid
        return jitted[bucket](params, jnp.asarray(fpad), jnp.asarray(vpad))

    video_st, trajs_lookup = defaultdict(list), {}
    for vid, fs, fe in store.segments("test"):
        seg = store.load(vid, fs, fe)
        trackid, pairs = seg["trackid"], seg["pairs"]
        # test pairs: both members must be proposals (reference model.py:135)
        test = (trackid[pairs[:, 0]] < 0) & (trackid[pairs[:, 1]] < 0)
        pairs = pairs[test]
        if len(pairs) == 0:
            continue
        feats = feature_preprocess(seg["feats"][test], cfg)
        scores, sto = predict(feats, np.ones((len(pairs),), bool))
        preds = predictions_to_host(scores, sto, pairs)
        key = (vid, int(fs), int(fe))
        video_st[vid].append((key, preds))
        trajs_lookup[key] = [
            Trajectory(int(fs), int(fe), rois) for rois in seg["traj_rois"]]

    obj_names, pred_names = _names(cfg)
    results = {}
    for vid, st_rels in video_st.items():
        results[vid] = greedy_relational_association(
            st_rels, trajs_lookup, obj_names, pred_names,
            max_traj_num_in_clip=args.max_traj_num_in_clip)
    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir,
                            "baseline_relation_prediction.json")
    with open(out_path, "w") as f:
        json.dump({"version": "VERSION 1.0", "results": results}, f)
    logger.info(f"saved {sum(map(len, results.values()))} relations "
                f"to {out_path}")

    # every test-split GT video participates: videos with no predictions
    # contribute AP 0 (evaluate() treats missing prediction keys as empty),
    # matching the challenge protocol's average over all GT videos
    test_vids = set(store.index["test"])
    gt = {}
    for vid, rels in store.groundtruth().items():
        if vid not in test_vids:
            continue
        gt[vid] = [dict(r, triplet=[obj_names[r["triplet"][0]],
                                    pred_names[r["triplet"][1]],
                                    obj_names[r["triplet"][2]]])
                   for r in rels]
    mean_ap, rec_at_n, prec_at_n = evaluate(gt, results)
    logger.info(json.dumps({"detection_mAP": round(mean_ap, 4),
                            "recall@50": round(rec_at_n[50], 4),
                            "recall@100": round(rec_at_n[100], 4),
                            "tagging_P@1": round(prec_at_n[1], 4)}))
    return mean_ap


def main():
    ap = argparse.ArgumentParser(description="VidVRD segment baseline")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--detect", action="store_true")
    ap.add_argument("--data_root", type=str, default=None)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--synthetic_root", type=str,
                    default="datasets/synthetic_segments")
    ap.add_argument("--output_dir", type=str, default="output_segbase")
    # reference training params (reference baseline.py:64-77)
    ap.add_argument("--rng_seed", type=int, default=1701)
    ap.add_argument("--max_sampling_in_batch", type=int, default=32)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--max_iter", type=int, default=200)
    ap.add_argument("--display_freq", type=int, default=20)
    ap.add_argument("--max_traj_num_in_clip", type=int, default=100)
    args = ap.parse_args()

    logger = create_logger("segment_baseline")
    root = args.data_root
    if args.synthetic:
        root = write_synthetic_segments(args.synthetic_root,
                                        n_videos=args.synthetic)
        logger.info(f"synthetic segment data at {root}")
    assert root, "--data_root or --synthetic required"
    store = SegmentStore(root)

    if args.train:
        train(store, args, logger)
    if args.detect:
        detect(store, args, logger)
    if not (args.train or args.detect):
        print("nothing to do: pass --train and/or --detect")


if __name__ == "__main__":
    main()
