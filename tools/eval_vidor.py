"""Evaluate on VidOR: classification stage alone, or the full two-stage
classification-then-grounding pipeline (capability-parity with reference
tools/eval_vidor.py:19-332)."""
import argparse
import os
import pickle

import numpy as np
import jax

from common import make_dataset, load_tables
from vidsgg_big_tpu.utils.config import parse_config_py
from vidsgg_big_tpu.utils.logger import create_logger
from vidsgg_big_tpu.data.bucketing import BucketSpec, bucketed_batches
from vidsgg_big_tpu.models import BigC, BigCConfig
from vidsgg_big_tpu.models.base_c import BaseC, BaseCConfig
from vidsgg_big_tpu.models.grounding import GroundingConfig, GroundingModel
from vidsgg_big_tpu.models.triplets import pairwise_construct_triplets
from vidsgg_big_tpu.train.train_state import (
    make_optimizer, create_train_state, load_checkpoint)
from vidsgg_big_tpu.train.steps import build_infer_step
from vidsgg_big_tpu.train.grounding_steps import build_grounding_infer_step
from vidsgg_big_tpu.train.grounding_data import prepare_grounding_queries
from vidsgg_big_tpu.evaluation.convert import EvalFmtCvtor
from vidsgg_big_tpu.evaluation.metrics import eval_relation_with_gt


def _load_params(model, example, ckpt_path, bias=None, seed=0):
    params = model.init(jax.random.PRNGKey(seed), *example) \
        if isinstance(example, tuple) else \
        model.init(jax.random.PRNGKey(seed), example)
    if bias is not None and hasattr(model, "load_tables"):
        params = model.load_tables(params, bias)
    if ckpt_path:
        tx, _ = make_optimizer(1e-4, 0.2, [1])
        state = create_train_state(params, tx)
        state, step = load_checkpoint(ckpt_path, state)
        params = state.params
    return params


def evaluate_cls_stage(args, logger, all_cfgs):
    """Stage A: BIG-C (or Base-C) inference -> per-video triplet tuples."""
    model_config = all_cfgs["model_config"]
    infer_config = all_cfgs.get("inference_config", {})
    topk = args.topk or infer_config.get("topk", 10)
    dataset, _ = make_dataset(all_cfgs["test_dataset_config"], "vidor",
                              synthetic=args.synthetic,
                              synthetic_root=args.synthetic_root)
    items = list(dataset)
    rows = [(it[-2], it[-1]) for it in items]
    video_feats = {it[-2].video_name: it[0] for it in items} \
        if dataset.use_video_features else {}
    feat_dim = rows[0][0].features[0].shape[1]
    spec = BucketSpec(feat_dim=feat_dim, n_ladder=(8, 16, 32, 64, 128, 192))

    if args.use_baseline:
        cfg = BaseCConfig.from_dict(model_config)
        enti_emb, bias, _ = load_tables(model_config, cfg.num_enti_cats,
                                        cfg.num_pred_cats, cfg.dim_clsme)
        model = BaseC(cfg, enti_name_emb=enti_emb)
        first = next(iter(bucketed_batches(rows, spec, 1, with_gt=False)))
        params = _load_params(model, first[2], args.ckpt_path, bias)

        def infer(params, props):
            out = model.apply(params, props)
            import functools
            trip = jax.vmap(functools.partial(
                pairwise_construct_triplets, topk=topk,
                num_enti_cats=cfg.num_enti_cats,
                num_pred_cats=cfg.num_pred_cats,
                rt_topk=cfg.rt_triplets_topk))(
                out["pred_logits"], jax.numpy.broadcast_to(
                    out["pair_ids"][None],
                    (props.traj_mask.shape[0],) + out["pair_ids"].shape),
                props.durations, props.scores, props.cat_ids,
                props.traj_mask)
            return trip
        infer = jax.jit(infer)
    else:
        cfg = BigCConfig.from_dict(model_config, variant="v7")
        enti_emb, bias, _ = load_tables(model_config, cfg.num_enti_cats,
                                        cfg.num_pred_cats, cfg.dim_clsme)
        model = BigC(cfg, enti_name_emb=enti_emb
                     if cfg.use_name_emb else None)
        first = next(iter(bucketed_batches(rows, spec, 1, with_gt=False)))
        params = _load_params(model, first[2], args.ckpt_path, bias)
        infer = build_infer_step(model, topk=topk)

    infer_results = {}
    for key, brows, props, _ in bucketed_batches(rows, spec, args.batch_size,
                                                 with_gt=False):
        trip = jax.device_get(infer(params, props))
        for i, (prop, _gt) in enumerate(brows):
            one = jax.tree_util.tree_map(lambda x: x[i], trip)
            infer_results[prop.video_name] = one
    logger.info(f"stage-A inference done on {len(infer_results)} videos")
    return infer_results, rows, video_feats


def evaluate_combined(args, logger, all_cfgs, infer_results, rows,
                      video_feats):
    """Stage B: grounding model expands each triplet into K+1 temporal bins
    (reference tools/eval_vidor.py:141-280)."""
    grd_cfgs = parse_config_py(args.grounding_cfg_path)
    gcfg = GroundingConfig.from_dict(grd_cfgs["model_config"])
    ginfer_cfg = grd_cfgs.get("inference_config", {})
    model = GroundingModel(gcfg)

    # shape buckets
    max_clips = max(v.shape[0] for v in video_feats.values())
    t_bucket = 1 << (max_clips - 1).bit_length()
    q_bucket = 256

    infer = build_grounding_infer_step(
        model, score_th=ginfer_cfg.get("score_th", 0.9),
        tiou_th=ginfer_cfg.get("tiou_th", 0.5),
        bins_th=args.bins_th or ginfer_cfg.get("bins_th", 0.2),
        nms_th=ginfer_cfg.get("nms_th", 0.8))

    params = None
    cvt = EvalFmtCvtor("vidor")
    predict_relations = {}
    for prop, gt in rows:
        name = prop.video_name
        trip = infer_results.get(name)
        if trip is None:
            predict_relations.update({cvt._reset_video_name(name): []})
            continue
        valid = np.asarray(trip.valid)
        m = int(valid.sum())
        if m == 0:
            predict_relations.update({cvt._reset_video_name(name): []})
            continue
        quint = np.asarray(trip.quintuples)[valid][:q_bucket]
        scores3 = np.asarray(trip.scores)[valid][:q_bucket]
        duras = np.asarray(trip.dura_inters)[valid][:q_bucket]
        m = quint.shape[0]

        vf = video_feats[name]
        n_clips = min(vf.shape[0], t_bucket)
        feats = np.zeros((1, t_bucket, gcfg.dim_feat), np.float32)
        feats[0, :n_clips] = vf[:n_clips]
        clip_mask = (np.arange(t_bucket) < n_clips)[None]

        qc = np.zeros((1, q_bucket, 3), np.int32)
        temp = np.zeros((1, q_bucket, 2), np.float32)
        qm = np.zeros((1, q_bucket), bool)
        qcats, qtemp, _ = prepare_grounding_queries(
            jax.numpy.asarray(quint), jax.numpy.asarray(duras),
            jax.numpy.asarray(np.ones(m, bool)), prop.video_len)
        qc[0, :m] = np.asarray(qcats)
        temp[0, :m] = np.asarray(qtemp)
        qm[0, :m] = True

        if params is None:
            params = _load_params(
                model, (jax.numpy.asarray(feats), jax.numpy.asarray(clip_mask),
                        jax.numpy.asarray(qc), jax.numpy.asarray(temp),
                        jax.numpy.asarray(qm)), args.grounding_ckpt_path)
        pooled, bins_probs, bins_mask = jax.device_get(infer(
            params, jax.numpy.asarray(feats), jax.numpy.asarray(clip_mask),
            jax.numpy.asarray([n_clips]), jax.numpy.asarray(qc),
            jax.numpy.asarray(temp), jax.numpy.asarray(qm)))

        # expand: score = cls_score x bin_prob; frames = round(span x len)
        k1 = bins_probs.shape[-1]
        cls_score = scores3.mean(-1)                       # (m,)
        out_q, out_s, out_d = [], [], []
        video_len = prop.video_len
        for i in range(m):
            for k in range(k1):
                if not bins_mask[0, i, k]:
                    continue
                s, e = pooled[0, i, k]
                fs = int(round(float(s) * video_len))
                fe = int(round(float(e) * video_len))
                fs = max(0, min(fs, video_len - 2))
                fe = max(fs + 1, min(fe, video_len - 1))
                # clamp into the subject∩object overlap (tracklet extent)
                ds, de = int(duras[i][0]), int(duras[i][1])
                fs, fe = max(fs, ds), min(fe, de)
                if fe <= fs:
                    fs, fe = ds, de
                out_q.append(quint[i])
                out_s.append(cls_score[i] * float(bins_probs[0, i, k]))
                out_d.append((fs, fe))
        if not out_q:
            predict_relations.update({cvt._reset_video_name(name): []})
            continue
        pr = cvt.to_eval_format_pr(
            prop, (np.stack(out_q), np.asarray(out_s),
                   np.asarray(out_d, np.int64)))
        predict_relations.update(pr)
    return predict_relations


def main(args):
    experiment_dir = args.output_dir or os.path.dirname(args.cfg_path)
    log_dir = os.path.join(experiment_dir, "logfile")
    os.makedirs(log_dir, exist_ok=True)
    logger = create_logger(os.path.join(log_dir, f"eval_{args.save_tag}.log"))
    all_cfgs = parse_config_py(args.cfg_path)

    infer_results, rows, video_feats = evaluate_cls_stage(args, logger,
                                                          all_cfgs)
    cvt = EvalFmtCvtor("vidor")
    if args.grounding_cfg_path and video_feats:
        predict_relations = evaluate_combined(
            args, logger, all_cfgs, infer_results, rows, video_feats)
    else:
        predict_relations = {}
        for prop, gt in rows:
            one = infer_results.get(prop.video_name)
            predict_relations.update(
                cvt.to_eval_format_pr(prop, one))
    if args.save_infer_result:
        p = os.path.join(experiment_dir,
                         f"VidORval_infer_results_{args.save_tag}.pkl")
        with open(p, "wb") as f:
            pickle.dump({k: jax.tree_util.tree_map(np.asarray, v)
                         for k, v in infer_results.items()}, f)
        logger.info(f"infer results saved at {p}")

    gt_relations = None
    if not args.gt_json:
        logger.info("building GT from dataset annotations (our-gt path)")
        gt_relations = {}
        for prop, gt in rows:
            gt_relations.update(cvt.to_eval_format_gt(gt))
    hit_infos = eval_relation_with_gt(
        dataset_type="vidor", logger=logger,
        prediction_results=predict_relations,
        gt_relations_path=args.gt_json, gt_relations=gt_relations,
        return_hit_infos=True)
    if args.save_hit_infos:
        p = os.path.join(experiment_dir, f"hit_infos_{args.save_tag}.pkl")
        with open(p, "wb") as f:
            pickle.dump(hit_infos, f)
        logger.info(f"hit infos saved at {p}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, required=True)
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--grounding_cfg_path", type=str, default=None)
    parser.add_argument("--grounding_ckpt_path", type=str, default=None)
    parser.add_argument("--use_baseline", action="store_true")
    parser.add_argument("--save_tag", type=str, default="")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--topk", type=int, default=None)
    parser.add_argument("--bins_th", type=float, default=None)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--gt_json", type=str, default=None)
    parser.add_argument("--save_infer_result", action="store_true")
    parser.add_argument("--save_hit_infos", action="store_true")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--synthetic_root", type=str, default=None)
    main(parser.parse_args())
