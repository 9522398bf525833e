"""Evaluate on VidOR: classification stage alone, or the full two-stage
classification-then-grounding pipeline (capability-parity with reference
tools/eval_vidor.py:19-332)."""
import argparse
import os
import pickle

import numpy as np
import jax

from common import (make_dataset, load_tables, load_side_tables,
                    write_metrics_json, first_feat_dim)
from eval_vidvrd import _maybe_zero_shot
from vidsgg_big_tpu.utils.config import parse_config_py
from vidsgg_big_tpu.utils.logger import create_logger
from vidsgg_big_tpu.data.bucketing import (BucketSpec, bucketed_batches,
                                           pick_unbounded)
from vidsgg_big_tpu.models import BigC, BigCConfig
from vidsgg_big_tpu.models.base_c import BaseC, BaseCConfig
from vidsgg_big_tpu.models.grounding import GroundingConfig, GroundingModel
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
    if args.compute_dtype:
        model_config = dict(model_config, compute_dtype=args.compute_dtype)
    infer_config = all_cfgs.get("inference_config", {})
    topk = args.topk or infer_config.get("topk", 10)
    # `use_post`/`use_regr` are part of the reference's public config
    # surface (reference experiments/exp4/config_.py:87-89) but vestigial:
    # the 0v7 forward never branches on them (reference
    # tools/eval_vidor_our_gt.py:47-56 reads them, then discards).  We
    # accept and record them identically; warn on non-default values so a
    # real-data rehearsal can't silently assume a behavior we don't have.
    for k in ("use_post", "use_regr"):
        if not infer_config.get(k, True):
            logger.info(f"note: inference_config[{k!r}]={infer_config[k]} is "
                        "accepted but has no effect (matches the reference, "
                        "whose forward does not branch on it)")
    dataset, _ = make_dataset(all_cfgs["test_dataset_config"], "vidor",
                              synthetic=args.synthetic,
                              synthetic_root=args.synthetic_root)
    # bounded memory: stream (prop, gt) records straight from the per-video
    # cache — never list(dataset), and never load I3D clip features here
    # (stage B reads them lazily per batch via dataset.load_video_feature)
    rows_iter = (dataset.get_data(name) for name in dataset.video_name_list)
    peek = dataset.get_data(dataset.video_name_list[0])
    feat_dim = first_feat_dim(
        dataset.get_data(n)[0] for n in dataset.video_name_list)
    spec = BucketSpec(feat_dim=feat_dim, n_ladder=(8, 16, 32, 64, 128, 192),
                      feat_dtype=args.feat_dtype)

    enti_override, pos_tab = load_side_tables(args.tables_path)

    if args.use_baseline:
        cfg = BaseCConfig.from_dict(model_config)
        enti_emb, bias, _ = load_tables(model_config, cfg.num_enti_cats,
                                        cfg.num_pred_cats, cfg.dim_clsme)
        if enti_override is not None:
            enti_emb = enti_override
        model = BaseC(cfg, enti_name_emb=enti_emb)
        first = next(iter(bucketed_batches([peek], spec, 1, with_gt=False)))
        params = _load_params(model, first[2], args.ckpt_path, bias)
        from vidsgg_big_tpu.train.steps import build_basec_infer_step
        infer = build_basec_infer_step(model, topk=topk)
    else:
        cfg = BigCConfig.from_dict(model_config, variant="v7")
        enti_emb, bias, _ = load_tables(model_config, cfg.num_enti_cats,
                                        cfg.num_pred_cats, cfg.dim_clsme)
        if enti_override is not None:
            enti_emb = enti_override
        model = BigC(cfg, enti_name_emb=enti_emb
                     if cfg.use_name_emb else None,
                     pos_emb_table=pos_tab)
        first = next(iter(bucketed_batches([peek], spec, 1, with_gt=False)))
        params = _load_params(model, first[2], args.ckpt_path, bias)
        infer = build_infer_step(model, topk=topk)

    mesh, tp, p_sh = None, 1, None
    if getattr(args, "mesh", None) and not args.use_baseline:
        from vidsgg_big_tpu.parallel.sharding import mesh_from_spec
        mesh, tp = mesh_from_spec(args.mesh)
    elif args.data_parallel or getattr(args, "mesh", None):
        from vidsgg_big_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    if mesh is not None:
        from vidsgg_big_tpu.parallel.mesh import replicated, shard_batch
        assert args.batch_size % mesh.shape["data"] == 0, \
            "batch_size must be divisible by the mesh's data axis"
        if tp > 1:
            from vidsgg_big_tpu.parallel.sharding import (shard_params,
                                                          state_shardings)
            params = shard_params(params, mesh)
            p_sh = state_shardings(params)
            infer = build_infer_step(model, topk=topk, mesh=mesh,
                                     param_shardings=p_sh)
        else:
            params = jax.device_put(params, replicated(mesh))
        logger.info(f"sharded stage-A inference over {mesh} (tp={tp})")
    infer_results = {}
    # light rows kept for stage B / GT eval: features dropped (they dominate
    # a record's footprint ~300:1; boxes/durations/GT graphs are small)
    rows_light = []
    from vidsgg_big_tpu.data.prefetch import prefetch
    batches = prefetch(
        bucketed_batches(rows_iter, spec, args.batch_size, with_gt=False),
        size=2, device_put=mesh is None)  # overlap pack (+H2D off-axon)
    for key, brows, props, _ in batches:
        if mesh is not None:
            props = shard_batch(props, mesh)
        trip = jax.device_get(infer(params, props))
        for i, (prop, gt) in enumerate(brows):
            one = jax.tree_util.tree_map(lambda x: x[i], trip)
            infer_results[prop.video_name] = one
            rows_light.append((prop.without_features(), gt))
    logger.info(f"stage-A inference done on {len(infer_results)} videos")
    return infer_results, rows_light, dataset


# Q (unique triplets) and T (clips) buckets share the grounding ladder —
# one definition in data/bucketing.py so train and eval can never diverge
_q_bucket_of = _t_bucket_of = pick_unbounded


def _expand_bins(prop, quint, scores3, duras, pooled, bins_probs, bins_mask):
    """Vectorized (K+1)-bin expansion of one video's triplets: score =
    cls_score x bin_prob, frames = round(norm_span x video_len) — exactly
    the reference's torch.round, no extra clamping (reference
    tools/eval_vidor.py:246-254; the decode already clamped every span
    into the subject∩object window, grounding_decode).  A single-frame
    span (fs == fe, closed) is a legal output.  The clip below only guards
    against float-rounding noise at the window edges."""
    video_len = prop.video_len
    m, k1 = bins_mask.shape
    ds = duras[:, 0:1].astype(np.int64)
    de = duras[:, 1:2].astype(np.int64)
    fs = np.rint(pooled[..., 0] * video_len).astype(np.int64)   # (m, K1)
    fe = np.rint(pooled[..., 1] * video_len).astype(np.int64)
    fs = np.clip(fs, ds, de)
    fe = np.clip(fe, fs, de)
    scores = scores3.mean(-1)[:, None] * bins_probs             # (m, K1)
    sel = bins_mask
    if not sel.any():
        return None
    qq = np.broadcast_to(quint[:, None, :], (m, k1, 5))[sel]
    return qq, scores[sel], np.stack([fs, fe], axis=-1)[sel]




def evaluate_combined(args, logger, all_cfgs, infer_results, rows, dataset):
    """Stage B: grounding model expands each unique triplet into K+1 temporal
    bins (reference tools/eval_vidor.py:141-280) — batched per (Q, T) shape
    bucket instead of the reference's per-video loop.  I3D clip features are
    loaded lazily per batch (header-only reads plan the T buckets), so peak
    memory is O(batch), not O(split)."""
    grd_cfgs = parse_config_py(args.grounding_cfg_path)
    gmc = grd_cfgs["model_config"]
    if args.compute_dtype:
        gmc = dict(gmc, compute_dtype=args.compute_dtype)
    gcfg = GroundingConfig.from_dict(gmc)
    ginfer_cfg = grd_cfgs.get("inference_config", {})
    model = GroundingModel(gcfg)

    # --mesh: data-parallel stage B (grounding params are replicated — the
    # model has no TP layout; queries/videos are row-independent)
    mesh = None
    if getattr(args, "mesh", None) or args.data_parallel:
        from vidsgg_big_tpu.parallel.mesh import make_mesh
        n_data = (int(args.mesh.split(",")[0]) if getattr(args, "mesh", None)
                  else None)
        mesh = make_mesh(n_data)
        logger.info(f"sharded stage-B grounding inference over {mesh}")

    infer = build_grounding_infer_step(
        model, score_th=ginfer_cfg.get("score_th", 0.9),
        tiou_th=ginfer_cfg.get("tiou_th", 0.5),
        bins_th=args.bins_th or ginfer_cfg.get("bins_th", 0.2),
        nms_th=ginfer_cfg.get("nms_th", 0.8), mesh=mesh)

    cvt = EvalFmtCvtor("vidor")
    predict_relations = {}

    # collect per-video work, grouped on the (Q, T) ladder; the T bucket
    # comes from the .npy header (no feature data read here)
    groups = {}
    for prop, gt in rows:
        trip = infer_results.get(prop.video_name)
        valid = np.asarray(trip.valid) if trip is not None else None
        if valid is None or not valid.any():
            predict_relations[cvt._reset_video_name(prop.video_name)] = []
            continue
        work = (prop, np.asarray(trip.quintuples)[valid],
                np.asarray(trip.scores)[valid],
                np.asarray(trip.dura_inters)[valid])
        key = (_q_bucket_of(int(valid.sum())),
               _t_bucket_of(dataset.video_feature_len(prop.video_name)))
        groups.setdefault(key, []).append(work)

    params = None
    batch_size = max(args.batch_size, 4)
    if mesh is not None:
        d = mesh.shape["data"]
        batch_size = -(-batch_size // d) * d   # pad rows are masked anyway
    for q_bucket, t_bucket in sorted(groups):
        group = groups[(q_bucket, t_bucket)]
        logger.info(f"grounding stage B: {len(group)} videos in "
                    f"(Q={q_bucket}, T={t_bucket}) bucket "
                    f"(batch {batch_size})")
        for s in range(0, len(group), batch_size):
            chunk = group[s:s + batch_size]
            b = batch_size                       # pad to a fixed batch shape
            feats = np.zeros((b, t_bucket, gcfg.dim_feat), np.float32)
            clips = np.zeros((b,), np.int32)
            qc = np.zeros((b, q_bucket, 3), np.int32)
            temp = np.zeros((b, q_bucket, 2), np.float32)
            qm = np.zeros((b, q_bucket), bool)
            for i, (prop, quint, scores3, duras) in enumerate(chunk):
                vf = dataset.load_video_feature(prop.video_name)
                nc = min(vf.shape[0], t_bucket)
                feats[i, :nc] = vf[:nc]
                clips[i] = nc
                m = quint.shape[0]
                # shared with training-side query conventions
                # (train/grounding_data.py) so they can never diverge
                q_cats, q_temp, _ = prepare_grounding_queries(
                    quint, duras, None, prop.video_len)
                qc[i, :m] = np.asarray(q_cats)
                temp[i, :m] = np.asarray(q_temp)
                qm[i, :m] = True
            clip_mask = np.arange(t_bucket)[None] < clips[:, None]
            if params is None:
                params = _load_params(
                    model, (jax.numpy.asarray(feats),
                            jax.numpy.asarray(clip_mask),
                            jax.numpy.asarray(qc), jax.numpy.asarray(temp),
                            jax.numpy.asarray(qm)),
                    args.grounding_ckpt_path)
                if mesh is not None:
                    from vidsgg_big_tpu.parallel.mesh import replicated
                    params = jax.device_put(params, replicated(mesh))
            operands = (feats, clip_mask, clips, qc, temp, qm)
            if mesh is not None:
                from vidsgg_big_tpu.parallel.mesh import shard_batch
                operands = shard_batch(operands, mesh)
            else:
                operands = jax.tree_util.tree_map(jax.numpy.asarray,
                                                  operands)
            pooled, bins_probs, bins_mask = jax.device_get(
                infer(params, *operands))
            for i, (prop, quint, scores3, duras) in enumerate(chunk):
                m = quint.shape[0]
                out = _expand_bins(prop, quint, scores3, duras,
                                   pooled[i, :m], bins_probs[i, :m],
                                   bins_mask[i, :m])
                if out is None:
                    predict_relations[
                        cvt._reset_video_name(prop.video_name)] = []
                    continue
                qq, out_s, out_d = out
                predict_relations.update(
                    cvt.to_eval_format_pr(prop, (qq, out_s, out_d)))
    return predict_relations


def main(args):
    experiment_dir = args.output_dir or os.path.dirname(args.cfg_path)
    log_dir = os.path.join(experiment_dir, "logfile")
    os.makedirs(log_dir, exist_ok=True)
    logger = create_logger(os.path.join(log_dir, f"eval_{args.save_tag}.log"))
    all_cfgs = parse_config_py(args.cfg_path)

    infer_results, rows, dataset = evaluate_cls_stage(args, logger,
                                                      all_cfgs)
    cvt = EvalFmtCvtor("vidor")
    if args.grounding_cfg_path:
        # loud, not silent: reporting stage-A numbers under a grounded
        # save_tag would corrupt a parity rehearsal
        assert dataset.use_video_features, (
            "--grounding_cfg_path passed but the dataset config has no "
            "video_feature_dir (stage B needs I3D clip features)")
    if args.grounding_cfg_path and dataset.use_video_features:
        predict_relations = evaluate_combined(
            args, logger, all_cfgs, infer_results, rows, dataset)
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
    if args.save_json_results:
        split = all_cfgs["test_dataset_config"].get("split", "val")
        p = os.path.join(experiment_dir,
                         f"VidOR{split}_predict_relations_"
                         f"{args.save_tag}.json")
        import json
        with open(p, "w") as f:
            json.dump({k: v for k, v in predict_relations.items()}, f)
        logger.info(f"prediction json saved at {p} "
                    f"(package with tools/cvt_results.py)")

    if all(gt is None for _, gt in rows) and not args.gt_json:
        logger.info("test split has no ground truth; skipping metric eval")
        return

    gt_relations = None
    if not args.gt_json:
        logger.info("building GT from dataset annotations (our-gt path)")
        gt_relations = {}
        for prop, gt in rows:
            gt_relations.update(cvt.to_eval_format_gt(gt))
    if args.save_hit_infos:
        *out, hit_infos = eval_relation_with_gt(
            dataset_type="vidor", logger=logger,
            prediction_results=predict_relations,
            gt_relations_path=args.gt_json, gt_relations=gt_relations,
            return_hit_infos=True)
        p = os.path.join(experiment_dir, f"hit_infos_{args.save_tag}.pkl")
        with open(p, "wb") as f:
            pickle.dump(hit_infos, f)
        logger.info(f"hit infos saved at {p}")
    else:
        out = eval_relation_with_gt(
            dataset_type="vidor", logger=logger,
            prediction_results=predict_relations,
            gt_relations_path=args.gt_json, gt_relations=gt_relations)
    zs_cfg = ({"ann_dir": os.path.dirname(dataset.video_ann_dir)}
              if getattr(dataset, "video_ann_dir", None) else None)
    zs = _maybe_zero_shot(args, logger, "vidor", predict_relations,
                          gt_relations, zs_cfg)
    if getattr(args, 'metrics_json', None):
        write_metrics_json(args.metrics_json, tuple(out), zero_shot=zs)
        logger.info(f"metrics json saved at {args.metrics_json}")


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
    parser.add_argument("--data_parallel", action="store_true")
    parser.add_argument("--mesh", type=str, default=None,
                        help="explicit device mesh 'D' (data parallel) or "
                             "'D,M' (2-D data x model; TP params over the "
                             "model axis — BIG-C stage A only)")
    parser.add_argument("--save_infer_result", action="store_true")
    parser.add_argument("--save_json_results", action="store_true")
    parser.add_argument("--save_hit_infos", action="store_true")
    parser.add_argument("--metrics_json", type=str, default=None,
                        help="write {mAP, recall@K, tagging P@K} as JSON "
                             "(machine-readable, for scripts/diff_baseline.py)")
    parser.add_argument("--feat_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16", "int8"],
                        help="feature storage dtype (int8: quantized serving path)")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--synthetic_root", type=str, default=None)
    parser.add_argument("--compute_dtype", type=str, default=None,
                        choices=("float32", "bfloat16"),
                        help="override the model compute dtype for both "
                             "stages (config key compute_dtype)")
    parser.add_argument("--tables_path", type=str, default=None,
                        help="tables.npz from tools/convert_checkpoint.py "
                             "(frozen EntiNameEmb / pos-emb table)")
    parser.add_argument("--zeroshot", action="store_true",
                        help="additionally evaluate in the zero-shot setting "
                             "(triplets unseen in the training split; "
                             "reference VidVRD-helper/evaluate.py:22-53)")
    parser.add_argument("--old_zeroshot_eval", action="store_true",
                        help="keep non-zero-shot predictions in zero-shot "
                             "videos (the reference's 'old' protocol)")
    parser.add_argument("--train_anno_rpath", type=str, default=None,
                        help="annotation root containing the training split "
                             "(default: derived from the dataset config)")
    main(parser.parse_args())
