"""Evaluate BIG-C on VidVRD (capability-parity with reference
tools/eval_vidvrd.py:42-198 + the our-gt variant): bucketed jitted inference,
challenge-format conversion, relation-detection metrics.

GT source: --gt_json (challenge GT file) or, by default, the dataset's own
interpolated GT graphs (the reference's *_our_gt.py path).
"""
import argparse
import json
import os
import pickle

import jax

from common import (make_dataset, load_tables, load_side_tables,
                    write_metrics_json, first_feat_dim)
from vidsgg_big_tpu.utils.config import parse_config_py
from vidsgg_big_tpu.utils.logger import create_logger
from vidsgg_big_tpu.data.bucketing import BucketSpec, bucketed_batches
from vidsgg_big_tpu.models import BigC, BigCConfig
from vidsgg_big_tpu.train.train_state import (
    make_optimizer, create_train_state, load_checkpoint)
from vidsgg_big_tpu.train.steps import build_infer_step
from vidsgg_big_tpu.evaluation.convert import EvalFmtCvtor
from vidsgg_big_tpu.evaluation.metrics import eval_relation_with_gt


def _maybe_zero_shot(args, logger, dataset_type, predict_relations,
                     gt_relations, ds_cfg=None):
    """--zeroshot: relation metrics restricted to triplets unseen at train
    time (capability-parity with reference VidVRD-helper/evaluate.py:22-53).
    Train triplets come from the train-split annotation JSONs under
    --train_anno_rpath (default: the dataset config's ann_dir)."""
    if not getattr(args, "zeroshot", False):
        return None
    from vidsgg_big_tpu.evaluation.zero_shot import (collect_train_triplets,
                                                     evaluate_zero_shot)
    ann = getattr(args, "train_anno_rpath", None) or \
        (ds_cfg or {}).get("ann_dir")
    assert ann, ("--zeroshot needs --train_anno_rpath (or a dataset config "
                 "with ann_dir)")
    if getattr(args, "synthetic", 0):
        # --synthetic fabricates everything a run needs; that includes a
        # train split for the zero-shot triplet collection
        import glob
        from vidsgg_big_tpu.data import synthetic_raw
        if dataset_type == "vidvrd":
            if not glob.glob(os.path.join(ann, "train", "*.json")):
                synthetic_raw.write_synthetic_vidvrd(
                    os.path.dirname(os.path.abspath(ann)),
                    n_videos=int(args.synthetic), split="train", seed=1)
        elif not glob.glob(os.path.join(ann, "training", "*", "*.json")):
            synthetic_raw.write_synthetic_vidor(
                os.path.dirname(os.path.dirname(os.path.abspath(ann))),
                n_videos=int(args.synthetic), split="train", seed=1,
                with_video_features=False)
    train_triplets = collect_train_triplets(dataset_type, ann)
    logger.info(f"zero-shot: {len(train_triplets)} train triplets "
                f"collected from {ann}")
    if gt_relations is None:
        import json as _json
        gt_path = args.gt_json
        assert gt_path, "--zeroshot with --json_results_path needs --gt_json"
        with open(gt_path) as f:
            gt_relations = _json.load(f)
    if not isinstance(predict_relations, dict):
        import json as _json
        with open(args.json_results_path) as f:
            predict_relations = _json.load(f)
    return evaluate_zero_shot(
        gt_relations, predict_relations, train_triplets,
        use_old_zeroshot_eval=getattr(args, "old_zeroshot_eval", False),
        logger=logger)


def inference_then_eval(args):
    experiment_dir = args.output_dir or os.path.dirname(args.cfg_path)
    log_dir = os.path.join(experiment_dir, "logfile")
    os.makedirs(log_dir, exist_ok=True)
    logger = create_logger(os.path.join(log_dir,
                                        f"eval_{args.save_tag}.log"))
    all_cfgs = parse_config_py(args.cfg_path)
    model_config = all_cfgs["model_config"]
    infer_config = all_cfgs.get("inference_config", {})
    topk = args.topk or infer_config.get("topk", 10)

    if args.json_results_path:
        logger.info(f"re-scoring saved predictions {args.json_results_path}")
        out = eval_relation_with_gt(
            dataset_type="vidvrd", logger=logger,
            json_results_path=args.json_results_path,
            gt_relations_path=args.gt_json)
        zs = _maybe_zero_shot(args, logger, "vidvrd",
                              args.json_results_path, None)
        if getattr(args, 'metrics_json', None):
            write_metrics_json(args.metrics_json, out, zero_shot=zs)
        return out

    dims = ({"dim_feat": model_config["dim_feat"],
             "dim_i3d": model_config.get("dim_i3d")}
            if args.synthetic_model_dims else {})
    # an explicit --fmt wins (exp1 is PKU *without* I3D: --use_pku --fmt pku);
    # --use_pku alone implies the flagship pku_i3d format; with neither, the
    # dataset config's own fmt key applies (exp1=pku, exp2=pku_i3d, exp3=mega)
    fmt = args.fmt or ("pku_i3d" if args.use_pku else None)
    dataset, ds_cfg = make_dataset(
        all_cfgs["test_dataset_config"], "vidvrd",
        synthetic=args.synthetic, synthetic_root=args.synthetic_root,
        fmt=fmt, **dims)
    logger.info(f"dataset: {len(dataset)} videos")

    if args.compute_dtype:
        model_config = dict(model_config, compute_dtype=args.compute_dtype)
    cfg = BigCConfig.from_dict(model_config, variant="v10")
    enti_emb, bias, _ = load_tables(model_config, cfg.num_enti_cats,
                                    cfg.num_pred_cats, cfg.dim_clsme)
    enti_emb, pos_tab = load_side_tables(args.tables_path, enti_emb)
    model = BigC(cfg, enti_name_emb=enti_emb, pos_emb_table=pos_tab)
    # bounded memory: peek one record for shapes; the split itself streams
    # from the per-video cache through the bucketer (never list(dataset))
    peek = dataset[0]
    feat_dim = first_feat_dim(item[0] for item in dataset)
    spec = BucketSpec(feat_dim=feat_dim,
                      feat_dtype=args.feat_dtype)

    first = next(iter(bucketed_batches([peek], spec, 1, with_gt=False)))
    params = model.init(jax.random.PRNGKey(0), first[2])
    params = model.load_tables(params, bias)
    if args.ckpt_path:
        tx, _ = make_optimizer(1e-4, 0.2, [1])
        state = create_train_state(params, tx)
        state, step = load_checkpoint(args.ckpt_path, state)
        params = state.params
        logger.info(f"loaded checkpoint {args.ckpt_path} (step {step})")

    mesh, tp, p_sh = None, 1, None
    if getattr(args, "mesh", None):
        from vidsgg_big_tpu.parallel.sharding import mesh_from_spec
        mesh, tp = mesh_from_spec(args.mesh)
    elif args.data_parallel:
        from vidsgg_big_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    if mesh is not None:
        from vidsgg_big_tpu.parallel.mesh import replicated
        assert args.batch_size % mesh.shape["data"] == 0, \
            "batch_size must be divisible by the mesh's data axis"
        if tp > 1:
            from vidsgg_big_tpu.parallel.sharding import (shard_params,
                                                          state_shardings)
            params = shard_params(params, mesh)
            p_sh = state_shardings(params)
        else:
            params = jax.device_put(params, replicated(mesh))
        logger.info(f"sharded inference over {mesh} (tp={tp})")
    infer = build_infer_step(model, topk=topk, mesh=mesh,
                             param_shardings=p_sh)
    convertor = EvalFmtCvtor("vidvrd")
    predict_relations = {}
    infer_results = {}
    # GT graphs are collected during the streaming pass (they are small —
    # no feature arrays); a second dataset pass would re-read every record
    gt_relations = {} if not args.gt_json else None
    logger.info("start inference...")
    from vidsgg_big_tpu.data.prefetch import prefetch
    batches = prefetch(
        bucketed_batches(dataset, spec, args.batch_size, with_gt=False),
        size=2, device_put=mesh is None)  # overlap pack (+H2D off-axon)
    for key, rows, props, _ in batches:
        if mesh is not None:
            from vidsgg_big_tpu.parallel.mesh import shard_batch
            props = shard_batch(props, mesh)
        trip = jax.device_get(infer(params, props))
        # (batch remainders are padded by repeating the last video; the dict
        #  update below dedups those repeats by video name)
        for i, (prop, gt) in enumerate(rows):
            one = jax.tree_util.tree_map(lambda x: x[i], trip)
            pr = convertor.to_eval_format_pr(prop, one,
                                             use_pku=args.use_pku)
            predict_relations.update(pr)
            infer_results[prop.video_name] = one
            if gt_relations is not None and gt is not None:
                gt_relations.update(convertor.to_eval_format_gt(gt))
    logger.info(f"inference done on {len(predict_relations)} videos")

    if args.save_infer_result:
        p = os.path.join(experiment_dir,
                         f"VidVRDtest_infer_result_{args.save_tag}.pkl")
        with open(p, "wb") as f:
            pickle.dump(infer_results, f)
        logger.info(f"infer_result saved at {p}")

    if args.gt_json:
        gt_path = args.gt_json
    else:
        logger.info("using GT built from dataset annotations during the "
                    "streaming pass (our-gt path)")
        gt_path = None
    out = eval_relation_with_gt(
        dataset_type="vidvrd", logger=logger,
        prediction_results=predict_relations,
        gt_relations_path=gt_path, gt_relations=gt_relations)
    zs = _maybe_zero_shot(args, logger, "vidvrd", predict_relations,
                          gt_relations, ds_cfg)
    if getattr(args, 'metrics_json', None):
        write_metrics_json(args.metrics_json, out, zero_shot=zs)
        logger.info(f"metrics json saved at {args.metrics_json}")

    if args.save_json_results:
        p = os.path.join(experiment_dir,
                         f"VidVRDtest_predict_relations_{args.save_tag}.json")
        with open(p, "w") as f:
            json.dump(predict_relations, f)
        logger.info(f"predict_relations saved at {p}")
    return out


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, required=True)
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--use_pku", action="store_true")
    parser.add_argument("--fmt", type=str, default=None,
                        help="tracklet format (mega/pku/pku_i3d); default "
                             "mega, or pku_i3d when --use_pku")
    parser.add_argument("--save_tag", type=str, default="")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--topk", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--gt_json", type=str, default=None)
    parser.add_argument("--json_results_path", type=str, default=None)
    parser.add_argument("--metrics_json", type=str, default=None,
                        help="write {mAP, recall@K, tagging P@K} as JSON "
                             "(machine-readable, for scripts/diff_baseline.py)")
    parser.add_argument("--save_infer_result", action="store_true")
    parser.add_argument("--save_json_results", action="store_true")
    parser.add_argument("--data_parallel", action="store_true")
    parser.add_argument("--mesh", type=str, default=None,
                        help="explicit device mesh 'D' (data parallel) or "
                             "'D,M' (2-D data x model; tensor-parallel "
                             "params over the model axis)")
    parser.add_argument("--feat_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16", "int8"],
                        help="feature storage dtype (int8: quantized serving path)")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--synthetic_root", type=str, default=None)
    parser.add_argument("--synthetic_model_dims", action="store_true",
                        help="write synthetic features at the model "
                             "config's dims (full-size end-to-end runs)")
    parser.add_argument("--compute_dtype", type=str, default=None,
                        choices=("float32", "bfloat16"),
                        help="override the model compute dtype "
                             "(config key compute_dtype)")
    parser.add_argument("--tables_path", type=str, default=None,
                        help="tables.npz from tools/convert_checkpoint.py "
                             "(frozen EntiNameEmb / pos-emb table)")
    parser.add_argument("--zeroshot", action="store_true",
                        help="additionally evaluate in the zero-shot setting "
                             "(triplets unseen in the train split; reference "
                             "VidVRD-helper/evaluate.py:22-53)")
    parser.add_argument("--old_zeroshot_eval", action="store_true",
                        help="keep non-zero-shot predictions in zero-shot "
                             "videos (the reference's 'old' protocol)")
    parser.add_argument("--train_anno_rpath", type=str, default=None,
                        help="annotation root containing the train split "
                             "(default: the dataset config's ann_dir)")
    inference_then_eval(parser.parse_args())
