"""Export a trained model as a self-contained serving artifact (StableHLO).

Beyond the reference (which serves nothing — eval scripts are its only
inference surface): `jax.export` ahead-of-time lowers the jitted infer step
— params baked in as constants — to a portable serialized StableHLO module
that any later JAX runtime can deserialize and run on the named platforms
without this repo's model code, Python version, or flax.

    python tools/export_model.py --cfg_path experiments/exp2/config_.py \
        --model bigc_vidvrd --ckpt_path ckpt_exp2 --tables_path ckpt_exp2/tables.npz \
        --n_bucket 50 --t_bucket 256 --batch_size 8 --platforms cpu,tpu \
        --out exp2_serving

writes `<out>/model.jaxexp` (serialized artifact) and `<out>/manifest.json`
(input shapes/dtypes + metadata).  Reload with
:func:`vidsgg_big_tpu.utils.serving.load_exported` — see its docstring for
the 3-line serving loop.  One artifact per (N, T, B) bucket: serving picks
the bucket like the eval CLIs do (data/bucketing.py).
"""
import argparse
import json
import os

import numpy as np


def _restore(params, ckpt_path):
    if not ckpt_path:
        return params
    from vidsgg_big_tpu.train.train_state import (
        make_optimizer, create_train_state, load_checkpoint)
    tx, _ = make_optimizer(1e-4, 0.2, [1])
    state = create_train_state(params, tx)
    state, _ = load_checkpoint(ckpt_path, state)
    return state.params


def build_model_and_params(args, model_config):
    import jax
    from common import load_tables, load_side_tables
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.data.types import pack_proposal, stack_batches
    from vidsgg_big_tpu.models import BigC, BigCConfig

    variant = {"bigc_vidvrd": "v10", "bigc_vidor": "v7"}[args.model]
    cfg = BigCConfig.from_dict(model_config, variant=variant)
    enti_emb, bias, _ = load_tables(model_config, cfg.num_enti_cats,
                                    cfg.num_pred_cats, cfg.dim_clsme)
    enti_emb, pos_tab = load_side_tables(args.tables_path, enti_emb)
    model = BigC(cfg, enti_name_emb=enti_emb, pos_emb_table=pos_tab)

    # feature channels ON DISK (what serving batches will carry): RoI + I3D
    # for v10; RoI + the 300-d classeme concat for v7 — the VidOR loaders
    # append the classeme unconditionally (data/parse.py), and the model
    # slices/ignores unconsumed tail channels like the reference
    # (model_0v7.py:441-447, big_c.py feats assert)
    feat_dim = cfg.dim_feat + (cfg.dim_i3d or 0) + \
        (cfg.dim_clsme if variant == "v7" else 0)
    import ml_dtypes
    dtype = (ml_dtypes.bfloat16 if args.feat_dtype == "bfloat16"
             else np.dtype(args.feat_dtype))
    recs = [make_video(i, video_len=4 * args.t_bucket // 2, n_gt_trajs=3,
                       n_preds=4, n_distractors=2, feat_dim=feat_dim,
                       num_enti_cats=cfg.num_enti_cats,
                       num_pred_cats=cfg.num_pred_cats)[0]
            for i in range(args.batch_size)]
    template = stack_batches([
        pack_proposal(r, args.n_bucket, args.t_bucket, feat_dim, dtype=dtype)
        for r in recs])

    params = model.init(jax.random.PRNGKey(0), template)
    params = model.load_tables(params, bias)
    return model, _restore(params, args.ckpt_path), template, feat_dim


def build_basec_and_params(args, model_config):
    import jax
    from common import load_tables
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.data.types import pack_proposal, stack_batches
    from vidsgg_big_tpu.models.base_c import BaseC, BaseCConfig
    import ml_dtypes

    cfg = BaseCConfig.from_dict(model_config)
    enti_emb, bias, _ = load_tables(model_config, cfg.num_enti_cats,
                                    cfg.num_pred_cats, cfg.dim_clsme)
    model = BaseC(cfg, enti_name_emb=enti_emb)
    # VidOR tracklet files always carry the 300-d classeme concat after the
    # RoI channels (data/parse.py); the model ignores the tail when it uses
    # the name-embedding lookup instead
    feat_dim = cfg.dim_feat + cfg.dim_clsme
    dtype = (ml_dtypes.bfloat16 if args.feat_dtype == "bfloat16"
             else np.dtype(args.feat_dtype))
    recs = [make_video(i, video_len=2 * args.t_bucket, n_gt_trajs=3,
                       n_preds=4, n_distractors=2, feat_dim=feat_dim,
                       num_enti_cats=cfg.num_enti_cats,
                       num_pred_cats=cfg.num_pred_cats)[0]
            for i in range(args.batch_size)]
    template = stack_batches([
        pack_proposal(r, args.n_bucket, args.t_bucket, feat_dim, dtype=dtype)
        for r in recs])
    params = model.init(jax.random.PRNGKey(0), template)
    params = model.load_tables(params, bias)
    return model, _restore(params, args.ckpt_path), template, feat_dim


def build_grounding_and_params(args, model_config):
    import jax
    from common import load_tables
    from vidsgg_big_tpu.models.grounding import (GroundingConfig,
                                                 GroundingModel)
    import os.path as osp

    cfg = GroundingConfig.from_dict(model_config)
    enti_emb, _, pred_emb = load_tables(model_config, cfg.num_enti_cats,
                                        cfg.num_pred_cats, cfg.dim_clsme)
    has_e = model_config.get("EntiNameEmb_path") and osp.exists(
        model_config["EntiNameEmb_path"])
    has_p = model_config.get("PredNameEmb_path") and osp.exists(
        model_config["PredNameEmb_path"])
    model = GroundingModel(cfg, enti_emb_init=enti_emb if has_e else None,
                           pred_emb_init=pred_emb if has_p else None)

    rng = np.random.default_rng(0)
    b, t, q = args.batch_size, args.t_bucket, args.q_bucket
    feats = rng.normal(size=(b, t, cfg.dim_feat)).astype(np.float32)
    clip_mask = np.ones((b, t), bool)
    n_clips = np.full((b,), t, np.int32)
    qc = rng.integers(1, cfg.num_enti_cats,
                      size=(b, q, 3)).astype(np.int32)
    lo = rng.uniform(0, 0.4, size=(b, q, 1))
    temporal = np.concatenate(
        [lo, lo + rng.uniform(0.1, 0.5, size=(b, q, 1))], -1).astype(
            np.float32)
    qm = np.ones((b, q), bool)
    template = (feats, clip_mask, n_clips, qc, temporal, qm)
    params = model.init(jax.random.PRNGKey(0), feats, clip_mask, qc,
                        temporal, qm)
    return model, _restore(params, args.ckpt_path), template, cfg.dim_feat


def export_model(args):
    import jax
    from jax import export as jexport
    from vidsgg_big_tpu.utils.config import parse_config_py
    from vidsgg_big_tpu.train.steps import build_infer_step

    all_cfgs = parse_config_py(args.cfg_path)
    model_config = all_cfgs["model_config"]
    if args.compute_dtype:   # applies to every family's config
        model_config = dict(model_config, compute_dtype=args.compute_dtype)
    infer_cfg = all_cfgs.get("inference_config", {})
    topk = args.topk or infer_cfg.get("topk", 10)
    if args.model == "base_c":
        from vidsgg_big_tpu.train.steps import build_basec_infer_step
        model, params, template, feat_dim = build_basec_and_params(
            args, model_config)
        infer = build_basec_infer_step(model, topk=topk)
        infer_wrapped = lambda p, b: infer(p, b)
    elif args.model == "grounding":
        from vidsgg_big_tpu.train.grounding_steps import (
            build_grounding_infer_step)
        model, params, template, feat_dim = build_grounding_and_params(
            args, model_config)
        ginfer = build_grounding_infer_step(
            model, score_th=infer_cfg.get("score_th", 0.9),
            tiou_th=infer_cfg.get("tiou_th", 0.5),
            bins_th=infer_cfg.get("bins_th", 0.2),
            nms_th=infer_cfg.get("nms_th", 0.8))
        infer_wrapped = lambda p, b: ginfer(p, *b)
    else:
        model, params, template, feat_dim = build_model_and_params(
            args, model_config)
        infer = build_infer_step(model, topk=topk)
        infer_wrapped = lambda p, b: infer(p, b)
    # flat-leaf calling convention: custom pytree types (TrackletBatch,
    # Triplets) cannot be serialized into the artifact, and plain-array
    # inputs/outputs keep it loadable without any pytree registrations —
    # the input treedef is baked in at trace time, the output structure is
    # recorded in the manifest for the loader to reassemble
    flat_template, in_tree = jax.tree_util.tree_flatten(template)
    out_struct = jax.eval_shape(lambda b: infer_wrapped(params, b), template)
    out_cls = type(out_struct)

    def serve(*leaves):
        batch = jax.tree_util.tree_unflatten(in_tree, leaves)
        return tuple(jax.tree_util.tree_leaves(infer_wrapped(params, batch)))

    in_sds = tuple(jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
                   for x in flat_template)
    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]
    exported = jexport.export(jax.jit(serve), platforms=platforms)(*in_sds)

    os.makedirs(args.out, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(args.out, "model.jaxexp"), "wb") as f:
        f.write(blob)
    import dataclasses
    if dataclasses.is_dataclass(template):
        inputs = {f.name: [list(np.shape(getattr(template, f.name))),
                           str(np.asarray(getattr(template, f.name)).dtype)]
                  for f in dataclasses.fields(type(template))}
    else:   # grounding: a plain tuple of arrays
        names = ["video_feats", "clip_mask", "n_clips", "query_cats",
                 "temporal", "query_mask"]
        inputs = {n: [list(np.shape(x)), str(np.asarray(x).dtype)]
                  for n, x in zip(names, template)}
    if dataclasses.is_dataclass(out_cls):
        out_type = f"{out_cls.__module__}.{out_cls.__qualname__}"
        out_fields = [f.name for f in dataclasses.fields(out_cls)]
    else:   # grounding decode returns (pooled_se, bins_probs, bins_mask)
        out_type, out_fields = None, ["pooled_se", "bins_probs", "bins_mask"]
    manifest = {
        "model": args.model, "topk": topk, "platforms": platforms,
        "batch_size": args.batch_size, "n_bucket": args.n_bucket,
        "t_bucket": args.t_bucket, "q_bucket": args.q_bucket,
        "feat_dim": feat_dim,
        # grounding consumes float32 I3D clip features regardless of the
        # tracklet-feature storage flag
        "feat_dtype": ("float32" if args.model == "grounding"
                       else args.feat_dtype),
        "compute_dtype": model_config.get("compute_dtype", "float32"),
        "inputs": inputs,     # flat leaves in field order (= tree_leaves)
        "output_type": out_type,
        "output_fields": out_fields,
        "ckpt_path": args.ckpt_path, "cfg_path": args.cfg_path,
        "artifact_bytes": len(blob),
    }
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    print(f"exported {args.model} (topk={topk}, platforms={platforms}, "
          f"{len(blob) / 1e6:.1f} MB) -> {args.out}")
    return exported


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, required=True)
    parser.add_argument("--model", type=str, default="bigc_vidvrd",
                        choices=["bigc_vidvrd", "bigc_vidor", "base_c",
                                 "grounding"])
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--tables_path", type=str, default=None)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--n_bucket", type=int, default=50)
    parser.add_argument("--t_bucket", type=int, default=256,
                        help="frame bucket (clip bucket for grounding)")
    parser.add_argument("--q_bucket", type=int, default=64,
                        help="query bucket (grounding only)")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--topk", type=int, default=None)
    parser.add_argument("--feat_dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16", "int8"])
    parser.add_argument("--compute_dtype", type=str, default=None)
    parser.add_argument("--platforms", type=str, default="cpu,tpu",
                        help="comma-separated lowering targets")
    export_model(parser.parse_args())
