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


def build_model_and_params(args, model_config):
    import jax
    from common import load_tables, load_side_tables
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.data.types import pack_proposal, stack_batches
    from vidsgg_big_tpu.models import BigC, BigCConfig
    from vidsgg_big_tpu.train.train_state import (
        make_optimizer, create_train_state, load_checkpoint)

    variant = {"bigc_vidvrd": "v10", "bigc_vidor": "v7"}[args.model]
    if args.compute_dtype:
        model_config = dict(model_config, compute_dtype=args.compute_dtype)
    cfg = BigCConfig.from_dict(model_config, variant=variant)
    enti_emb, bias, _ = load_tables(model_config, cfg.num_enti_cats,
                                    cfg.num_pred_cats, cfg.dim_clsme)
    enti_emb, pos_tab = load_side_tables(args.tables_path, enti_emb)
    model = BigC(cfg, enti_name_emb=enti_emb, pos_emb_table=pos_tab)

    # feature channels on disk: RoI + I3D for v10; RoI + classeme concat for
    # v7 when use_clsme (the VidOR loaders concatenate the 300-d classeme)
    feat_dim = cfg.dim_feat + (cfg.dim_i3d or 0) + \
        (cfg.dim_clsme if (variant == "v7" and cfg.use_clsme) else 0)
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
    if args.ckpt_path:
        tx, _ = make_optimizer(1e-4, 0.2, [1])
        state = create_train_state(params, tx)
        state, _ = load_checkpoint(args.ckpt_path, state)
        params = state.params
    return model, params, template, feat_dim


def export_model(args):
    import jax
    from jax import export as jexport
    from vidsgg_big_tpu.utils.config import parse_config_py
    from vidsgg_big_tpu.train.steps import build_infer_step

    all_cfgs = parse_config_py(args.cfg_path)
    model_config = all_cfgs["model_config"]
    topk = args.topk or all_cfgs.get("inference_config", {}).get("topk", 10)
    model, params, template, feat_dim = build_model_and_params(
        args, model_config)

    infer = build_infer_step(model, topk=topk)
    # flat-leaf calling convention: custom pytree types (TrackletBatch,
    # Triplets) cannot be serialized into the artifact, and plain-array
    # inputs/outputs keep it loadable without any pytree registrations —
    # the input treedef is baked in at trace time, the output structure is
    # recorded in the manifest for the loader to reassemble
    flat_template, in_tree = jax.tree_util.tree_flatten(template)
    out_struct = jax.eval_shape(lambda b: infer(params, b), template)
    out_cls = type(out_struct)

    def serve(*leaves):
        batch = jax.tree_util.tree_unflatten(in_tree, leaves)
        return tuple(jax.tree_util.tree_leaves(infer(params, batch)))

    in_sds = tuple(jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
                   for x in flat_template)
    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]
    exported = jexport.export(jax.jit(serve), platforms=platforms)(*in_sds)

    os.makedirs(args.out, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(args.out, "model.jaxexp"), "wb") as f:
        f.write(blob)
    import dataclasses
    manifest = {
        "model": args.model, "topk": topk, "platforms": platforms,
        "batch_size": args.batch_size, "n_bucket": args.n_bucket,
        "t_bucket": args.t_bucket, "feat_dim": feat_dim,
        "feat_dtype": args.feat_dtype,
        # flat leaves in TrackletBatch field order (= tree_leaves order)
        "inputs": {f.name: [list(np.shape(getattr(template, f.name))),
                            str(np.asarray(getattr(template, f.name)).dtype)]
                   for f in dataclasses.fields(type(template))},
        "output_type": f"{out_cls.__module__}.{out_cls.__qualname__}",
        "output_fields": [f.name for f in dataclasses.fields(out_cls)],
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
                        choices=["bigc_vidvrd", "bigc_vidor"])
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--tables_path", type=str, default=None)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--n_bucket", type=int, default=50)
    parser.add_argument("--t_bucket", type=int, default=256)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--topk", type=int, default=None)
    parser.add_argument("--feat_dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16", "int8"])
    parser.add_argument("--compute_dtype", type=str, default=None)
    parser.add_argument("--platforms", type=str, default="cpu,tpu",
                        help="comma-separated lowering targets")
    export_model(parser.parse_args())
