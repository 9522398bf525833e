"""Shared CLI plumbing for the tools/ drivers."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from vidsgg_big_tpu.utils.compile_cache import (  # noqa: E402
    enable_compilation_cache)

# every CLI driver pays multi-minute cold jit compiles without this
enable_compilation_cache()


def load_tables(model_config, num_enti, num_pred, dim_clsme=300):
    """Load EntiNameEmb / bias matrix / PredNameEmb from the configured .npy
    paths, falling back to zeros when absent (e.g. synthetic runs)."""
    def _load(path, shape):
        if path and os.path.exists(path):
            arr = np.load(path).astype(np.float32)
            assert arr.shape == tuple(shape), (path, arr.shape, shape)
            return arr
        return np.zeros(shape, np.float32)

    enti_emb = _load(model_config.get("EntiNameEmb_path"),
                     (num_enti, dim_clsme))
    bias = _load(model_config.get("bias_matrix_path"),
                 (num_enti, num_enti, num_pred))
    pred_emb = _load(model_config.get("PredNameEmb_path"),
                     (num_pred, dim_clsme))
    return enti_emb, bias, pred_emb


def load_side_tables(tables_path, enti_emb=None):
    """``tables.npz`` written by tools/convert_checkpoint.py ->
    (enti_name_emb override, pos_emb_table or None)."""
    if not tables_path:
        return enti_emb, None
    t = np.load(tables_path)
    if "enti_name_emb" in t:
        enti_emb = t["enti_name_emb"]
    pos = t["pos_emb_table"] if "pos_emb_table" in t else None
    return enti_emb, pos


def write_metrics_json(path, out, zero_shot=None):
    """Dump (mean_ap, recall@K, tagging precision@K) from
    eval_relation_with_gt as machine-readable JSON (consumed by
    scripts/diff_baseline.py for real-data parity rehearsal).
    ``zero_shot``: optional same-shaped tuple from evaluate_zero_shot,
    written under a "zero_shot" key."""
    import json

    def _d(tup):
        mean_ap, rec_at_n, prec_at_n = tup
        return {
            "mAP": float(mean_ap),
            "recall": {str(k): float(v) for k, v in rec_at_n.items()},
            "precision": {str(k): float(v) for k, v in prec_at_n.items()},
        }

    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    payload = _d(out)
    if zero_shot is not None:
        payload["zero_shot"] = _d(zero_shot)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)


def make_dataset(dataset_config, dataset_type, synthetic=0, synthetic_root=None,
                 fmt=None, dim_feat=None, dim_i3d=None):
    """Build the dataset; with --synthetic N, first write a synthetic split in
    the reference layout and point the config at it.

    ``dim_feat``/``dim_i3d`` size the synthetic features (pass the model
    config's dims to drive a full-size model end-to-end on synthetic data;
    defaults stay small for smoke tests)."""
    from vidsgg_big_tpu.data.dataset import VidVRDDataset, VidORDataset
    from vidsgg_big_tpu.data import synthetic_raw

    cfg = dict(dataset_config)
    if synthetic:
        root = synthetic_root or os.path.join("datasets", "synthetic")
        os.makedirs(root, exist_ok=True)
        dims = {}
        if dim_feat:
            dims["dim_feat"] = dim_feat
        if dataset_type == "vidvrd":
            if dim_i3d:
                dims["dim_i3d"] = dim_i3d
            cfg = synthetic_raw.write_synthetic_vidvrd(
                root, n_videos=synthetic, split=cfg.get("split", "test"),
                fmt=fmt or cfg.get("fmt", "pku_i3d"), **dims)
        else:
            cfg = synthetic_raw.write_synthetic_vidor(
                root, n_videos=synthetic, split=cfg.get("split", "val"),
                **dims)
    if dataset_type == "vidvrd":
        if fmt and not synthetic:
            cfg["fmt"] = fmt
        return VidVRDDataset(**cfg), cfg
    if not cfg.get("video_dir"):
        cfg.pop("video_dir", None)   # only test split needs the videos
    return VidORDataset(**cfg), cfg


def first_feat_dim(prop_iter):
    """Feature width of the first non-empty video (zero-proposal videos
    exist in real splits and carry no feature rows to measure)."""
    for prop in prop_iter:
        if prop.num_proposals:
            return prop.features[0].shape[1]
    raise ValueError("every video in the split has zero proposals")


def maybe_resume(args, logger, state, default_ckpt_dir, iters_per_epoch):
    """Resume from a checkpoint (reference resumes in every mode, reference
    tools/train_vidvrd.py:128-147, tools/train_vidor.py:281-282,430-431,
    560-561).  Returns ``(state, start_epoch, start_batch)``; a non-zero
    ``start_batch`` marks a graceful mid-epoch stop whose epoch stream the
    loop fast-forwards (train/loop.py)."""
    if not args.from_checkpoint:
        return state, 0, 0
    from vidsgg_big_tpu.train.train_state import (load_checkpoint,
                                                  load_checkpoint_position)
    path = args.ckpt_path or default_ckpt_dir
    state, step = load_checkpoint(path, state)
    # the sidecar epoch is authoritative: streaming bucketed epochs emit
    # more steps than len(dataset)//batch_size (partial-bucket flushes),
    # so dividing over-counts and would silently skip epochs on resume
    epoch, start_batch = load_checkpoint_position(path, step)
    start_epoch = epoch if epoch is not None else step // iters_per_epoch
    logger.info(f"resumed from {path} at step {step} (epoch {start_epoch}"
                + (f", batch {start_batch}" if start_batch else "") + ")")
    return state, start_epoch, start_batch
