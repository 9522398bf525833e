"""Device-resident record cache (data/device_cache.py): cached-epoch
batches must be bit-identical to the host pipeline's, and the end-to-end
trainer must journal the same losses with the cache on or off.

The cache has no reference counterpart (the reference re-reads host RAM
every epoch, reference tools/train_vidvrd.py:105-112); its contract is
pure transparency, which these tests pin down.
"""
import argparse
import json
import os
import sys

import numpy as np
import jax
import pytest

from vidsgg_big_tpu.data.bucketing import (BucketSpec, bucketed_batches,
                                           iter_shuffled)
from vidsgg_big_tpu.data.device_cache import DeviceRecordCache

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _dataset(tmp_path, n=6):
    sys.path.insert(0, TOOLS)
    try:
        from common import make_dataset
        ds, _ = make_dataset(
            dict(split="train", min_frames_th=5, max_proposal=50,
                 max_preds=100),
            "vidvrd", synthetic=n, synthetic_root=str(tmp_path / "synth"),
            fmt="pku_i3d")
    finally:
        sys.path.remove(TOOLS)
    return ds


def _fill(cache, ds, spec, bs, seed=0):
    for key, rows, props, gts in bucketed_batches(
            iter_shuffled(ds, seed=seed), spec, bs):
        props, gts = jax.device_put((props, gts))
        cache.offer(key, rows, props, gts)


def test_cached_epoch_bit_equal(tmp_path):
    ds = _dataset(tmp_path)
    spec = BucketSpec(feat_dim=80, g_bucket=32, feat_dtype="bfloat16")
    bs = 2
    cache = DeviceRecordCache(ds.video_name_list, bs, 8e9)
    _fill(cache, ds, spec, bs, seed=0)
    assert cache.complete and cache.bytes > 0

    # a *different* epoch seed: composition comes from the descriptor path
    host = list(bucketed_batches(iter_shuffled(ds, seed=3), spec, bs))
    cached = list(cache.epoch_descriptors(seed=3))
    assert len(host) == len(cached)
    for (hk, hrows, hp, hg), (ck, cnames) in zip(host, cached):
        assert hk == ck
        assert [r[0].video_name for r in hrows] == cnames
        ap, ag = cache.assemble(ck, cnames)
        for a, b in zip(jax.tree_util.tree_leaves(ap),
                        jax.tree_util.tree_leaves(hp)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(ag),
                        jax.tree_util.tree_leaves(hg)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_budget_exhaustion_disables(tmp_path):
    ds = _dataset(tmp_path)
    spec = BucketSpec(feat_dim=80, g_bucket=32, feat_dtype="bfloat16")
    cache = DeviceRecordCache(ds.video_name_list, 2, budget_bytes=1e6)
    _fill(cache, ds, spec, 2)
    assert cache.over_budget and not cache.complete


def test_skip_names_excluded_from_required(tmp_path):
    ds = _dataset(tmp_path)
    skip = {ds.video_name_list[0]}
    cache = DeviceRecordCache(ds.video_name_list, 2, 8e9, skip_names=skip)
    assert ds.video_name_list[0] not in cache.required
    spec = BucketSpec(feat_dim=80, g_bucket=32, feat_dtype="bfloat16")
    _fill(cache, ds, spec, 2)
    assert cache.complete       # the skipped name is not required


CFG = """
model_config = dict(
    num_enti_cats=36, num_pred_cats=133, dim_ffn=32, dim_enti=32,
    dim_pred=32, dim_att=32, dim_feat=64, dim_clsme=300, dim_i3d=16,
    enco_pool_len=4, n_enco_layers=1, n_deco_layers=1, n_att_head=4,
    num_querys=8, neg_weight=0.1, positive_vIoU_th=0.5,
    cost_coeff_dict=dict(classification=1.0, adj_matrix=30.0),
    loss_coeff_dict=dict(classification=1.0, adj_matrix=30.0),
)
train_dataset_config = dict(split="train", min_frames_th=5,
                            max_proposal=50, max_preds=100, fmt="pku_i3d")
test_dataset_config = dict(train_dataset_config, split="test")
train_config = dict(batch_size=2, total_epoch=3, initial_lr=1e-4,
                    lr_decay=0.2, epoch_lr_milestones=[50])
inference_config = dict(topk=3)
"""


def _train_args(cfg_path, root, outdir, cache_gb):
    return argparse.Namespace(
        cfg_path=cfg_path, use_pku=True, fmt=None, save_tag="t",
        from_checkpoint=False, ckpt_path=None, output_dir=outdir,
        epochs=3, batch_size=None, ckpt_every=100, seed=0,
        data_parallel=False, mesh=None, tables_path=None,
        synthetic=6, synthetic_root=root, synthetic_model_dims=False,
        compute_dtype=None, feat_dtype=None, stop_after_batches=0,
        device_cache_gb=cache_gb)


def _losses(outdir):
    out = {}
    with open(os.path.join(outdir, "logfile", "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r["tag"] == "loss/total":
                out[r["step"]] = r["value"]
    return out


@pytest.mark.slow
def test_train_cli_losses_bit_equal_with_cache(tmp_path):
    cfg_path = tmp_path / "config_.py"
    cfg_path.write_text(CFG)
    root = str(tmp_path / "synth")
    sys.path.insert(0, TOOLS)
    try:
        import train_vidvrd
        out_off = str(tmp_path / "off")
        out_on = str(tmp_path / "on")
        train_vidvrd.train(_train_args(str(cfg_path), root, out_off, 0.0))
        train_vidvrd.train(_train_args(str(cfg_path), root, out_on, 8.0))
    finally:
        sys.path.remove(TOOLS)
    l_off, l_on = _losses(out_off), _losses(out_on)
    assert l_off and l_off == l_on


# ---- VidOR trainers (cls + baseline) share the cache wiring ---------------

VIDOR_CLS_CFG = """
model_config = dict(
    num_enti_cats=81, num_pred_cats=51, dim_ffn=32, dim_enti=32, dim_pred=32,
    dim_att=32, dim_feat=64, dim_clsme=300, enco_pool_len=4, n_enco_layers=1,
    n_deco_layers=1, n_att_head=4, num_querys=8, neg_weight=0.1,
    positive_vIoU_th=0.5, use_clsme=True, EntiNameEmb_path=None,
    bias_matrix_path=None,
    cost_coeff_dict=dict(classification=1.0, adj_matrix=30.0),
    loss_coeff_dict=dict(classification=1.0, adj_matrix=30.0))
train_dataset_config = dict(split="train")
test_dataset_config = dict(split="val")
train_config = dict(batch_size=2, total_epoch=3, initial_lr=1e-4,
                    lr_decay=0.2, epoch_lr_milestones=[50])
inference_config = dict(topk=3)
"""

VIDOR_BASE_CFG = """
model_config = dict(
    num_enti_cats=81, num_pred_cats=51, dim_feat=64, dim_clsme=300,
    dim_enti=32, dim_ffn=32, enco_pool_len=4, use_clsme=True,
    EntiNameEmb_path=None, bias_matrix_path=None, max_preds=16)
train_dataset_config = dict(split="train")
test_dataset_config = dict(split="val")
train_config = dict(batch_size=2, total_epoch=3, initial_lr=1e-4,
                    lr_decay=0.2, epoch_lr_milestones=[50])
inference_config = dict(topk=3)
"""


def _vidor_args(cfg_path, root, outdir, cache_gb, **kw):
    base = dict(cfg_path=cfg_path, save_tag="t", output_dir=outdir,
                from_checkpoint=False, ckpt_path=None, epochs=3,
                batch_size=None, ckpt_every=100, seed=0, data_parallel=False,
                mesh=None, tables_path=None, synthetic=4,
                synthetic_root=root, train_baseline=False,
                train_grounding=False, compute_dtype=None, feat_dtype=None,
                stop_after_batches=0, device_cache_gb=cache_gb)
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.mark.slow
@pytest.mark.parametrize("mode,cfg_text", [
    ("cls", VIDOR_CLS_CFG), ("baseline", VIDOR_BASE_CFG)])
def test_vidor_train_losses_bit_equal_with_cache(tmp_path, mode, cfg_text):
    cfg_path = tmp_path / "config_.py"
    cfg_path.write_text(cfg_text)
    root = str(tmp_path / "synth")
    sys.path.insert(0, TOOLS)
    try:
        import train_vidor
        fn = (train_vidor.train_baseline if mode == "baseline"
              else train_vidor.train_cls_stage)
        out_off = str(tmp_path / "off")
        out_on = str(tmp_path / "on")
        fn(_vidor_args(str(cfg_path), root, out_off, 0.0))
        fn(_vidor_args(str(cfg_path), root, out_on, 8.0))
    finally:
        sys.path.remove(TOOLS)
    l_off, l_on = _losses(out_off), _losses(out_on)
    assert l_off and l_off == l_on
