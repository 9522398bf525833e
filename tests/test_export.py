"""Serving-artifact export/reload (tools/export_model.py, utils/serving.py):
the deserialized StableHLO module must reproduce the live jitted infer step
for every exported model family — params baked in, identical integer/bool
leaves (triplet ids, validity, bin masks), float leaves to rounding."""
import argparse
import json
import os
import sys

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # smoke tier: -m 'not slow' (see pytest.ini)

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")

BIGC_CFG = """
model_config = dict(
    num_enti_cats=10, num_pred_cats=16, dim_ffn=32, dim_enti=32, dim_pred=32,
    dim_att=32, dim_feat=24, dim_clsme=16, dim_i3d=8, enco_pool_len=4,
    n_enco_layers=1, n_deco_layers=2, n_att_head=4, num_querys=8,
    neg_weight=0.1, positive_vIoU_th=0.5, EntiNameEmb_path=None,
    bias_matrix_path=None,
    cost_coeff_dict=dict(classification=1.0, adj_matrix=30.0),
    loss_coeff_dict=dict(classification=1.0, adj_matrix=30.0))
inference_config = dict(topk=5)
"""

BASEC_CFG = """
model_config = dict(
    num_enti_cats=10, num_pred_cats=16, dim_feat=24, dim_clsme=16,
    dim_enti=32, dim_ffn=32, enco_pool_len=4, use_clsme=True,
    EntiNameEmb_path=None, bias_matrix_path=None, rt_triplets_topk=6)
inference_config = dict(topk=5)
"""

GRD_CFG = """
model_config = dict(
    dim_feat=16, dim_clsme=16, dim_hidden=32, num_bins=2,
    num_pred_cats=16, num_enti_cats=10,
    loss_factor=dict(classification=1.0, centerness=1.0, regression=1.0))
inference_config = dict(topk=5, score_th=0.9, bins_th=0.2, nms_th=0.8)
"""


@pytest.fixture()
def tools_path():
    # stays on sys.path for the test body: export_model lazily imports its
    # sibling tools/common.py inside the exported functions
    sys.path.insert(0, TOOLS)
    yield
    sys.path.remove(TOOLS)


def _args(cfg_path, model, out):
    return argparse.Namespace(
        cfg_path=str(cfg_path), model=model, ckpt_path=None,
        tables_path=None, out=out, n_bucket=8, t_bucket=32, q_bucket=4,
        batch_size=2, topk=None, feat_dtype="float32", compute_dtype=None,
        platforms="cpu")


def _compare(live, served):
    live_leaves = jax.tree_util.tree_leaves(jax.device_get(live))
    served_leaves = jax.tree_util.tree_leaves(jax.device_get(served))
    assert len(live_leaves) == len(served_leaves)
    for a, b in zip(live_leaves, served_leaves):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.floating):
            # the AOT module may fuse differently from the live jit: float
            # leaves agree to rounding (measured max 4.5e-8), integer/bool
            # leaves must be identical
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
        else:
            np.testing.assert_array_equal(b, a)


def test_export_reload_matches_live_infer(tmp_path, tools_path):
    import export_model
    from vidsgg_big_tpu.train.steps import build_infer_step
    from vidsgg_big_tpu.utils.serving import load_exported
    from vidsgg_big_tpu.utils.config import parse_config_py

    cfg_path = tmp_path / "config_.py"
    cfg_path.write_text(BIGC_CFG)
    out = str(tmp_path / "artifact")
    args = _args(cfg_path, "bigc_vidvrd", out)
    export_model.export_model(args)

    assert os.path.exists(os.path.join(out, "model.jaxexp"))
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["topk"] == 5 and manifest["platforms"] == ["cpu"]
    assert manifest["inputs"]["feats"][0] == [2, 8, 32, 24 + 8]

    # rebuild the identical model/params/batch (fully deterministic) and
    # compare the reloaded artifact against the live jitted step
    model, params, template, _ = export_model.build_model_and_params(
        args, parse_config_py(str(cfg_path))["model_config"])
    infer = build_infer_step(model, topk=5)

    serve, man2 = load_exported(out)
    assert man2["model"] == "bigc_vidvrd"
    served = serve(template)
    assert type(served).__name__ == "Triplets"
    _compare(infer(params, template), served)


def test_export_basec_and_grounding(tmp_path, tools_path):
    import export_model
    from vidsgg_big_tpu.train.steps import build_basec_infer_step
    from vidsgg_big_tpu.train.grounding_steps import (
        build_grounding_infer_step)
    from vidsgg_big_tpu.utils.serving import load_exported
    from vidsgg_big_tpu.utils.config import parse_config_py

    # Base-C (pairwise baseline, rt_triplets_topk truncation active)
    cfg_path = tmp_path / "config_base.py"
    cfg_path.write_text(BASEC_CFG)
    out = str(tmp_path / "base_artifact")
    args = _args(cfg_path, "base_c", out)
    export_model.export_model(args)
    model, params, template, _ = export_model.build_basec_and_params(
        args, parse_config_py(str(cfg_path))["model_config"])
    infer = build_basec_infer_step(model, topk=5)
    serve, man = load_exported(out)
    assert man["model"] == "base_c"
    _compare(infer(params, template), serve(template))

    # grounding (stage 2): plain-array inputs, tuple output
    gcfg_path = tmp_path / "config_grd.py"
    gcfg_path.write_text(GRD_CFG)
    gout = str(tmp_path / "grd_artifact")
    gargs = _args(gcfg_path, "grounding", gout)
    export_model.export_model(gargs)
    gmodel, gparams, gtemplate, _ = export_model.build_grounding_and_params(
        gargs, parse_config_py(str(gcfg_path))["model_config"])
    ginfer = build_grounding_infer_step(gmodel, score_th=0.9, tiou_th=0.5,
                                        bins_th=0.2, nms_th=0.8)
    gserve, gman = load_exported(gout)
    assert gman["output_fields"] == ["pooled_se", "bins_probs", "bins_mask"]
    _compare(ginfer(gparams, *gtemplate), gserve(gtemplate))
