"""Serving-artifact export/reload (tools/export_model.py, utils/serving.py):
the deserialized StableHLO module must reproduce the live jitted infer step
exactly — params baked in, same triplet set, same scores."""
import argparse
import json
import os
import sys

import numpy as np
import jax

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")

CFG = """
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


import pytest


@pytest.fixture()
def tools_path():
    # stays on sys.path for the test body: export_model lazily imports its
    # sibling tools/common.py inside the exported functions
    sys.path.insert(0, TOOLS)
    yield
    sys.path.remove(TOOLS)


def test_export_reload_matches_live_infer(tmp_path, tools_path):
    import export_model
    from vidsgg_big_tpu.train.steps import build_infer_step
    from vidsgg_big_tpu.utils.serving import load_exported

    cfg_path = tmp_path / "config_.py"
    cfg_path.write_text(CFG)
    out = str(tmp_path / "artifact")
    args = argparse.Namespace(
        cfg_path=str(cfg_path), model="bigc_vidvrd", ckpt_path=None,
        tables_path=None, out=out, n_bucket=8, t_bucket=32, batch_size=2,
        topk=None, feat_dtype="float32", compute_dtype=None,
        platforms="cpu")
    export_model.export_model(args)

    assert os.path.exists(os.path.join(out, "model.jaxexp"))
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["topk"] == 5 and manifest["platforms"] == ["cpu"]
    assert manifest["inputs"]["feats"][0] == [2, 8, 32, 24 + 8]

    # rebuild the identical model/params/batch (fully deterministic) and
    # compare the reloaded artifact against the live jitted step
    from vidsgg_big_tpu.utils.config import parse_config_py
    model, params, template, _ = export_model.build_model_and_params(
        args, parse_config_py(str(cfg_path))["model_config"])
    infer = build_infer_step(model, topk=5)
    live = jax.device_get(infer(params, template))

    serve, man2 = load_exported(out)
    served = jax.device_get(serve(template))

    assert man2["model"] == "bigc_vidvrd"
    live_leaves = jax.tree_util.tree_leaves(live)
    served_leaves = jax.tree_util.tree_leaves(served)
    assert len(live_leaves) == len(served_leaves)
    for a, b in zip(live_leaves, served_leaves):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.floating):
            # the AOT module may fuse differently from the live jit: float
            # leaves agree to rounding (measured max 4.5e-8), integer/bool
            # leaves (triplet ids, validity) must be identical
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
        else:
            np.testing.assert_array_equal(b, a)
