"""Whole-model parity vs the torch reference via weight transplant.

A randomly-initialized reference ``BIG_C`` (torch) is converted to flax
parameters with :mod:`vidsgg_big_tpu.models.transplant`; on shared random
videos the two implementations must agree on logits, soft adjacency, the
constructed triplet set, and the training loss (reference
models/model_0v10.py:369-388,434-507,642-785 and models/model_0v7.py).

The stretch target: the reference repeat-stretches every trajectory to the
video's own max_frames; exact parity therefore uses a T bucket equal to that
(one proposal is pinned to the full video length).
"""
import numpy as np
import pytest

from vidsgg_big_tpu.data.synthetic import make_video
from vidsgg_big_tpu.data.types import pack_proposal, pack_gt, stack_batches
from vidsgg_big_tpu.models import BigC, BigCConfig, construct_triplets
from vidsgg_big_tpu.models.transplant import bigc_params_from_torch
from vidsgg_big_tpu.train.losses import bigc_train_loss

pytestmark = pytest.mark.slow  # smoke tier: -m 'not slow' (see pytest.ini)

NUM_ENTI, NUM_PRED = 9, 11
T = 64                      # video length == stretch target on both sides
N_BUCKET = 12
DIM_CLSME = 16
BASE = dict(num_pred_cats=NUM_PRED, num_enti_cats=NUM_ENTI,
            dim_clsme=DIM_CLSME, dim_enti=32, dim_pred=32, dim_att=32,
            dim_ffn=48, enco_pool_len=4, n_enco_layers=2, n_deco_layers=2,
            n_att_head=4, num_querys=12)

CASES = [
    ("v10", dict(dim_feat=40, dim_i3d=8)),
    ("v10", dict(dim_feat=40, dim_i3d=None)),
    ("v7", dict(dim_feat=40, use_clsme=True, use_name_emb=True)),
    ("v7", dict(dim_feat=40, use_clsme=True, use_name_emb=False)),
    ("v7", dict(dim_feat=40, use_clsme=False, use_name_emb=False)),
    # the published VidOR geometry is depth-asymmetric: 6 encoder / 4
    # decoder layers (reference experiments/exp4/config_.py:14-15) — prove
    # the transplant/forward loops handle enc != dec counts
    ("v7", dict(dim_feat=40, use_clsme=False, use_name_emb=False,
                n_enco_layers=6, n_deco_layers=4)),
]


def _flax_cfg(variant, dim_feat, dim_i3d=None, use_clsme=True,
              use_name_emb=True, **arch):
    return BigCConfig(dim_feat=dim_feat, dim_i3d=dim_i3d, variant=variant,
                      use_clsme=use_clsme, use_name_emb=use_name_emb,
                      **dict(BASE, **arch))


def _feat_total(cfg: BigCConfig) -> int:
    return cfg.dim_feat + (cfg.dim_i3d or 0) + (
        DIM_CLSME if cfg.clsme_in_feats else 0)


def _videos(feat_dim, seeds=(3, 4)):
    rng = np.random.default_rng(77)
    out = []
    for s in seeds:
        p, g = make_video(s, video_len=T, feat_dim=feat_dim, n_gt_trajs=4,
                          n_preds=5, num_enti_cats=NUM_ENTI,
                          num_pred_cats=NUM_PRED)
        # pin proposal 0 to the full video so the reference's per-video
        # stretch target (its max_frames) equals our T bucket exactly
        lo = rng.uniform(0, 300, (T, 2)).astype(np.float32)
        sz = rng.uniform(10, 120, (T, 2)).astype(np.float32)
        p.boxes[0] = np.concatenate([lo, lo + sz], axis=1)
        p.features[0] = rng.normal(size=(T, feat_dim)).astype(np.float32)
        p.durations[0] = (0, T - 1)
        out.append((p, g))
    return out


def _torch_model(reference_bigc, tmp_path, variant, dim_feat, dim_i3d=None,
                 use_clsme=True, use_name_emb=True, seed=0, **arch):
    import torch
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed + 1)
    bias = rng.normal(0, 0.5, (NUM_ENTI, NUM_ENTI, NUM_PRED)).astype(
        np.float32)
    emb = rng.normal(0, 1, (NUM_ENTI, DIM_CLSME)).astype(np.float32)
    bias_path = tmp_path / f"bias_{variant}_{seed}.npy"
    emb_path = tmp_path / f"emb_{variant}_{seed}.npy"
    np.save(bias_path, bias)
    np.save(emb_path, emb)
    cfgd = dict(BASE, **arch, dim_feat=dim_feat, neg_weight=0.1,
                positive_vIoU_th=0.5,
                cost_coeff_dict=dict(classification=1.0, adj_matrix=30.0),
                loss_coeff_dict=dict(classification=1.0, adj_matrix=30.0),
                bias_matrix_path=str(bias_path))
    if variant == "v10":
        cfgd["EntiNameEmb_path"] = str(emb_path)
        if dim_i3d:
            cfgd["dim_i3d"] = dim_i3d
    else:
        cfgd["use_clsme"] = use_clsme
        cfgd["EntiNameEmb_path"] = (
            str(emb_path) if (use_clsme and use_name_emb) else None)
    model = reference_bigc[variant](cfgd, is_train=True)
    model.eval()
    return model


def _duck_proposal(rec):
    import torch

    class P:
        pass

    p = P()
    p.video_name, p.video_len = rec.video_name, rec.video_len
    p.video_wh = rec.video_wh
    p.num_proposals = rec.num_proposals
    p.cat_ids = torch.tensor(np.asarray(rec.cat_ids), dtype=torch.long)
    p.scores = torch.tensor(np.asarray(rec.scores))
    p.traj_durations = torch.tensor(np.asarray(rec.durations),
                                    dtype=torch.long)
    p.bboxes_list = [torch.tensor(b) for b in rec.boxes]
    p.features_list = [torch.tensor(f) for f in rec.features]
    return p


def _duck_gt(g):
    import torch

    class G:
        pass

    r = G()
    r.pred_cat_ids = torch.tensor(np.asarray(g.pred_cat_ids),
                                  dtype=torch.long)
    r.adj_matrix = torch.tensor(np.asarray(g.adj))
    r.traj_bboxes = [torch.tensor(b) for b in g.traj_boxes]
    # reference VideoGraph carries half-open GT traj durations and converts
    # in-place inside enti_viou_align (model_0v10.py:568)
    half_open = np.stack(
        [g.traj_durations[:, 0], g.traj_durations[:, 1] + 1], axis=1)
    r.traj_durations = torch.tensor(half_open, dtype=torch.long)
    return r


def _transplanted(reference_bigc, tmp_path, variant, kw):
    tmodel = _torch_model(reference_bigc, tmp_path, variant, **kw)
    cfg = _flax_cfg(variant, **kw)
    variables, tables = bigc_params_from_torch(tmodel.state_dict(), cfg)
    model = BigC(cfg, enti_name_emb=tables["enti_name_emb"],
                 pos_emb_table=tables["pos_emb_table"])
    vids = _videos(_feat_total(cfg))
    batch = stack_batches(
        [pack_proposal(p, N_BUCKET, T, _feat_total(cfg)) for p, _ in vids])
    out = model.apply(variables, batch)
    return tmodel, cfg, model, variables, vids, batch, out


@pytest.mark.parametrize("variant,kw", CASES,
                         ids=["v10_i3d", "v10", "v7_emb", "v7_clsme",
                              "v7_noclsme", "v7_enc6dec4"])
def test_forward_parity(reference_bigc, tmp_path, variant, kw):
    import torch
    tmodel, cfg, model, variables, vids, batch, out = _transplanted(
        reference_bigc, tmp_path, variant, kw)
    for i, (p, _) in enumerate(vids):
        with torch.no_grad():
            _, logits_ref, att_ref = tmodel.encode2decode(_duck_proposal(p))
        n = p.num_proposals
        np.testing.assert_allclose(
            np.asarray(out["pred_logits"][i]), logits_ref.numpy(),
            rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(out["att"][i][:, :, :n]), att_ref.numpy(),
            rtol=1e-3, atol=1e-5)
        assert np.abs(np.asarray(out["att"][i][:, :, n:])).max() == 0


def test_triplet_parity(reference_bigc, tmp_path):
    """construct_triplet output sets match exactly (flagship v10 + i3d)."""
    import torch
    variant, kw = CASES[0]
    tmodel, cfg, model, variables, vids, batch, out = _transplanted(
        reference_bigc, tmp_path, variant, kw)
    tmodel.topk = 3
    for i, (p, _) in enumerate(vids):
        with torch.no_grad():
            _, logits_ref, att_ref = tmodel.encode2decode(_duck_proposal(p))
            ret = tmodel.construct_triplet(
                _duck_proposal(p), logits_ref, att_ref)
        assert ret is not None
        quint_r, scores_r, dura_r, qid_r = [x.numpy() for x in ret]
        expect = {tuple(int(v) for v in quint_r[j]):
                  (scores_r[j], dura_r[j], int(qid_r[j]))
                  for j in range(quint_r.shape[0])}

        trip = construct_triplets(
            out["pred_logits"][i], out["att"][i], batch.durations[i],
            batch.scores[i], batch.cat_ids[i], batch.traj_mask[i],
            topk=3, num_enti_cats=NUM_ENTI, num_pred_cats=NUM_PRED)
        got = {}
        tq, ts = np.asarray(trip.quintuples), np.asarray(trip.scores)
        td, tqid = np.asarray(trip.dura_inters), np.asarray(trip.query_ids)
        for j in np.nonzero(np.asarray(trip.valid))[0]:
            got[tuple(int(v) for v in tq[j])] = (ts[j], td[j], int(tqid[j]))

        assert set(got) == set(expect)
        for k, (sc, du, qi) in expect.items():
            np.testing.assert_allclose(got[k][0], sc, rtol=1e-3, atol=1e-5)
            np.testing.assert_array_equal(got[k][1], du)
            assert got[k][2] == qi


@pytest.mark.parametrize("use_name_emb", [True, False],
                         ids=["name_emb", "soft_clsme"])
def test_basec_forward_parity(reference_utils, tmp_path, use_name_emb):
    """Base-C pairwise-baseline forward parity via weight transplant
    (reference models/model_pairwise_baseline.py:174-273)."""
    import sys
    import torch

    from vidsgg_big_tpu.models.base_c import (BaseC, BaseCConfig,
                                              ordered_pair_ids)
    from vidsgg_big_tpu.models.transplant import basec_params_from_torch

    sys.path.insert(0, "/root/reference")
    try:
        from models.model_pairwise_baseline import Base_C
    finally:
        sys.path.remove("/root/reference")

    rng = np.random.default_rng(9)
    dim_feat = 40
    bias = rng.normal(0, 0.5, (NUM_ENTI, NUM_ENTI, NUM_PRED)).astype(
        np.float32)
    emb = rng.normal(0, 1, (NUM_ENTI, DIM_CLSME)).astype(np.float32)
    np.save(tmp_path / "bias_bc.npy", bias)
    np.save(tmp_path / "emb_bc.npy", emb)
    torch.manual_seed(11)
    ref_cfg = dict(num_pred_cats=NUM_PRED, num_enti_cats=NUM_ENTI,
                   dim_feat=dim_feat, dim_clsme=DIM_CLSME, dim_enti=32,
                   dim_ffn=48, enco_pool_len=4, use_clsme=True,
                   rt_triplets_topk=0, positive_vIoU_th=0.5,
                   bias_matrix_path=str(tmp_path / "bias_bc.npy"),
                   EntiNameEmb_path=(str(tmp_path / "emb_bc.npy")
                                     if use_name_emb else None))
    tmodel = Base_C(ref_cfg, is_train=False)
    tmodel.eval()

    cfg = BaseCConfig.from_dict(ref_cfg)
    assert cfg.use_name_emb == use_name_emb
    variables, tables = basec_params_from_torch(tmodel.state_dict(), cfg)
    model = BaseC(cfg, enti_name_emb=tables["enti_name_emb"])

    feat_total = dim_feat + (0 if use_name_emb else DIM_CLSME)
    vids = _videos(feat_total)
    batch = stack_batches(
        [pack_proposal(p, N_BUCKET, T, feat_total) for p, _ in vids])
    out = model.apply(variables, batch)

    for i, (p, _) in enumerate(vids):
        n = p.num_proposals
        with torch.no_grad():
            pair_ids_t = tmodel.trajid2pairid(n)
            logits_ref = tmodel.forward_propagation(
                _duck_proposal(p), pair_ids_t)
        # our fixed-shape pair enumeration covers N_BUCKET trajs; select the
        # rows whose (sub, obj) are both real and match the reference order
        pids = np.asarray(ordered_pair_ids(N_BUCKET))
        keep = (pids[:, 0] < n) & (pids[:, 1] < n)
        ours = np.asarray(out["pred_logits"][i])[keep]
        order_ref = pair_ids_t.numpy()
        # both enumerations are row-major over (i, j) i != j -> same order
        np.testing.assert_array_equal(pids[keep], order_ref)
        np.testing.assert_allclose(ours, logits_ref.numpy(),
                                   rtol=5e-4, atol=5e-4)


def test_grounding_forward_parity(reference_utils, tmp_path):
    """Whole grounding-model (DEBUG) forward parity via weight transplant.

    A randomly-initialized reference ``DEBUG`` (reference
    models/grd_model_v5.py:140-193, eval mode) against our batched
    :class:`GroundingModel` on the same videos/queries: regression,
    confidence, and classification maps must match.  The reference hard-
    asserts the VidOR vocabulary (81 entities / 51 predicates, 300-d GloVe),
    so the test uses those table shapes with small hidden dims.
    """
    import sys
    import torch

    from vidsgg_big_tpu.models.grounding import (GroundingConfig,
                                                 GroundingModel)
    from vidsgg_big_tpu.models.transplant import grounding_params_from_torch

    sys.path.insert(0, "/root/reference")
    try:
        from models.grd_model_v5 import DEBUG
    finally:
        sys.path.remove("/root/reference")

    rng = np.random.default_rng(5)
    enti = rng.normal(0, 1, (81, 300)).astype(np.float32)
    pred = rng.normal(0, 1, (51, 300)).astype(np.float32)
    np.save(tmp_path / "enti.npy", enti)
    np.save(tmp_path / "pred.npy", pred)
    torch.manual_seed(3)
    ref = DEBUG(dict(dim_feat=24, dim_clsme=300, dim_hidden=32, num_bins=4,
                     loss_factor=dict(classification=1.0, centerness=1.0,
                                      regression=1.0),
                     EntiNameEmb_path=str(tmp_path / "enti.npy"),
                     PredNameEmb_path=str(tmp_path / "pred.npy")),
                is_train=False)
    ref.eval()

    cfg = GroundingConfig(dim_feat=24, dim_clsme=300, dim_hidden=32,
                          num_bins=4, num_pred_cats=51, num_enti_cats=81)
    model = GroundingModel(cfg)
    variables = grounding_params_from_torch(ref.state_dict())

    t, q = 19, 6
    feats = rng.normal(size=(1, t, 24)).astype(np.float32)
    cats = rng.integers(1, 50, size=(1, q, 3)).astype(np.int32)
    lo = rng.uniform(0, 0.5, size=(1, q, 1))
    temporal = np.concatenate(
        [lo, lo + rng.uniform(0.1, 0.5, size=(1, q, 1))], -1).astype(
            np.float32)

    regrs, conf, cls = model.apply(
        variables, feats, np.ones((1, t), bool), cats, temporal,
        np.ones((1, q), bool))

    with torch.no_grad():
        words = torch.stack(
            [torch.tensor(enti[cats[0, :, 0]]),
             torch.tensor(pred[cats[0, :, 1]]),
             torch.tensor(enti[cats[0, :, 2]])], dim=1)      # (Q, 3, 300)
        regrs_r, conf_r, cls_r = ref.forward_propagation(
            torch.tensor(feats[0]), words, torch.tensor(temporal[0]))

    k = cfg.num_bins
    np.testing.assert_allclose(np.asarray(regrs[0]).reshape(q, t, 2 * k),
                               regrs_r.numpy(), rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(conf[0]), conf_r.numpy(),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(cls[0]), cls_r.numpy(),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("case", [0, 2, 5],
                         ids=["v10_i3d", "v7_emb", "v7_enc6dec4"])
def test_convert_checkpoint_cli_roundtrip(reference_bigc, tmp_path, case):
    """tools/convert_checkpoint.py: reference .pth (DataParallel prefixes +
    training-dict wrapper) -> orbax checkpoint + tables.npz; the restored
    params equal the direct transplant bit-for-bit (v7 also carries its
    frozen random pos-embedding table out through tables.npz)."""
    import argparse
    import os
    import sys

    import jax
    import jax.numpy as jnp
    import torch

    from vidsgg_big_tpu.models.transplant import strip_module_prefix
    from vidsgg_big_tpu.train.train_state import (
        make_optimizer, create_train_state, load_checkpoint)

    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    sys.path.insert(0, tools)
    try:
        import convert_checkpoint as cc
    finally:
        sys.path.remove(tools)

    variant, kw = CASES[case]                    # v10+i3d or v7+name-emb
    tmodel = _torch_model(reference_bigc, tmp_path, variant, **kw)
    sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
    pth = tmp_path / "ref_epoch3.pth"
    torch.save({"model_state_dict": sd, "crt_epoch": 3, "batch_size": 4},
               pth)
    i3d = ", dim_i3d=8" if kw.get("dim_i3d") else ""
    emb = ""
    if variant == "v7" and kw.get("use_name_emb", True):
        np.save(tmp_path / "emb.npy",
                np.zeros((NUM_ENTI, DIM_CLSME), np.float32))
        emb = f", EntiNameEmb_path={str(tmp_path / 'emb.npy')!r}"
    n_enc = kw.get("n_enco_layers", BASE["n_enco_layers"])
    n_dec = kw.get("n_deco_layers", BASE["n_deco_layers"])
    cfgf = tmp_path / "config_.py"
    cfgf.write_text(
        f"model_config = dict(num_pred_cats={NUM_PRED}, "
        f"num_enti_cats={NUM_ENTI}, dim_feat=40, dim_clsme={DIM_CLSME}, "
        "dim_enti=32, dim_pred=32, dim_att=32, dim_ffn=48, "
        f"enco_pool_len=4, n_enco_layers={n_enc}, n_deco_layers={n_dec}, "
        "n_att_head=4, "
        f"num_querys=12, use_clsme={kw.get('use_clsme', True)}{i3d}{emb})\n")
    out = tmp_path / "converted"
    cc.convert(argparse.Namespace(
        torch_ckpt=str(pth), cfg_path=str(cfgf),
        model="bigc_vidvrd" if variant == "v10" else "bigc_vidor",
        out=str(out), legacy_keys=False))

    cfg = _flax_cfg(variant, **kw)
    variables, tables = bigc_params_from_torch(
        strip_module_prefix(sd), cfg)
    tx, _ = make_optimizer(1e-4, 0.2, [1])
    template = create_train_state(
        jax.tree_util.tree_map(jnp.zeros_like, variables), tx)
    state, step = load_checkpoint(str(out), template)
    assert step == 0
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t = np.load(out / "tables.npz")
    if tables.get("enti_name_emb") is not None:
        np.testing.assert_array_equal(t["enti_name_emb"],
                                      tables["enti_name_emb"])
    if variant == "v7":
        np.testing.assert_array_equal(t["pos_emb_table"],
                                      tables["pos_emb_table"])


def test_converted_checkpoint_drives_eval_cli(reference_bigc, tmp_path):
    """The migration user story end-to-end: reference .pth -> converter ->
    eval_vidvrd --ckpt_path/--tables_path runs inference + metrics."""
    import argparse
    import os
    import sys

    import torch

    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    repo = os.path.dirname(tools)
    sys.path.insert(0, tools)
    try:
        import convert_checkpoint as cc
        import eval_vidvrd
    finally:
        sys.path.remove(tools)

    # torch reference at the demo config's dims (synthetic-writer defaults)
    rng = np.random.default_rng(21)
    np.save(tmp_path / "emb36.npy",
            rng.normal(0, 1, (36, 300)).astype(np.float32))
    np.save(tmp_path / "bias36.npy",
            rng.normal(0, 0.2, (36, 36, 133)).astype(np.float32))
    cfgd = dict(num_enti_cats=36, num_pred_cats=133, dim_ffn=64, dim_enti=64,
                dim_pred=64, dim_att=64, dim_feat=64, dim_clsme=300,
                dim_i3d=16, enco_pool_len=4, n_enco_layers=1,
                n_deco_layers=2, n_att_head=4, num_querys=48, neg_weight=0.1,
                positive_vIoU_th=0.5,
                EntiNameEmb_path=str(tmp_path / "emb36.npy"),
                bias_matrix_path=str(tmp_path / "bias36.npy"),
                cost_coeff_dict=dict(classification=1.0, adj_matrix=30.0),
                loss_coeff_dict=dict(classification=1.0, adj_matrix=30.0))
    torch.manual_seed(5)
    tmodel = reference_bigc["v10"](cfgd, is_train=False)
    pth = tmp_path / "ref.pth"
    torch.save(tmodel.state_dict(), pth)

    demo_cfg = os.path.join(repo, "experiments", "demo", "config_smoke_.py")
    out = tmp_path / "converted"
    cc.convert(argparse.Namespace(
        torch_ckpt=str(pth), cfg_path=demo_cfg, model="bigc_vidvrd",
        out=str(out), legacy_keys=False))

    res = eval_vidvrd.inference_then_eval(argparse.Namespace(
        cfg_path=demo_cfg, ckpt_path=str(out),
        tables_path=str(out / "tables.npz"), use_pku=True, fmt="pku_i3d",
        save_tag="cvt", output_dir=str(tmp_path), topk=3, batch_size=2,
        gt_json=None, json_results_path=None, save_infer_result=False,
        save_json_results=False, data_parallel=False, feat_dtype="float32",
        synthetic=3, synthetic_root=str(tmp_path / "syn"),
        synthetic_model_dims=False, compute_dtype=None))
    mean_ap, rec_at_n, mprec_at_n = res
    assert np.isfinite(mean_ap)
    assert set(rec_at_n) == {50, 100}


def test_legacy_key_migration():
    """Historical reference key scheme -> released scheme (reference
    tools/eval_vidvrd_our_gt.py:186-207)."""
    import os
    import sys

    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    sys.path.insert(0, tools)
    try:
        from convert_checkpoint import replace_legacy_keys
    finally:
        sys.path.remove(tools)

    old = {
        "pred_nodes_init": 1,
        "decoder_layers.0.fc_msg_recv.0.0.weight": 2,
        "fc_enti2enco.layers.0.weight": 3,
        "fc_pred2logits.0.weight": 4,
        "encoder_layers.0.linear1.weight": 5,
    }
    new = replace_legacy_keys(old)
    assert new == {
        "pred_query_init": 1,
        "decoder_layers.0.fc_rolewise.0.0.weight": 2,
        "fc_enti2enco.0.weight": 3,
        "fc_pred2logits.weight": 4,
        "encoder_layers.0.linear1.weight": 5,
    }


@pytest.mark.parametrize("variant,kw", [CASES[0], CASES[2]],
                         ids=["v10_i3d", "v7_emb"])
def test_train_loss_parity(reference_bigc, tmp_path, variant, kw):
    """Whole train-step objective equality (matching + CE + weighted BCE)."""
    import torch
    tmodel, cfg, model, variables, vids, batch, out = _transplanted(
        reference_bigc, tmp_path, variant, kw)
    with torch.no_grad():
        total_ref, ld_ref = tmodel([_duck_proposal(p) for p, _ in vids],
                                   [_duck_gt(g) for _, g in vids])
    gts = stack_batches(
        [pack_gt(g, g_bucket=6, tg_bucket=T, p_bucket=8) for _, g in vids])
    total, ld = bigc_train_loss(out, batch, gts, cfg)
    np.testing.assert_allclose(float(total), float(total_ref), rtol=3e-4)
    for k in ("cls_pos", "cls_neg", "adj"):
        np.testing.assert_allclose(float(ld[k]), float(ld_ref[k]), rtol=3e-4,
                                   err_msg=k)


@pytest.mark.parametrize("variant,kw", [CASES[0], CASES[2]],
                         ids=["v10_i3d", "v7_emb"])
def test_gradient_parity(reference_bigc, tmp_path, variant, kw):
    """Training-dynamics parity, part 1: d(total loss)/d(params) equals
    torch autograd through the reference model.

    The transplant mapping is per-tensor linear (transpose/reshape/slice),
    so running the torch ``.grad`` tensors through the same mapping yields
    the gradients in our parameter layout; frozen reference tables
    (EntiNameEmb, v7 pos_embedding — requires_grad=False, reference
    models/model_0v10.py:268 / model_0v7.py:273,286) fall out into the
    constructor tables on both sides.
    """
    import jax
    import torch
    tmodel, cfg, model, variables, vids, batch, out = _transplanted(
        reference_bigc, tmp_path, variant, kw)

    total_ref, _ = tmodel([_duck_proposal(p) for p, _ in vids],
                          [_duck_gt(g) for _, g in vids])
    total_ref.backward()
    grad_sd = {k: (p.grad if p.grad is not None else torch.zeros_like(p))
               for k, p in tmodel.named_parameters()}
    grad_ref, _ = bigc_params_from_torch(grad_sd, cfg)

    gts = stack_batches(
        [pack_gt(g, g_bucket=6, tg_bucket=T, p_bucket=8) for _, g in vids])

    def objective(v):
        return bigc_train_loss(model.apply(v, batch), batch, gts, cfg)[0]

    grad_ours = jax.grad(objective)(variables)

    import flax
    flat_ours = flax.traverse_util.flatten_dict(grad_ours["params"])
    flat_ref = flax.traverse_util.flatten_dict(grad_ref["params"])
    assert set(flat_ours) == set(flat_ref)
    for k in sorted(flat_ours):
        ref = np.asarray(flat_ref[k], np.float64)
        got = np.asarray(flat_ours[k], np.float64)
        # near-zero elements carry fp noise with large *relative* error;
        # bound them by a per-tensor absolute floor instead
        scale = max(1e-3, float(np.abs(ref).max()))
        np.testing.assert_allclose(
            got, ref, rtol=2e-3, atol=1e-3 * scale,
            err_msg="/".join(k))
        # direction check for tensors with a real gradient signal (e.g. the
        # key-projection *bias* has a mathematically-zero gradient — softmax
        # is shift-invariant — leaving pure fp noise there)
        if np.linalg.norm(ref) > 1e-4:
            cos = float((ref * got).sum() /
                        (np.linalg.norm(ref) * np.linalg.norm(got)))
            assert cos > 0.9999, ("/".join(k), cos)


def test_optimizer_trajectory_parity():
    """Training-dynamics parity, part 2: the optimizer chain (global-norm
    clip 5.0 -> Adam -> per-iteration MultiStepLR; reference
    tools/train_vidvrd.py:123-164) produces torch-identical parameter
    trajectories — including a step whose gradient norm exceeds the clip
    and the lr-milestone crossing."""
    import jax
    import jax.numpy as jnp
    import torch
    import optax
    from vidsgg_big_tpu.train.train_state import make_optimizer

    rng = np.random.default_rng(0)
    shapes = {"a": (7,), "b": (3, 5)}
    p0 = {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
    # step 2 has an oversized gradient so the global-norm clip engages
    grads = [{k: (rng.normal(size=s) * (10.0 if i == 2 else 1.0)).astype(
        np.float32) for k, s in shapes.items()} for i in range(6)]
    lr, gamma, milestone = 0.1, 0.2, 4

    tparams = {k: torch.nn.Parameter(torch.tensor(v.copy()))
               for k, v in p0.items()}
    opt = torch.optim.Adam(list(tparams.values()), lr=lr)
    sch = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[milestone], gamma=gamma)
    t_traj = []
    for g in grads:
        opt.zero_grad()
        for k in tparams:
            tparams[k].grad = torch.tensor(g[k].copy())
        torch.nn.utils.clip_grad_norm_(list(tparams.values()), 5.0)
        opt.step()
        sch.step()
        t_traj.append({k: v.detach().numpy().copy()
                       for k, v in tparams.items()})

    tx, _ = make_optimizer(lr, gamma, [milestone])
    params = {k: jnp.asarray(v) for k, v in p0.items()}
    state = tx.init(params)
    for i, g in enumerate(grads):
        upd, state = tx.update({k: jnp.asarray(v) for k, v in g.items()},
                               state, params)
        params = optax.apply_updates(params, upd)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(params[k]), t_traj[i][k], rtol=2e-5, atol=1e-6,
                err_msg=f"step {i} param {k}")


def test_convert_checkpoint_cli_grounding_roundtrip(reference_utils,
                                                    tmp_path):
    """tools/convert_checkpoint.py --model grounding: reference DEBUG .pth
    (training-dict wrapper + DataParallel prefixes) -> orbax checkpoint; the
    restored params equal the direct transplant bit-for-bit, INCLUDING the
    raw-kernel attention containers (_DenseGeneralParams) the fused kernel
    consumes — the rehearsal kit (scripts/rehearse_real_data.sh) drives the
    fused TPU path through exactly this conversion."""
    import argparse
    import os
    import sys

    import jax
    import jax.numpy as jnp
    import torch

    from vidsgg_big_tpu.models.transplant import grounding_params_from_torch
    from vidsgg_big_tpu.train.train_state import (
        make_optimizer, create_train_state, load_checkpoint)

    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    sys.path.insert(0, tools)
    try:
        import convert_checkpoint as cc
    finally:
        sys.path.remove(tools)

    sys.path.insert(0, "/root/reference")
    try:
        from models.grd_model_v5 import DEBUG
    finally:
        sys.path.remove("/root/reference")

    rng = np.random.default_rng(11)
    np.save(tmp_path / "enti.npy",
            rng.normal(0, 1, (81, 300)).astype(np.float32))
    np.save(tmp_path / "pred.npy",
            rng.normal(0, 1, (51, 300)).astype(np.float32))
    torch.manual_seed(7)
    ref = DEBUG(dict(dim_feat=24, dim_clsme=300, dim_hidden=32, num_bins=4,
                     loss_factor=dict(classification=1.0, centerness=1.0,
                                      regression=1.0),
                     EntiNameEmb_path=str(tmp_path / "enti.npy"),
                     PredNameEmb_path=str(tmp_path / "pred.npy")),
                is_train=False)
    sd = {"module." + k: v for k, v in ref.state_dict().items()}
    pth = tmp_path / "grd_epoch70.pth"
    torch.save({"model_state_dict": sd, "crt_epoch": 70}, pth)

    cfgf = tmp_path / "config_.py"
    cfgf.write_text(
        "model_config = dict(dim_feat=24, dim_clsme=300, dim_hidden=32, "
        "num_bins=4, loss_factor=dict(classification=1.0, centerness=1.0, "
        "regression=1.0), "
        f"EntiNameEmb_path={str(tmp_path / 'enti.npy')!r}, "
        f"PredNameEmb_path={str(tmp_path / 'pred.npy')!r})\n")
    out = tmp_path / "converted"
    cc.convert(argparse.Namespace(
        torch_ckpt=str(pth), cfg_path=str(cfgf), model="grounding",
        out=str(out), legacy_keys=False))

    variables = grounding_params_from_torch(ref.state_dict())
    tx, _ = make_optimizer(1e-4, 0.2, [1])
    template = create_train_state(
        jax.tree_util.tree_map(jnp.zeros_like, variables), tx)
    state, step = load_checkpoint(str(out), template)
    assert step == 0
    flat_a = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(variables)[0]
    assert len(flat_a) == len(flat_b)
    n_raw_attn = 0
    for (ka, a), (kb, b) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        if "attn_" in jax.tree_util.keystr(ka):
            n_raw_attn += 1
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(ka))
    # the three QANet encoders' raw q/k/v/out containers all round-tripped
    assert n_raw_attn == 3 * 4 * 2
