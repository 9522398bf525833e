"""Trajectory-level validation of the fused attention training path.

VERDICT r4 #5: the fused Pallas kernel (ops/pallas_attention.py) had
gradient parity at ONE step; training needs the property over a
trajectory.  Runs the kernel in Pallas interpret mode on CPU (bit-exact
kernel math, no TPU needed) at a 128-aligned small geometry:

* ``test_fused_vs_chunked_trajectory``: 12 Adam steps of the grounding
  model, fused vs chunked stored-A, identical data/init/rng streams
  (attention dropout 0 so the surviving dropout draws are common to both
  paths).  The kernel's f32 rounding (~1e-6 rel/call) amplifies through
  training dynamics, so a pointwise tolerance would test chaos, not the
  kernel; instead the fused-vs-chunked loss divergence is bounded by the
  divergence a deliberate 1e-5 *parameter* perturbation causes on the
  chunked path itself (the system's own Lyapunov envelope), plus strict
  early-step parity that any real gradient bug (mask handling, dropped
  terms, wrong scale) would blow past by orders of magnitude.

* ``test_transplant_through_fused``: torch grounding weights
  (reference models/grd_model_v5.py:140-193) transplanted and run through
  the *fused* kernel reproduce the reference regression/confidence/
  classification maps — the rest of the transplant suite only ever
  exercises the chunked CPU path.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidsgg_big_tpu.data.synthetic import make_video
from vidsgg_big_tpu.data.types import pack_gt, stack_batches
from vidsgg_big_tpu.models.grounding import GroundingConfig, GroundingModel

B, T, FEAT = 2, 128, 24

CFG_KW = dict(dim_feat=FEAT, dim_clsme=16, dim_hidden=128, num_bins=4,
              num_pred_cats=10, num_enti_cats=8, attn_dropout=0.0,
              attn_bytes_budget=1)


def _toy_inputs():
    rng = np.random.default_rng(3)
    vids = [make_video(7 + i, video_len=60, n_gt_trajs=4, n_preds=6,
                       num_enti_cats=8, num_pred_cats=10, feat_dim=4)
            for i in range(B)]
    gts = stack_batches([pack_gt(g, 6, 64, 8) for _, g in vids])
    n_clips = np.array([T - 9, T], np.int32)
    clip_mask = np.arange(T)[None, :] < n_clips[:, None]
    feats = (rng.normal(size=(B, T, FEAT)).astype(np.float32)
             * clip_mask[..., None])
    video_len = np.array([v[1].video_len for v in vids], np.int32)
    return (jnp.asarray(feats), jnp.asarray(clip_mask),
            jnp.asarray(n_clips), gts, jnp.asarray(video_len))


def _train(cfg, inputs, steps=12, perturb=0.0):
    import optax
    from vidsgg_big_tpu.train.grounding_steps import grounding_train_loss
    from vidsgg_big_tpu.train.grounding_data import prepare_grounding_gt

    feats, clip_mask, n_clips, gts, video_len = inputs
    model = GroundingModel(cfg)
    prep = jax.vmap(functools.partial(
        prepare_grounding_gt, num_pred_cats=cfg.num_pred_cats))(
        gts, video_len, rng=jax.random.split(jax.random.PRNGKey(0), B))
    params = model.init(jax.random.PRNGKey(1), feats, clip_mask,
                        prep["query_cats"], prep["temporal"],
                        prep["query_mask"])
    if perturb:
        leaves, tree = jax.tree_util.tree_flatten(params)
        ks = jax.random.split(jax.random.PRNGKey(9), len(leaves))
        leaves = [l + perturb * jax.random.normal(k, l.shape, l.dtype)
                  if jnp.issubdtype(l.dtype, jnp.floating) else l
                  for l, k in zip(leaves, ks)]
        params = jax.tree_util.tree_unflatten(tree, leaves)
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, rng):
        def loss_fn(p):
            return grounding_train_loss(model, p, feats, clip_mask, n_clips,
                                        gts, video_len, rng,
                                        deterministic=False)
        (total, _), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt2, total

    losses, k = [], jax.random.PRNGKey(42)
    for _ in range(steps):
        k, sk = jax.random.split(k)
        params, opt, total = step(params, opt, sk)
        losses.append(float(total))
    return np.asarray(losses)


@pytest.mark.slow
def test_fused_vs_chunked_trajectory():
    inputs = _toy_inputs()
    cfg_fused = GroundingConfig(**CFG_KW, fused_interpret=True)
    cfg_chunk = GroundingConfig(**CFG_KW, fused_attention=False)

    l_chunk = _train(cfg_chunk, inputs)
    l_fused = _train(cfg_fused, inputs)
    l_pert = _train(cfg_chunk, inputs, perturb=1e-5)

    # training must actually train (the bound below is vacuous otherwise)
    assert l_chunk[-1] < 0.6 * l_chunk[0]
    assert np.all(np.isfinite(l_fused)) and np.all(np.isfinite(l_pert))

    rel_fused = np.abs(l_fused - l_chunk) / np.abs(l_chunk)
    rel_pert = np.abs(l_pert - l_chunk) / np.abs(l_chunk)

    # strict early-step parity: a real gradient bug is orders of magnitude
    # bigger (measured: step0 bit-equal, step1 ~6e-7)
    assert rel_fused[0] < 1e-5, rel_fused
    assert rel_fused[1] < 1e-3, rel_fused

    # Lyapunov envelope: the fused path's accumulated divergence must stay
    # within (2x) the divergence the chunked path itself shows under a 1e-5
    # parameter perturbation (measured ratio ~0.37)
    assert rel_fused.sum() <= 2.0 * rel_pert.sum(), (rel_fused, rel_pert)


@pytest.mark.slow
def test_transplant_through_fused(reference_utils, tmp_path):
    """Torch grounding weights through the FUSED kernel == reference maps.

    Mirrors tests/test_transplant.py::test_grounding_forward_parity but at a
    fused-eligible geometry (d=128, T=128) with the kernel forced on via
    ``fused_interpret`` + a tiny ``attn_bytes_budget`` (the combined encoder
    runs B*Q=2 rows -> chunk=1 < b engages the budgeted branch).
    """
    import sys
    import torch

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
    ref = DEBUG(dict(dim_feat=24, dim_clsme=300, dim_hidden=128, num_bins=4,
                     loss_factor=dict(classification=1.0, centerness=1.0,
                                      regression=1.0),
                     EntiNameEmb_path=str(tmp_path / "enti.npy"),
                     PredNameEmb_path=str(tmp_path / "pred.npy")),
                is_train=False)
    ref.eval()

    cfg = GroundingConfig(dim_feat=24, dim_clsme=300, dim_hidden=128,
                          num_bins=4, num_pred_cats=51, num_enti_cats=81,
                          attn_bytes_budget=1, fused_interpret=True)
    model = GroundingModel(cfg)
    variables = grounding_params_from_torch(ref.state_dict())

    t, q = 128, 2
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
                               regrs_r.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(conf[0]), conf_r.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cls[0]), cls_r.numpy(),
                               rtol=2e-3, atol=2e-3)
