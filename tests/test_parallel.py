import numpy as np
import jax
import pytest


def test_eight_cpu_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_sharded_train_step_runs_and_matches_single_device():
    """Data-parallel train step over an 8-device mesh: runs, finite loss, and
    the result equals the unsharded computation (GSPMD correctness)."""
    import __graft_entry__ as ge
    from vidsgg_big_tpu.parallel.mesh import make_mesh, shard_batch
    from vidsgg_big_tpu.train.train_state import (
        make_optimizer, create_train_state)
    from vidsgg_big_tpu.train.steps import build_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, cfg = ge._flagship(feat_dim=16, dim=16, n_enco=1, n_deco=1,
                              num_querys=8, heads=2, dim_i3d=4,
                              num_enti=8, num_pred=6)
    props, gts = ge._batch(8, n_bucket=8, t_bucket=16, feat_total=20,
                           num_enti=8, num_pred=6, video_len=40)
    params = model.init(jax.random.PRNGKey(0), props)
    tx, _ = make_optimizer(1e-4, 0.2, [100])
    rng = jax.random.PRNGKey(1)

    # single-device
    state1 = create_train_state(params, tx)
    step1 = build_train_step(model, tx, donate=False)
    state1, m1 = step1(state1, props, gts, rng)

    # sharded
    mesh = make_mesh(8)
    props_s = shard_batch(props, mesh)
    gts_s = shard_batch(gts, mesh)
    params_s = jax.device_put(params, NamedSharding(mesh, P()))
    state8 = create_train_state(params_s, tx)
    state8 = jax.device_put(state8, NamedSharding(mesh, P()))
    step8 = build_train_step(model, tx, mesh=mesh, donate=False)
    state8, m8 = step8(state8, props_s, gts_s, rng)

    np.testing.assert_allclose(float(m1["total"]), float(m8["total"]),
                               rtol=1e-4)
    # parameters after the update agree
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_sharded_grounding_step_matches_single_device():
    """Data-parallel grounding (stage 2) train step over the 8-device mesh
    equals the single-device computation."""
    import jax.numpy as jnp
    from vidsgg_big_tpu.data.synthetic import make_video
    from vidsgg_big_tpu.data.types import pack_gt, stack_batches
    from vidsgg_big_tpu.models.grounding import (GroundingConfig,
                                                 GroundingModel)
    from vidsgg_big_tpu.parallel.mesh import make_mesh, shard_batch
    from vidsgg_big_tpu.train.train_state import (
        make_optimizer, create_train_state)
    from vidsgg_big_tpu.train.grounding_steps import (
        build_grounding_train_step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    b, t = 8, 16
    rng_np = np.random.default_rng(4)
    vids = [make_video(20 + i, video_len=48, n_gt_trajs=4, n_preds=6,
                       num_enti_cats=8, num_pred_cats=10, feat_dim=4)
            for i in range(b)]
    gts = stack_batches([pack_gt(g, 6, 64, 8) for _, g in vids])
    video_len = jnp.asarray([v[1].video_len for v in vids], jnp.int32)
    n_clips = jnp.asarray(rng_np.integers(t - 4, t + 1, b), jnp.int32)
    clip_mask = jnp.arange(t)[None, :] < n_clips[:, None]
    feats = jnp.asarray(rng_np.normal(size=(b, t, 12)), jnp.float32)
    feats = feats * clip_mask[..., None]

    cfg = GroundingConfig(dim_feat=12, dim_clsme=16, dim_hidden=16,
                          num_bins=4, num_pred_cats=10, num_enti_cats=8)
    model = GroundingModel(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, clip_mask,
                        jnp.zeros((b, 8, 3), jnp.int32),
                        jnp.zeros((b, 8, 2), jnp.float32),
                        jnp.ones((b, 8), bool))
    tx, _ = make_optimizer(1e-4, 0.2, [100])
    rng = jax.random.PRNGKey(7)

    state1 = create_train_state(params, tx)
    step1 = build_grounding_train_step(model, tx, donate=False)
    state1, m1 = step1(state1, feats, clip_mask, n_clips, gts, video_len,
                       rng)

    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    state8 = jax.device_put(create_train_state(params, tx), repl)
    step8 = build_grounding_train_step(model, tx, mesh=mesh, donate=False)
    state8, m8 = step8(state8, *shard_batch(
        (feats, clip_mask, n_clips, gts, video_len), mesh), rng)

    assert np.isfinite(float(m1["total"]))
    np.testing.assert_allclose(float(m1["total"]), float(m8["total"]),
                               rtol=1e-4)
    # atol: zero-init leaves see noise-level gradients, where Adam's
    # rsqrt(v) amplifies f32 reduction-order differences on step 1
    for a, c in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-3, atol=5e-5)


@pytest.mark.slow
def test_elastic_checkpoint_across_meshes(tmp_path):
    """Elastic resume: a checkpoint saved under a 4x2 TP mesh restores
    bit-equal under an 8x1 data mesh, a single device, and a *different*
    2x4 TP layout — and keeps training under the new mesh.  This is the
    train CLIs' --mesh resume path (the orbax template's shardings drive
    placement; checkpoint values are mesh-invariant because save_checkpoint
    host-gathers)."""
    import __graft_entry__ as ge
    from vidsgg_big_tpu.parallel.mesh import (make_mesh, shard_batch,
                                              replicated)
    from vidsgg_big_tpu.parallel.sharding import (
        make_mesh_2d, shard_params, state_shardings)
    from vidsgg_big_tpu.train.train_state import (
        make_optimizer, create_train_state, save_checkpoint, load_checkpoint)
    from vidsgg_big_tpu.train.steps import build_train_step

    model, cfg = ge._flagship(feat_dim=16, dim=16, n_enco=1, n_deco=1,
                              num_querys=8, heads=2, dim_i3d=4,
                              num_enti=8, num_pred=6)
    props, gts = ge._batch(4, n_bucket=8, t_bucket=16, feat_total=20,
                           num_enti=8, num_pred=6, video_len=40)
    params = model.init(jax.random.PRNGKey(0), props)
    tx, _ = make_optimizer(1e-4, 0.2, [100])
    rng = jax.random.PRNGKey(1)

    # train one step under mesh A = 4x2 (TP): moments become non-trivial
    mesh_a = make_mesh_2d(4, 2)
    state = jax.jit(lambda p: create_train_state(p, tx))(
        shard_params(params, mesh_a))
    step_a = build_train_step(model, tx, mesh=mesh_a, donate=False,
                              state_shardings=state_shardings(state))
    state, _ = step_a(state, shard_batch(props, mesh_a),
                      shard_batch(gts, mesh_a), rng)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, jax.device_get(state), int(state.step), epoch=1)
    ref = [np.asarray(x) for x in
           jax.tree_util.tree_leaves(jax.device_get(state))]

    def assert_equal(restored):
        got = [np.asarray(x) for x in
               jax.tree_util.tree_leaves(jax.device_get(restored))]
        assert len(got) == len(ref)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a, b)

    # mesh B = 8x1 data mesh, replicated params
    mesh_b = make_mesh(8)
    tmpl_b = jax.device_put(create_train_state(params, tx),
                            replicated(mesh_b))
    restored_b, step_no = load_checkpoint(ckpt, tmpl_b)
    assert step_no == int(state.step)
    assert_equal(restored_b)

    # single device (no mesh)
    restored_1, _ = load_checkpoint(ckpt, create_train_state(params, tx))
    assert_equal(restored_1)

    # mesh C = 2x4: a *different* TP layout; restored shards land in it and
    # the state keeps training there
    mesh_c = make_mesh_2d(2, 4)
    tmpl_c = jax.jit(lambda p: create_train_state(p, tx))(
        shard_params(params, mesh_c))
    restored_c, _ = load_checkpoint(ckpt, tmpl_c)
    assert_equal(restored_c)
    n_sharded = sum(1 for l in jax.tree_util.tree_leaves(restored_c.params)
                    if any(s is not None for s in l.sharding.spec))
    assert n_sharded >= 8
    step_c = build_train_step(model, tx, mesh=mesh_c, donate=False,
                              state_shardings=state_shardings(restored_c))
    restored_c, m_c = step_c(restored_c, shard_batch(props, mesh_c),
                             shard_batch(gts, mesh_c), rng)
    assert np.isfinite(float(m_c["total"]))
    assert int(restored_c.step) == step_no + 1


def test_milestone_schedule():
    from vidsgg_big_tpu.train.train_state import milestone_schedule
    s = milestone_schedule(1e-4, 0.2, [10, 20])
    assert float(s(0)) == pytest.approx(1e-4)
    assert float(s(10)) == pytest.approx(2e-5)
    assert float(s(25)) == pytest.approx(4e-6)


def test_sharded_inference_matches_single_device():
    """Mesh-sharded bucketed inference (the eval CLIs' --data_parallel path)
    equals the single-device triplet output."""
    import __graft_entry__ as ge
    from vidsgg_big_tpu.parallel.mesh import make_mesh, shard_batch
    from vidsgg_big_tpu.train.steps import build_infer_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, cfg = ge._flagship(feat_dim=16, dim=16, n_enco=1, n_deco=1,
                              num_querys=8, heads=2, dim_i3d=4,
                              num_enti=8, num_pred=6)
    props, _ = ge._batch(8, n_bucket=8, t_bucket=16, feat_total=20,
                         num_enti=8, num_pred=6, video_len=40)
    params = model.init(jax.random.PRNGKey(0), props)

    infer1 = build_infer_step(model, topk=3)
    t1 = infer1(params, props)

    mesh = make_mesh(8)
    infer8 = build_infer_step(model, topk=3, mesh=mesh)
    t8 = infer8(jax.device_put(params, NamedSharding(mesh, P())),
                shard_batch(props, mesh))
    for a, b in zip(jax.tree_util.tree_leaves(t1),
                    jax.tree_util.tree_leaves(t8)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        else:
            np.testing.assert_array_equal(a, b)


def test_sharded_grounding_inference_matches_single_device():
    """Mesh-sharded grounding inference (stage-B eval's --mesh path) equals
    the single-device decode, with sharded outputs."""
    import jax.numpy as jnp
    from vidsgg_big_tpu.models.grounding import (GroundingConfig,
                                                 GroundingModel)
    from vidsgg_big_tpu.parallel.mesh import make_mesh, shard_batch
    from vidsgg_big_tpu.train.grounding_steps import (
        build_grounding_infer_step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    b, t, q = 8, 16, 8
    rng_np = np.random.default_rng(11)
    n_clips = jnp.asarray(rng_np.integers(t - 4, t + 1, b), jnp.int32)
    clip_mask = jnp.arange(t)[None, :] < n_clips[:, None]
    feats = jnp.asarray(rng_np.normal(size=(b, t, 12)), jnp.float32)
    feats = feats * clip_mask[..., None]
    qc = jnp.asarray(rng_np.integers(0, 8, (b, q, 3)), jnp.int32)
    temporal = jnp.tile(jnp.asarray([0.0, 1.0], jnp.float32), (b, q, 1))
    qm = jnp.asarray(rng_np.random((b, q)) < 0.8)

    cfg = GroundingConfig(dim_feat=12, dim_clsme=16, dim_hidden=16,
                          num_bins=4, num_pred_cats=10, num_enti_cats=8)
    model = GroundingModel(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, clip_mask, qc,
                        temporal, qm)
    kw = dict(score_th=0.0, tiou_th=0.5, bins_th=0.0, nms_th=0.8)

    out1 = build_grounding_infer_step(model, **kw)(
        params, feats, clip_mask, n_clips, qc, temporal, qm)

    mesh = make_mesh(8)
    infer8 = build_grounding_infer_step(model, mesh=mesh, **kw)
    out8 = infer8(jax.device_put(params, NamedSharding(mesh, P())),
                  *shard_batch((feats, clip_mask, n_clips, qc, temporal, qm),
                               mesh))
    assert out8[0].sharding.spec[0] == "data", out8[0].sharding
    for a, c in zip(jax.tree_util.tree_leaves(out1),
                    jax.tree_util.tree_leaves(out8)):
        a, c = np.asarray(a), np.asarray(c)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)
        else:
            np.testing.assert_array_equal(a, c)


@pytest.mark.slow
def test_tensor_parallel_step_matches_replicated():
    """2-D (data, model) mesh with megatron-style TP param sharding: the
    train step equals the replicated data-parallel result, and the TP specs
    actually shard the big kernels over the model axis."""
    import __graft_entry__ as ge
    from vidsgg_big_tpu.parallel.mesh import shard_batch
    from vidsgg_big_tpu.parallel.sharding import (
        make_mesh_2d, shard_params, param_partition_specs, state_shardings)
    from vidsgg_big_tpu.train.train_state import (
        make_optimizer, create_train_state)
    from vidsgg_big_tpu.train.steps import build_train_step
    import flax

    model, cfg = ge._flagship(feat_dim=16, dim=16, n_enco=1, n_deco=1,
                              num_querys=8, heads=2, dim_i3d=4,
                              num_enti=8, num_pred=6)
    props, gts = ge._batch(4, n_bucket=8, t_bucket=16, feat_total=20,
                           num_enti=8, num_pred=6, video_len=40)
    params = model.init(jax.random.PRNGKey(0), props)
    tx, _ = make_optimizer(1e-4, 0.2, [100])
    rng = jax.random.PRNGKey(1)

    # spec sanity: the MLP/attention kernels are sharded, norms are not
    specs = flax.traverse_util.flatten_dict(param_partition_specs(params))
    p = specs[("params", "tracklet_encoder", "fc_feat2enti", "dense0",
               "kernel")]
    assert tuple(p) == (None, "model")
    p = specs[("params", "tracklet_encoder", "fc_feat2enti", "dense1",
               "kernel")]
    assert tuple(p) == ("model", None)
    assert tuple(specs[("params", "encoder0", "self_attn", "q",
                        "kernel")]) == (None, "model", None)
    assert tuple(specs[("params", "encoder0", "norm1", "scale")]) == ()
    assert tuple(specs[("params", "bias_matrix")]) == ()

    # reference: single-device step
    state1 = create_train_state(params, tx)
    step1 = build_train_step(model, tx, donate=False)
    state1, m1 = step1(state1, props, gts, rng)

    # 2x2 TP+DP step
    mesh = make_mesh_2d(2, 2)
    params_tp = shard_params(params, mesh)
    n_sharded = sum(1 for l in jax.tree_util.tree_leaves(params_tp)
                    if any(s is not None for s in l.sharding.spec))
    assert n_sharded >= 8
    state_tp = jax.jit(lambda p: create_train_state(p, tx))(params_tp)
    step_tp = build_train_step(model, tx, mesh=mesh, donate=False,
                               state_shardings=state_shardings(state_tp))
    state_tp, m_tp = step_tp(state_tp, shard_batch(props, mesh),
                             shard_batch(gts, mesh), rng)

    np.testing.assert_allclose(float(m1["total"]), float(m_tp["total"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    # the updated state keeps its TP layout (no silent re-replication)
    n_after = sum(1 for l in jax.tree_util.tree_leaves(state_tp.params)
                  if any(s is not None for s in l.sharding.spec))
    assert n_after == n_sharded
