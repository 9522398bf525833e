"""Fused head-composed Pallas attention (ops/pallas_attention.py) vs the
XLA composed reference, in interpret mode on CPU.

Used by models/grounding.py QANetEncoderLayer for the reference QANet
blocks (reference grd_model_v5.py:81-137)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

# pltpu.prng_random_bits is stubbed to zeros in CPU interpret mode, so the
# dropout paths are only testable on a real TPU (scripts/fused_attn_check.py
# runs these same checks compiled); deterministic paths use interpret mode.
_NO_TPU = jax.default_backend() != "tpu"

from vidsgg_big_tpu.ops.attention import composed_qkvo
from vidsgg_big_tpu.ops.pallas_attention import fused_composed_attention

H, HD, D = 4, 8, 64
SCALE = 1.0 / np.sqrt(HD)


def _setup(seed, b, t, dtype=jnp.float32):
    r = np.random.default_rng(seed)
    p = dict(
        wq=jnp.asarray(r.normal(0, 0.3, (D, H, HD)), dtype),
        bq=jnp.asarray(r.normal(0, 0.1, (H, HD)), dtype),
        wk=jnp.asarray(r.normal(0, 0.3, (D, H, HD)), dtype),
        wv=jnp.asarray(r.normal(0, 0.3, (D, H, HD)), dtype),
        bv=jnp.asarray(r.normal(0, 0.1, (H, HD)), dtype),
        wo=jnp.asarray(r.normal(0, 0.3, (H, HD, D)), dtype),
        bo=jnp.asarray(r.normal(0, 0.1, (D,)), dtype),
    )
    x = jnp.asarray(r.normal(size=(b, t, D)), dtype)
    mask = jnp.asarray(r.random((b, t)) < 0.8).at[:, 0].set(True)
    comp = composed_qkvo(p["wq"], p["bq"], p["wk"], p["wv"], p["wo"],
                         p["bv"], p["bo"])
    return p, x, mask, comp


def _ref(comp, x, mask):
    """XLA composed-attention reference (same algebra, materialized)."""
    wqk, wb, wvo, cb = comp
    q_hat = jnp.einsum("btc,hce->bhte", x, wqk) + wb[None, :, None, :]
    lg = jnp.einsum("bhte,bke->bhtk", q_hat, x) * SCALE
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, lg.dtype)
    at = jax.nn.softmax(jnp.where(mask[:, None, None, :], lg, neg), -1)
    at = jnp.where(mask[:, None, None, :], at, 0.0)
    v_til = jnp.einsum("btc,hce->bhte", x, wvo)
    return jnp.einsum("bhqk,bhke->bqe", at, v_til) + cb


def _fused(comp, x, mask, dropout=0.0, rng=None):
    wqk, wb, wvo, cb = comp
    return fused_composed_attention(
        x, mask, wqk, wb, wvo, cb, hd=HD, dropout=dropout, rng=rng,
        interpret=_NO_TPU)


def test_fused_forward_matches_reference():
    _, x, mask, comp = _setup(0, 3, 32)
    got = jax.jit(lambda: _fused(comp, x, mask))()
    ref = _ref(comp, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_forward_q_blocking():
    """t > 256 exercises the q-block grid split (and with it the distinct
    per-q-block PRNG streams in training)."""
    _, x, mask, comp = _setup(1, 2, 384)
    got = jax.jit(lambda: _fused(comp, x, mask))()
    ref = _ref(comp, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_grad_matches_autodiff():
    """No-dropout gradients (through x and the composites) must match
    autodiff of the XLA reference."""
    _, x, mask, comp = _setup(2, 2, 32)

    def loss_fused(xx, cc):
        return (_fused(cc, xx, mask) ** 2).sum()

    def loss_ref(xx, cc):
        return (_ref(cc, xx, mask) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x, comp)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, comp)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(_NO_TPU, reason="interpret-mode PRNG is a zero stub")
def test_fused_dropout_deterministic_and_unbiased():
    _, x, mask, comp = _setup(3, 2, 128)
    rng = jax.random.PRNGKey(5)
    o1 = jax.jit(lambda: _fused(comp, x, mask, dropout=0.3, rng=rng))()
    o2 = jax.jit(lambda: _fused(comp, x, mask, dropout=0.3, rng=rng))()
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # dropped attention rows average back to ~the deterministic output
    outs = []
    for i in range(24):
        k = jax.random.PRNGKey(100 + i)
        outs.append(np.asarray(
            jax.jit(lambda kk: _fused(comp, x, mask, dropout=0.3,
                                      rng=kk))(k)))
    mean = np.stack(outs).mean(0)
    ref = np.asarray(_ref(comp, x, mask))
    corr = np.corrcoef(mean.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99, corr


def test_fused_spmd_batch_partitioning():
    """Under a GSPMD mesh with the batch operand sharded over "data"
    (exactly what the --mesh CLIs produce), the kernel's custom_partitioning
    rule must shard the pallas_call over the batch grid — NOT replicate it
    behind an all-gather — and sharded numerics must match the
    single-device result (fwd and grad), on 1-D and (data, model) meshes.
    The kernel itself is bitwise-identical per batch row; the pre-kernel
    qh/vt einsums recompile under sharding, so the comparison carries the
    usual f32 re-association tolerance."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    _, x, mask, comp = _setup(5, 8, 32)

    def f(xx):
        return _fused(comp, xx, mask)

    def loss(xx):
        return (f(xx) * jnp.cos(jnp.arange(D))).sum()

    out_1 = jax.jit(f)(x)
    g_1 = jax.jit(jax.grad(loss))(x)
    for axes in [(8,), (4, 2)]:
        names = ("data", "model")[:len(axes)]
        mesh = Mesh(np.array(jax.devices()).reshape(axes), names)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        out_s = jax.jit(f)(xs)
        g_s = jax.jit(jax.grad(loss))(xs)
        assert out_s.sharding.spec == P("data"), out_s.sharding
        assert g_s.sharding.spec == P("data"), g_s.sharding
        np.testing.assert_allclose(np.asarray(out_1), np.asarray(out_s),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g_1), np.asarray(g_s),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(_NO_TPU, reason="interpret-mode PRNG is a zero stub")
def test_fused_dropout_bwd_mask_matches_fwd_mask():
    """The output is LINEAR in v_til for a fixed keep-mask, so
    f(vt+E) - f(vt) == <df/dvt, E> holds exactly iff the backward
    regenerates the identical keep-mask the forward drew (the fwd pair
    shares seeds).  This validates the reseed-and-regenerate contract
    without access to the kernel-internal mask."""
    from vidsgg_big_tpu.ops.pallas_attention import _fused as fused_core

    _, x, mask, comp = _setup(4, 2, 128)
    wqk, wb, wvo, _ = comp
    qh = jnp.einsum("btc,hce->bhte", x, wqk) + wb[None, :, None, :]
    vt = jnp.einsum("btc,hce->bhte", x, wvo)
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[:, None, :]
    seeds = jnp.asarray([[7, 11]], jnp.int32)
    r = np.random.default_rng(9)
    cotan = jnp.asarray(r.normal(size=(2, 128, D)), jnp.float32)
    eps = jnp.asarray(r.normal(size=vt.shape), jnp.float32) * 0.1

    def f(vt_):
        return (fused_core(0.3, _NO_TPU, SCALE, qh, x, vt_, bias,
                           seeds) * cotan).sum()

    g_vt = jax.grad(f)(vt)
    lhs = float(f(vt + eps) - f(vt))
    rhs = float((g_vt * eps).sum())
    assert abs(lhs - rhs) / max(abs(lhs), 1e-6) < 1e-3, (lhs, rhs)
