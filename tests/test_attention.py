"""Exact attention lowerings (ops/attention.py): stored-A custom VJP and
head-composed operands (used by models/grounding.py QANetEncoderLayer for
the reference QANet blocks, reference grd_model_v5.py:81-137)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from vidsgg_big_tpu.ops.attention import (
    attn_chunked_stored, composed_qkvo, drop_rate_eff, _keep_mask)

H, HD, D = 2, 8, 16
SCALE = 1.0 / np.sqrt(HD)


def _qkv(seed, b, t):
    r = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(r.normal(size=(b, t, H, HD)), jnp.float32)
    q, k, v = mk(), mk(), mk()
    mask = jnp.asarray(r.random((b, t)) < 0.8)
    mask = mask.at[:, 0].set(True)
    return q, k, v, mask


def _direct(q, k, v, mask):
    lg = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * SCALE
    neg = jnp.asarray(jnp.finfo(lg.dtype).min, lg.dtype)
    lg = jnp.where(mask[:, None, None, :], lg, neg)
    at = jax.nn.softmax(lg, axis=-1)
    at = jnp.where(mask[:, None, None, :], at, 0.0).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", at, v)


def test_stored_a_forward_matches_direct():
    q, k, v, mask = _qkv(0, 8, 16)
    out = attn_chunked_stored(q, k, v, mask, chunk=2)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_direct(q, k, v, mask)),
                               rtol=1e-5, atol=1e-6)


def test_stored_a_grad_matches_autodiff():
    """The recompute-free backward must equal autodiff of the direct path."""
    q, k, v, mask = _qkv(1, 4, 16)
    f1 = lambda q_, k_, v_: attn_chunked_stored(q_, k_, v_, mask,
                                                chunk=2).sum()
    f2 = lambda q_, k_, v_: _direct(q_, k_, v_, mask).sum()
    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_stored_a_dropout_grad_matches_autodiff():
    """With dropout, the backward regenerates the keep-mask from the same
    key; gradients must equal autodiff of the identical chunked computation
    (same per-chunk key stream, no custom_vjp)."""
    q, k, v, mask = _qkv(2, 4, 16)
    rng = jax.random.PRNGKey(3)
    chunk, dropout = 2, 0.3
    p_eff = drop_rate_eff(dropout)

    def ref(q_, k_, v_):
        b, t = q_.shape[:2]
        n_blk = b // chunk
        keys = jax.random.bits(rng, (n_blk, 4), jnp.uint32)

        def blk(a):
            qc, kc, vc, mc, key = a
            at = jnp.where(
                mc[:, None, None, :],
                jax.nn.softmax(jnp.where(
                    mc[:, None, None, :],
                    jnp.einsum("bqhd,bkhd->bhqk", qc, kc) * SCALE,
                    jnp.finfo(jnp.float32).min), -1), 0.0)
            keep = _keep_mask(key, at.shape, dropout)
            at = jnp.where(keep, at / (1.0 - p_eff), 0.0)
            return jnp.einsum("bhqk,bkhd->bqhd", at, vc)

        out = jax.lax.map(blk, (q_.reshape(n_blk, chunk, t, H, HD),
                                k_.reshape(n_blk, chunk, t, H, HD),
                                v_.reshape(n_blk, chunk, t, H, HD),
                                mask.reshape(n_blk, chunk, t), keys))
        return out.reshape(b, t, H, HD).sum()

    f = lambda q_, k_, v_: attn_chunked_stored(
        q_, k_, v_, mask, chunk=chunk, dropout=dropout, rng=rng).sum()
    assert abs(float(f(q, k, v)) - float(ref(q, k, v))) < 1e-3
    g1 = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_keep_mask_rate_and_determinism():
    """The 16-bit rbg keep-mask realizes drop_rate_eff(p) and is a pure
    function of its key (the stored-A backward regenerates it)."""
    key = jax.random.bits(jax.random.PRNGKey(9), (4,), jnp.uint32)
    shape = (64, 2, 37, 33)   # odd minor dim exercises the trailing slice
    m1 = _keep_mask(key, shape, 0.3)
    m2 = jax.jit(lambda k: _keep_mask(k, shape, 0.3))(key)
    assert m1.shape == shape
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    rate = 1.0 - float(np.asarray(m1).mean())
    n = np.prod(shape)
    # binomial 6-sigma band around the effective rate
    assert abs(rate - drop_rate_eff(0.3)) < 6 * np.sqrt(0.3 * 0.7 / n), rate


def test_pack_unpack_bits_roundtrip():
    """The backward reads the fwd's keep-mask through the bit-packed
    residual; pack->unpack must be the identity (incl. non-multiple-of-8
    minor dims via padding)."""
    from vidsgg_big_tpu.ops.attention import _pack_bits, _unpack_bits
    r = np.random.default_rng(11)
    for k in (16, 33, 512):
        keep = jnp.asarray(r.random((3, 5, k)) < 0.7)
        packed = _pack_bits(keep)
        assert packed.dtype == jnp.uint8
        assert packed.shape == (3, 5, (k + 7) // 8)
        np.testing.assert_array_equal(np.asarray(_unpack_bits(packed, k)),
                                      np.asarray(keep))


def test_composed_qkvo_algebra():
    """Head-composition is exact: logits factor through W_q W_k^T (the
    query-side bias terms are constant along each softmax row and cancel;
    b_k drops out of the function entirely), and A's row-sum = 1 absorbs
    b_v into a constant output bias through W_o."""
    r = np.random.default_rng(4)
    b, t = 3, 12
    x = jnp.asarray(r.normal(size=(b, t, D)), jnp.float32)
    mask = jnp.asarray(r.random((b, t)) < 0.8).at[:, 0].set(True)
    p = dict(
        wq=jnp.asarray(r.normal(0, 0.3, (D, H, HD)), jnp.float32),
        bq=jnp.asarray(r.normal(0, 0.1, (H, HD)), jnp.float32),
        wk=jnp.asarray(r.normal(0, 0.3, (D, H, HD)), jnp.float32),
        bk=jnp.asarray(r.normal(0, 0.1, (H, HD)), jnp.float32),
        wv=jnp.asarray(r.normal(0, 0.3, (D, H, HD)), jnp.float32),
        bv=jnp.asarray(r.normal(0, 0.1, (H, HD)), jnp.float32),
        wo=jnp.asarray(r.normal(0, 0.3, (H, HD, D)), jnp.float32),
        bo=jnp.asarray(r.normal(0, 0.1, (D,)), jnp.float32),
    )

    # direct: full projections (b_k INCLUDED), attention, output projection
    q = jnp.einsum("btc,chd->bthd", x, p["wq"]) + p["bq"]
    k = jnp.einsum("btc,chd->bthd", x, p["wk"]) + p["bk"]
    v = jnp.einsum("btc,chd->bthd", x, p["wv"]) + p["bv"]
    ref = jnp.einsum("bqhd,hdc->bqc", _direct(q, k, v, mask), p["wo"]) + \
        p["bo"]

    # composed: d-width operands, plain einsum (the flash kernel computes
    # this same masked softmax on TPU)
    wqk, wb, wvo, cb = composed_qkvo(p["wq"], p["bq"], p["wk"], p["wv"],
                                     p["wo"], p["bv"], p["bo"])
    q_hat = jnp.einsum("btc,hce->bhte", x, wqk) + wb[:, None, :]
    lg = jnp.einsum("bhte,bke->bhtk", q_hat, x) * SCALE
    neg = jnp.asarray(jnp.finfo(lg.dtype).min, lg.dtype)
    at = jax.nn.softmax(jnp.where(mask[:, None, None, :], lg, neg), -1)
    at = jnp.where(mask[:, None, None, :], at, 0.0)
    v_til = jnp.einsum("btc,hce->bhte", x, wvo)
    got = jnp.einsum("bhqk,bhke->bqe", at, v_til) + cb

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dense_general_param_init_parity():
    """_DenseGeneralParams (models/grounding.py) must init bit-identically
    to the nn.DenseGeneral modules it replaced, so pre-change checkpoints
    and seeded runs are unaffected."""
    from vidsgg_big_tpu.models.grounding import (
        _DenseGeneralParams, torch_linear, xavier_u)

    class OldQ(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.DenseGeneral((H, HD), axis=-1, kernel_init=xavier_u,
                                   name="attn_q")(x)

    class NewQ(nn.Module):
        @nn.compact
        def __call__(self, x):
            w, b = _DenseGeneralParams((D, H, HD), (H, HD), name="attn_q")()
            return jnp.einsum("btc,chd->bthd", x, w) + b

    class OldO(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.DenseGeneral(D, axis=(-2, -1),
                                   kernel_init=torch_linear,
                                   name="attn_out")(x)

    class NewO(nn.Module):
        @nn.compact
        def __call__(self, x):
            w, b = _DenseGeneralParams((H, HD, D), (D,), n_in_axes=2,
                                       kernel_init=torch_linear,
                                       name="attn_out")()
            return jnp.einsum("bthd,hdc->btc", x, w) + b

    x = jnp.zeros((2, 5, D))
    xo = jnp.zeros((2, 5, H, HD))
    rng = jax.random.PRNGKey(17)
    pq_old = OldQ().init(rng, x)["params"]["attn_q"]
    pq_new = NewQ().init(rng, x)["params"]["attn_q"]
    np.testing.assert_array_equal(np.asarray(pq_old["kernel"]),
                                  np.asarray(pq_new["kernel"]))
    np.testing.assert_array_equal(np.asarray(pq_old["bias"]),
                                  np.asarray(pq_new["bias"]))
    po_old = OldO().init(rng, xo)["params"]["attn_out"]
    po_new = NewO().init(rng, xo)["params"]["attn_out"]
    np.testing.assert_array_equal(np.asarray(po_old["kernel"]),
                                  np.asarray(po_new["kernel"]))
    np.testing.assert_array_equal(np.asarray(po_old["bias"]),
                                  np.asarray(po_new["bias"]))
