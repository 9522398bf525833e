"""Exact lowerings of masked multi-head self-attention at tiny head_dim.

The grounding QANet blocks (models/grounding.py, reference
grd_model_v5.py:81-137) run 8 heads of head_dim 16 over (B*Q, T) = (1024,
512) token grids.  That shape is pathological on TPU two ways at once:

* the (BQ, h, T, T) logits tensor is 8.6 GB in f32 — materializing it makes
  the op HBM-bound (measured ~30 ms forward ≈ the bandwidth of its own
  round trips, docs/ROUND3.md);
* head_dim=16 contractions pad 8x on the MXU, so "saving FLOPs" with
  gathers or smaller tiles never pays (docs/ROUND2.md postmortem).

Two complementary exact rewrites:

``chunked stored-A`` (:func:`attn_chunked_stored`) keeps the shipped
chunked-materialization forward but replaces whole-block rematerialization
with a custom VJP that stores the softmax output in bfloat16: the backward
recomputes nothing (VERDICT r3 #1's stored-stats plan).  Attention dropout
is supported by regenerating the keep-mask from the same key in the
backward.

``head composition`` (:func:`composed_qkvo`, :func:`attn_composed_flash`):
per head, logits = (x W_q + b_q)·(x W_k + b_k)^T factor through the d x d
kernel W_q W_k^T — so the contraction runs at d=128, full MXU width.  The
query-side bias terms (x W_q·b_k and b_q·b_k) are constant along the
softmax row and cancel; the key-side term b_q·W_k x^T folds into a bias on
the composed query.  The value/output projections compose the same way
(W_v W_o, with A's row-sum = 1 absorbing b_v into a constant output bias).
The composed operands have head_dim 128 — exactly the shape the stock
Pallas TPU flash kernel wants — so the (BQ, h, T, T) tensor never
materializes at all.  Consequence of the algebra: b_k drops out of the
function entirely (its true gradient is zero — in the reference it only
ever moves by f32 rounding noise), so the composed path is used for
deterministic/inference work and the stored-A path for training.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# chunked attention with stored bf16 softmax (training path)
# --------------------------------------------------------------------------

def drop_rate_eff(dropout: float) -> float:
    """The dropout rate the 16-bit keep-mask generator actually realizes.

    ``round(dropout * 2**16) / 2**16`` — e.g. 0.1 becomes 0.100006…; the
    keep-mask threshold and the 1/(1-p) rescale both use this value, so the
    dropout stays exactly unbiased at the (negligibly) quantized rate.
    """
    return round(dropout * 65536.0) / 65536.0


def _keep_mask(key4, shape, dropout):
    """Bernoulli(1 - drop_rate_eff(dropout)) keep-mask from the TPU's
    hardware RNG (XLA RngBitGenerator via the rbg PRNG), two 16-bit draws
    per generated word.

    The default threefry PRNG hashes ≥32 bits per element on the VPU — at
    the grounding step's 2.1e9 attention-weight draws per pass that is
    ~75 ms/pass on v5e (scripts/dropout_rng_sweep.py); rbg + 16-bit
    extraction cuts it ~3x.  Determinism: RngBitGenerator output is a pure
    function of (key, shape) within a backend, so the backward pass (same
    compiled program) regenerates the identical mask.
    """
    *lead, k = shape
    thr = np.uint32(round(dropout * 65536.0))
    words = jax.random.bits(_wrap_key(key4), (*lead, (k + 1) // 2),
                            jnp.uint32)
    lo = (words & np.uint32(0xFFFF)) >= thr
    hi = (words >> np.uint32(16)) >= thr
    keep = jnp.stack([lo, hi], axis=-1).reshape(*lead, -1)
    return keep[..., :k]


def _pack_bits(keep):
    """(…, k) bool -> (…, k/8) uint8, bit i of byte j = element 8j+i.

    The stored-A VJP stores the keep-mask this way: 0.125 byte/element
    (0.5 GB at the grounding production shape) instead of either a 26 ms
    RngBitGenerator regeneration in the backward or a 1 byte/element bool
    residual.  XLA fuses threshold->pack into the generation pass.
    """
    *lead, k = keep.shape
    if k % 8:
        keep = jnp.pad(keep, [(0, 0)] * len(lead) + [(0, 8 - k % 8)])
        k += 8 - k % 8
    g = keep.reshape(*lead, k // 8, 8).astype(jnp.uint8)
    w = np.asarray(1 << np.arange(8), np.uint8)
    return (g * w).sum(-1, dtype=jnp.uint8)


def _unpack_bits(packed, k):
    """Inverse of _pack_bits (broadcast shift+mask, fuses into consumers)."""
    bits = (packed[..., None] >> np.asarray(np.arange(8), np.uint8)) & \
        np.uint8(1)
    return bits.astype(bool).reshape(*packed.shape[:-1], -1)[..., :k]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _blk_stored(dropout, qc, kc, vc, mc, key):
    out, _ = _blk_stored_fwd(dropout, qc, kc, vc, mc, key)
    return out


def _blk_stored_fwd(dropout, qc, kc, vc, mc, key):
    hd = qc.shape[-1]
    lg = jnp.einsum("bqhd,bkhd->bhqk", qc, kc).astype(jnp.float32) \
        / np.sqrt(hd)
    neg = jnp.asarray(jnp.finfo(lg.dtype).min, lg.dtype)
    lg = jnp.where(mc[:, None, None, :], lg, neg)
    at = jax.nn.softmax(lg, axis=-1)
    at = jnp.where(mc[:, None, None, :], at, 0.0).astype(vc.dtype)
    at_d = at
    if dropout > 0.0:
        p = drop_rate_eff(dropout)
        keep = _keep_mask(key, at.shape, dropout)
        at_d = jnp.where(keep, at / (1.0 - p), 0.0)
        packed = _pack_bits(keep)
    else:
        packed = jnp.zeros(at.shape[:-1] + (0,), jnp.uint8)
    out = jnp.einsum("bhqk,bkhd->bqhd", at_d, vc)
    # stored intermediates: the pre-dropout softmax output (bf16 when vc is
    # bf16) and the bit-packed keep-mask — the backward recomputes nothing
    return out, (qc, kc, vc, mc, at, packed)


def _blk_stored_bwd(dropout, res, do):
    qc, kc, vc, mc, at, packed = res
    hd = qc.shape[-1]
    if dropout > 0.0:
        p = drop_rate_eff(dropout)
        keep = _unpack_bits(packed, at.shape[-1])
        at_d = jnp.where(keep, at / (1.0 - p), 0.0)
    else:
        at_d = at
    dv = jnp.einsum("bhqk,bqhd->bkhd", at_d, do)
    dat = jnp.einsum("bqhd,bkhd->bhqk", do, vc)
    if dropout > 0.0:
        dat = jnp.where(keep, dat / (1.0 - p), 0.0)
    a32 = at.astype(jnp.float32)
    g = dat.astype(jnp.float32)
    dlg = a32 * (g - (g * a32).sum(-1, keepdims=True)) / np.sqrt(hd)
    dlg = jnp.where(mc[:, None, None, :], dlg, 0.0).astype(qc.dtype)
    dq = jnp.einsum("bhqk,bkhd->bqhd", dlg, kc)
    dk = jnp.einsum("bhqk,bqhd->bkhd", dlg, qc)
    return dq, dk, dv, None, None


_blk_stored.defvjp(_blk_stored_fwd, _blk_stored_bwd)


def _wrap_key(raw):
    return jax.random.wrap_key_data(raw, impl="rbg")


def attn_chunked_stored(q, k, v, mask, *, chunk, dropout=0.0, rng=None):
    """Chunked exact attention, (B, T, h, hd) -> (B, T, h, hd).

    Identical numerics to materialized masked softmax attention; the batch
    axis is processed in ``chunk``-row blocks (bounded memory) and each
    block's softmax output is stored in the value dtype for a
    recompute-free backward.  ``rng`` is required when ``dropout`` > 0.
    """
    b, t, h, hd = q.shape
    n_blk = b // chunk
    assert n_blk * chunk == b, (b, chunk)
    if dropout > 0.0:
        # per-chunk rbg key material, derived (cheaply — n_blk*4 words)
        # from the caller's key; the masks themselves come from the
        # hardware RNG (see _keep_mask)
        keys = jax.random.bits(rng, (n_blk, 4), jnp.uint32)
    else:
        keys = jnp.zeros((n_blk, 4), jnp.uint32)
    out = jax.lax.map(
        lambda a: _blk_stored(dropout, *a),
        (q.reshape(n_blk, chunk, t, h, hd),
         k.reshape(n_blk, chunk, t, h, hd),
         v.reshape(n_blk, chunk, t, h, hd),
         mask.reshape(n_blk, chunk, t),
         keys))
    return out.reshape(b, t, h, hd)


# --------------------------------------------------------------------------
# head-composed attention (deterministic / inference path)
# --------------------------------------------------------------------------

def composed_qkvo(wq, bq, wk, wv, wo, bv, bo):
    """Fold per-head projections into d-width composites.

    Args: wq/wk/wv (d, h, hd); bq/bv (h, hd); wo (h, hd, d); bo (d,).
    Returns (wqk (h, d, d), wb (h, d), wvo (h, d, d), cb (d,)); b_k cancels
    (constant along each softmax row — see module docstring).
    """
    wqk = jnp.einsum("chd,ehd->hce", wq, wk)
    wb = jnp.einsum("hd,ehd->he", bq, wk)
    wvo = jnp.einsum("chd,hde->hce", wv, wo)
    cb = jnp.einsum("hd,hde->e", bv, wo) + bo
    return wqk, wb, wvo, cb


def attn_composed_flash(x, mask, wqk, wb, wvo, cb, *, hd,
                        block_sizes=None):
    """Flash attention over head-composed operands, (B, T, d) -> (B, T, d).

    Output includes the attention-output projection (it is composed into
    the value side).  Requires T divisible by the kernel block (128) and a
    TPU backend; callers gate on both.  Rows of fully-masked videos attend
    clip 0 (finite garbage — callers re-zero padded rows anyway).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, BlockSizes, SegmentIds)
    b, t, d = x.shape
    h = wqk.shape[0]
    cdt = x.dtype
    q_hat = jnp.einsum("btc,hce->bhte", x, wqk.astype(cdt)) + \
        wb[:, None, :].astype(cdt)
    v_til = jnp.einsum("btc,hce->bhte", x, wvo.astype(cdt))
    kb = jnp.broadcast_to(x[:, None], (b, h, t, d))
    kv_seg = mask.astype(jnp.int32)
    kv_seg = kv_seg.at[:, 0].max(1 - kv_seg.max(axis=1, keepdims=False)
                                 [:, None][:, 0])  # rescue all-masked rows
    seg = SegmentIds(q=jnp.ones((b, t), jnp.int32), kv=kv_seg)
    o = flash_attention(q_hat, kb, v_til, segment_ids=seg,
                        sm_scale=1.0 / np.sqrt(hd),
                        block_sizes=block_sizes)
    return o.sum(axis=1) + cb.astype(cdt)
