"""Pallas TPU kernel: fused head-composed QANet self-attention (+dropout).

The grounding QANet blocks (models/grounding.py, reference
grd_model_v5.py:81-137) run 8 heads of head_dim 16 over up to
(B*Q, T) = (1024, 512) token grids.  head_dim-16 contractions pad 8x on
the MXU and the (BQ, h, T, T) attention tensor is 8.6 GB in f32, so both
the direct and the chunked XLA lowerings are bandwidth/padding bound
(docs/ROUND3.md, docs/ROUND4.md).

This kernel runs the *head-composed* formulation (ops/attention.py
``composed_qkvo``): per head, logits factor through the d x d kernel
W_q W_k^T, so the contraction runs at d=128 — full MXU width — and the
keys/values are the raw ``x`` rows, read ONCE for all heads (the stock
flash kernel instead wants an 8x-broadcast (B, h, T, d) operand and is
2.7x slower than chunked XLA here, scripts/attn_fwd_compare.py).

Per grid step (one batch row, one q-block), entirely in VMEM:

  S_h = (x W_qk_h + wb_h) x^T / sqrt(hd) + col_bias        [MXU, d=128]
  A_h = softmax(S_h)          (masked cols underflow to exactly 0)
  Ã_h = A_h ⊙ keep / (1-p)    (keep-mask from the on-core PRNG)
  out += Ã_h (x W_vo_h)                                    [MXU]

Nothing of the (T, T) attention tensor ever reaches HBM.  The custom VJP
recomputes S/A in the backward (flash convention — at d=128 the recompute
is MXU-efficient, unlike the 8x-padded head_dim-16 form) and regenerates
the identical keep-mask by reseeding ``pltpu.prng_seed`` with the same
per-(row, head, q-block) seed.  Dropout rate is realized exactly at
``round(p * 2**32) / 2**32`` (threshold and rescale use the same value).

b_k drops out of the composed function (row-constant logit terms cancel
in the softmax), so its gradient is exactly zero — in the reference it
only ever moves by f32 rounding noise.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

# golden-ratio mixers decorrelate the per-(head, q-block) PRNG streams
_MIX_Q = np.int32(-1274982903)


def _mix_h(h: int) -> np.int32:
    v = (0x9E3779B9 * (h + 1)) & 0xFFFFFFFF
    return np.int32(v - (1 << 32) if v >= (1 << 31) else v)


def _drop_consts(dropout: float):
    thr = np.uint32(round(dropout * 4294967296.0))
    p_eff = float(thr) / 4294967296.0
    return thr, np.float32(1.0 / (1.0 - p_eff))


def _dotg(a, b, dims):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(qh_ref, x_ref, vt_ref, bias_ref, seed_ref, o_ref, *,
                heads, scale, dropout):
    x = x_ref[0]                                    # (T, d)
    bias = bias_ref[0]                              # (1, T) f32
    thr, inv = _drop_consts(dropout)
    blk_q = qh_ref.shape[2]
    acc = jnp.zeros((blk_q, x.shape[1]), jnp.float32)
    for h in range(heads):
        s = _dotg(qh_ref[0, h], x, ((1,), (1,))) * scale + bias   # (bq, T)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)
        if dropout > 0.0:
            pltpu.prng_seed(seed_ref[0, pl.program_id(0)] ^ _mix_h(h) ^
                            (_MIX_Q * pl.program_id(1)))
            bits = pltpu.bitcast(pltpu.prng_random_bits(a.shape),
                                 jnp.uint32)
            a = jnp.where(bits >= thr, a * inv, 0.0)
        acc += _dotg(a.astype(x.dtype), vt_ref[0, h], ((1,), (0,)))
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(qh_ref, x_ref, vt_ref, bias_ref, seed_ref, do_ref,
                dqh_ref, dx_ref, dvt_ref, dvt_acc, dx_acc, *,
                heads, scale, dropout):
    x = x_ref[0]                                    # (T, d)
    bias = bias_ref[0]                              # (1, T)
    do = do_ref[0]                                  # (bq, d)
    thr, inv = _drop_consts(dropout)
    i = pl.program_id(1)
    nq = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        dvt_acc[...] = jnp.zeros(dvt_acc.shape, dvt_acc.dtype)
        dx_acc[...] = jnp.zeros(dx_acc.shape, dx_acc.dtype)

    for h in range(heads):
        qh = qh_ref[0, h]                           # (bq, d)
        s = _dotg(qh, x, ((1,), (1,))) * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)  # pre-dropout softmax
        u = _dotg(do, vt_ref[0, h], ((1,), (1,)))   # dÃ  (bq, T)
        if dropout > 0.0:
            pltpu.prng_seed(seed_ref[0, pl.program_id(0)] ^ _mix_h(h) ^
                            (_MIX_Q * i))
            bits = pltpu.bitcast(pltpu.prng_random_bits(a.shape),
                                 jnp.uint32)
            keep = bits >= thr
            a_d = jnp.where(keep, a * inv, 0.0)
            da = jnp.where(keep, u * inv, 0.0)
        else:
            a_d = a
            da = u
        dvt_acc[h] += _dotg(a_d.astype(x.dtype), do, ((0,), (0,)))
        r = jnp.sum(da * a, axis=-1, keepdims=True)
        ds = (a * (da - r) * scale).astype(x.dtype)  # masked cols: a==0
        dqh_ref[0, h] = _dotg(ds, x, ((1,), (0,))).astype(dqh_ref.dtype)
        dx_acc[...] += _dotg(ds, qh, ((0,), (0,)))

    @pl.when(i == nq - 1)
    def _():
        dx_ref[0] = dx_acc[...].astype(dx_ref.dtype)
        dvt_ref[0] = dvt_acc[...].astype(dvt_ref.dtype)


def _pick_blk_q(t: int) -> int:
    if t <= 256:
        return t
    return 256 if t % 256 == 0 else 128


def _fwd_call(dropout, interpret, scale, qh, x, vt, bias, seeds):
    b, heads, t, d = qh.shape
    blk_q = _pick_blk_q(t)
    nq = t // blk_q
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads,
                          scale=np.float32(scale), dropout=dropout),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, heads, blk_q, d), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, t, d), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(qh, x, vt, bias, seeds)
    return out


def _bwd_call(dropout, interpret, scale, qh, x, vt, bias, seeds, do):
    b, heads, t, d = qh.shape
    blk_q = _pick_blk_q(t)
    nq = t // blk_q
    dqh, dx, dvt = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads,
                          scale=np.float32(scale), dropout=dropout),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, heads, blk_q, d), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, t, d), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, heads, blk_q, d), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, t, d), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qh.shape, qh.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(vt.shape, vt.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((heads, t, d), jnp.float32),
            pltpu.VMEM((t, d), jnp.float32),
        ],
        interpret=interpret,
    )(qh, x, vt, bias, seeds, do)
    return dqh, dx, dvt


# ---- SPMD partitioning --------------------------------------------------
#
# Under the CLIs' (data, model) mesh the batch operands arrive sharded over
# the "data" axis.  Without a partitioning rule, GSPMD/shardy treats the
# Mosaic custom call as opaque and REPLICATES it — an all-gather of every
# operand plus redundant full-batch kernel launches on every device
# (measured on the 8-device CPU mesh: output sharding degrades to
# PartitionSpec()).  The grid is batch-major and rows are independent, so
# the kernel shards perfectly along the batch dim: each device runs the
# unmodified pallas_call on its local rows (the per-row dropout seeds ride
# along the same dim, so sharded numerics are bit-identical to unsharded).
# Everything that is contracted or softmaxed inside the kernel (t, d, h)
# must stay replicated; ``partition`` demands batch-only shardings and the
# partitioner inserts the reshards where a producer disagrees.

_FWD_BDIMS = (0, 0, 0, 0, 1)        # qh, x, vt, bias: dim 0; seeds: dim 1
_BWD_BDIMS = (0, 0, 0, 0, 1, 0)     # + do: dim 0
# shardy rules: only the shared factor ``b`` propagates; every other factor
# is op-local and pinned replicated.
_FWD_RULE = "b q1 q2 q3, b x1 x2, b v1 v2 v3, b m1 m2, s1 b -> b x1 x2"
_FWD_REPL = ("q1", "q2", "q3", "x1", "x2", "v1", "v2", "v3", "m1", "m2",
             "s1")
_BWD_RULE = ("b q1 q2 q3, b x1 x2, b v1 v2 v3, b m1 m2, s1 b, b o1 o2"
             " -> b q1 q2 q3, b x1 x2, b v1 v2 v3")
_BWD_REPL = _FWD_REPL + ("o1", "o2")


def _batch_spec(arg_shapes, batch_dims):
    """The mesh axes the batch dim is sharded over (first operand that
    carries a non-None spec there), or None when fully replicated."""
    for a, bd in zip(arg_shapes, batch_dims):
        spec = getattr(getattr(a, "sharding", None), "spec", None)
        if spec is not None and len(spec) > bd and spec[bd] is not None:
            return spec[bd]
    return None


def _batch_only(mesh, shapes, batch_dims, baxes):
    out = []
    for a, bd in zip(shapes, batch_dims):
        dims = [None] * len(a.shape)
        dims[bd] = baxes
        out.append(NamedSharding(mesh, P(*dims)))
    return tuple(out)


def _batch_partitioned(raw_fn, batch_dims, out_batch_dims, rule, repl):
    fn = custom_partitioning(raw_fn)

    def infer(mesh, arg_shapes, result_shape):
        baxes = _batch_spec(arg_shapes, batch_dims)
        res = jax.tree.leaves(result_shape)
        sh = _batch_only(mesh, res, out_batch_dims, baxes)
        return tuple(sh) if len(sh) > 1 else sh[0]

    def part(mesh, arg_shapes, result_shape):
        baxes = _batch_spec(arg_shapes, batch_dims)
        arg_sh = _batch_only(mesh, arg_shapes, batch_dims, baxes)
        res = jax.tree.leaves(result_shape)
        res_sh = _batch_only(mesh, res, out_batch_dims, baxes)
        return (mesh, raw_fn,
                tuple(res_sh) if len(res_sh) > 1 else res_sh[0], arg_sh)

    fn.def_partition(part, infer_sharding_from_operands=infer,
                     sharding_rule=rule, need_replication_factors=repl)
    return fn


@functools.lru_cache(maxsize=None)
def _fwd_cp(dropout, interpret, scale):
    return _batch_partitioned(
        functools.partial(_fwd_call, dropout, interpret, scale),
        _FWD_BDIMS, (0,), _FWD_RULE, _FWD_REPL)


@functools.lru_cache(maxsize=None)
def _bwd_cp(dropout, interpret, scale):
    return _batch_partitioned(
        functools.partial(_bwd_call, dropout, interpret, scale),
        _BWD_BDIMS, (0, 0, 0), _BWD_RULE, _BWD_REPL)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused(dropout, interpret, scale, qh, x, vt, bias, seeds):
    return _fwd_cp(dropout, interpret, scale)(qh, x, vt, bias, seeds)


def _fused_fwd(dropout, interpret, scale, qh, x, vt, bias, seeds):
    out = _fwd_cp(dropout, interpret, scale)(qh, x, vt, bias, seeds)
    return out, (qh, x, vt, bias, seeds)


def _fused_bwd(dropout, interpret, scale, res, do):
    qh, x, vt, bias, seeds = res
    dqh, dx, dvt = _bwd_cp(dropout, interpret, scale)(
        qh, x, vt, bias, seeds, do)
    return dqh, dx, dvt, None, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attention_flops(rows: int, t: int, e: int, heads: int,
                          backward: bool = False) -> float:
    """Analytic matmul FLOPs of the fused kernel's Mosaic custom calls.

    XLA's compiled cost analysis reports 0 FLOPs for a Mosaic custom call,
    so any MFU computed from it under-counts programs that engage this
    kernel; bench.py adds these.  Per batch row and head the forward does
    S = q~ x^T (2*T*T*e) and out += A v~ (2*T*T*e); the backward recomputes
    S (2), forms dA = do v~^T (2), dv~ = A_d^T do (2), dq~ = dS x (2) and
    dx += dS^T q~ (2) — 10*T*T*e per head (_fwd_kernel / _bwd_kernel
    above).  The q~ / v~ projections run OUTSIDE the kernel as XLA einsums
    and are already counted.  ``e`` is the composed width (d_model), not
    the original head_dim.
    """
    fwd = 4.0 * heads * rows * t * t * e
    bwd = 10.0 * heads * rows * t * t * e
    return fwd + (bwd if backward else 0.0)


def fused_composed_attention(x, mask, wqk, wb, wvo, cb, *, hd,
                             dropout=0.0, rng=None, interpret=False):
    """Fused composed attention, (B, T, d) -> (B, T, d) incl. out-proj.

    Args mirror ops.attention.composed_qkvo outputs; ``hd`` is the ORIGINAL
    head_dim (the softmax scale is 1/sqrt(hd)).  ``rng`` is required when
    ``dropout`` > 0; the (B,) per-row seeds derive from it.  T must be a
    multiple of 128 (callers gate).
    """
    b, t, d = x.shape
    heads = wqk.shape[0]
    cdt = x.dtype
    qh = jnp.einsum("btc,hce->bhte", x, wqk.astype(cdt)) + \
        wb.astype(cdt)[None, :, None, :]
    vt = jnp.einsum("btc,hce->bhte", x, wvo.astype(cdt))
    if mask is None:
        bias = jnp.zeros((b, 1, t), jnp.float32)
    else:
        bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[:, None, :]
    if dropout > 0.0:
        seeds = jax.lax.bitcast_convert_type(
            jax.random.bits(rng, (1, b), jnp.uint32), jnp.int32)
    else:
        seeds = jnp.zeros((1, b), jnp.int32)
    o = _fused(float(dropout), bool(interpret),
               1.0 / float(np.sqrt(hd)), qh, x, vt, bias, seeds)
    return o + cb.astype(cdt)
