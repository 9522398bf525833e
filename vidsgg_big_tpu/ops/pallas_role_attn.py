"""Pallas TPU kernel: fused role-factored bipartite attention.

The BIG-C decoder's signature op (reference models/model_0v10.py:196-214):
for each of 2 roles r, attention logits between predicate queries and entity
nodes, then the *product* of a softmax over entities and a softmax over roles,
then the value matmul against the entity nodes:

  logits[r, q, n] = <p[r, q], e[r, n]> / sqrt(dim_enti)
  att = softmax_n(mask(logits)) * softmax_r(logits)
  values[r, q, :] = att[r, q, :] @ enco

One video's whole computation fits VMEM, so the kernel runs the full chain —
two matmuls, two softmaxes, masking, product, value matmul — without touching
HBM for any intermediate.  Grid = (B,).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(p_ref, e_ref, enco_ref, mask_ref, att_ref, val_ref, *,
            dim_enti: int):
    # blocks (leading batch dim 1): p (1,2,Q,Dh); e (1,2,N,Dh); enco (1,N,De)
    scale = 1.0 / np.sqrt(dim_enti)
    logits = jnp.stack([
        jnp.dot(p_ref[0, r], e_ref[0, r].T,
                preferred_element_type=jnp.float32)
        for r in range(2)], axis=0) * scale                  # (2, Q, N)

    valid = mask_ref[0, 0] > 0                               # (N,)
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    masked = jnp.where(valid[None, None, :], logits, neg)
    m = jnp.max(masked, axis=-1, keepdims=True)
    ex = jnp.exp(masked - m)
    att_enti = ex / jnp.sum(ex, axis=-1, keepdims=True)
    att_enti = jnp.where(valid[None, None, :], att_enti, 0.0)

    r_m = jnp.max(logits, axis=0, keepdims=True)
    r_ex = jnp.exp(logits - r_m)
    att_role = r_ex / jnp.sum(r_ex, axis=0, keepdims=True)

    att = att_enti * att_role                                # (2, Q, N)
    att_ref[0] = att
    val_ref[0] = jnp.stack([
        jnp.dot(att[r], enco_ref[0], preferred_element_type=jnp.float32)
        for r in range(2)], axis=0)                          # (2, Q, De)


def role_attention_flops(b: int, q: int, n: int, dh: int, de: int) -> float:
    """Analytic matmul FLOPs of one fused role-attention custom call (XLA
    cost analysis reports 0 for Mosaic custom calls; bench.py adds these).
    Per (batch row, role): logits = p e^T (2*Q*N*Dh) and values = att enco
    (2*Q*N*De), two roles per row (_kernel above)."""
    return 2.0 * b * (2.0 * q * n * dh + 2.0 * q * n * de)


def role_attention(pred2att, enti2att, enco, traj_mask,
                   dim_enti: int, interpret: bool = False):
    """Fused role attention.

    Args:
      pred2att: (B, 2, Q, Dh) query projections (role-split halves).
      enti2att: (B, 2, N, Dh) entity projections.
      enco: (B, N, De) entity nodes (value source).
      traj_mask: (B, N) validity.

    Returns:
      att (B, 2, Q, N) float32, values (B, 2, Q, De) float32.
    """
    b, _, q, dh = pred2att.shape
    n = enti2att.shape[2]
    de = enco.shape[-1]
    mask_i32 = traj_mask.astype(jnp.int32)[:, None, :]       # (B, 1, N)

    grid = (b,)
    kernel = functools.partial(_kernel, dim_enti=dim_enti)
    att, values = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, q, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, de), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, q, n), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, q, de), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2, q, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 2, q, de), jnp.float32),
        ],
        interpret=interpret,
    )(pred2att.astype(jnp.float32), enti2att.astype(jnp.float32),
      enco.astype(jnp.float32), mask_i32)
    return att, values


def role_attention_reference(pred2att, enti2att, enco, traj_mask,
                             dim_enti: int):
    """Plain-XLA implementation (used on CPU and as the parity oracle)."""
    logits = jnp.einsum("brqd,brnd->brqn", pred2att, enti2att) / np.sqrt(
        dim_enti)
    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
    masked = jnp.where(traj_mask[:, None, None, :], logits, neg)
    att_enti = jax.nn.softmax(masked, axis=-1)
    att_enti = jnp.where(traj_mask[:, None, None, :], att_enti, 0.0)
    att_role = jax.nn.softmax(logits, axis=1)
    att = att_enti * att_role
    values = jnp.einsum("brqn,bnd->brqd", att, enco)
    return att, values
