"""Bipartite matching for DETR-style query/ground-truth assignment.

The reference runs scipy ``linear_sum_assignment`` on CPU per video
(reference models/model_0v10.py:606-639), forcing a device->host sync in the
middle of every training step.  The TPU runtime here has **no host-callback
support**, so we solve the LAP exactly on device: :func:`lap_jv` is a pure-JAX
shortest-augmenting-path (Jonker-Volgenant) solver — the same algorithm family
as scipy's ``linear_sum_assignment`` — built from ``lax.while_loop`` +
vectorized Dijkstra relaxations, vmappable over the batch.

All entry points return fixed-shape results: for each of ``P`` (padded)
ground truths the index of its assigned query (or -1), so downstream loss
code is jit-static.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def lap_jv(cost):
    """Exact rectangular linear assignment (minimize), rows <= cols.

    Args:
      cost: (R, C) float32 with R <= C.

    Returns:
      col4row: (R,) int32 — the column assigned to each row.
    """
    r, c = cost.shape
    assert r <= c, "lap_jv requires rows <= cols; transpose the cost"
    cost = cost.astype(jnp.float32)

    def solve_row(cur_row, state):
        u, v, row4col, col4row = state
        # --- Dijkstra for the shortest augmenting path from cur_row ---
        shortest = jnp.full((c,), _INF)
        path = jnp.full((c,), -1, jnp.int32)       # predecessor row per col
        sr = jnp.zeros((r,), bool)
        sc = jnp.zeros((c,), bool)

        def dij_cond(s):
            _, _, _, _, sink, _, _ = s
            return sink < 0

        def dij_body(s):
            shortest, path, sr, sc, sink, minval, i = s
            sr = sr.at[i].set(True)
            red = minval + cost[i] - u[i] - v          # (C,)
            upd = (~sc) & (red < shortest)
            shortest = jnp.where(upd, red, shortest)
            path = jnp.where(upd, i, path)
            # pick the lowest-cost unscanned column, preferring unassigned
            # columns on ties (matches scipy's tie-break)
            masked = jnp.where(sc, _INF, shortest)
            lowest = jnp.min(masked)
            cand = (masked == lowest)
            free = cand & (row4col < 0)
            j = jnp.where(jnp.any(free), jnp.argmax(free), jnp.argmax(cand))
            sc = sc.at[j].set(True)
            sink = jnp.where(row4col[j] < 0, j, -1)
            i_next = jnp.where(row4col[j] < 0, i, row4col[j])
            return shortest, path, sr, sc, sink, lowest, i_next

        shortest, path, sr, sc, sink, minval, _ = jax.lax.while_loop(
            dij_cond, dij_body,
            (shortest, path, sr, sc, jnp.int32(-1), jnp.float32(0.0),
             cur_row))

        # --- update dual potentials ---
        u = u.at[cur_row].add(minval)
        other = sr & (jnp.arange(r) != cur_row)
        sp_at_col4row = jnp.where(
            col4row >= 0, shortest[jnp.clip(col4row, 0)], 0.0)
        u = jnp.where(other, u + minval - sp_at_col4row, u)
        v = jnp.where(sc, v - (minval - shortest), v)

        # --- augment along the alternating path ---
        def aug_cond(s):
            _, _, j, done = s
            return ~done

        def aug_body(s):
            row4col, col4row, j, _ = s
            i = path[j]
            row4col = row4col.at[j].set(i)
            j_next = col4row[i]
            col4row = col4row.at[i].set(j)
            return row4col, col4row, j_next, i == cur_row

        row4col, col4row, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (row4col, col4row, sink, False))
        return u, v, row4col, col4row

    u = jnp.zeros((r,))
    v = jnp.zeros((c,))
    row4col = jnp.full((c,), -1, jnp.int32)
    col4row = jnp.full((r,), -1, jnp.int32)
    _, _, _, col4row = jax.lax.fori_loop(
        0, r, solve_row, (u, v, row4col, col4row))
    return col4row


def _assign_single(cost, n_gt):
    """cost: (Q, P); returns (P,) query index per gt, -1 past n_gt.

    Formulated as one always-feasible rectangular LAP: rows = (padded) gts,
    columns = the Q real queries plus P virtual "unmatched" slots.  Valid gts
    pay their real costs on queries and M (just above the max real cost) on
    virtual slots; padding gts pay 0 on virtual slots and never compete for
    queries.  This reproduces scipy's min(Q, n_gt)-pair semantics for both
    n_gt <= Q and n_gt > Q and never builds an infeasible problem (an
    infeasible instance makes the augmenting search loop forever — which
    kills the TPU program).
    """
    q, p = cost.shape
    gt_valid = jnp.arange(p) < n_gt
    maxc = jnp.max(jnp.where(gt_valid[None, :], cost, -_INF))
    m = jnp.where(jnp.isfinite(maxc), jnp.abs(maxc), 0.0) + 1.0
    real = jnp.where(gt_valid[:, None], cost.T, 2.0 * m)      # (P, Q)
    virt = jnp.where(gt_valid[:, None], m,
                     0.0) * jnp.ones((p, p))                  # (P, P)
    big = jnp.concatenate([real, virt], axis=1)               # (P, Q+P)
    col4row = lap_jv(big)                                     # (P,)
    matched = (col4row < q) & gt_valid
    return jnp.where(matched, col4row, -1).astype(jnp.int32)


def hungarian(cost, n_gt):
    """Exact on-device Hungarian assignment.

    Args:
      cost: (B, Q, P) cost of assigning query q to ground truth p (entries for
        p >= n_gt[b] are ignored).
      n_gt: (B,) number of valid ground truths per element.

    Returns:
      (B, P) int32: assigned query index per ground truth, -1 for padding /
      unmatched.
    """
    return jax.vmap(_assign_single)(cost, n_gt)
