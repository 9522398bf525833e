"""Compiled-on-TPU checks + timing for the fused composed-attention kernel.

Runs the correctness suite that CPU pytest cannot (interpret-mode
pltpu.prng_random_bits is a zero stub): dropout determinism, the
linear-in-v_til mask-consistency identity, and fwd/grad parity compiled.
Then times the kernel vs the chunked stored-A lowering at the production
shape (BQ=1024, T=512, d=128, h=8, bf16), round-robin best-of-rounds with
scalar fetches.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fused_attn_check.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vidsgg_big_tpu.ops.attention import (attn_chunked_stored, composed_qkvo)
from vidsgg_big_tpu.ops.pallas_attention import fused_composed_attention

H, HD, D = 8, 16, 128
SCALE = 1.0 / np.sqrt(HD)


def make(seed, b, t, dtype):
    r = np.random.default_rng(seed)
    p = dict(
        wq=jnp.asarray(r.normal(0, 0.2, (D, H, HD)), jnp.float32),
        bq=jnp.asarray(r.normal(0, 0.05, (H, HD)), jnp.float32),
        wk=jnp.asarray(r.normal(0, 0.2, (D, H, HD)), jnp.float32),
        bk=jnp.asarray(r.normal(0, 0.05, (H, HD)), jnp.float32),
        wv=jnp.asarray(r.normal(0, 0.2, (D, H, HD)), jnp.float32),
        bv=jnp.asarray(r.normal(0, 0.05, (H, HD)), jnp.float32),
        wo=jnp.asarray(r.normal(0, 0.2, (H, HD, D)), jnp.float32),
        bo=jnp.asarray(r.normal(0, 0.05, (D,)), jnp.float32),
    )
    x = jnp.asarray(r.normal(size=(b, t, D)), dtype)
    mask = jnp.asarray(r.random((b, t)) < 0.85).at[:, 0].set(True)
    return p, x, mask


def chunked(p, x, mask, chunk, dropout=0.0, key=None):
    cdt = x.dtype
    pr = lambda w, b_: jnp.einsum("btc,chd->bthd", x, p[w].astype(cdt)) + \
        p[b_].astype(cdt)
    o = attn_chunked_stored(pr("wq", "bq"), pr("wk", "bk"), pr("wv", "bv"),
                            mask, chunk=chunk, dropout=dropout, rng=key)
    return jnp.einsum("bqhd,hdc->bqc", o, p["wo"].astype(cdt)) + \
        p["bo"].astype(cdt)


def fused(p, x, mask, dropout=0.0, key=None):
    wqk, wb, wvo, cb = composed_qkvo(p["wq"], p["bq"], p["wk"], p["wv"],
                                     p["wo"], p["bv"], p["bo"])
    return fused_composed_attention(x, mask, wqk, wb, wvo, cb, hd=HD,
                                    dropout=dropout, rng=key)


def main():
    print(jax.devices(), flush=True)

    # ---- correctness (f32, small) -----------------------------------------
    p, x, mask = make(0, 4, 256, jnp.float32)
    ref = np.asarray(jax.jit(lambda: chunked(p, x, mask, chunk=2))())
    got = np.asarray(jax.jit(lambda: fused(p, x, mask))())
    err = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"  fwd parity vs chunked     rel-err {err:.2e}", flush=True)
    # TPU f32 matmuls run through bf16 passes (CPU interpret parity is 1e-4,
    # tests/test_pallas_attention.py); 3e-2 matches the bf16-pass envelope
    assert err < 3e-2, err

    g1 = jax.jit(jax.grad(lambda pp, xx: (fused(pp, xx, mask) ** 2).sum(),
                          argnums=(0, 1)))(p, x)
    g2 = jax.jit(jax.grad(lambda pp, xx: (chunked(pp, xx, mask,
                                                  chunk=2) ** 2).sum(),
                          argnums=(0, 1)))(p, x)
    worst = 0.0
    for k in g1[0]:
        if k == "bk":
            # b_k's true gradient is 0: fused returns exactly 0; chunked
            # autodiff returns softmax-cancellation rounding noise, which at
            # TPU f32-through-bf16 matmul precision is O(1e-2) relative
            ref_mag = np.abs(np.asarray(g2[0]["bq"])).max()
            noise = np.abs(np.asarray(g2[0][k])).max() / ref_mag
            print(f"  (chunked b_k grad noise {noise:.2e} of |b_q| grad)",
                  flush=True)
            assert np.abs(np.asarray(g1[0][k])).max() <= 1e-6 * ref_mag
            assert noise <= 5e-2
            continue
        a, b = np.asarray(g1[0][k]), np.asarray(g2[0][k])
        den = max(np.abs(b).max(), 1e-6)
        worst = max(worst, np.abs(a - b).max() / den)
    a, b = np.asarray(g1[1]), np.asarray(g2[1])
    worst = max(worst, np.abs(a - b).max() / max(np.abs(b).max(), 1e-6))
    print(f"  grad parity (excl. b_k)   worst rel-err {worst:.2e}",
          flush=True)
    assert worst < 3e-2, worst

    # ---- dropout determinism + mask consistency ---------------------------
    key = jax.random.PRNGKey(3)
    f_drop = jax.jit(lambda kk: fused(p, x, mask, dropout=0.3, key=kk))
    o1, o2 = np.asarray(f_drop(key)), np.asarray(f_drop(key))
    assert (o1 == o2).all(), "dropout not deterministic under same key"
    print("  dropout determinism ok", flush=True)

    from vidsgg_big_tpu.ops.pallas_attention import _fused as fused_core
    wqk, wb, wvo, _ = composed_qkvo(p["wq"], p["bq"], p["wk"], p["wv"],
                                    p["wo"], p["bv"], p["bo"])
    qh = jnp.einsum("btc,hce->bhte", x, wqk) + wb[None, :, None, :]
    vt = jnp.einsum("btc,hce->bhte", x, wvo)
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[:, None, :]
    seeds = jnp.arange(4, dtype=jnp.int32).reshape(1, 4) + 7
    r = np.random.default_rng(9)
    cot = jnp.asarray(r.normal(size=x.shape), jnp.float32)
    # eps at full vt scale: the identity is exact at any magnitude (f is
    # linear in vt given the mask), and the difference must dominate the
    # bf16-pass rounding of each forward (a 0.1-scale eps left the finite
    # difference at ~1% of |f| — the same order as TPU matmul rounding —
    # while a wrong backward mask would show as an O(30%) deviation)
    eps = jnp.asarray(r.normal(size=vt.shape), jnp.float32) * 3.0

    def fv(vt_):
        return (fused_core(0.3, False, SCALE, qh, x, vt_, bias, seeds) *
                cot).sum()

    fv_j = jax.jit(fv)
    g_vt = jax.jit(jax.grad(fv))(vt)
    lhs = float(np.asarray(fv_j(vt + eps))) - float(np.asarray(fv_j(vt)))
    rhs = float(np.asarray((g_vt * eps).sum()))
    rel = abs(lhs - rhs) / max(abs(lhs), 1e-6)
    print(f"  bwd mask == fwd mask (linear-in-vt identity) rel {rel:.2e}",
          flush=True)
    assert rel < 2e-2, (lhs, rhs)

    # dropped mean ~ deterministic output
    # 1-corr shrinks ~1/n_seeds (residual dropout variance): 16 seeds sat
    # at 0.9875, 48 clears the 0.99 bar with margin
    outs = [np.asarray(f_drop(jax.random.PRNGKey(50 + i)))
            for i in range(48)]
    corr = np.corrcoef(np.stack(outs).mean(0).ravel(),
                       np.asarray(jax.jit(
                           lambda: fused(p, x, mask))()).ravel())[0, 1]
    print(f"  E[dropout out] vs determ  corr {corr:.4f}", flush=True)
    assert corr > 0.99, corr

    # ---- timing at the production shape -----------------------------------
    p, x, mask = make(1, 1024, 512, jnp.bfloat16)
    key = jax.random.PRNGKey(11)
    variants = {
        "chunked fwd": jax.jit(
            lambda xx: chunked(p, xx, mask, 64).astype(jnp.float32).sum()),
        "fused fwd": jax.jit(
            lambda xx: fused(p, xx, mask).astype(jnp.float32).sum()),
        "chunked+drop f+b": jax.jit(jax.value_and_grad(
            lambda xx: chunked(p, xx, mask, 64, dropout=0.1,
                               key=key).astype(jnp.float32).sum())),
        "fused+drop f+b": jax.jit(jax.value_and_grad(
            lambda xx: fused(p, xx, mask, dropout=0.1,
                             key=key).astype(jnp.float32).sum())),
    }
    for nm, f in variants.items():
        t0 = time.perf_counter()
        float(np.asarray(jax.tree_util.tree_leaves(f(x))[0]).astype(
            np.float32).sum())
        print(f"  [compile {time.perf_counter() - t0:6.1f} s] {nm}",
              flush=True)
    best = {nm: float("inf") for nm in variants}
    for rnd in range(6):
        for nm, f in variants.items():
            t0 = time.perf_counter()
            for _ in range(8):
                out = f(x)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).astype(
                np.float32).sum())
            best[nm] = min(best[nm], (time.perf_counter() - t0) / 8 * 1e3)
        print(f"  round {rnd}: " + "  ".join(f"{nm}={best[nm]:.1f}"
                                             for nm in best), flush=True)
    print("\n  best-of-rounds (ms):", flush=True)
    for nm, v in best.items():
        print(f"    {nm:20s} {v:8.2f}", flush=True)


if __name__ == "__main__":
    main()
