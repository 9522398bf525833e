"""Deterministic-forward comparison: chunked stored-A vs head-composed flash.

The first lowering sweep fetched the full (1024, 512, 128) output per
timing round, so its forward numbers were dominated by the ~0.7 s tunnel
transfer.  Here every variant is reduced to a scalar on device and timed
round-robin (best-of-rounds), isolating compute.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/attn_fwd_compare.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vidsgg_big_tpu.ops.attention import (
    attn_chunked_stored, composed_qkvo, attn_composed_flash)

HD, H, D = 16, 8, 128


def main():
    print(jax.devices(), flush=True)
    cdt = jnp.bfloat16
    r = np.random.default_rng(0)
    p = {k: jnp.asarray(r.normal(0, 0.08, s), jnp.float32)
         for k, s in [("Wq", (D, H, HD)), ("Wk", (D, H, HD)),
                      ("Wv", (D, H, HD)), ("Wo", (H, HD, D))]}
    p.update({k: jnp.asarray(r.normal(0, 0.02, s), jnp.float32)
              for k, s in [("bq", (H, HD)), ("bk", (H, HD)),
                           ("bv", (H, HD)), ("bo", (D,))]})

    def chunked(x, mask, chunk):
        q = jnp.einsum("btc,chd->bthd", x, p["Wq"].astype(cdt)) + \
            p["bq"].astype(cdt)
        k = jnp.einsum("btc,chd->bthd", x, p["Wk"].astype(cdt)) + \
            p["bk"].astype(cdt)
        v = jnp.einsum("btc,chd->bthd", x, p["Wv"].astype(cdt)) + \
            p["bv"].astype(cdt)
        o = attn_chunked_stored(q, k, v, mask, chunk=chunk)
        o = jnp.einsum("bqhd,hdc->bqc", o, p["Wo"].astype(cdt)) + \
            p["bo"].astype(cdt)
        return o.astype(jnp.float32).sum()

    def flash(x, mask):
        wqk, wb, wvo, cb = composed_qkvo(p["Wq"], p["bq"], p["Wk"], p["Wv"],
                                         p["Wo"], p["bv"], p["bo"])
        o = attn_composed_flash(x, mask, wqk, wb, wvo, cb, hd=HD)
        return o.astype(jnp.float32).sum()

    for bq, t in [(1024, 512), (512, 512), (256, 256)]:
        x = jnp.asarray(r.normal(size=(bq, t, D)), cdt)
        mask = jnp.ones((bq, t), bool)
        variants = {
            "chunked64": jax.jit(lambda xx, mm: chunked(xx, mm, 64)),
            "chunked128": jax.jit(lambda xx, mm: chunked(xx, mm, 128)),
            "flash": jax.jit(flash),
        }
        for nm, f in variants.items():
            t0 = time.perf_counter()
            float(np.asarray(f(x, mask)))
            print(f"  [compile {time.perf_counter() - t0:6.1f} s] "
                  f"({bq},{t}) {nm}", flush=True)
        best = {nm: float("inf") for nm in variants}
        for rnd in range(5):
            for nm, f in variants.items():
                t0 = time.perf_counter()
                for _ in range(10):
                    out = f(x, mask)
                float(np.asarray(out))
                best[nm] = min(best[nm],
                               (time.perf_counter() - t0) / 10 * 1e3)
        print(f"  (BQ={bq}, T={t}) " + "  ".join(
            f"{nm}={best[nm]:.2f}ms" for nm in best), flush=True)


if __name__ == "__main__":
    main()
