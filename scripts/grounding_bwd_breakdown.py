"""Attribute the grounding train step's BACKWARD time.

Round-3 breakdown (scripts/grounding_train_breakdown.py) measured the full
step at 292 ms with a 78 ms forward; backward+adam own ~214 ms.  This script
measures value_and_grad of each isolated piece at the production shapes
(B=8, T=512, Q=64 pos+neg -> BQ=1024, H=128, bf16) so the backward gap can be
pinned to a stage, including the chunked-attention remat sweep.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/grounding_bwd_breakdown.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp
    from vidsgg_big_tpu.models.grounding import (QANetEncoderLayer, ConvHead,
                                                 DepthwiseSeparableConv)

    print(jax.devices(), flush=True)
    bq, t, h = 1024, 512, 128
    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bq, t, h)), cdt)
    mask = jnp.ones((bq, t), bool)
    key = jax.random.PRNGKey(0)

    def timeit(fn, *a, n=20, label=""):
        t0 = time.perf_counter()
        out = fn(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        print(f"  [compile {time.perf_counter() - t0:6.1f} s] {label}",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        dt = (time.perf_counter() - t0) / n * 1000.0
        print(f"  {label:44s} {dt:8.2f} ms", flush=True)
        return dt

    def fwd_and_bwd(module, make_call, label, train=True):
        params = module.init(jax.random.PRNGKey(1), *make_call(x))
        rngs = {"dropout": key} if train else None

        def apply(p, xx):
            return module.apply(p, *make_call(xx), rngs=rngs).astype(
                jnp.float32).sum()

        f = jax.jit(apply)
        g = jax.jit(jax.value_and_grad(apply, argnums=(0, 1)))
        tf = timeit(f, params, x, label=f"{label} fwd")
        tg = timeit(g, params, x, label=f"{label} fwd+bwd")
        print(f"    -> bwd {tg - tf:.2f} ms ({(tg - tf) / max(tf, 1e-9):.1f}x fwd)",
              flush=True)
        return tf, tg

    # --- combined QANet encoder at the shipped chunking (budget 1 GB) ------
    enc = QANetEncoderLayer(h, 4, 7, dtype=cdt)
    fwd_and_bwd(enc, lambda xx: (xx, mask, False), "combined enc (chunk=auto)")

    # --- chunk-size sweep on the encoder -----------------------------------
    for budget in ((1 << 30) // 4, (1 << 30) // 2, 1 << 30, 1 << 31):
        chunk = bq
        while chunk * 8 * t * t * 4 > budget and chunk % 2 == 0:
            chunk //= 2
        e = QANetEncoderLayer(h, 4, 7, dtype=cdt, attn_bytes_budget=budget)
        fwd_and_bwd(e, lambda xx: (xx, mask, False),
                    f"combined enc (chunk={chunk})")

    # --- one ConvHead -------------------------------------------------------
    head = ConvHead(h, 20, sigmoid=True, dtype=cdt)
    fwd_and_bwd(head, lambda xx: (xx, mask), "conv head (5 dwsep)",
                train=False)

    # --- a bare fused dw-sep conv k=7 --------------------------------------
    conv = DepthwiseSeparableConv(h, 7, dtype=cdt)
    fwd_and_bwd(conv, lambda xx: (xx,), "dwsep conv k=7", train=False)

    # --- video encoder (B=8 rows) -------------------------------------------
    xv = jnp.asarray(rng.normal(size=(8, t, h)), cdt)
    mv = jnp.ones((8, t), bool)
    vid = QANetEncoderLayer(h, 4, 7, dtype=cdt)
    pv = vid.init(jax.random.PRNGKey(1), xv, mv, False)

    def apply_v(p, xx):
        return vid.apply(p, xx, mv, False, rngs={"dropout": key}).astype(
            jnp.float32).sum()

    tf = timeit(jax.jit(apply_v), pv, xv, label="video enc (B=8) fwd")
    tg = timeit(jax.jit(jax.value_and_grad(apply_v, argnums=(0, 1))), pv, xv,
                label="video enc (B=8) fwd+bwd")
    print(f"    -> bwd {tg - tf:.2f} ms", flush=True)

    # --- query encoder (BQ x 3 rows) ----------------------------------------
    xq = jnp.asarray(rng.normal(size=(bq, 3, h)), cdt)
    qe = QANetEncoderLayer(h, 4, 3, dtype=cdt)
    pq = qe.init(jax.random.PRNGKey(1), xq, None, False)

    def apply_q(p, xx):
        return qe.apply(p, xx, None, False, rngs={"dropout": key}).astype(
            jnp.float32).sum()

    tf = timeit(jax.jit(apply_q), pq, xq, label="query enc (BQx3) fwd")
    tg = timeit(jax.jit(jax.value_and_grad(apply_q, argnums=(0, 1))), pq, xq,
                label="query enc (BQx3) fwd+bwd")
    print(f"    -> bwd {tg - tf:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
