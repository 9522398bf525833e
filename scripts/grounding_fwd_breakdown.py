"""Isolated submodule timings of the grounding forward at the bench
geometry (B=8, T=512, Q=64 -> pos+neg flattened BQ=1024, H=128, bf16).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/grounding_fwd_breakdown.py
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
    x = jax.device_put(jnp.asarray(rng.normal(size=(bq, t, h)), cdt))
    mask = jax.device_put(jnp.ones((bq, t), bool))

    def timeit(raw_fn, *a, n=20, label=""):
        # reduce on device so the sync fetch is a scalar, not the full
        # (BQ, T, H) tensor over the tunnel
        fn = jax.jit(lambda *args: jnp.asarray(
            jax.tree_util.tree_leaves(raw_fn(*args))[0],
            jnp.float32).sum())
        t0 = time.perf_counter()
        out = fn(*a)
        float(np.asarray(out))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        float(np.asarray(out))
        dt = (time.perf_counter() - t0) / n * 1000.0
        print(f"  {label:44s} {dt:8.2f} ms   (compile {c:5.1f} s)",
              flush=True)
        return dt

    # combined encoder (the big one: 4 convs k=7 + attn + fc over BQ x T)
    enc = QANetEncoderLayer(h, 4, 7, dtype=cdt)
    p_enc = enc.init(jax.random.PRNGKey(0), x, mask=mask)
    timeit(jax.jit(lambda p, v: enc.apply(p, v, mask=mask)), p_enc, x,
           label="combined QANet encoder (BQ=1024, T=512)")

    # one conv head (5 dw-sep convs)
    head = ConvHead(h, 10, dtype=cdt)
    p_head = head.init(jax.random.PRNGKey(0), x, mask=mask)
    timeit(jax.jit(lambda p, v: head.apply(p, v, mask=mask)), p_head, x,
           label="one ConvHead (5 convs)")

    # one bare fused dense conv k=3 (the head building block)
    conv = DepthwiseSeparableConv(h, 3, dtype=cdt)
    p_conv = conv.init(jax.random.PRNGKey(0), x)
    timeit(jax.jit(lambda p, v: conv.apply(p, v)), p_conv, x,
           label="bare dw-sep conv k=3")

    conv7 = DepthwiseSeparableConv(h, 7, dtype=cdt)
    p_conv7 = conv7.init(jax.random.PRNGKey(0), x)
    timeit(jax.jit(lambda p, v: conv7.apply(p, v)), p_conv7, x,
           label="bare dw-sep conv k=7")

    # bare equivalent matmul: (BQ*T, k*h) @ (k*h, h) for k=3
    a3 = jax.device_put(jnp.asarray(rng.normal(size=(bq * t, 3 * h)), cdt))
    w3 = jax.device_put(jnp.asarray(rng.normal(size=(3 * h, h)), cdt))
    timeit(jax.jit(lambda a, w: a @ w), a3, w3,
           label="bare matmul (524288 x 384 @ 384 x 128)")

    # the chunked attention alone (budget chunking as in the layer)
    hds = 8
    hd = h // hds
    q = jax.device_put(jnp.asarray(rng.normal(size=(bq, t, hds, hd)), cdt))

    def attn(qh):
        def blk(args):
            qc, kc, vc = args
            lg = jnp.einsum("bqhd,bkhd->bhqk", qc, kc).astype(
                jnp.float32) / np.sqrt(hd)
            at = jax.nn.softmax(lg, axis=-1).astype(vc.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", at, vc)
        chunk = 64
        n_blk = bq // chunk
        ops = tuple(qh.reshape(n_blk, chunk, t, hds, hd) for _ in range(3))
        return jax.lax.map(blk, ops)

    timeit(jax.jit(attn), q, label="chunked attention (16 blocks of 64)")

    # elementwise tax: one layernorm(f32) + mask-zero + residual pass
    def ln_pass(v):
        m = v.astype(jnp.float32)
        m = (m - m.mean(-1, keepdims=True)) / jnp.sqrt(
            m.var(-1, keepdims=True) + 1e-6)
        return jnp.where(mask[:, :, None], m.astype(cdt) + v, 0)
    timeit(jax.jit(ln_pass), x, label="one LN(f32)+residual+mask pass")


if __name__ == "__main__":
    main()
