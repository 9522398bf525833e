"""How much does the attention-dropout keep-mask cost, per PRNG impl?

The grounding train step draws a bernoulli keep-mask over the full
(B*Q=1024, h=8, T=512, T=512) attention-weight tensor (2.1e9 draws) twice
per step (forward + stored-A backward regeneration).  The lowering sweep
(docs/ROUND4.md) measured that at ~93 ms of the ~209 ms attention f+b under
the default threefry2x32 PRNG — pure VPU hashing work.

Candidates, all exact-p bernoulli:

  threefry      jax.random.bernoulli under the default threefry2x32
  threefry_u8   threefry uint8 bits + integer threshold (4x fewer hash words;
                p quantized to 1/256 — NOT shipped, measurement only)
  rbg           jax.random.bernoulli under rbg (XLA RngBitGenerator —
                the TPU's hardware Philox generator)
  rbg_u32       rbg uint32 bits + integer threshold (p quantized to 2^-32,
                below f32 uniform quantization — candidate for shipping)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dropout_rng_sweep.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

SHAPE = (128, 8, 512, 512)   # one lax.map chunk of the production tensor
N_CHUNK = 8                  # chunks per step-pass
P = 0.1


def main():
    print(jax.devices(), flush=True)
    at = jnp.ones(SHAPE, jnp.bfloat16)

    def tf_bern(key):
        keep = jax.random.bernoulli(key, 1.0 - P, SHAPE)
        return jnp.where(keep, at / (1.0 - P), 0.0).sum()

    def tf_u8(key):
        thr = np.uint8(round(P * 256.0))
        keep = jax.random.bits(key, SHAPE, jnp.uint8) >= thr
        return jnp.where(keep, at / (1.0 - P), 0.0).sum()

    def rbg_u32(key):
        thr = np.uint32(round(P * 2.0 ** 32))
        keep = jax.random.bits(key, SHAPE, jnp.uint32) >= thr
        return jnp.where(keep, at / (1.0 - P), 0.0).sum()

    k_tf = jax.random.PRNGKey(0)
    k_rbg = jax.random.key(0, impl="rbg")
    variants = {
        "threefry": (jax.jit(tf_bern), k_tf),
        "threefry_u8": (jax.jit(tf_u8), k_tf),
        "rbg": (jax.jit(tf_bern), k_rbg),
        "rbg_u32": (jax.jit(rbg_u32), k_rbg),
    }

    for nm, (f, k) in variants.items():
        t0 = time.perf_counter()
        float(np.asarray(f(k)))
        print(f"  [compile {time.perf_counter() - t0:6.1f} s] {nm}",
              flush=True)

    best = {nm: float("inf") for nm in variants}
    for rnd in range(6):
        for nm, (f, k) in variants.items():
            t0 = time.perf_counter()
            for _ in range(8):
                out = f(k)
            float(np.asarray(out))
            best[nm] = min(best[nm], (time.perf_counter() - t0) / 8 * 1e3)
        print(f"  round {rnd}: " + "  ".join(
            f"{nm}={best[nm]:.2f}" for nm in best), flush=True)

    print("\n  per-chunk ms (x%d chunks x2 passes = per-step cost):"
          % N_CHUNK, flush=True)
    for nm, v in best.items():
        print(f"    {nm:14s} {v:7.2f} ms/chunk  -> {v * N_CHUNK * 2:7.1f} "
              "ms/step", flush=True)


if __name__ == "__main__":
    main()
