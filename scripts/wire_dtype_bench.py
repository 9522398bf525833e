"""H2D wire cost of a flagship train batch: f32 vs bf16 feature tensors.

The soak showed the exp2 train step is transfer-bound through the axon
tunnel (device step 21 ms, sustained step p50 ~5.3 s at ~1.2 GB/batch of
f32 features).  --feat_dtype bfloat16 halves the wire bytes; this measures
the actual device_put cost of one (B=8, N=50, T=256, D=2880) feature
tensor in both dtypes, fetch-synchronized (axon's block_until_ready does
not wait — CLAUDE.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/wire_dtype_bench.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import ml_dtypes
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print(jax.devices(), flush=True)
    b, n, t, d = 8, 50, 256, 2880
    rng = np.random.default_rng(0)
    base = rng.normal(size=(b, n, t, d)).astype(np.float32)
    tensors = {"float32": base, "bfloat16": base.astype(ml_dtypes.bfloat16),
               "int8": np.clip(base * 32, -127, 127).astype(np.int8)}

    # tiny jitted consumer so the timed path is put + one scalar fetch
    @jax.jit
    def consume(x):
        return jnp.float32(x[0, 0, 0, :8].astype(jnp.float32).sum())

    for name, arr in tensors.items():
        t0 = time.perf_counter()
        float(np.asarray(consume(jax.device_put(arr))))     # warm compile
        print(f"{name}: warm in {time.perf_counter() - t0:.1f} s",
              flush=True)
    out = {}
    for name, arr in tensors.items():
        times = []
        for _ in range(5):                                   # tunnel varies
            t0 = time.perf_counter()
            dev = jax.device_put(arr)
            float(np.asarray(consume(dev)))                  # sync
            times.append(time.perf_counter() - t0)
        best, med = min(times), sorted(times)[len(times) // 2]
        gb = arr.nbytes / 1e9
        out[name] = {"bytes_gb": round(gb, 3), "best_s": round(best, 3),
                     "median_s": round(med, 3),
                     "gb_per_s": round(gb / best, 3)}
        print(f"{name}: {gb:.2f} GB in {best:.2f} s best / {med:.2f} s med "
              f"({gb / best:.2f} GB/s)", flush=True)
    out["speedup_bf16"] = round(out["float32"]["best_s"] /
                                out["bfloat16"]["best_s"], 2)
    out["speedup_int8"] = round(out["float32"]["best_s"] /
                                out["int8"]["best_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
