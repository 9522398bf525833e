"""Microbench: XLA matmul TFLOP/s at the encoder's exact shapes (TPU)."""
import time
import numpy as np
import jax
import jax.numpy as jnp


def bench(m, k, n, dtype, n_iter=50):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, k)), dtype)
    b = jnp.asarray(rng.normal(size=(k, n)), dtype)
    f = jax.jit(lambda a, b: jnp.dot(a, b,
                                     preferred_element_type=jnp.float32))
    out = f(a, b)
    float(np.asarray(jnp.sum(out)))        # fetch a scalar, not the matrix
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f(a, b)
    float(np.asarray(jnp.sum(out)))
    dt = (time.perf_counter() - t0) / n_iter
    tf = 2 * m * k * n / dt / 1e12
    print(f"({m:7d}x{k:5d})x({k:5d}x{n:5d}) {np.dtype(dtype).name:9s} "
          f"{dt * 1e3:7.3f} ms  {tf:6.1f} TFLOP/s")
    return tf


if __name__ == "__main__":
    import ml_dtypes
    bf16 = ml_dtypes.bfloat16
    B = 16
    rows = B * 50 * 256                       # per-frame rows at B=16
    bench(rows, 2048, 512, bf16)              # fc_feat2enti layer 1
    bench(rows, 512, 512, bf16)               # layer 2
    bench(B * 50 * 128, 3072, 512, bf16)      # fused stretch+conv
    bench(rows, 2048, 2048, bf16)             # wider-N reference point
    bench(8192, 8192, 8192, bf16)             # square big reference
    bench(rows, 2048, 512, jnp.int8)          # int8 rate at our shape
    bench(8192, 8192, 8192, jnp.int8)
