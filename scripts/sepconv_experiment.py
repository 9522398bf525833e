"""Depthwise-separable conv vs the exact fused dense conv on TPU.
Composite kernel F[k,c,o] = dw[k,0,c] * pw[0,c,o] is exact (linear ops)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

def timeit(f, *a, n=60):
    out = f(*a); float(np.asarray(jnp.sum(out)))
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    float(np.asarray(jnp.sum(out)))
    return (time.perf_counter() - t0) / n * 1e3

B, T, C, K = 1024, 512, 128, 7
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
dw = jnp.asarray(rng.normal(size=(K, 1, C)) * 0.1, jnp.float32)
pw = jnp.asarray(rng.normal(size=(1, C, C)) * 0.1, jnp.float32)
dn = jax.lax.conv_dimension_numbers(x.shape, (K, 1, C), ("NWC", "WIO", "NWC"))

@jax.jit
def separable(x, dw, pw):
    d = jax.lax.conv_general_dilated(x, dw, (1,), [(K // 2, K // 2)],
                                     dimension_numbers=dn,
                                     feature_group_count=C)
    return jax.lax.conv_general_dilated(d, pw, (1,), [(0, 0)],
                                        dimension_numbers=dn)

@jax.jit
def fused_dense(x, dw, pw):
    F = dw[:, 0, :, None] * pw[0][None]          # (K, C, C)
    return jax.lax.conv_general_dilated(x, F, (1,), [(K // 2, K // 2)],
                                        dimension_numbers=dn)

t_sep = timeit(separable, x, dw, pw)
t_fus = timeit(fused_dense, x, dw, pw)
o1 = np.asarray(separable(x, dw, pw))
o2 = np.asarray(fused_dense(x, dw, pw))
err = np.abs(o1 - o2).max() / np.abs(o1).max()
print(f"separable {t_sep:.3f} ms   fused-dense {t_fus:.3f} ms   "
      f"speedup {t_sep/t_fus:.2f}x   rel-err {err:.2e}")
