"""Is dynamic int8 (quantize + int8 dot + rescale) faster than bf16 end-to-end
at the encoder's shapes? Weights pre-quantized per-column; activations
quantized per-row on the fly."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes

def timeit(f, *a, n=50):
    out = f(*a); float(np.asarray(jnp.sum(out)))
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    float(np.asarray(jnp.sum(out)))
    return (time.perf_counter() - t0) / n * 1e3

M, K, N = 204800, 2048, 512
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(M, K)), ml_dtypes.bfloat16)
w = jnp.asarray(rng.normal(size=(K, N)), ml_dtypes.bfloat16)

@jax.jit
def bf16_dot(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

wq_scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
wq = jnp.round(w.astype(jnp.float32) / wq_scale).astype(jnp.int8)

@jax.jit
def int8_dot(x, wq, wq_scale):
    xs = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * wq_scale[None]).astype(jnp.bfloat16)

t_bf = timeit(bf16_dot, x, w)
t_i8 = timeit(int8_dot, x, wq, wq_scale)
o_bf = np.asarray(bf16_dot(x, w), np.float32)
o_i8 = np.asarray(int8_dot(x, wq, wq_scale), np.float32)
cos = (o_bf * o_i8).sum() / np.linalg.norm(o_bf) / np.linalg.norm(o_i8)
print(f"bf16 {t_bf:.3f} ms   int8(dyn) {t_i8:.3f} ms   speedup {t_bf/t_i8:.2f}x  cos {cos:.6f}")

# static activation scale: no row-max pass; one elementwise cast
xs_static = jnp.float32(np.abs(np.asarray(x, np.float32)).max() / 127.0)

@jax.jit
def int8_static(x, wq, wq_scale, xs):
    xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * wq_scale[None]).astype(jnp.bfloat16)

t_st = timeit(int8_static, x, wq, wq_scale, xs_static)
o_st = np.asarray(int8_static(x, wq, wq_scale, xs_static), np.float32)
cos = (o_bf * o_st).sum() / np.linalg.norm(o_bf) / np.linalg.norm(o_st)
print(f"int8(static) {t_st:.3f} ms   speedup {t_bf/t_st:.2f}x  cos {cos:.6f}")

# pre-quantized activations (int8 storage end-to-end: measures pure dot+rescale)
xq_pre = jnp.round(x.astype(jnp.float32) / xs_static).astype(jnp.int8)

@jax.jit
def int8_pre(xq, wq, wq_scale, xs):
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * wq_scale[None]).astype(jnp.bfloat16)

t_pre = timeit(int8_pre, xq_pre, wq, wq_scale, xs_static)
print(f"int8(pre-quantized input) {t_pre:.3f} ms   speedup {t_bf/t_pre:.2f}x")
