"""Alternative lowerings of the fused stretch+conv (exp2 geometry, TPU).

The shipped path (A) composes the repeat-stretch gather and the k3/s2
conv's patch extraction into one one-hot selection matmul (80.5 GFLOP at a
thin K=256 contraction) followed by the (3*1024 -> 512) conv matmul
(161 GFLOP).  Round-3 profiling measured the selection at 2.42 ms isolated
— a 33 TFLOP/s rate, far off the chip's ~133 TFLOP/s at fat shapes — so
this script measures whether re-associating the algebra helps:

  A. shipped: stretch_conv_patches one-hot -> patches @ W        (241 GF)
  B. stretch one-hot (T->T) -> 3 strided slices -> patches @ W   (215 GF)
  C. stretch one-hot (T->T) -> lax.conv k3 s2 p1                 (215 GF)
  D. per-tap conv on RAW frames as one wide matmul x @ [W0|W1|W2]
     (K=1024, fat) -> narrow one-hot tap-select-sum               (362 GF)

plus the full TrackletEncoder with the winning variant swapped in, so XLA
fusion effects are included.  All variants are exact re-associations (f32
matmul accumulation; D regroups the 3-tap sum, allclose-checked).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/stretch_conv_lowering.py
"""
import time
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import ml_dtypes  # noqa: E402

from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402
from vidsgg_big_tpu.data.synthetic import make_video  # noqa: E402
from vidsgg_big_tpu.data.types import pack_proposal, stack_batches  # noqa: E402
from vidsgg_big_tpu.ops.segments import (stretch_conv_patches,  # noqa: E402
                                         stretch_conv_src,
                                         stretch_lookup_matmul,
                                         adaptive_max_pool1d)

B, N, T, DF, DI, E = 8, 50, 256, 2048, 832, 512
K = 3
STRIDE = 2
PAD = 1
T_OUT = (T + 2 * PAD - K) // STRIDE + 1


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf[(slice(0, 1),) * leaf.ndim]).sum())


def timeit(fn, *args, n=40):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):             # best-of-3 windows (tunnel oscillation)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / n * 1000.0


def src_indices(idx):
    """(n, T_out, K) stretched source index per conv tap; -1 = zero pad.

    Uses the shipped op's own index algebra so every variant measures the
    exact composition stretch_conv_patches implements."""
    return stretch_conv_src(idx, T, K, STRIDE, PAD)


def variant_a(x, idx, w, b):
    patches = stretch_conv_patches(x, idx)
    return patches @ w.reshape(K * 2 * E, -1) + b


def variant_b(x, idx, w, b):
    stretched = stretch_lookup_matmul(x, idx)                # (n, T, 2E)
    p = jnp.pad(stretched, ((0, 0), (PAD, PAD), (0, 0)))
    taps = [p[:, i:i + STRIDE * T_OUT:STRIDE] for i in range(K)]
    patches = jnp.concatenate(taps, axis=-1)                 # (n, To, K*2E)
    # concat order is (tap, channel) — matches w.reshape(K*2E, F)
    return patches @ w.reshape(K * 2 * E, -1) + b


def variant_c(x, idx, w, b):
    stretched = stretch_lookup_matmul(x, idx)
    return jax.lax.conv_general_dilated(
        stretched, w, window_strides=(STRIDE,), padding=[(PAD, PAD)],
        dimension_numbers=("NWC", "WIO", "NWC")) + b


def variant_d(x, idx, w, b):
    # conv taps on RAW frames: one fat matmul, then a narrow one-hot
    # tap-select-sum over the stretched source rows
    n = x.shape[0]
    wide = jnp.moveaxis(w, 0, 1).reshape(2 * E, K * w.shape[-1])
    y = (x @ wide).reshape(n, T, K, w.shape[-1])             # (n, T, K, F)
    src = src_indices(idx)                                   # (n, To, K)
    onehot = jax.nn.one_hot(src, T, dtype=y.dtype)           # (n, To, K, T)
    return jnp.einsum("npkt,ntkd->npd", onehot, y) + b


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    bf = ml_dtypes.bfloat16

    recs = [make_video(i, video_len=480, n_gt_trajs=12, n_preds=16,
                       n_distractors=34, feat_dim=DF + DI,
                       num_enti_cats=36, num_pred_cats=133)[0]
            for i in range(B)]
    batch = stack_batches([pack_proposal(r, N, T, DF + DI,
                                         dtype=ml_dtypes.bfloat16)
                           for r in recs])
    idx = jax.device_put(jnp.asarray(batch.stretch_idx.reshape(B * N, T)))
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(B * N, T, 2 * E)).astype(bf)))
    w = jax.device_put(jnp.asarray(
        (rng.normal(size=(K, 2 * E, E)) / 55).astype(bf)))
    bias = jax.device_put(jnp.asarray(np.zeros((E,), bf)))

    fns = {"A shipped (patch one-hot -> conv matmul)": variant_a,
           "B stretch one-hot -> slices -> conv matmul": variant_b,
           "C stretch one-hot -> lax.conv": variant_c,
           "D wide matmul on raw -> narrow tap-select": variant_d}

    ref = np.asarray(jax.jit(variant_a)(x, idx, w, bias), np.float32)
    for name, fn in fns.items():
        jfn = jax.jit(fn)
        got = np.asarray(jfn(x, idx, w, bias), np.float32)
        err = float(np.max(np.abs(got - ref)))
        ms = timeit(jfn, x, idx, w, bias)
        print(f"{name:<46} {ms:8.3f} ms   max|err|={err:.4g}", flush=True)

    # full tracklet encoder with the shipped path, for scale
    from vidsgg_big_tpu.models.big_c import TrackletEncoder
    batch = jax.device_put(batch)
    enc = TrackletEncoder(E, DF, 4, compute_dtype="bfloat16",
                          name="tracklet_encoder")
    params = enc.init(jax.random.PRNGKey(0), batch)
    print(f"{'full encoder (shipped)':<46} "
          f"{timeit(jax.jit(lambda b: enc.apply(params, b)[0]), batch):8.3f}"
          " ms", flush=True)

    # full encoder with variant D swapped in (same params, same math)
    p_enc = params["params"]
    from vidsgg_big_tpu.models.layers import MLP, xavier_normal
    from vidsgg_big_tpu.models.big_c import geometry_features

    kern = p_enc["conv_feat2enti"]["kernel"].astype(bf)      # (K, 2E, E)
    cbias = p_enc["conv_feat2enti"]["bias"].astype(bf)

    def enc_d(b):
        geo = geometry_features(b)
        vis = b.feats[..., :DF]
        x_geo = MLP((E, E), kernel_init=xavier_normal).apply(
            {"params": p_enc["fc_bbox2enti"]}, geo.astype(bf))
        x_vis = MLP((E, E), kernel_init=xavier_normal).apply(
            {"params": p_enc["fc_feat2enti"]}, vis.astype(bf))
        xx = jnp.concatenate([x_geo, x_vis], axis=-1).reshape(B * N, T, -1)
        ii = b.stretch_idx.reshape(B * N, T)
        conv = variant_d(xx, ii, kern, cbias).astype(jnp.float32)
        pooled = adaptive_max_pool1d(conv, 4, axis=-2).reshape(B, N, 4 * E)
        return MLP((E, E), kernel_init=xavier_normal).apply(
            {"params": p_enc["fc_enti2enco"]}, pooled)

    ref_full = np.asarray(
        jax.jit(lambda b: enc.apply(params, b)[0])(batch), np.float32)
    got_full = np.asarray(jax.jit(enc_d)(batch), np.float32)
    err = float(np.max(np.abs(got_full - ref_full)))
    print(f"{'full encoder (variant D)':<46} "
          f"{timeit(jax.jit(enc_d), batch):8.3f} ms   max|err|={err:.4g}",
          flush=True)


if __name__ == "__main__":
    main()
