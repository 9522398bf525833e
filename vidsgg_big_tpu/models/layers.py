"""Shared transformer building blocks (flax.linen), batched and masked.

The reference processes one video at a time with seq-len = n_trajs and
batch = 1 (reference models/model_0v10.py:459-467); here every layer takes a
(B, ...) batch with validity masks so a whole bucket of videos is one call.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

xavier_normal = nn.initializers.glorot_normal()
xavier_uniform = nn.initializers.glorot_uniform()


def packed_qkv_xavier(base_init):
    """Xavier init with the *packed* in_proj fan of torch MultiheadAttention.

    The reference xavier-initializes the packed (3D, D) in_proj matrix
    (reference models/model_0v10.py:349-355), giving std sqrt(2/(D + 3D));
    flax's per-head (D, h, hd) kernels would see fan (D, D) and come out
    sqrt(2) larger — enough to change early training dynamics.  This wraps
    glorot_{normal,uniform} to use the packed fan on the per-head shape.
    """
    import jax

    base = (jax.nn.initializers.variance_scaling(
        1.0, "fan_avg", "truncated_normal")
        if base_init is xavier_normal else
        jax.nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"))

    def init(key, shape, dtype=jnp.float32):
        # DenseGeneral flattens the per-head kernel to (D, h*hd) before
        # calling the initializer; accept that or the unflattened 3-D shape
        d = shape[0]
        # emulate fan_avg of (3D, D): (fan_in + fan_out)/2 = 2D
        return base(key, (d, 3 * d), dtype)[:, :d].reshape(shape)

    return init


def sine_pos_embedding(length: int, d_model: int) -> np.ndarray:
    """Sinusoidal positional embedding, reference models/model_0v10.py:228-237."""
    i = np.arange(d_model)
    freqs = np.where(i % 2 == 0, 10000.0 ** (-i / d_model),
                     -(10000.0 ** ((1 - i) / d_model)))
    phases = np.where(i % 2 == 0, 0.0, np.pi / 2)
    pos = np.arange(length)[:, None].astype(np.float64)
    return np.sin(pos * freqs[None, :] + phases[None, :]).astype(np.float32)


class Int8Dense(nn.Module):
    """Dense over int8 activations via the int8 MXU path (inference only).

    Parameters are stored float32 under the same names/shapes as ``nn.Dense``
    (checkpoints and torch transplants are unaffected); the kernel is
    quantized per output column at apply time (tiny vs the activations), the
    dot accumulates in int32, and the product of the activation scale and the
    column scales dequantizes the result.  Measured 1.5x the bf16 rate at the
    encoder's (M x 2048) x (2048 x 512) shape — but only when the activations
    are *stored* int8; any on-the-fly activation-quantize pass costs more
    than the dot saves (scripts/int8_experiment.py).
    """
    features: int
    kernel_init: callable = xavier_normal

    @nn.compact
    def __call__(self, x, input_scale):
        assert x.dtype == jnp.int8, x.dtype
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        sw = jnp.max(jnp.abs(kernel), axis=0) / 127.0
        kq = jnp.round(kernel / sw).astype(jnp.int8)
        acc = jnp.dot(x, kq, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (input_scale * sw) + bias
        return y.astype(jnp.bfloat16)


class MLP(nn.Module):
    """Linear->ReLU stacks used throughout (fc_feat2enti etc.).

    When the input arrives in a low-precision dtype the matmuls run in that
    dtype on the MXU (params stay float32).  int8 inputs (quantized feature
    storage) run the first layer through :class:`Int8Dense`; pass the
    dequantization ``input_scale`` (broadcastable to the batch shape)."""
    features: tuple
    final_relu: bool = True
    kernel_init: callable = xavier_normal

    @nn.compact
    def __call__(self, x, input_scale=None):
        start = 0
        if x.dtype == jnp.int8:
            assert input_scale is not None, "int8 MLP input needs a scale"
            x = Int8Dense(self.features[0], kernel_init=self.kernel_init,
                          name="dense0")(x, input_scale)
            if len(self.features) > 1 or self.final_relu:
                x = nn.relu(x)
            start = 1
        dtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float16) else None
        for k, f in list(enumerate(self.features))[start:]:
            x = nn.Dense(f, kernel_init=self.kernel_init, dtype=dtype,
                         name=f"dense{k}")(x)
            if k < len(self.features) - 1 or self.final_relu:
                x = nn.relu(x)
        return x


class MultiHeadAttention(nn.Module):
    """Standard MHA with additive key-padding masking.

    Equivalent math to torch.nn.MultiheadAttention (packed qkv + out proj).
    """
    dim: int
    num_heads: int
    dropout: float = 0.1
    kernel_init: callable = xavier_normal

    @nn.compact
    def __call__(self, q, k, v, key_mask=None, deterministic=True):
        # q: (B, Lq, D); k, v: (B, Lk, D); key_mask: (B, Lk) bool (True=valid)
        h, d = self.num_heads, self.dim
        hd = d // h
        dense = lambda name: nn.DenseGeneral(
            (h, hd), axis=-1, kernel_init=self.kernel_init, name=name)
        qkv = lambda name: nn.DenseGeneral(
            (h, hd), axis=-1, kernel_init=packed_qkv_xavier(self.kernel_init),
            name=name)
        qh = qkv("q")(q)
        kh = qkv("k")(k)
        vh = qkv("v")(v)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(hd)
        if key_mask is not None:
            neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
            logits = jnp.where(key_mask[:, None, None, :], logits, neg)
        attn = nn.softmax(logits, axis=-1)
        if key_mask is not None:
            # rows with zero valid keys produce uniform garbage; zero them
            attn = jnp.where(key_mask[:, None, None, :], attn, 0.0)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
        out = nn.DenseGeneral(d, axis=(-2, -1), kernel_init=self.kernel_init,
                              name="out")(out)
        return out


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer (reference models/model_0v10.py:70-139)."""
    dim: int
    num_heads: int
    dim_ffn: int
    dropout: float = 0.1
    kernel_init: callable = xavier_normal

    @nn.compact
    def __call__(self, src, key_mask=None, pos=None, deterministic=True):
        qk = src if pos is None else src + pos
        src2 = MultiHeadAttention(
            self.dim, self.num_heads, self.dropout,
            kernel_init=self.kernel_init, name="self_attn")(
                qk, qk, src, key_mask=key_mask, deterministic=deterministic)
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        src = nn.LayerNorm(name="norm1")(src)
        src2 = nn.Dense(self.dim_ffn, kernel_init=self.kernel_init,
                        name="linear1")(src)
        src2 = nn.Dropout(self.dropout)(nn.relu(src2),
                                        deterministic=deterministic)
        src2 = nn.Dense(self.dim, kernel_init=self.kernel_init,
                        name="linear2")(src2)
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        return nn.LayerNorm(name="norm2")(src)


class RoleAttnDecoderLayer(nn.Module):
    """Role-factored cross-attention decoder (reference model_0v10.py:142-225).

    Produces the soft bipartite adjacency ``att`` (B, 2, Q, N): a product of a
    softmax over entities (axis N, masked to valid trajectories) and a softmax
    over the two roles (subject/object).
    """
    dim_pred: int
    num_heads: int
    dim_enti: int
    dim_att: int
    dim_ffn: int
    dropout: float = 0.1
    kernel_init: callable = xavier_normal
    use_pallas: bool = False   # force the fused Pallas kernel.  Measured on
    # v5e (fp32, Q=192, Dh=256, De=512): XLA wins at B<=8 (0.56 vs 0.76 ms at
    # N=180), the kernel wins 1.3x from B~24 up (0.81 vs 1.08 ms at B=32) —
    # so it auto-engages at large batches and stays off otherwise.

    @nn.compact
    def __call__(self, pred_query, pos_emb, enco_output, traj_mask,
                 deterministic=True):
        # pred_query: (B, Q, Dp); pos_emb: (Q, Dp); enco_output: (B, N, De)
        qk = pred_query + pos_emb[None]
        pq2 = MultiHeadAttention(
            self.dim_pred, self.num_heads, self.dropout,
            kernel_init=self.kernel_init, name="self_attn")(
                qk, qk, pred_query, deterministic=deterministic)
        pred_query = nn.LayerNorm(name="norm1")(pred_query + pq2)

        pred_query = pred_query + pos_emb[None]
        enti2att = nn.Dense(self.dim_att, kernel_init=self.kernel_init,
                            name="fc_enti2att")(enco_output)   # (B, N, Da)
        pred2att = nn.Dense(self.dim_att, kernel_init=self.kernel_init,
                            name="fc_pred2att")(pred_query)    # (B, Q, Da)
        half = self.dim_att // 2
        # role r uses the r-th half of the att projection (equivalent to two
        # separate half-width projections; reference model_0v10.py:193-194)
        e = jnp.stack([enti2att[..., :half], enti2att[..., half:]], axis=1)
        p = jnp.stack([pred2att[..., :half], pred2att[..., half:]], axis=1)
        from ..ops.pallas_role_attn import (role_attention,
                                            role_attention_reference)
        import jax
        # inference only: pallas_call has no reverse-mode AD rule, so the
        # kernel must never engage inside a grad trace (training passes
        # deterministic=False) — jax.grad would fail at linearization
        auto_pallas = (pred_query.shape[0] >= 24
                       and jax.default_backend() != "cpu")
        fn = (role_attention
              if deterministic and (self.use_pallas or auto_pallas)
              else role_attention_reference)
        att, values = fn(p, e, enco_output, traj_mask,
                         dim_enti=self.dim_enti)
        role_q = 0.0
        for r in range(2):
            role_q = role_q + MLP(
                (self.dim_pred, self.dim_pred), final_relu=False,
                kernel_init=self.kernel_init,
                name=f"fc_rolewise{r}")(values[:, r])
        pred_query = nn.LayerNorm(name="norm2")(pred_query + role_q)

        ffn = nn.Dense(self.dim_ffn, kernel_init=self.kernel_init,
                       name="fc2_0")(pred_query)
        ffn = nn.Dropout(self.dropout)(nn.relu(ffn),
                                       deterministic=deterministic)
        ffn = nn.Dense(self.dim_pred, kernel_init=self.kernel_init,
                       name="fc2_1")(ffn)
        pred_query = nn.LayerNorm(name="norm3")(pred_query + ffn)
        return pred_query, att
