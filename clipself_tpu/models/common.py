"""Shared tower helpers (import-cycle-free home)."""

from __future__ import annotations

import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / (n + 1e-12)).astype(x.dtype)


import flax.linen as nn


class AttentionalPooler(nn.Module):
    """Learnable-query cross-attention pooling (reference `AttentionalPooler`,
    `src/open_clip/transformer.py:163-186`): `n_queries` learned queries of
    width `d_model` attend over a `context_dim`-wide token sequence through a
    torch-MultiheadAttention-equivalent (separate q/k/v projections because
    kdim != embed_dim) and an output projection.

    Param names mirror the torch module for state-dict interop
    (`torch_io._vision_key_map`): query, ln_q, ln_k, q_proj/k_proj/v_proj,
    out_proj.
    """

    d_model: int
    context_dim: int
    n_head: int = 8
    n_queries: int = 256
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        from clipself_tpu.ops.attention import multi_head_attention

        b = tokens.shape[0]
        q = self.param(
            "query", nn.initializers.normal(1.0), (self.n_queries, self.d_model),
            jnp.float32,
        )
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        ln = dict(dtype=jnp.float32, param_dtype=jnp.float32)
        tokens = nn.LayerNorm(epsilon=1e-5, name="ln_k", **ln)(tokens).astype(self.dtype)
        qx = nn.LayerNorm(epsilon=1e-5, name="ln_q", **ln)(q).astype(self.dtype)
        qx = jnp.broadcast_to(qx, (b,) + qx.shape)
        h = self.n_head
        d = self.d_model // h
        qh = nn.Dense(self.d_model, name="q_proj", **kw)(qx).reshape(b, -1, h, d)
        kh = nn.Dense(self.d_model, name="k_proj", **kw)(tokens).reshape(b, -1, h, d)
        vh = nn.Dense(self.d_model, name="v_proj", **kw)(tokens).reshape(b, -1, h, d)
        out = multi_head_attention(qh, kh, vh, d ** -0.5)
        out = out.reshape(b, self.n_queries, self.d_model)
        return nn.Dense(self.d_model, name="out_proj", **kw)(out)


class LayerScale(nn.Module):
    """Per-channel learned residual-branch scale (reference `LayerScale`,
    `src/open_clip/transformer.py`: gamma initialized to ls_init_value)."""

    dim: int
    init_value: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,), jnp.float32
        )
        return x * gamma.astype(x.dtype)
