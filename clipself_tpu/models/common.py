"""Shared tower helpers (import-cycle-free home)."""

from __future__ import annotations

import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / (n + 1e-12)).astype(x.dtype)


import flax.linen as nn


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
