"""MXU-friendly patch embedding: reshape + matmul instead of strided conv.

The reference towers patchify with a stride-p Conv2d over 3 input channels
(e.g. `eva_vit_model.py` PatchEmbed / open_clip `transformer.py` conv1). On
TPU that conv is a poor fit: the MXU contracts over 128-wide lanes, and a
C_in=3 convolution pads 3 -> 128, wasting ~97% of the systolic array. A
measured B/16 distill step spent 8.7 ms/step in `convolution_add_fusion`
for ~0.1 ms of useful arithmetic (PERF.md round-3 trace).

A stride-p VALID conv with kernel p x p *is* a matmul over non-overlapping
patches: reshape [B, H, W, C] -> [B, gh, gw, p*p*C] and contract with the
HWIO kernel flattened to [p*p*C, width]. K = p*p*3 (768 for p=16) aligns
with the MXU contraction dimension, and the backward (dW = patches^T @ dy)
is a matmul too.

Parameter layout is IDENTICAL to `flax.linen.Conv` — a "kernel" of shape
(p, p, C_in, features) in HWIO plus optional "bias" — so checkpoints and
the torch_io import path are unchanged; only the compute graph differs.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class PatchEmbed(nn.Module):
    """Drop-in replacement for ``nn.Conv(features, (p, p), strides=(p, p),
    padding="VALID")`` on non-overlapping patches, computed as one matmul."""

    features: int
    patch_size: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        b, h, w, cin = x.shape
        gh, gw = h // p, w // p
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, cin, self.features),
            self.param_dtype,
        )
        if h != gh * p or w != gw * p:
            # VALID conv semantics: trailing pixels that don't fill a
            # patch are dropped
            x = x[:, : gh * p, : gw * p, :]
        # [B, gh, p, gw, p, C] -> [B, gh, gw, p, p, C]: row-major flatten of
        # the last three axes matches the HWIO kernel's (kh, kw, cin) order
        xp = x.reshape(b, gh, p, gw, p, cin).transpose(0, 1, 3, 2, 4, 5)
        xp = xp.reshape(b, gh, gw, p * p * cin)
        y = jnp.dot(
            xp.astype(self.dtype),
            kernel.reshape(p * p * cin, self.features).astype(self.dtype),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y
