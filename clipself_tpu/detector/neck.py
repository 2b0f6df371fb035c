"""ViT feature pyramid + FPN neck.

`SimpleFeaturePyramid` turns the four equal-resolution ViT taps into a
4x / 2x / 1x / 0.5x pyramid (reference `interpolate1..4`,
`F-ViT/models/evaclip_vit.py:26-36,108-111`); `FPN` is the standard mmdet
FPN with norm'd lateral/output convs and an extra max-pooled level
(`configs/ov_coco/...eva_original.py:18-23`).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from clipself_tpu.detector.layers import ConvNorm, DeconvNorm, make_norm, max_pool_2x2
from clipself_tpu.ops.interpolate import resize_nhwc

Dtype = Any


class SimpleFeaturePyramid(nn.Module):
    """[B,h,w,width] x4 (stride-16 taps) -> strides (4, 8, 16, 32)."""

    width: int
    norm: str = "gn"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, taps: Sequence[jnp.ndarray]) -> list[jnp.ndarray]:
        assert len(taps) == 4, "expected 4 backbone taps"
        up4_a = DeconvNorm(self.width, norm=self.norm, act=True, dtype=self.dtype, name="up4_a")
        up4_b = DeconvNorm(self.width, norm="none", act=False, dtype=self.dtype, name="up4_b")
        up2 = DeconvNorm(self.width, norm="none", act=False, dtype=self.dtype, name="up2")
        p4 = up4_b(up4_a(taps[0]))
        p8 = up2(taps[1])
        p16 = taps[2]
        p32 = max_pool_2x2(taps[3])
        return [p4, p8, p16, p32]


class FPN(nn.Module):
    """Top-down feature pyramid (mmdet FPN semantics: 1x1 laterals, nearest
    top-down sum, 3x3 output convs, extra stride-64 level by max-pool)."""

    out_channels: int = 256
    num_outs: int = 5
    norm: str = "gn"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> list[jnp.ndarray]:
        n = len(inputs)
        laterals = []
        for i, x in enumerate(inputs):
            y = nn.Conv(
                self.out_channels, (1, 1), use_bias=self.norm == "none",
                dtype=self.dtype, param_dtype=jnp.float32, name=f"lateral_{i}",
            )(x)
            norm = make_norm(self.norm, f"lateral_norm_{i}", self.out_channels)
            if norm is not None:
                y = norm(y).astype(self.dtype)
            laterals.append(y)
        for i in range(n - 1, 0, -1):
            up = resize_nhwc(laterals[i], laterals[i - 1].shape[1:3], method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            ConvNorm(
                self.out_channels, kernel=3, norm=self.norm, act=False,
                dtype=self.dtype, name=f"fpn_conv_{i}",
            )(laterals[i])
            for i in range(n)
        ]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs
