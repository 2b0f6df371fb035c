"""CLIP ModifiedResNet (anti-aliased RN50) with the dense protocol.

Behavioral parity targets (re-derived from the reference
`src/open_clip/modified_resnet.py`):
  - 3-conv stem + avgpool; bottlenecks with avgpool-before-stride
    anti-aliasing; attention pooling head with q/k/v/c projections
  - dense protocol: `attnpool.forward_dense` = per-token value path
    (v_proj + c_proj, no attention mixing) with bicubic pos-embed rescale
    (`modified_resnet.py:191-210`), channel-L2-normalized
  - v1 RoI features: roi_align(stage-4 map, (7,7)) -> attnpool
    (`modified_resnet.py:318-334`); v2: roi_align(dense map, 1x1)
  - mask_pool over the dense map; mask_attn_pool aliases mask_pool
    (`modified_resnet.py:344-380`)

TPU notes: BatchNorm runs in inference mode (frozen stats — the reference
freezes all BNs during distillation, `modified_resnet.py:257-284`); stats are
imported from checkpoints as constants.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from clipself_tpu.core.config import VisionConfig
from clipself_tpu.models.clip import l2_normalize
from clipself_tpu.ops.attention import multi_head_attention
from clipself_tpu.ops.interpolate import resize_2d
from clipself_tpu.ops.mask_pool import mask_pool
from clipself_tpu.ops.roi_align import denormalize_boxes, roi_align_1x1, roi_align_nxn

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """Inference-mode batch norm with loadable running stats."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        y = (x.astype(jnp.float32) - mean) / jnp.sqrt(var + 1e-5) * scale + bias
        return y.astype(self.dtype)


def _avg_pool(x, k):
    return nn.avg_pool(x, (k, k), strides=(k, k))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    EXPANSION: int = 4

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32, use_bias=False)
        out = nn.Conv(self.planes, (1, 1), name="conv1", **kw)(x)
        out = nn.relu(FrozenBatchNorm(self.planes, self.dtype, name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, name="conv2", **kw)(out)
        out = nn.relu(FrozenBatchNorm(self.planes, self.dtype, name="bn2")(out))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out_ch = self.planes * self.EXPANSION
        out = nn.Conv(out_ch, (1, 1), name="conv3", **kw)(out)
        out = FrozenBatchNorm(out_ch, self.dtype, name="bn3")(out)

        identity = x
        if self.stride > 1 or x.shape[-1] != out_ch:
            identity = x
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = nn.Conv(out_ch, (1, 1), name="downsample_conv", **kw)(identity)
            identity = FrozenBatchNorm(out_ch, self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim ** -0.5),
            (self.spacial_dim**2 + 1, self.embed_dim),
            jnp.float32,
        )
        self.q_proj = nn.Dense(self.embed_dim, name="q_proj", **kw)
        self.k_proj = nn.Dense(self.embed_dim, name="k_proj", **kw)
        self.v_proj = nn.Dense(self.embed_dim, name="v_proj", **kw)
        self.c_proj = nn.Dense(self.output_dim, name="c_proj", **kw)

    def _pos_embed(self, gh: int, gw: int) -> jnp.ndarray:
        pe = self.positional_embedding
        if (gh, gw) == (self.spacial_dim, self.spacial_dim):
            return pe
        cls_pe = pe[:1]
        grid = pe[1:].reshape(self.spacial_dim, self.spacial_dim, -1)
        grid = jnp.moveaxis(grid, -1, 0)[None]
        grid = resize_2d(grid, (gh, gw), "bicubic")[0]
        grid = jnp.moveaxis(grid, 0, -1).reshape(gh * gw, -1)
        return jnp.concatenate([cls_pe, grid], axis=0)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, h, w, C] stage-4 map -> [B, output_dim] pooled feature
        (mean token as query, standard MHA, first output token)."""
        b, gh, gw, c = x.shape
        t = x.reshape(b, gh * gw, c)
        t = jnp.concatenate([t.mean(axis=1, keepdims=True), t], axis=1)
        t = t + self._pos_embed(gh, gw).astype(t.dtype)
        q = self.q_proj(t)
        k = self.k_proj(t)
        v = self.v_proj(t)
        d = self.embed_dim // self.num_heads
        n = t.shape[1]
        out = multi_head_attention(
            q.reshape(b, n, self.num_heads, d),
            k.reshape(b, n, self.num_heads, d),
            v.reshape(b, n, self.num_heads, d),
            d ** -0.5,
            impl="xla",
        ).reshape(b, n, self.embed_dim)
        return self.c_proj(out)[:, 0]

    def forward_dense(self, x: jnp.ndarray) -> jnp.ndarray:
        """Per-token value path with pos-embed (reference `forward_dense`,
        `modified_resnet.py:191-210`): [B, h, w, C] -> [B, h, w, output_dim]."""
        b, gh, gw, c = x.shape
        t = x.reshape(b, gh * gw, c)
        t = jnp.concatenate([t.mean(axis=1, keepdims=True), t], axis=1)
        t = t + self._pos_embed(gh, gw).astype(t.dtype)
        t = self.c_proj(self.v_proj(t))
        return t[:, 1:].reshape(b, gh, gw, self.output_dim)


class ModifiedResNet(nn.Module):
    cfg: VisionConfig
    embed_dim: int
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    def setup(self):
        c = self.cfg
        width = c.width
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32, use_bias=False)
        self.conv1 = nn.Conv(width // 2, (3, 3), strides=2, padding=1, name="conv1", **kw)
        self.bn1 = FrozenBatchNorm(width // 2, self.dtype, name="bn1")
        self.conv2 = nn.Conv(width // 2, (3, 3), padding=1, name="conv2", **kw)
        self.bn2 = FrozenBatchNorm(width // 2, self.dtype, name="bn2")
        self.conv3 = nn.Conv(width, (3, 3), padding=1, name="conv3", **kw)
        self.bn3 = FrozenBatchNorm(width, self.dtype, name="bn3")

        blocks = []
        planes = [width, width * 2, width * 4, width * 8]
        for stage, (p, n) in enumerate(zip(planes, self.layers)):
            stage_blocks = []
            for i in range(n):
                stride = 2 if (i == 0 and stage > 0) else 1
                stage_blocks.append(
                    Bottleneck(p, stride, self.dtype, name=f"layer{stage+1}_{i}")
                )
            blocks.append(stage_blocks)
        self.stages = blocks
        heads = c.width * 32 // c.head_width
        self.attnpool = AttentionPool2d(
            c.image_size // 32, width * 32, heads, self.embed_dim, self.dtype, name="attnpool"
        )

    def _trunk(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = nn.relu(self.bn1(self.conv1(x)))
        x = nn.relu(self.bn2(self.conv2(x)))
        x = nn.relu(self.bn3(self.conv3(x)))
        x = _avg_pool(x, 2)
        for stage in self.stages:
            for blk in stage:
                x = blk(x)
        return x  # [B, H/32, W/32, width*32]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.attnpool(self._trunk(x))

    def encode_dense(self, x: jnp.ndarray, keep_shape: bool = True) -> jnp.ndarray:
        dense = self.attnpool.forward_dense(self._trunk(x))
        dense = l2_normalize(dense)
        if keep_shape:
            return dense
        b, gh, gw, c = dense.shape
        return dense.reshape(b, gh * gw, c)

    def extract_roi_features(
        self, x: jnp.ndarray, normed_boxes: jnp.ndarray, extract_type: str = "v1"
    ) -> jnp.ndarray:
        if extract_type == "v1":
            feats = self._trunk(x)
            _, gh, gw, _ = feats.shape
            boxes = denormalize_boxes(normed_boxes, gh, gw)
            tar = self.attnpool.spacial_dim
            b, m = normed_boxes.shape[:2]
            rois = roi_align_nxn(feats, boxes, (tar, tar))  # [B, M, t, t, C]
            rois = rois.reshape(b * m, tar, tar, -1)
            return self.attnpool(rois).reshape(b, m, -1)
        dense = self.encode_dense(x, keep_shape=True)
        _, gh, gw, _ = dense.shape
        return roi_align_1x1(dense, denormalize_boxes(normed_boxes, gh, gw))

    def mask_pool(self, x: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
        dense = self.encode_dense(x, keep_shape=True)
        return mask_pool(dense, masks)

    def mask_attn_pool(self, x: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
        # reference aliases mask_attn_pool to mask_pool for RN
        # (`modified_resnet.py:344-346`)
        return self.mask_pool(x, masks)

    def encode_rois_and_image(self, x: jnp.ndarray, normed_boxes: jnp.ndarray):
        feats = self._trunk(x)
        image = l2_normalize(self.attnpool(feats))
        dense = l2_normalize(self.attnpool.forward_dense(feats))
        _, gh, gw, _ = dense.shape
        rois = roi_align_1x1(dense, denormalize_boxes(normed_boxes, gh, gw))
        return l2_normalize(rois), image
