"""Native Swin Transformer tower with the reference's timm-adapter protocol.

The reference's `swin_base_patch4_window7_224.json` builds a `TimmModel`
(`src/open_clip/timm_model.py:29-108`) around a timm Swin trunk with the
network-default avg pooling (timm_pool="" keeps the trunk's own pooled head)
and a bias-free linear projection into the joint space. This is the
TPU-native equivalent: the full Swin-B architecture (windowed attention with
relative position bias, shifted windows via cyclic roll + static region
masks, patch merging between stages) in channels-last Flax.

Dense protocol notes: the reference's `TimmModel.encode_dense`
(`timm_model.py:177-190`) reads `trunk.head.norm` on an NCHW map — that
attribute only exists on convnet trunks (ConvNeXt); calling it on a timm
Swin/ViT trunk raises, so the reference effectively ships these configs as
contrastive towers only. Here the protocol is defined the natural way for
Swin: the trunk's final LayerNorm is already per-position, so
`encode_dense` = proj(norm(final 7x7 map)) per position, exactly consistent
with the pooled forward = proj(mean(norm(map))). RoI v1
(`timm_model.py:163-174` semantics) aligns the (normed) trunk map to the
224-native grid and avg-pools each RoI through the head.

Weight interop uses the classic timm Swin state-dict layout
(`visual.trunk.patch_embed.*, visual.trunk.layers.{i}.blocks.{j}.*,
visual.trunk.layers.{i}.downsample.*, visual.trunk.norm.*,
visual.head.proj.*`) — the layout of the original MSR checkpoints and the
HF conversion sources.

TPU-first: every window partition/shift is a static reshape/roll at trace
time (no dynamic shapes), region masks and relative-position indices are
numpy constants baked at trace time, and the 49-token window attention runs
as one batched einsum over all windows (MXU-friendly [B*nW, 49, C] GEMMs).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clipself_tpu.core.config import VisionConfig
from clipself_tpu.models.common import l2_normalize
from clipself_tpu.ops.mask_pool import mask_pool
from clipself_tpu.ops.patchify import PatchEmbed
from clipself_tpu.ops.roi_align import denormalize_boxes, roi_align_1x1, roi_align_nxn

Dtype = Any

# (embed_dim, depths, num_heads, window_size) per timm model name
SWIN_ARCHS: dict[str, tuple[int, Tuple[int, ...], Tuple[int, ...], int]] = {
    "swin_tiny_patch4_window7_224": (96, (2, 2, 6, 2), (3, 6, 12, 24), 7),
    "swin_small_patch4_window7_224": (96, (2, 2, 18, 2), (3, 6, 12, 24), 7),
    "swin_base_patch4_window7_224": (128, (2, 2, 18, 2), (4, 8, 16, 32), 7),
    "swin_large_patch4_window7_224": (192, (2, 2, 18, 2), (6, 12, 24, 48), 7),
}


def _ln(name: str, eps: float = 1e-5):
    return nn.LayerNorm(epsilon=eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name)


@lru_cache(maxsize=64)
def _relative_position_index(ws: int) -> np.ndarray:
    """[ws^2, ws^2] index into the (2ws-1)^2 relative-position-bias table
    (MSR Swin `WindowAttention.__init__`)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, ws^2, ws^2]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


@lru_cache(maxsize=64)
def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """[nW, ws^2, ws^2] additive mask (-100 across shifted-region pairs) for
    the cyclic-shift trick (MSR Swin `SwinTransformerBlock.attn_mask`)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B * nW, ws*ws, C] (static reshapes only)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of `_window_partition`."""
    bnw, _, c = x.shape
    b = bnw // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


class SwinBlock(nn.Module):
    """Pre-norm Swin block: (shifted-)window attention with relative
    position bias, then 4x MLP; both residual."""

    dim: int
    num_heads: int
    window_size: int
    shift: int  # 0 or window_size // 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws, shift = self.window_size, self.shift
        if min(h, w) <= ws:
            # resolution <= window: one global window, no shift (timm/MSR
            # `SwinTransformerBlock.__init__` clamps exactly this way)
            ws, shift = min(h, w), 0
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        nh = self.num_heads
        hd = c // nh

        shortcut = x
        x = _ln("norm1")(x).astype(self.dtype)
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        xw = _window_partition(x, ws)  # [B*nW, ws^2, C]
        qkv = nn.Dense(3 * c, name="attn_qkv", **kw)(xw)
        q, k, v = jnp.split(qkv.reshape(-1, ws * ws, 3, nh, hd), 3, axis=2)
        q, k, v = (t.squeeze(2) for t in (q, k, v))  # [B*nW, ws^2, nH, hd]
        logits = jnp.einsum(
            "wqhd,wkhd->whqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        table = self.param(
            "rel_pos_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, nh),
            jnp.float32,
        )
        idx = jnp.asarray(_relative_position_index(ws))
        bias = table[idx.reshape(-1)].reshape(ws * ws, ws * ws, nh)
        logits = logits + bias.transpose(2, 0, 1)[None]
        if shift:
            amask = jnp.asarray(_shift_attn_mask(h, w, ws, shift))  # [nW,q,k]
            nw = amask.shape[0]
            logits = logits.reshape(b, nw, nh, ws * ws, ws * ws)
            logits = logits + amask[None, :, None]
            logits = logits.reshape(b * nw, nh, ws * ws, ws * ws)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        xw = jnp.einsum("whqk,wkhd->wqhd", probs, v).reshape(-1, ws * ws, c)
        xw = nn.Dense(c, name="attn_proj", **kw)(xw)
        x = _window_reverse(xw, ws, h, w)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x

        y = _ln("norm2")(x).astype(self.dtype)
        y = nn.Dense(4 * c, name="mlp_fc1", **kw)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, name="mlp_fc2", **kw)(y)
        return x + y


class SwinTrunk(nn.Module):
    """timm Swin feature extractor: 4x4 patch embed + LN, four stages of
    Swin blocks with patch merging AFTER each non-final stage, final LN.
    Returns the final NHWC feature map (stride 32), ALREADY final-normed —
    timm `forward_features` applies `self.norm` before the pooled head."""

    embed_dim: int
    depths: Tuple[int, ...]
    num_heads: Tuple[int, ...]
    window_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        x = PatchEmbed(
            self.embed_dim, patch_size=4, name="patch_embed_conv", **kw,
        )(x.astype(self.dtype))
        x = _ln("patch_embed_norm")(x).astype(self.dtype)
        dim = self.embed_dim
        for s, depth in enumerate(self.depths):
            for j in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[s], self.window_size,
                    shift=0 if j % 2 == 0 else self.window_size // 2,
                    dtype=self.dtype, name=f"layer{s}_block{j}",
                )(x)
            if s < len(self.depths) - 1:
                # PatchMerging: concat 2x2 neighbors -> LN(4C) -> Linear 2C
                b, h, w, c = x.shape
                x = x.reshape(b, h // 2, 2, w // 2, 2, c)
                # MSR concat order: (0::2,0::2), (1::2,0::2), (0::2,1::2), (1::2,1::2)
                x = jnp.concatenate(
                    [x[:, :, 0, :, 0], x[:, :, 1, :, 0], x[:, :, 0, :, 1], x[:, :, 1, :, 1]],
                    axis=-1,
                )
                x = _ln(f"downsample_norm_{s}")(x).astype(self.dtype)
                x = nn.Dense(2 * c, use_bias=False, name=f"downsample_reduction_{s}", **kw)(x)
                dim *= 2
        return _ln("norm")(x).astype(self.dtype)


class SwinTower(nn.Module):
    """TimmModel-equivalent CLIP tower over the native Swin trunk."""

    cfg: VisionConfig
    embed_dim: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"  # unused; uniform tower signature
    remat: bool = False

    def setup(self):
        name = self.cfg.timm_model_name
        embed_dim, depths, heads, window = SWIN_ARCHS[name]
        self.trunk = SwinTrunk(
            embed_dim, depths, heads, window, dtype=self.dtype, name="trunk"
        )
        self.num_features = embed_dim * 2 ** (len(depths) - 1)
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        if self.cfg.timm_proj == "linear":
            # proj_bias=False in TimmModel (`timm_model.py:100`)
            self.proj = nn.Dense(self.embed_dim, use_bias=False, name="proj", **kw)
            self.proj_hidden = None
        elif self.cfg.timm_proj == "mlp":
            self.proj_hidden = nn.Dense(2 * self.embed_dim, name="proj_fc1", **kw)
            self.proj = nn.Dense(self.embed_dim, use_bias=False, name="proj_fc2", **kw)
        else:
            raise ValueError(f"unknown timm_proj {self.cfg.timm_proj!r}")

    def _project(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.proj_hidden is not None:
            x = nn.gelu(self.proj_hidden(x), approximate=False)
        return self.proj(x)

    # ---- public protocol ----------------------------------------------

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Trunk (final LN included) -> global avgpool -> projection: the
        timm_pool="" network-default head of `TimmModel.forward`
        (`timm_model.py:147-151` with the Swin trunk's own avg pooling)."""
        feats = self.trunk(x)
        return self._project(feats.mean(axis=(1, 2)))

    def encode_dense(self, x: jnp.ndarray, keep_shape: bool = True) -> jnp.ndarray:
        """Per-position projection of the final (normed) feature map.
        UN-normalized; consumers normalize (`timm_model.py:176-190`
        semantics, generalized — see module docstring)."""
        tokens = self._project(self.trunk(x))
        if keep_shape:
            return tokens
        b, gh, gw, c = tokens.shape
        return tokens.reshape(b, gh * gw, c)

    def _roi_target_size(self, img_hw, feat_hw):
        th = (self.cfg.image_size * feat_hw[0]) // img_hw[0]
        tw = (self.cfg.image_size * feat_hw[1]) // img_hw[1]
        return max(th, 1), max(tw, 1)

    def extract_roi_features(
        self, x: jnp.ndarray, normed_boxes: jnp.ndarray, extract_type: str = "v1"
    ) -> jnp.ndarray:
        """v1: align the trunk map (final LN already applied — timm Swin
        `forward_features` semantics) to the 224-native grid, avg-pool each
        RoI through the head (`timm_model.py:163-174`). v2: 1x1-align the
        normalized dense map."""
        if extract_type == "v1":
            feats = self.trunk(x)
            b, fh, fw, c = feats.shape
            tar = self._roi_target_size(x.shape[1:3], (fh, fw))
            rois = roi_align_nxn(feats, denormalize_boxes(normed_boxes, fh, fw), tar)
            m = rois.shape[1]
            pooled = rois.reshape(b * m, tar[0], tar[1], c).mean(axis=(1, 2))
            return self._project(pooled).reshape(b, m, -1)
        if extract_type == "v2":
            dense = l2_normalize(self.encode_dense(x, keep_shape=True))
            _, gh, gw, _ = dense.shape
            return roi_align_1x1(dense, denormalize_boxes(normed_boxes, gh, gw))
        raise NotImplementedError(extract_type)

    def mask_pool(self, x: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
        dense = l2_normalize(self.encode_dense(x, keep_shape=True))
        return mask_pool(dense, masks)

    def encode_rois_and_image(self, x: jnp.ndarray, normed_boxes: jnp.ndarray):
        """(L2-normed RoI embeds, L2-normed image embeds) from one trunk
        pass (`timm_model.py:219-239`)."""
        feats = self.trunk(x)
        b, fh, fw, c = feats.shape
        tar = self._roi_target_size(x.shape[1:3], (fh, fw))
        rois = roi_align_nxn(feats, denormalize_boxes(normed_boxes, fh, fw), tar)
        m = rois.shape[1]
        x_rois = self._project(rois.reshape(b * m, tar[0], tar[1], c).mean(axis=(1, 2)))
        x_rois = l2_normalize(x_rois.reshape(b, m, -1))
        x_image = l2_normalize(self._project(feats.mean(axis=(1, 2))))
        return x_rois, x_image
