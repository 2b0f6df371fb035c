"""Native ConvNeXt tower with the reference's timm-adapter protocol.

The reference's convnext config family (`model_configs/convnext_*.json`)
builds a `TimmModel` (`src/open_clip/timm_model.py:29-239`): a timm ConvNeXt
trunk, an avgpool + LayerNorm head, a linear/MLP projection into the joint
space, and the fork's dense protocol grafted on top:

  - `forward` = trunk features -> global avgpool -> head LN -> projection
    (timm ConvNeXt `forward_head` with the classifier reset,
    `timm_model.py:148-151`)
  - `encode_dense` = per-position head LN + projection over the final
    feature map, NO normalization (`timm_model.py:176-190`)
  - `extract_roi_features` (v1, the adapter's default and only asserted
    type, `timm_model.py:202-208`): RoI-align the UN-normed trunk feature
    map to the 224-native grid size, then pool+LN+project each RoI like a
    full image (`timm_model.py:163-174`)
  - `mask_pool` = L2-normalized dense map, mask-weighted mean
    (`timm_model.py:191-200`)
  - `encode_rois_and_image` = both paths from ONE trunk pass
    (`timm_model.py:219-239`)

TPU-first: channels-last NHWC throughout, depthwise convs via
`feature_group_count`, fixed-shape [B, M, 4] boxes.

Weight interop uses the timm ConvNeXt state-dict layout
(`visual.trunk.stem.*, visual.trunk.stages.*, visual.trunk.head.norm.*,
visual.head.proj.*`) — the layout of the OpenCLIP convnext hub checkpoints.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from clipself_tpu.core.config import VisionConfig
from clipself_tpu.models.common import l2_normalize
from clipself_tpu.ops.mask_pool import mask_pool
from clipself_tpu.ops.roi_align import denormalize_boxes, roi_align_1x1, roi_align_nxn

Dtype = Any

# timm ConvNeXt variants (depths, channel dims) used by the reference's
# convnext_*.json config family
CONVNEXT_ARCHS: dict[str, tuple[Tuple[int, ...], Tuple[int, ...]]] = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
    "convnext_xxlarge": ((3, 4, 30, 3), (384, 768, 1536, 3072)),
}


def _ln(name: str, eps: float = 1e-6):
    return nn.LayerNorm(epsilon=eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name)


class ConvNeXtBlock(nn.Module):
    """7x7 depthwise conv -> LN -> 4x pointwise MLP -> layer scale, residual
    (timm `ConvNeXtBlock`; stochastic depth is a train-time no-op here — the
    shipped recipes use the tower frozen or as a distillation student where
    drop_path defaults off)."""

    dim: int
    ls_init: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        shortcut = x
        x = nn.Conv(
            self.dim, kernel_size=(7, 7), padding=3,
            feature_group_count=self.dim, name="conv_dw", **kw,
        )(x)
        x = _ln("norm")(x).astype(self.dtype)
        x = nn.Dense(4 * self.dim, name="mlp_fc1", **kw)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="mlp_fc2", **kw)(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.ls_init), (self.dim,), jnp.float32
        )
        return shortcut + x * gamma.astype(x.dtype)


class ConvNeXtTrunk(nn.Module):
    """timm ConvNeXt feature extractor: stem (4x4/4 conv + LN), four stages
    with LN+2x2/2 conv downsampling between them. Returns the final NHWC
    feature map (stride 32), UN-normed — the head LN lives with the pooling
    (timm head_norm_first=False layout)."""

    depths: Tuple[int, ...]
    dims: Tuple[int, ...]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        x = nn.Conv(
            self.dims[0], kernel_size=(4, 4), strides=(4, 4), padding="VALID",
            name="stem_conv", **kw,
        )(x.astype(self.dtype))
        x = _ln("stem_norm")(x).astype(self.dtype)
        for s, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if s > 0:
                x = _ln(f"downsample_norm_{s}")(x).astype(self.dtype)
                x = nn.Conv(
                    dim, kernel_size=(2, 2), strides=(2, 2), padding="VALID",
                    name=f"downsample_conv_{s}", **kw,
                )(x)
            for i in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype, name=f"stage{s}_block{i}")(x)
        return x


class ConvNeXtTower(nn.Module):
    """TimmModel-equivalent CLIP tower over the native ConvNeXt trunk."""

    cfg: VisionConfig
    embed_dim: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"  # unused; uniform tower signature
    remat: bool = False

    def setup(self):
        name = self.cfg.timm_model_name
        if name not in CONVNEXT_ARCHS:
            raise NotImplementedError(
                f"timm trunk {name!r} has no native TPU implementation "
                f"(supported: {sorted(CONVNEXT_ARCHS)}); transformers-Flax "
                "ViT trunks go through models.trunk_adapter instead"
            )
        depths, dims = CONVNEXT_ARCHS[name]
        self.trunk = ConvNeXtTrunk(depths, dims, dtype=self.dtype, name="trunk")
        self.num_features = dims[-1]
        # timm ClassifierHead norm: LayerNorm over channels, shared between
        # the pooled path and the dense per-position path
        self.head_norm = _ln("head_norm")
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        if self.cfg.timm_proj == "linear":
            # proj_bias=False in TimmModel (`timm_model.py:100`)
            self.proj = nn.Dense(self.embed_dim, use_bias=False, name="proj", **kw)
            self.proj_hidden = None
        elif self.cfg.timm_proj == "mlp":
            # timm Mlp(prev, 2*embed, embed, bias=(True, False))
            self.proj_hidden = nn.Dense(2 * self.embed_dim, name="proj_fc1", **kw)
            self.proj = nn.Dense(self.embed_dim, use_bias=False, name="proj_fc2", **kw)
        else:
            raise ValueError(f"unknown timm_proj {self.cfg.timm_proj!r}")

    # ---- head pieces ---------------------------------------------------

    def _project(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.proj_hidden is not None:
            x = nn.gelu(self.proj_hidden(x), approximate=False)
        return self.proj(x)

    def _forward_head(self, feats: jnp.ndarray) -> jnp.ndarray:
        """Pooled features -> joint space: global avgpool, head LN,
        projection (timm `forward_head` + TimmModel.head)."""
        pooled = feats.mean(axis=(1, 2))
        pooled = self.head_norm(pooled).astype(self.dtype)
        return self._project(pooled)

    # ---- public protocol ----------------------------------------------

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._forward_head(self.trunk(x))

    def encode_dense(self, x: jnp.ndarray, keep_shape: bool = True) -> jnp.ndarray:
        """Per-position head LN + projection over the final feature map
        (reference `encode_dense` + `dense_trunk_head`,
        `timm_model.py:176-190`). UN-normalized, matching the reference —
        consumers (mask_pool, v2 RoIs, the CLIP wrapper) normalize."""
        feats = self.trunk(x)
        tokens = self.head_norm(feats).astype(self.dtype)
        tokens = self._project(tokens)
        if keep_shape:
            return tokens
        b, gh, gw, c = tokens.shape
        return tokens.reshape(b, gh * gw, c)

    def _roi_target_size(self, img_hw, feat_hw):
        # tar = image_size * feat / img (`timm_model.py:166-168`): the
        # RoI grid a 224-native crop would produce
        th = (self.cfg.image_size * feat_hw[0]) // img_hw[0]
        tw = (self.cfg.image_size * feat_hw[1]) // img_hw[1]
        return max(th, 1), max(tw, 1)

    def extract_roi_features(
        self, x: jnp.ndarray, normed_boxes: jnp.ndarray, extract_type: str = "v1"
    ) -> jnp.ndarray:
        """v1 (the adapter's default; `extract_roi_features` asserts it,
        `timm_model.py:202-208`): align the raw trunk map to the 224-native
        grid and run each RoI through the pooled head. v2: 1x1-align the
        normalized dense map."""
        if extract_type == "v1":
            feats = self.trunk(x)
            b, fh, fw, c = feats.shape
            tar = self._roi_target_size(x.shape[1:3], (fh, fw))
            rois = roi_align_nxn(feats, denormalize_boxes(normed_boxes, fh, fw), tar)
            m = rois.shape[1]
            rois = rois.reshape(b * m, tar[0], tar[1], c)
            out = self._forward_head(rois)
            return out.reshape(b, m, -1)
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
        pass (reference `encode_rois_and_image`, `timm_model.py:219-239`)."""
        feats = self.trunk(x)
        b, fh, fw, c = feats.shape
        tar = self._roi_target_size(x.shape[1:3], (fh, fw))
        rois = roi_align_nxn(feats, denormalize_boxes(normed_boxes, fh, fw), tar)
        m = rois.shape[1]
        x_rois = self._forward_head(rois.reshape(b * m, tar[0], tar[1], c))
        x_rois = l2_normalize(x_rois.reshape(b, m, -1))
        x_image = l2_normalize(self._forward_head(feats))
        return x_rois, x_image
