"""CLIP assembly with the dense-prediction API.

Parity surface (reference `CustomCLIP`,
`src/open_clip/eva_clip/model.py:272-346`): `encode_image`, `encode_text`,
`encode_dense`, `encode_pseudo_boxes`, `encode_masks`, plus the fused
`encode_rois_and_image`. The text tower is frozen by recipe (enforced by the
optimizer mask, not parameter surgery — JAX params are immutable anyway).

Batched, fixed-shape API: boxes are [B, max_anns, 4] with validity handled by
callers via masks, instead of the reference's ragged per-image lists.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from clipself_tpu.core.config import CLIPConfig
from clipself_tpu.models.eva_vit import EvaViT
from clipself_tpu.models.text_transformer import TextTransformer

Dtype = Any


from clipself_tpu.models.common import l2_normalize  # noqa: F401 (re-export)


class CLIP(nn.Module):
    cfg: CLIPConfig
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    def setup(self):
        extra = {}
        if self.cfg.vision.hf_trunk_name:
            # config-driven transformers-Flax trunk grafting (the
            # arbitrary-trunk half of the reference's timm adapter)
            from clipself_tpu.models.trunk_adapter import FlaxTrunkAdapter

            visual_cls = FlaxTrunkAdapter
        elif self.cfg.vision.timm_model_name:
            # native towers per timm trunk family (reference builds all of
            # these through the generic `timm_model.py:29-60` adapter)
            name = self.cfg.vision.timm_model_name
            if name.startswith("convnext"):
                from clipself_tpu.models.convnext import ConvNeXtTower

                visual_cls = ConvNeXtTower
            elif name.startswith("swin"):
                from clipself_tpu.models.swin import SwinTower

                visual_cls = SwinTower
            elif name.startswith("vit_"):
                from clipself_tpu.models.timm_vit import TimmViTTower

                visual_cls = TimmViTTower
            else:
                raise NotImplementedError(
                    f"timm trunk {name!r} has no native TPU tower "
                    "(supported families: convnext_*, swin_*, vit_*)"
                )
        elif self.cfg.vision.eva_model_name:
            visual_cls = EvaViT
        elif self.cfg.vision.resnet_layers:
            from clipself_tpu.models.modified_resnet import ModifiedResNet

            visual_cls = ModifiedResNet
            extra = {"layers": self.cfg.vision.resnet_layers}
        else:
            from clipself_tpu.models.open_clip_vit import OpenCLIPViT

            visual_cls = OpenCLIPViT
        self.visual = visual_cls(
            self.cfg.vision,
            embed_dim=self.cfg.embed_dim,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            name="visual",
            **extra,
        )
        if self.cfg.text.hf_model_name:
            from clipself_tpu.models.hf_text import HFTextTower

            self.text = HFTextTower(
                self.cfg.text.hf_model_name,
                output_dim=self.cfg.embed_dim,
                pooler_type=self.cfg.text.pooler_type,
                proj=self.cfg.text.proj,
                hf_config_kwargs=self.cfg.text.hf_model_config,
                dtype=self.dtype,
                name="text",
            )
        else:
            self.text = TextTransformer(
                self.cfg.text, embed_dim=self.cfg.embed_dim, dtype=self.dtype, name="text"
            )
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(np.log(1.0 / 0.07)),
            (),
            jnp.float32,
        )

    def __call__(self, image: jnp.ndarray, text: jnp.ndarray):
        return (
            self.encode_image(image, normalize=True),
            self.encode_text(text, normalize=True),
            jnp.exp(self.logit_scale),
        )

    def encode_image(self, image: jnp.ndarray, normalize: bool = False) -> jnp.ndarray:
        feats = self.visual(image)
        return l2_normalize(feats) if normalize else feats

    def encode_text(self, text: jnp.ndarray, normalize: bool = False) -> jnp.ndarray:
        feats = self.text(text)
        return l2_normalize(feats) if normalize else feats

    def encode_dense(
        self, image: jnp.ndarray, normalize: bool = False, keep_shape: bool = False
    ) -> jnp.ndarray:
        # dense features are already L2-normalized by the protocol; the
        # normalize flag re-normalizes for parity with the reference API.
        feats = self.visual.encode_dense(image, keep_shape=keep_shape)
        return l2_normalize(feats) if normalize else feats

    def encode_pseudo_boxes(
        self,
        image: jnp.ndarray,
        normed_boxes: jnp.ndarray,
        normalize: bool = False,
        extract_type: str = "v2",
    ) -> jnp.ndarray:
        """image: [B, H, W, 3]; normed_boxes: [B, M, 4] in [0,1] xyxy.

        extract_type 'v1' (mask-attention pooling) is only meaningful for the
        plain OpenCLIP ViT; the EVA tower ignores it (reference
        `eva_vit_model.py:625`)."""
        feats = self.visual.extract_roi_features(image, normed_boxes, extract_type=extract_type)
        return l2_normalize(feats) if normalize else feats

    def encode_masks(
        self,
        image: jnp.ndarray,
        masks: jnp.ndarray,
        normalize: bool = True,
        mask_attn: bool = False,
    ) -> jnp.ndarray:
        """image: [B, H, W, 3]; masks: [B, M, gh, gw] binary.

        mask_attn=True uses mask-attention pooling where the tower supports
        it (plain OpenCLIP ViT); the EVA tower always mask-pools, matching
        the reference (`eva_clip/model.py:342-346`)."""
        if mask_attn and hasattr(self.visual, "mask_attn_pool"):
            feats = self.visual.mask_attn_pool(image, masks)
        else:
            feats = self.visual.mask_pool(image, masks)
        return l2_normalize(feats) if normalize else feats

    def encode_rois_and_image(self, image: jnp.ndarray, normed_boxes: jnp.ndarray):
        return self.visual.encode_rois_and_image(image, normed_boxes)

    def encode_rois_and_masks(
        self,
        image: jnp.ndarray,
        normed_boxes: jnp.ndarray,
        masks: jnp.ndarray,
        normalize: bool = True,
        extract_type: str = "v2",
        mask_attn: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """RoI features AND mask-pooled features from ONE dense trunk pass.

        The zero-shot evaluator needs both per image (reference
        `zero_shot.py:60-86` runs them as separate model calls, each paying a
        full dense forward). For extract_type 'v2' every tower's RoI path is
        dense-map RoI-align and its mask path is a masked mean of the same
        map, so the trunk runs once. v1/v3 or mask-attention pooling fall
        back to the separate calls (their RoI/mask paths are not a shared
        dense map).

        image: [B, H, W, 3]; normed_boxes: [B, M, 4]; masks: [B, M, gh, gw].
        Returns ([B, M, C] roi feats, [B, M, C] mask feats).
        """
        if extract_type == "v2" and not mask_attn:
            from clipself_tpu.ops.mask_pool import mask_pool
            from clipself_tpu.ops.roi_align import denormalize_boxes, roi_align_1x1

            dense = self.visual.encode_dense(image, keep_shape=True)
            _, gh, gw, _ = dense.shape
            rois = roi_align_1x1(dense, denormalize_boxes(normed_boxes, gh, gw))
            mp = mask_pool(dense, masks)
        else:
            rois = self.visual.extract_roi_features(
                image, normed_boxes, extract_type=extract_type
            )
            if mask_attn and hasattr(self.visual, "mask_attn_pool"):
                mp = self.visual.mask_attn_pool(image, masks)
            else:
                mp = self.visual.mask_pool(image, masks)
        if normalize:
            rois = l2_normalize(rois)
            mp = l2_normalize(mp)
        return rois, mp

    def visual_taps(
        self, image: jnp.ndarray, out_indices: tuple, with_dense: bool = False
    ):
        """Intermediate visual-trunk taps for detection backbones
        (reference `EvaCLIPViT.forward`, `F-ViT/models/evaclip_vit.py:61-115`)."""
        return self.visual.forward_taps(image, out_indices, with_dense=with_dense)
