"""Third-party vision trunk adapter with the dense-prediction protocol.

Equivalent of the reference's timm adapter (`src/open_clip/timm_model.py:29-239`),
which grafts `encode_dense` / `extract_roi_features` / `mask_pool` onto any
timm trunk. The TPU-native counterpart adapts transformers' Flax vision
models (ViT / CLIP-vision trunks) — any module producing patch-token hidden
states — and adds the same protocol: drop CLS, project into the joint space,
L2-normalize, reshape to a grid, then RoI-align / mask-pool.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from clipself_tpu.ops.mask_pool import mask_pool
from clipself_tpu.ops.roi_align import denormalize_boxes, roi_align_1x1

Dtype = Any


from clipself_tpu.models.common import l2_normalize as _l2


class FlaxTrunkAdapter(nn.Module):
    """Wrap a transformers Flax vision model as a CLIP tower.

    The trunk must return `last_hidden_state [B, 1+N, W]` (CLS first, the
    transformers ViT convention). Patch size is read from the HF config.
    """

    model_type_or_name: str
    embed_dim: int
    hf_config_kwargs: Optional[dict] = None
    pool: str = "cls"  # 'cls' | 'mean'
    dtype: Dtype = jnp.float32

    def setup(self):
        try:
            from transformers import AutoConfig, FlaxAutoModel
        except Exception as e:  # pragma: no cover
            raise RuntimeError("transformers Flax support required") from e
        if "/" in self.model_type_or_name:
            cfg = AutoConfig.from_pretrained(self.model_type_or_name)
        else:
            cfg = AutoConfig.for_model(
                self.model_type_or_name, **(self.hf_config_kwargs or {})
            )
        self.hf_config = cfg
        # _do_init=False: module definition only, skip eager weight init
        self.trunk = FlaxAutoModel.from_config(cfg, _do_init=False).module
        self.patch_size = getattr(cfg, "patch_size", 16)
        self.head = nn.Dense(
            self.embed_dim, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="head",
        )

    def _tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        # transformers FLAX vision models take channels-last pixel_values
        return self.trunk(pixel_values=x).last_hidden_state

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        t = self._tokens(x)
        pooled = t[:, 0] if self.pool == "cls" else t[:, 1:].mean(axis=1)
        return self.head(pooled)

    def encode_dense(self, x: jnp.ndarray, keep_shape: bool = True) -> jnp.ndarray:
        t = self._tokens(x)[:, 1:]
        t = _l2(self.head(t))
        if keep_shape:
            b, h = x.shape[0], x.shape[1] // self.patch_size
            w = x.shape[2] // self.patch_size
            return t.reshape(b, h, w, -1)
        return t

    def extract_roi_features(
        self, x: jnp.ndarray, normed_boxes: jnp.ndarray, extract_type: str = "v2"
    ) -> jnp.ndarray:
        dense = self.encode_dense(x, keep_shape=True)
        _, gh, gw, _ = dense.shape
        return roi_align_1x1(dense, denormalize_boxes(normed_boxes, gh, gw))

    def mask_pool(self, x: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
        return mask_pool(self.encode_dense(x, keep_shape=True), masks)
