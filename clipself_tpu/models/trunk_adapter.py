"""Third-party vision trunk adapter with the dense-prediction protocol.

Equivalent of the generic-arbitrary-trunk half of the reference's timm
adapter (`src/open_clip/timm_model.py:29-239`), which grafts `encode_dense`
/ `extract_roi_features` / `mask_pool` onto any timm trunk. The TPU-native
counterpart adapts transformers' FLAX vision models (ViT / CLIP-vision
trunks — any module producing patch-token hidden states) and adds the same
protocol: drop CLS, project into the joint space, L2-normalize, reshape to
a grid, then RoI-align / mask-pool.

Factory-reachable via `vision_cfg.hf_trunk_name` (a transformers model TYPE
like "vit", configured by `hf_trunk_kwargs`, or a hub id like
"google/vit-base-patch16-224" when the hub is reachable) — see
`model_configs/hf-vit-tiny-test.json` for a config-driven example. Weight
import: `load_hf_trunk_params` converts a torch HF checkpoint's state dict
into the adapter's param tree (transformers' own torch->flax conversion
rules for the trunk, plus our `head` kernel).
"""

from __future__ import annotations

import json
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from clipself_tpu.core.config import VisionConfig
from clipself_tpu.models.common import l2_normalize as _l2
from clipself_tpu.ops.mask_pool import mask_pool
from clipself_tpu.ops.roi_align import denormalize_boxes, roi_align_1x1

Dtype = Any


class FlaxTrunkAdapter(nn.Module):
    """Wrap a transformers Flax vision model as a CLIP tower.

    The trunk must return `last_hidden_state [B, 1+N, W]` (CLS first, the
    transformers ViT convention). Patch size is read from the HF config.
    Uniform tower signature: (cfg, embed_dim, dtype, attn_impl, remat) —
    attn_impl/remat are accepted for interface parity (the trunk's own
    attention implementation is whatever transformers ships).
    """

    cfg: VisionConfig
    embed_dim: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    def setup(self):
        try:
            from transformers import AutoConfig, FlaxAutoModel
        except Exception as e:  # pragma: no cover
            raise RuntimeError("transformers Flax support required") from e
        name = self.cfg.hf_trunk_name
        kwargs = json.loads(self.cfg.hf_trunk_kwargs or "{}")
        if "/" in name:
            cfg = AutoConfig.from_pretrained(name)
        else:
            cfg = AutoConfig.for_model(name, **kwargs)
        self.hf_config = cfg
        # _do_init=False: module definition only, skip eager weight init.
        # Drop the HF pooler head when the model type has one — we pool
        # ourselves, and its params would be dead weight in checkpoints.
        try:
            self.trunk = FlaxAutoModel.from_config(
                cfg, _do_init=False, add_pooling_layer=False
            ).module
        except TypeError:
            self.trunk = FlaxAutoModel.from_config(cfg, _do_init=False).module
        self.patch_size = getattr(cfg, "patch_size", 16)
        self.pool = self.cfg.hf_trunk_pool
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

    def encode_rois_and_image(self, x: jnp.ndarray, normed_boxes: jnp.ndarray):
        t = self._tokens(x)
        pooled = t[:, 0] if self.pool == "cls" else t[:, 1:].mean(axis=1)
        pooled = _l2(self.head(pooled))
        dense = _l2(self.head(t[:, 1:]))
        b, h = x.shape[0], x.shape[1] // self.patch_size
        w = x.shape[2] // self.patch_size
        dense = dense.reshape(b, h, w, -1)
        rois = roi_align_1x1(dense, denormalize_boxes(normed_boxes, h, w))
        return _l2(rois), pooled


def load_hf_trunk_params(torch_state_dict: dict, params: dict, cfg) -> dict:
    """Import a torch HF checkpoint into the adapter's param tree.

    Uses transformers' own torch->flax key conversion for the trunk
    (`modeling_flax_pytorch_utils.convert_pytorch_state_dict_to_flax`),
    then grafts the result under our `visual.trunk` subtree; the projection
    head (ours, not HF's) is left at its current value unless the state
    dict carries a `head.weight`.
    """
    import numpy as np
    import torch
    from transformers import AutoConfig, FlaxAutoModel
    from transformers.modeling_flax_pytorch_utils import (
        convert_pytorch_state_dict_to_flax,
    )

    name = cfg.vision.hf_trunk_name
    kwargs = json.loads(cfg.vision.hf_trunk_kwargs or "{}")
    hf_cfg = (
        AutoConfig.from_pretrained(name)
        if "/" in name
        else AutoConfig.for_model(name, **kwargs)
    )
    # eager init here (unlike the adapter module): transformers' converter
    # reads `flax_model.params` to learn the target tree structure
    try:
        flax_model = FlaxAutoModel.from_config(hf_cfg, add_pooling_layer=False)
    except TypeError:
        flax_model = FlaxAutoModel.from_config(hf_cfg)
    trunk_sd = {
        k: v for k, v in torch_state_dict.items() if not k.startswith("head.")
    }
    trunk_params = convert_pytorch_state_dict_to_flax(
        {k: torch.as_tensor(np.asarray(v)) for k, v in trunk_sd.items()}, flax_model
    )
    params = dict(params)
    visual = dict(params["visual"])
    visual["trunk"] = trunk_params
    if "head.weight" in torch_state_dict:
        head = np.asarray(torch_state_dict["head.weight"]).T
        visual["head"] = {"kernel": jnp.asarray(head)}
    params["visual"] = visual
    return params
