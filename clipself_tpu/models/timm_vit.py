"""Native towers for the reference's timm plain-ViT config family.

Covers the two non-convnext, non-swin timm configs the reference registers
(`src/open_clip/model_configs/vit_relpos_medium_patch16_cls_224.json`,
`vit_medium_patch16_gap_256.json`), built through `TimmModel`
(`src/open_clip/timm_model.py:29-108`) with timm_pool="" (network-default
pooling) and a bias-free linear projection:

  - `vit_relpos_medium_patch16_cls_224`: ViT-Medium (width 512, 12 layers,
    8 heads) with NO absolute position embedding; every block adds a
    relative-position bias to its attention logits, produced by a small MLP
    over log-scaled relative coordinates (timm `RelPosMlp`, mode 'cr':
    sign(d) * log1p(|d|) coords -> ReLU MLP 2 -> hidden -> heads, the bias
    zero-padded over the class-token row/column). Pooled output = the class
    token after the final LayerNorm.
  - `vit_medium_patch16_gap_256`: ViT-Medium with absolute position
    embeddings, NO class token, global average pooling over patch tokens
    followed by `fc_norm` LayerNorm (timm's use_fc_norm path: the pre-pool
    `norm` is Identity).

Both mirror timm's ViT block exactly: pre-norm, fused qkv (qkv_bias=False
for these two variants), gelu MLP at 4x, no layer-scale. timm itself is not
importable in this environment and no released checkpoints for these two
names exist offline. Both variants are nonetheless golden-pinned against
independent torch implementations: the GAP variant vs transformers'
`ViTModel` (final layernorm applied post-pool as fc_norm,
tests/test_timm_towers.py::test_gap_vit_math_golden_vs_transformers_torch_vit)
and the rel-pos variant vs transformers' `BeitModel` (its bias TABLE
generated from our RelPosMlp at each slot's decoded (dy, dx), pinning the
relative-coordinate/index conventions and bias-on-logits placement;
test_relpos_vit_math_golden_vs_transformers_torch_beit). The Swin and
ConvNeXt members of the timm family carry the other independent-math
goldens for the adapter head.

Dense-protocol note: as with Swin (see `swin.py` docstring), the
reference's `TimmModel.encode_dense` requires a convnet `trunk.head.norm`
and cannot run on ViT trunks; here the protocol is defined per-position in
the natural way (final norm / fc_norm, then projection).

Weight interop uses the timm ViT state-dict layout
(`visual.trunk.patch_embed.proj.*, visual.trunk.pos_embed,
visual.trunk.cls_token, visual.trunk.blocks.{j}.*, visual.trunk.norm.* /
visual.trunk.fc_norm.*, visual.head.proj.weight`).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clipself_tpu.core.config import VisionConfig
from clipself_tpu.models.common import l2_normalize
from clipself_tpu.ops.patchify import PatchEmbed
from clipself_tpu.ops.mask_pool import mask_pool
from clipself_tpu.ops.roi_align import denormalize_boxes, roi_align_1x1

Dtype = Any

# arch hyperparameters per timm model name
TIMM_VIT_ARCHS: dict[str, dict] = {
    "vit_relpos_medium_patch16_cls_224": dict(
        width=512, depth=12, heads=8, patch=16, cls_token=True,
        pool="token", rel_pos=True, rel_pos_dim=512, qkv_bias=False,
        fc_norm=False, abs_pos=False,
    ),
    "vit_medium_patch16_gap_256": dict(
        width=512, depth=12, heads=8, patch=16, cls_token=False,
        pool="avg", rel_pos=False, rel_pos_dim=0, qkv_bias=False,
        fc_norm=True, abs_pos=True,
    ),
}


def _ln(name: str, eps: float = 1e-6):
    return nn.LayerNorm(epsilon=eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name)


@lru_cache(maxsize=32)
def _rel_log_coords(gh: int, gw: int) -> np.ndarray:
    """[gh*gw, gh*gw, 2] log-scaled relative coordinates, timm
    `gen_relative_log_coords` mode='cr': sign(d) * log1p(|d|)."""
    coords = np.stack(np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij"))
    flat = coords.reshape(2, -1).astype(np.float32)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)  # [N, N, 2]
    return np.sign(rel) * np.log1p(np.abs(rel))


class RelPosMlp(nn.Module):
    """Per-block relative-position bias head (timm `RelPosMlp`, mode 'cr').

    Produces a [heads, P+N, P+N] additive bias for N = gh*gw patch tokens
    and P prefix (class) tokens; the prefix rows/columns are zero
    (timm pads the patch-token bias with zeros for the class token)."""

    num_heads: int
    hidden_dim: int = 512
    prefix_tokens: int = 0

    @nn.compact
    def __call__(self, gh: int, gw: int) -> jnp.ndarray:
        coords = jnp.asarray(_rel_log_coords(gh, gw))  # [N, N, 2]
        h = nn.Dense(self.hidden_dim, param_dtype=jnp.float32, name="fc1")(coords)
        h = nn.relu(h)
        bias = nn.Dense(self.num_heads, param_dtype=jnp.float32, name="fc2")(h)
        bias = bias.transpose(2, 0, 1)  # [heads, N, N]
        if self.prefix_tokens:
            p = self.prefix_tokens
            bias = jnp.pad(bias, ((0, 0), (p, 0), (p, 0)))
        return bias


class TimmViTBlock(nn.Module):
    """timm ViT block: pre-norm attention (+ optional rel-pos bias on the
    logits) and 4x gelu MLP, both residual."""

    width: int
    heads: int
    qkv_bias: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        c, nh = self.width, self.heads
        hd = c // nh
        y = _ln("norm1")(x).astype(self.dtype)
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="attn_qkv", **kw)(y)
        q, k, v = jnp.split(qkv.reshape(*x.shape[:2], 3, nh, hd), 3, axis=2)
        q, k, v = (t.squeeze(2) for t in (q, k, v))  # [B, N, nh, hd]
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        if bias is not None:
            logits = logits + bias[None]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(*x.shape[:2], c)
        x = x + nn.Dense(c, name="attn_proj", **kw)(y)
        y = _ln("norm2")(x).astype(self.dtype)
        y = nn.Dense(4 * c, name="mlp_fc1", **kw)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, name="mlp_fc2", **kw)(y)
        return x + y


class TimmViTTower(nn.Module):
    """TimmModel-equivalent CLIP tower over a native timm-style ViT trunk
    (rel-pos 'cls' and GAP variants)."""

    cfg: VisionConfig
    embed_dim: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"  # uniform tower signature (einsum attention)
    remat: bool = False

    def setup(self):
        a = TIMM_VIT_ARCHS[self.cfg.timm_model_name]
        self.arch = a
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        self.patch = a["patch"]
        self.patch_embed = PatchEmbed(
            a["width"], patch_size=self.patch,
            name="patch_embed_conv", **kw,
        )
        grid = self.cfg.image_size // self.patch
        if a["cls_token"]:
            self.cls_token = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, a["width"]), jnp.float32
            )
        if a["abs_pos"]:
            n = grid * grid + (1 if a["cls_token"] else 0)
            self.pos_embed = self.param(
                "pos_embed", nn.initializers.truncated_normal(0.02),
                (1, n, a["width"]), jnp.float32,
            )
        self.blocks = [
            TimmViTBlock(
                a["width"], a["heads"], a["qkv_bias"], dtype=self.dtype,
                name=f"block{j}",
            )
            for j in range(a["depth"])
        ]
        if a["rel_pos"]:
            self.rel_pos = [
                RelPosMlp(
                    a["heads"], hidden_dim=a["rel_pos_dim"],
                    prefix_tokens=1 if a["cls_token"] else 0,
                    name=f"rel_pos{j}",
                )
                for j in range(a["depth"])
            ]
        # fc_norm path: pre-pool norm is Identity, LN applies after pooling
        self.norm = _ln("fc_norm" if a["fc_norm"] else "norm")
        self.proj = nn.Dense(self.embed_dim, use_bias=False, name="proj", **kw)

    # ---- trunk ----------------------------------------------------------

    def _tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        """Patch embed (+cls, +abs pos) -> blocks. Returns [B, P+N, W]
        WITHOUT the final norm (variant-dependent, see callers)."""
        a = self.arch
        x = self.patch_embed(x.astype(self.dtype))
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
        if a["cls_token"]:
            cls = jnp.broadcast_to(self.cls_token.astype(self.dtype), (b, 1, c))
            x = jnp.concatenate([cls, x], axis=1)
        if a["abs_pos"]:
            pe = self.pos_embed
            if pe.shape[1] != x.shape[1]:
                from clipself_tpu.models.torch_io import resize_pos_embed_np

                raise ValueError(
                    f"pos_embed holds {pe.shape[1]} tokens but input gives "
                    f"{x.shape[1]}; resize at import time with "
                    f"{resize_pos_embed_np.__name__}"
                )
            x = x + pe.astype(self.dtype)
        for j, blk in enumerate(self.blocks):
            bias = self.rel_pos[j](gh, gw) if a["rel_pos"] else None
            x = blk(x, bias)
        return x

    def _pooled(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """timm `forward_head`: token pool + the variant's norm placement."""
        a = self.arch
        if a["fc_norm"]:
            pooled = tokens[:, 1:].mean(axis=1) if a["cls_token"] else tokens.mean(axis=1)
            return self.norm(pooled).astype(self.dtype)
        tokens = self.norm(tokens).astype(self.dtype)
        return tokens[:, 0] if a["pool"] == "token" else tokens.mean(axis=1)

    def _dense_tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, gh, gw, embed_dim] per-position projected map (UN-normalized)."""
        a = self.arch
        tokens = self._tokens(x)
        patches = tokens[:, 1:] if a["cls_token"] else tokens
        patches = self.norm(patches).astype(self.dtype)  # norm OR fc_norm per position
        patches = self.proj(patches)
        b = x.shape[0]
        gh, gw = x.shape[1] // self.patch, x.shape[2] // self.patch
        return patches.reshape(b, gh, gw, -1)

    # ---- public protocol ------------------------------------------------

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.proj(self._pooled(self._tokens(x)))

    def encode_dense(self, x: jnp.ndarray, keep_shape: bool = True) -> jnp.ndarray:
        d = self._dense_tokens(x)
        if keep_shape:
            return d
        b, gh, gw, c = d.shape
        return d.reshape(b, gh * gw, c)

    def extract_roi_features(
        self, x: jnp.ndarray, normed_boxes: jnp.ndarray, extract_type: str = "v2"
    ) -> jnp.ndarray:
        dense = l2_normalize(self.encode_dense(x, keep_shape=True))
        _, gh, gw, _ = dense.shape
        return roi_align_1x1(dense, denormalize_boxes(normed_boxes, gh, gw))

    def mask_pool(self, x: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
        dense = l2_normalize(self.encode_dense(x, keep_shape=True))
        return mask_pool(dense, masks)

    def encode_rois_and_image(self, x: jnp.ndarray, normed_boxes: jnp.ndarray):
        tokens = self._tokens(x)
        pooled = l2_normalize(self.proj(self._pooled(tokens)))
        a = self.arch
        patches = tokens[:, 1:] if a["cls_token"] else tokens
        patches = self.norm(patches).astype(self.dtype)
        patches = self.proj(patches)
        b = x.shape[0]
        gh, gw = x.shape[1] // self.patch, x.shape[2] // self.patch
        dense = l2_normalize(patches.reshape(b, gh, gw, -1))
        rois = roi_align_1x1(dense, denormalize_boxes(normed_boxes, gh, gw))
        return l2_normalize(rois), pooled
