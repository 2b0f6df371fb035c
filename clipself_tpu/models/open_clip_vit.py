"""Plain OpenCLIP vision transformer (non-EVA) with the fork's dense
protocol, including v1 mask-attention pooling.

Behavioral parity targets (re-derived from the reference):
  - trunk: conv patchify (no bias), CLS + learned pos-embed, ln_pre, pre-LN
    blocks with packed-QKV attention and GELU MLP, ln_post, linear `proj`
    (reference `src/open_clip/transformer.py:318-492`)
  - dense protocol: final block without attention (value path through the
    packed in_proj's V rows), ln_post on ALL tokens, @proj, L2-normalize
    (`transformer.py:247-306,550-589`)
  - v2 RoI features: roi_align(1,1, aligned) on the dense map
    (`transformer.py:685-722`)
  - v1 RoI features ("mask attention pooling"): one query token per box,
    initialized from the post-ln_pre CLS, attending only to patch tokens
    inside the box; no token may attend back to the mask queries
    (`transformer.py:659-667,736-834`)
  - variable resolution via bicubic pos-embed rescale (`transformer.py:724-734`)

TPU-first notes: fixed-shape [B, M] padded boxes everywhere; the v1
attention mask is built with broadcasted iota comparisons (no Python loops).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from clipself_tpu.core.config import VisionConfig
from clipself_tpu.models.clip import l2_normalize
from clipself_tpu.models.common import LayerScale
from clipself_tpu.ops.attention import multi_head_attention
from clipself_tpu.ops.interpolate import resize_2d
from clipself_tpu.ops.mask_pool import mask_pool
from clipself_tpu.ops.patchify import PatchEmbed
from clipself_tpu.ops.roi_align import denormalize_boxes, roi_align_1x1

Dtype = Any


def _layer_norm(name: str, eps: float = 1e-5):
    return nn.LayerNorm(epsilon=eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name)



def _act(cfg, x):
    # OpenAI CLIP towers use QuickGELU x*sigmoid(1.702x) (reference
    # `src/open_clip/transformer.py` QuickGELU); OpenCLIP-trained ones use
    # exact GELU. Selected by config for checkpoint-level parity.
    if getattr(cfg, "quick_gelu", False):
        return x * jax.nn.sigmoid(1.702 * x)
    return nn.gelu(x, approximate=False)

class CLIPBlock(nn.Module):
    """Pre-LN residual block with packed QKV (torch MultiheadAttention layout)."""

    cfg: VisionConfig
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        c = self.cfg
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        self.ln_1 = _layer_norm("ln_1")
        self.in_proj = nn.Dense(3 * c.width, name="in_proj", **kw)
        self.out_proj = nn.Dense(c.width, name="out_proj", **kw)
        self.ln_2 = _layer_norm("ln_2")
        self.c_fc = nn.Dense(int(c.width * c.mlp_ratio), name="c_fc", **kw)
        self.c_proj = nn.Dense(c.width, name="c_proj", **kw)
        ls = getattr(c, "ls_init_value", None)
        self.ls_1 = LayerScale(c.width, ls, name="ls_1") if ls is not None else None
        self.ls_2 = LayerScale(c.width, ls, name="ls_2") if ls is not None else None

    def _attn(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        c = self.cfg
        b, n, _ = x.shape
        h = c.num_heads
        d = c.width // h
        q, k, v = jnp.split(self.in_proj(x), 3, axis=-1)
        out = multi_head_attention(
            q.reshape(b, n, h, d),
            k.reshape(b, n, h, d),
            v.reshape(b, n, h, d),
            d ** -0.5,
            mask=mask,
            impl=self.attn_impl,
        )
        return self.out_proj(out.reshape(b, n, c.width))

    def _ls(self, which, x):
        ls = self.ls_1 if which == 1 else self.ls_2
        return x if ls is None else ls(x)

    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = x + self._ls(1, self._attn(self.ln_1(x).astype(self.dtype), mask))
        h = _act(self.cfg, self.c_fc(self.ln_2(x).astype(self.dtype)))
        return x + self._ls(2, self.c_proj(h))

    def forward_without_attn(self, x: jnp.ndarray) -> jnp.ndarray:
        """Value path: V rows of the packed in_proj + out_proj
        (reference `ResidualAttentionBlockV2.proj_without_attn`,
        `transformer.py:247-260`; ls_1/ls_2 wrap the branches exactly as in
        the full forward)."""
        c = self.cfg
        y = self.in_proj(self.ln_1(x).astype(self.dtype))[..., 2 * c.width :]
        x = x + self._ls(1, self.out_proj(y))
        h = _act(self.cfg, self.c_fc(self.ln_2(x).astype(self.dtype)))
        return x + self._ls(2, self.c_proj(h))


class OpenCLIPViT(nn.Module):
    cfg: VisionConfig
    embed_dim: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    def setup(self):
        c = self.cfg
        # reshape+matmul patchify (ops/patchify.py): parameter-identical to
        # the previous stride-p nn.Conv, avoids the C_in=3 MXU lane waste
        self.conv1 = PatchEmbed(
            c.width,
            patch_size=c.patch_size,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )
        scale = c.width ** -0.5
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (c.width,), jnp.float32
        )
        base = c.grid_size
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(scale),
            (base * base + 1, c.width),
            jnp.float32,
        )
        self.ln_pre = _layer_norm("ln_pre")
        self.blocks = [
            CLIPBlock(c, dtype=self.dtype, attn_impl=self.attn_impl, name=f"resblocks_{i}")
            for i in range(c.layers)
        ]
        if c.attentional_pool:
            # CoCa tower (reference `transformer.py:380-384`): pooler queries
            # live in embed_dim space, ln_post normalizes embed_dim, and the
            # projection is square
            from clipself_tpu.models.common import AttentionalPooler

            self.attn_pool = AttentionalPooler(
                d_model=self.embed_dim, context_dim=c.width,
                n_head=c.attn_pooler_heads, n_queries=c.n_queries,
                dtype=self.dtype, name="attn_pool",
            )
            self.ln_post = _layer_norm("ln_post")
            self.proj = self.param(
                "proj", nn.initializers.normal(scale),
                (self.embed_dim, self.embed_dim), jnp.float32,
            )
        else:
            self.attn_pool = None
            self.ln_post = _layer_norm("ln_post")
            self.proj = self.param(
                "proj", nn.initializers.normal(scale), (c.width, self.embed_dim), jnp.float32
            )

    # ---- embedding ----------------------------------------------------

    def _pos_embed(self, grid_hw: tuple[int, int]) -> jnp.ndarray:
        c = self.cfg
        base = c.grid_size
        gh, gw = grid_hw
        pe = self.positional_embedding
        if (gh, gw) == (base, base):
            return pe
        cls_pe = pe[:1]
        grid_pe = pe[1:].reshape(base, base, c.width)
        grid_pe = jnp.moveaxis(grid_pe, -1, 0)[None]  # [1, width, base, base]
        grid_pe = resize_2d(grid_pe, (gh, gw), "bicubic")[0]
        grid_pe = jnp.moveaxis(grid_pe, 0, -1).reshape(gh * gw, c.width)
        return jnp.concatenate([cls_pe, grid_pe], axis=0)

    def embed(self, x: jnp.ndarray, apply_ln_pre: bool = True):
        c = self.cfg
        b, img_h, img_w, _ = x.shape
        gh, gw = img_h // c.patch_size, img_w // c.patch_size
        t = self.conv1(x.astype(self.dtype)).reshape(b, gh * gw, c.width)
        cls = jnp.broadcast_to(self.class_embedding.astype(self.dtype), (b, 1, c.width))
        t = jnp.concatenate([cls, t], axis=1)
        t = t + self._pos_embed((gh, gw)).astype(self.dtype)
        if apply_ln_pre:
            t = self.ln_pre(t).astype(self.dtype)
        return t, (gh, gw)

    # ---- public protocol ----------------------------------------------

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.forward_pooled(x)[0]

    def forward_pooled(self, x: jnp.ndarray):
        """(pooled [B, embed_dim], tokens) — the reference forward with
        output_tokens (`transformer.py:443-494`): with attentional pooling the
        trunk output is pooled to n_queries tokens, ln_post runs on ALL of
        them, and (pooled, tokens) = (x[:, 0] @ proj, x[:, 1:]); without it,
        ln_post runs on the pooled CLS only and tokens are the raw patch
        tokens."""
        t, _ = self.embed(x)
        for blk in self.blocks:
            t = blk(t)
        if self.attn_pool is not None:
            t = self.attn_pool(t)
            t = self.ln_post(t).astype(self.dtype)
            pooled, tokens = t[:, 0], t[:, 1:]
        else:
            pooled, tokens = t[:, 0], t[:, 1:]
            pooled = self.ln_post(pooled).astype(self.dtype)
        return pooled @ self.proj.astype(pooled.dtype), tokens

    def forward_tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        """Final-norm token sequence [B, 1+gh*gw, width] (CLS first) for
        attentional-pooling consumers (CoCa's AttentionalPooler)."""
        t, _ = self.embed(x)
        for blk in self.blocks:
            t = blk(t)
        return self.ln_post(t).astype(self.dtype)

    def encode_dense(self, x: jnp.ndarray, keep_shape: bool = True) -> jnp.ndarray:
        t, (gh, gw) = self.embed(x)
        for blk in self.blocks[:-1]:
            t = blk(t)
        t = self.blocks[-1].forward_without_attn(t)
        tokens = self.ln_post(t[:, 1:]).astype(self.dtype)
        tokens = tokens @ self.proj.astype(tokens.dtype)
        tokens = l2_normalize(tokens)
        if keep_shape:
            return tokens.reshape(x.shape[0], gh, gw, -1)
        return tokens

    def extract_roi_features(
        self, x: jnp.ndarray, normed_boxes: jnp.ndarray, extract_type: str = "v2"
    ) -> jnp.ndarray:
        if extract_type == "v1":
            return self._extract_roi_features_v1(x, normed_boxes)
        if extract_type == "v2":
            dense = self.encode_dense(x, keep_shape=True)
            _, gh, gw, _ = dense.shape
            return roi_align_1x1(dense, denormalize_boxes(normed_boxes, gh, gw))
        if extract_type == "v3":
            return self._extract_roi_features_v3(x, normed_boxes)
        raise NotImplementedError(extract_type)

    def mask_pool(self, x: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
        dense = self.encode_dense(x, keep_shape=True)
        return mask_pool(dense, masks)

    def encode_rois_and_image(self, x: jnp.ndarray, normed_boxes: jnp.ndarray):
        t, (gh, gw) = self.embed(x)
        for blk in self.blocks[:-1]:
            t = blk(t)
        ti = self.blocks[-1](t)
        pooled = self.ln_post(ti[:, 0]).astype(self.dtype)
        x_image = l2_normalize(pooled @ self.proj.astype(pooled.dtype))
        td = self.blocks[-1].forward_without_attn(t)
        tokens = self.ln_post(td[:, 1:]).astype(self.dtype)
        tokens = l2_normalize(tokens @ self.proj.astype(tokens.dtype))
        dense = tokens.reshape(x.shape[0], gh, gw, -1)
        rois = roi_align_1x1(dense, denormalize_boxes(normed_boxes, gh, gw))
        return l2_normalize(rois), x_image

    # ---- v1: mask attention pooling ------------------------------------

    @staticmethod
    def boxes_to_grid_masks(normed_boxes: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
        """[B, M, 4] normalized xyxy -> [B, M, gh, gw] binary cell masks
        (reference `_generate_masks_per_image`, `transformer.py:635-646`:
        integer-floored box corners select [y0:y1, x0:x1))."""
        scale = jnp.asarray([gw, gh, gw, gh], jnp.float32)
        b = (normed_boxes.astype(jnp.float32) * scale).astype(jnp.int32)
        ys = jnp.arange(gh)[None, None, :, None]
        xs = jnp.arange(gw)[None, None, None, :]
        x0 = b[..., 0][..., None, None]
        y0 = b[..., 1][..., None, None]
        x1 = b[..., 2][..., None, None]
        y1 = b[..., 3][..., None, None]
        return ((ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)).astype(jnp.float32)

    def _extract_roi_features_v1(self, x: jnp.ndarray, normed_boxes: jnp.ndarray):
        c = self.cfg
        gh = x.shape[1] // c.patch_size
        gw = x.shape[2] // c.patch_size
        masks = self.boxes_to_grid_masks(normed_boxes, gh, gw)
        return self.mask_attn_pool(x, masks)

    def _extract_roi_features_v3(self, x: jnp.ndarray, normed_boxes: jnp.ndarray):
        """Both feature types from ONE trunk pass (reference
        `_extract_roi_features_v3`, `transformer.py:670-683`): the v1
        mask-attention-pooled queries and the v2 RoI-aligned dense features.
        Returns (v1 [B, M, C], v2 [B, M, C]), both unnormalized."""
        c = self.cfg
        gh = x.shape[1] // c.patch_size
        gw = x.shape[2] // c.patch_size
        masks = self.boxes_to_grid_masks(normed_boxes, gh, gw)
        v1, dense = self.mask_attn_pool(x, masks, return_dense=True)
        dense = l2_normalize(dense)
        v2 = roi_align_1x1(dense, denormalize_boxes(normed_boxes, gh, gw))
        return v1, v2

    def mask_attn_pool(
        self, image: jnp.ndarray, masks: jnp.ndarray, return_dense: bool = False
    ):
        """Mask-attention pooling (reference `mask_attn_pool` +
        `_mask_attn_pool`, `transformer.py:736-834`).

        masks: [B, Q, gh, gw] binary. Returns [B, Q, embed_dim] (unnormalized,
        matching the reference; callers normalize). All-empty (padding) masks
        produce queries that only see CLS — harmless, masked downstream.

        Token layout: [Q mask queries | CLS | patches]. Attention rules:
          - nobody attends TO mask queries (including themselves)
          - mask query q attends to CLS and to patches where mask[q] is 1
        """
        b, q = masks.shape[:2]
        t, (gh, gw) = self.embed(image, apply_ln_pre=False)
        t = self.ln_pre(t).astype(self.dtype)
        n_img = gh * gw
        n_all = q + 1 + n_img

        cls_embed = t[:, :1]
        queries = jnp.broadcast_to(cls_embed, (b, q, t.shape[-1]))
        tokens = jnp.concatenate([queries, t], axis=1)  # [B, q+1+n_img, D]

        # additive mask [B, 1, n_all, n_all]
        neg = jnp.asarray(-1e9, jnp.float32)
        col_is_query = jnp.arange(n_all) < q  # nobody attends to queries
        base_mask = jnp.where(col_is_query, neg, 0.0)  # [n_all] (columns)
        attn = jnp.broadcast_to(base_mask[None, None, :], (b, n_all, n_all))
        # rows 0..q-1 (queries): restrict patch columns to the binary mask
        patch_block = jnp.where(masks.reshape(b, q, n_img) > 0, 0.0, neg)  # [B, Q, n_img]
        query_rows = jnp.concatenate(
            [
                jnp.full((b, q, q), neg.item(), jnp.float32),  # queries (masked anyway)
                jnp.zeros((b, q, 1), jnp.float32),  # CLS visible
                patch_block,
            ],
            axis=-1,
        )
        attn = attn.at[:, :q, :].set(query_rows)
        attn = attn[:, None, :, :]  # broadcast over heads

        for blk in self.blocks[:-1]:
            tokens = blk(tokens, mask=attn)
        out = self.blocks[-1](tokens, mask=attn)

        pooled = self.ln_post(out[:, :q]).astype(self.dtype)
        pooled = pooled @ self.proj.astype(pooled.dtype)
        if not return_dense:
            return pooled
        # dense branch shares the trunk: final block value path over the
        # image tokens (reference `_mask_attn_pool(return_dense=True)`,
        # `transformer.py:736-783`)
        td = self.blocks[-1].forward_without_attn(tokens)[:, q + 1 :]
        dtok = self.ln_post(td).astype(self.dtype)
        dtok = dtok @ self.proj.astype(dtok.dtype)
        dense = dtok.reshape(image.shape[0], gh, gw, -1)
        return pooled, dense
