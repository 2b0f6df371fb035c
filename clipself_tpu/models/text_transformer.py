"""CLIP text transformer in Flax (frozen in every shipped recipe).

Layout parity with the reference text tower
(`src/open_clip/eva_clip/transformer.py:642-742`): token embedding + learned
positional embedding, pre-LN residual blocks with packed QKV projections and
GELU MLPs, causal attention mask, final LN, and the EOT-token (argmax of the
token ids) pooled embedding projected by `text_projection`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from clipself_tpu.core.config import TextConfig
from clipself_tpu.models.common import LayerScale
from clipself_tpu.ops.attention import multi_head_attention

Dtype = Any


def _layer_norm(name: str, eps: float):
    return nn.LayerNorm(epsilon=eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name)



def _act(cfg, x):
    # OpenAI CLIP towers use QuickGELU x*sigmoid(1.702x) (reference
    # `src/open_clip/transformer.py` QuickGELU); OpenCLIP-trained ones use
    # exact GELU. Selected by config for checkpoint-level parity.
    if getattr(cfg, "quick_gelu", False):
        return x * jax.nn.sigmoid(1.702 * x)
    return nn.gelu(x, approximate=False)

class TextBlock(nn.Module):
    cfg: TextConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        self.ln_1 = _layer_norm("ln_1", c.ln_eps)
        self.in_proj = nn.Dense(3 * c.width, name="in_proj", **kw)
        self.out_proj = nn.Dense(c.width, name="out_proj", **kw)
        self.ln_2 = _layer_norm("ln_2", c.ln_eps)
        self.c_fc = nn.Dense(4 * c.width, name="c_fc", **kw)
        self.c_proj = nn.Dense(c.width, name="c_proj", **kw)
        ls = getattr(c, "ls_init_value", None)
        self.ls_1 = LayerScale(c.width, ls, name="ls_1") if ls is not None else None
        self.ls_2 = LayerScale(c.width, ls, name="ls_2") if ls is not None else None

    def _attention(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, n, _ = x.shape
        h = c.heads
        d = c.width // h
        q, k, v = jnp.split(self.in_proj(x), 3, axis=-1)
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)
        out = multi_head_attention(q, k, v, d ** -0.5, mask=mask, impl="xla")
        return self.out_proj(out.reshape(b, n, c.width))

    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        a = self._attention(self.ln_1(x).astype(self.dtype), mask)
        x = x + (a if self.ls_1 is None else self.ls_1(a))
        h = _act(self.cfg, self.c_fc(self.ln_2(x).astype(self.dtype)))
        m = self.c_proj(h)
        x = x + (m if self.ls_2 is None else self.ls_2(m))
        return x


class TextTransformer(nn.Module):
    cfg: TextConfig
    embed_dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.token_embedding = nn.Embed(
            c.vocab_size, c.width, param_dtype=jnp.float32, name="token_embedding"
        )
        # embed_cls (CoCa text tower, reference `transformer.py:911-915`):
        # one learned CLS token is appended at the END of the sequence, so the
        # positional table carries context_length + 1 rows
        num_pos = c.context_length + (1 if c.embed_cls else 0)
        if c.embed_cls:
            self.cls_emb = self.param(
                "cls_emb", nn.initializers.normal(0.01), (c.width,), jnp.float32
            )
        else:
            self.cls_emb = None
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (num_pos, c.width),
            jnp.float32,
        )
        self.blocks = [
            TextBlock(c, dtype=self.dtype, name=f"resblocks_{i}") for i in range(c.layers)
        ]
        self.ln_final = _layer_norm("ln_final", c.ln_eps)
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(c.width ** -0.5),
            (c.width, self.embed_dim),
            jnp.float32,
        )

    def features(self, text: jnp.ndarray) -> jnp.ndarray:
        """Per-token features [B, ctx, width] after the final LN (used by the
        CoCa multimodal decoder as the unimodal stream)."""
        c = self.cfg
        n = text.shape[1]
        x = self.token_embedding(text).astype(self.dtype)
        x = x + self.positional_embedding[:n].astype(self.dtype)
        if c.attn_mask:
            causal = jnp.triu(jnp.full((n, n), -jnp.inf, dtype=jnp.float32), k=1)
            mask = causal[None, None]
        else:
            mask = None
        for blk in self.blocks:
            x = blk(x, mask)
        return self.ln_final(x).astype(self.dtype)

    def forward_coca(self, text: jnp.ndarray):
        """(pooled [B, embed_dim], tokens [B, L, width]) — the reference
        embed_cls forward (`transformer.py:985-1016`): the learned CLS token
        is appended AFTER the text, its attention row masks out pad columns
        (`build_cls_mask`, `transformer.py:974-981` — replicated literally,
        including the one-column shift from the prepended always-visible
        column), pooling reads the CLS position through ln_final + projection,
        and the caption token stream is returned WITHOUT ln_final."""
        c = self.cfg
        if self.cls_emb is None:
            # non-embed_cls tower (reference `transformer.py:1007-1010`):
            # ln_final over ALL tokens, argmax (EOT) pooling; the token
            # stream keeps the final LN in this branch
            feats = self.features(text)
            return self.project(feats, text), feats
        b, n = text.shape
        seq = n + 1
        x = self.token_embedding(text).astype(self.dtype)
        cls_tok = jnp.broadcast_to(self.cls_emb.astype(self.dtype), (b, 1, c.width))
        x = jnp.concatenate([x, cls_tok], axis=1)
        x = x + self.positional_embedding[:seq].astype(self.dtype)
        causal = jnp.triu(jnp.full((seq, seq), -jnp.inf, jnp.float32), k=1)
        vis = jnp.where(text != c.pad_id, 0.0, -jnp.inf).astype(jnp.float32)
        last_row = jnp.concatenate([jnp.zeros((b, 1), jnp.float32), vis], axis=1)
        cls_mask = jnp.zeros((b, seq, seq), jnp.float32).at[:, -1, :].set(last_row)
        mask = (causal[None] + cls_mask)[:, None]
        for blk in self.blocks:
            x = blk(x, mask)
        pooled = self.ln_final(x[:, -1]).astype(self.dtype)
        tokens = x[:, :-1]
        return pooled @ self.text_projection.astype(pooled.dtype), tokens

    def project(self, feats: jnp.ndarray, text: jnp.ndarray) -> jnp.ndarray:
        """EOT-pool (highest token id position) + projection."""
        eot = jnp.argmax(text, axis=-1)
        pooled = jnp.take_along_axis(feats, eot[:, None, None], axis=1)[:, 0]
        return pooled @ self.text_projection.astype(pooled.dtype)

    def __call__(self, text: jnp.ndarray) -> jnp.ndarray:
        """text: [B, ctx] int32 token ids -> [B, embed_dim] (not normalized)."""
        return self.project(self.features(text), text)
