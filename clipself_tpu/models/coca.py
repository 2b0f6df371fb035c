"""CoCa: contrastive captioner (CLIP + caption decoder).

Equivalent of the reference's inherited CoCa stack
(`src/open_clip/coca_model.py`, `src/open_clip/transformer.py:163`
AttentionalPooler, `src/open_clip/generation_utils.py`) — present in the
upstream fork for API completeness but unused by the shipped recipes. This
re-design keeps the same capability surface: a vision trunk pooled by
learnable attention queries (1 contrastive + N caption queries), a causal
unimodal text encoder, a cross-attending multimodal decoder producing
caption logits, a combined contrastive+caption loss, and fixed-shape
`lax.scan` generation: greedy, top-k, top-p, and (group) beam search with
min-length and repetition-penalty processors (reference
`CoCa.generate`/`_generate_beamsearch`, `coca_model.py:167-343`).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clipself_tpu.core.config import CLIPConfig
from clipself_tpu.models.clip import l2_normalize
from clipself_tpu.ops.attention import multi_head_attention

Dtype = Any


def _ln(name, eps=1e-5):
    return nn.LayerNorm(epsilon=eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name)


class AttentionalPooler(nn.Module):
    """Learnable-query cross attention pooling (reference
    `transformer.py:163-186`)."""

    d_model: int
    context_dim: int
    n_head: int = 8
    n_queries: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        b = tokens.shape[0]
        q = self.param(
            "query", nn.initializers.normal(0.02), (self.n_queries, self.d_model),
            jnp.float32,
        )
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        tokens = _ln("ln_k")(tokens).astype(self.dtype)
        qx = jnp.broadcast_to(q.astype(self.dtype), (b,) + q.shape)
        qx = _ln("ln_q")(qx).astype(self.dtype)
        h = self.n_head
        d = self.d_model // h
        qh = nn.Dense(self.d_model, name="q_proj", **kw)(qx).reshape(b, -1, h, d)
        kh = nn.Dense(self.d_model, name="k_proj", **kw)(tokens).reshape(b, -1, h, d)
        vh = nn.Dense(self.d_model, name="v_proj", **kw)(tokens).reshape(b, -1, h, d)
        out = multi_head_attention(qh, kh, vh, d ** -0.5)
        out = out.reshape(b, self.n_queries, self.d_model)
        return nn.Dense(self.d_model, name="out_proj", **kw)(out)


class MultimodalBlock(nn.Module):
    """Causal self-attention + cross-attention to image queries + MLP."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        w = self.width
        self.ln_1 = _ln("ln_1")
        self.self_qkv = nn.Dense(3 * w, name="self_qkv", **kw)
        self.self_out = nn.Dense(w, name="self_out", **kw)
        self.ln_1_q = _ln("ln_1_q")
        self.ln_1_kv = _ln("ln_1_kv")
        self.cross_q = nn.Dense(w, name="cross_q", **kw)
        self.cross_k = nn.Dense(w, name="cross_k", **kw)
        self.cross_v = nn.Dense(w, name="cross_v", **kw)
        self.cross_out = nn.Dense(w, name="cross_out", **kw)
        self.ln_2 = _ln("ln_2")
        self.c_fc = nn.Dense(4 * w, name="c_fc", **kw)
        self.c_proj = nn.Dense(w, name="c_proj", **kw)

    def _heads(self, x, h):
        b, n, _ = x.shape
        return x.reshape(b, n, h, self.width // h)

    def __call__(self, x, img_tokens, causal_mask):
        h = self.heads
        d = self.width // h
        y = self.ln_1(x).astype(self.dtype)
        q, k, v = jnp.split(self.self_qkv(y), 3, axis=-1)
        attn = multi_head_attention(
            self._heads(q, h), self._heads(k, h), self._heads(v, h), d ** -0.5,
            mask=causal_mask,
        ).reshape(x.shape)
        x = x + self.self_out(attn)
        # separate pre-LNs: the text query stream and the projected image kv
        # stream have different distributions (reference gives cross-attn a
        # dedicated ln_1 for q and ln_1_kv for kv)
        y = self.ln_1_q(x).astype(self.dtype)
        ki = self.ln_1_kv(img_tokens).astype(self.dtype)
        cross = multi_head_attention(
            self._heads(self.cross_q(y), h),
            self._heads(self.cross_k(ki), h),
            self._heads(self.cross_v(ki), h),
            d ** -0.5,
        ).reshape(x.shape)
        x = x + self.cross_out(cross)
        y = self.ln_2(x).astype(self.dtype)
        return x + self.c_proj(nn.gelu(self.c_fc(y), approximate=False))


class CoCa(nn.Module):
    """Contrastive captioner over the framework's ViT towers (EVA or
    OpenCLIP; ResNet towers have no token stream for the pooler)."""

    cfg: CLIPConfig
    multimodal_layers: int = 6
    caption_queries: int = 255
    pad_id: int = 0
    dtype: Dtype = jnp.float32

    def setup(self):
        from clipself_tpu.models.clip import CLIP

        c = self.cfg
        self.clip = CLIP(c, dtype=self.dtype, name="clip")
        width = c.text.width
        self.img_pooler = AttentionalPooler(
            d_model=width, context_dim=c.vision.width, n_head=c.text.heads,
            n_queries=self.caption_queries + 1, dtype=self.dtype, name="img_pooler",
        )
        self.img_proj = nn.Dense(
            width, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="img_proj",
        )
        self.contrastive_proj = nn.Dense(
            c.embed_dim, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="contrastive_proj",
        )
        self.mm_blocks = [
            MultimodalBlock(width, c.text.heads, dtype=self.dtype, name=f"mm_{i}")
            for i in range(self.multimodal_layers)
        ]
        self.ln_mm = _ln("ln_mm")
        self.to_logits = nn.Dense(
            c.text.vocab_size, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="to_logits",
        )

    def _image_tokens(self, image):
        """Vision trunk token sequence -> (contrastive embed, caption tokens)."""
        visual = self.clip.visual
        if not hasattr(visual, "forward_tokens"):
            raise NotImplementedError(
                "CoCa needs a token-sequence vision tower (EVA or OpenCLIP "
                "ViT); ResNet towers have no token stream, as in the reference"
            )
        t = visual.forward_tokens(image)
        pooled = self.img_pooler(self.img_proj(t))
        contrastive = l2_normalize(self.contrastive_proj(pooled[:, 0]))
        return contrastive, pooled[:, 1:]

    def _text_tokens(self, text):
        """Causal unimodal text features [B, L, W] (no pooling)."""
        tt = self.clip.text
        if not hasattr(tt, "features"):
            raise NotImplementedError(
                "CoCa needs the built-in causal text transformer (HF text "
                "towers expose no per-token feature/projection protocol), "
                "as in the reference where CoCa builds its own text tower"
            )
        return tt.features(text)

    def decode_text(self, img_tokens, text):
        """Caption logits [B, L, V] given precomputed caption image tokens —
        the per-step body of generation (the vision trunk is loop-invariant
        and must not be recomputed inside the sampling scan)."""
        feats = self._text_tokens(text)
        n = text.shape[1]
        causal = jnp.triu(jnp.full((n, n), -1e9, jnp.float32), 1)[None, None]
        x = feats
        for blk in self.mm_blocks:
            x = blk(x, img_tokens, causal)
        return self.to_logits(self.ln_mm(x).astype(self.dtype))

    def __call__(self, image, text):
        img_embed, img_tokens = self._image_tokens(image)
        feats = self._text_tokens(text)
        txt_embed = l2_normalize(self.clip.text.project(feats, text))
        logits = self.decode_text(img_tokens, text)
        return {
            "image_features": img_embed,
            "text_features": txt_embed,
            "logits": logits,
            "logit_scale": jnp.exp(self.clip.logit_scale),
        }


def coca_loss(out: dict, text: jnp.ndarray, caption_weight: float = 2.0,
              contrastive_weight: float = 1.0, pad_id: int = 0):
    """Contrastive + shifted caption CE (reference `CoCaLoss`,
    `src/open_clip/loss.py:134-173`)."""
    from clipself_tpu.train.contrastive import clip_loss

    con = clip_loss(out["image_features"], out["text_features"], out["logit_scale"])
    logits = out["logits"][:, :-1]
    labels = text[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    mask = (labels != pad_id).astype(jnp.float32)
    cap = (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    return contrastive_weight * con + caption_weight * cap, {
        "contrastive_loss": con, "caption_loss": cap,
    }


def _apply_processors(
    logits: jnp.ndarray,
    tokens: jnp.ndarray,
    pos,
    eot_id: int,
    pad_id: int,
    min_len: int,
    repetition_penalty: float,
) -> jnp.ndarray:
    """Logit processors (reference wires HF MinLengthLogitsProcessor +
    RepetitionPenaltyLogitsProcessor into generate, `coca_model.py:196-201`).

    logits: [B, V] float32; tokens: [B, L] buffer (pad-filled past `pos`).
    """
    v = logits.shape[-1]
    if min_len > 1:
        logits = jnp.where(
            (pos < min_len) & (jnp.arange(v)[None, :] == eot_id), -1e9, logits
        )
    if repetition_penalty != 1.0:
        b, L = tokens.shape
        # only positions < pos hold generated tokens; later slots are the
        # static buffer's pad fill. Mask by POSITION (pad_id = 0 is also a
        # real BPE token — '!' — which must still be penalized when generated)
        slot = jnp.where(jnp.arange(L)[None, :] < pos, tokens, v)
        seen = jnp.zeros((b, v + 1), bool).at[
            jnp.arange(b)[:, None], slot
        ].set(True)[:, :v]
        penalized = jnp.where(
            logits > 0, logits / repetition_penalty, logits * repetition_penalty
        )
        logits = jnp.where(seen, penalized, logits)
    return logits


def generate(
    model: CoCa,
    params,
    image: jnp.ndarray,
    sot_id: int,
    eot_id: int,
    max_len: int = 77,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    min_len: int = 1,
    repetition_penalty: float = 1.0,
    rng: Optional[jax.Array] = None,
):
    """Fixed-shape autoregressive caption generation (reference
    `CoCa.generate` top_k/top_p paths, `coca_model.py:232-343`): greedy when
    top_k == 0 and top_p == 0, top-k sampling, or nucleus (top-p) sampling;
    runs as a `lax.scan` over positions with a static-length token buffer
    (TPU-friendly — no dynamic shapes, one compile).
    """
    b = image.shape[0]
    tokens0 = jnp.full((b, max_len), model.pad_id, jnp.int32).at[:, 0].set(sot_id)

    # the vision trunk is loop-invariant: encode ONCE, decode per step
    _, img_tokens = model.apply({"params": params}, image, method="_image_tokens")

    def logits_fn(tokens):
        return model.apply({"params": params}, img_tokens, tokens, method="decode_text")

    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def step(carry, pos):
        tokens, done, key = carry
        # processors and the top-p/top-k warpers act on RAW logits; the
        # temperature only rescales the final sampling softmax (reference
        # `coca_model.py:266-269`: probs = softmax(filtered_logits / T))
        logits = logits_fn(tokens)[:, pos - 1].astype(jnp.float32)
        logits = _apply_processors(
            logits, tokens, pos, eot_id, model.pad_id, min_len, repetition_penalty
        )
        if top_p > 0.0:
            # HF TopPLogitsWarper: keep the smallest descending-prob prefix
            # holding at least top_p probability mass (always >= 1 token)
            sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep_sorted = cum - probs < top_p
            kth = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1)
            logits = jnp.where(logits < kth[:, None], -1e9, logits)
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, logits / max(temperature, 1e-6))
        elif top_k > 0:
            kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
            logits = jnp.where(logits < kth, -1e9, logits)
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, logits / max(temperature, 1e-6))
        else:
            nxt = jnp.argmax(logits, axis=-1)
        # the final slot must terminate the caption (reference
        # `coca_model.py:254-257`: eos is forced when cur_len+1 == seq_len)
        nxt = jnp.where(pos == max_len - 1, eot_id, nxt)
        nxt = jnp.where(done, model.pad_id, nxt).astype(jnp.int32)
        tokens = tokens.at[:, pos].set(nxt)
        done = done | (nxt == eot_id)
        return (tokens, done, key), None

    (tokens, _, _), _ = jax.lax.scan(
        step, (tokens0, jnp.zeros((b,), bool), rng), jnp.arange(1, max_len)
    )
    return tokens


def beam_search(
    model: CoCa,
    params,
    image: jnp.ndarray,
    sot_id: int,
    eot_id: int,
    max_len: int = 77,
    num_beams: int = 6,
    num_beam_groups: int = 1,
    min_len: int = 1,
    repetition_penalty: float = 1.0,
    length_penalty: float = 1.0,
):
    """Fixed-shape beam search (reference `_generate_beamsearch`,
    `coca_model.py:289-343`). Groups partition the beams into independent
    sub-searches (the reference separates groups only through their init
    scores); the best sequence across all groups is returned.

    TPU-first design: the beam frontier lives in a static [B, K, L] buffer
    advanced by `lax.scan`; finished beams survive in the pool by being
    forced to extend with pad at score 0, so selection is one top-k over
    [B, K*V] per group per position — no host-side beam bookkeeping.

    Returns [B, max_len] int32 tokens of the best beam.
    """
    assert num_beams % num_beam_groups == 0, "num_beams must divide into groups"
    b = image.shape[0]
    k = num_beams
    g = num_beam_groups
    sub = k // g
    pad_id = model.pad_id

    tokens0 = jnp.full((b, k, max_len), pad_id, jnp.int32).at[:, :, 0].set(sot_id)
    # first beam of each group scores 0, the rest -1e9 (reference
    # `coca_model.py:336-338`) so group beams diverge from step one
    scores0 = jnp.where(jnp.arange(k) % sub == 0, 0.0, -1e9)
    scores0 = jnp.broadcast_to(scores0, (b, k)).astype(jnp.float32)
    # encode each image ONCE; beams share the repeated caption tokens
    _, img_tokens = model.apply({"params": params}, image, method="_image_tokens")
    img_tokens_rep = jnp.repeat(img_tokens, k, axis=0)

    def logits_fn(tokens):
        return model.apply(
            {"params": params}, img_tokens_rep, tokens.reshape(b * k, max_len),
            method="decode_text",
        )

    def step(carry, pos):
        tokens, scores, done, lens = carry
        logits = logits_fn(tokens)[:, pos - 1].astype(jnp.float32)  # [B*K, V]
        v = logits.shape[-1]
        logp = jax.nn.log_softmax(logits, axis=-1)
        logp = _apply_processors(
            logp, tokens.reshape(b * k, max_len), pos, eot_id, pad_id,
            min_len, repetition_penalty,
        )
        logp = logp.reshape(b, k, v)
        # finished beams may only extend with pad, at no cost — they stay in
        # the pool and compete on their frozen score
        pad_only = jnp.where(jnp.arange(v)[None, None, :] == pad_id, 0.0, -jnp.inf)
        logp = jnp.where(done[..., None], pad_only, logp)
        cand = scores[..., None] + logp  # [B, K, V]
        # independent top-sub within each group
        cand = cand.reshape(b, g, sub * v)
        top_scores, top_idx = jax.lax.top_k(cand, sub)  # [B, G, sub]
        beam_in_group = top_idx // v  # [B, G, sub]
        token_idx = (top_idx % v).astype(jnp.int32)
        src_beam = beam_in_group + (jnp.arange(g) * sub)[None, :, None]
        src_beam = src_beam.reshape(b, k)
        token_idx = token_idx.reshape(b, k)
        new_scores = top_scores.reshape(b, k)
        bi = jnp.arange(b)[:, None]
        tokens = tokens[bi, src_beam]  # reorder frontiers
        was_done = done[bi, src_beam]
        # unfinished beams terminate with EOT at the final slot (HF
        # BeamSearchScorer.finalize appends eos the same way; mirrors
        # generate()'s forced EOT)
        token_idx = jnp.where(
            (pos == max_len - 1) & ~was_done, eot_id, token_idx
        ).astype(jnp.int32)
        tokens = tokens.at[:, :, pos].set(token_idx)
        done = was_done | (token_idx == eot_id)
        # generated length (incl. eot) freezes when a beam finishes
        lens = jnp.where(was_done, lens[bi, src_beam], pos + 1)
        return (tokens, new_scores, done, lens), None

    carry0 = (
        tokens0, scores0, jnp.zeros((b, k), bool), jnp.ones((b, k), jnp.int32)
    )
    (tokens, scores, _, lens), _ = jax.lax.scan(
        step, carry0, jnp.arange(1, max_len)
    )
    # HF BeamSearchScorer selection: cumulative log-prob / length^penalty
    norm = scores / jnp.maximum(lens.astype(jnp.float32), 1.0) ** length_penalty
    best = jnp.argmax(norm, axis=-1)
    return tokens[jnp.arange(b), best]
