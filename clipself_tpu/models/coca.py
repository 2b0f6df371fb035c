"""CoCa: contrastive captioner (CLIP + caption decoder).

Architecture parity with the reference CoCa stack
(`src/open_clip/coca_model.py`, `src/open_clip/transformer.py:163-186`
AttentionalPooler / `:1018-1106` MultimodalTransformer,
`src/open_clip/generation_utils.py`):

  - visual tower: VisionTransformer with attentional pooling — n_queries
    learned queries in embed_dim space, ln_post over ALL pooled tokens,
    square projection; (pooled, tokens) = (x[:, 0] @ proj, x[:, 1:])
    (`transformer.py:380-384,480-494`)
  - text tower: TextTransformer with a learned CLS token appended at the END
    (embed_cls), pad-masked CLS attention row, caption token stream returned
    WITHOUT ln_final (`transformer.py:985-1016`)
  - text decoder: per layer one causal self-attention block then one
    cross-attention block (each with its own MLP), final LN + projection to
    the vocabulary (`transformer.py:1018-1106`)

Generation is a TPU-first re-design of the reference's HF-based sampling
(`coca_model.py:167-343`): fixed-shape `lax.scan` over positions with
greedy/top-k/top-p and (group) beam search, min-length and
repetition-penalty processors.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clipself_tpu.core.config import CLIPConfig, MultimodalConfig, TextConfig
from clipself_tpu.models.common import l2_normalize
from clipself_tpu.models.text_transformer import TextBlock, TextTransformer

Dtype = Any


def _ln(name, eps=1e-5):
    return nn.LayerNorm(epsilon=eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name)


class CrossAttnBlock(nn.Module):
    """Cross-attention residual block (reference `ResidualAttentionBlock`
    with is_cross_attention=True, `transformer.py:189-245`): q from ln_1(x),
    k/v from ln_1_kv(kv), packed-in_proj-equivalent projections, then an MLP
    — a FULL block with its own feed-forward, unlike a bare cross-attn."""

    cfg: MultimodalConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        w = c.width
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        self.ln_1 = _ln("ln_1", c.ln_eps)
        self.ln_1_kv = _ln("ln_1_kv", c.ln_eps)
        # torch packs q/k/v into attn.in_proj_weight; separate Denses here
        # (mapped by slice in torch_io) because q and kv streams differ
        self.q_proj = nn.Dense(w, name="q_proj", **kw)
        self.k_proj = nn.Dense(w, name="k_proj", **kw)
        self.v_proj = nn.Dense(w, name="v_proj", **kw)
        self.out_proj = nn.Dense(w, name="out_proj", **kw)
        self.ln_2 = _ln("ln_2", c.ln_eps)
        self.c_fc = nn.Dense(int(w * c.mlp_ratio), name="c_fc", **kw)
        self.c_proj = nn.Dense(w, name="c_proj", **kw)

    def __call__(self, x: jnp.ndarray, kv: jnp.ndarray) -> jnp.ndarray:
        from clipself_tpu.ops.attention import multi_head_attention

        c = self.cfg
        h = c.heads
        d = c.width // h
        b, n, _ = x.shape
        y = self.ln_1(x).astype(self.dtype)
        ki = self.ln_1_kv(kv).astype(self.dtype)
        out = multi_head_attention(
            self.q_proj(y).reshape(b, n, h, d),
            self.k_proj(ki).reshape(b, -1, h, d),
            self.v_proj(ki).reshape(b, -1, h, d),
            d ** -0.5,
        )
        x = x + self.out_proj(out.reshape(b, n, c.width))
        y = self.ln_2(x).astype(self.dtype)
        hmid = self.c_fc(y)
        if c.quick_gelu:
            hmid = hmid * jax.nn.sigmoid(1.702 * hmid)
        else:
            hmid = nn.gelu(hmid, approximate=False)
        return x + self.c_proj(hmid)


class MultimodalDecoder(nn.Module):
    """Reference `MultimodalTransformer` (`transformer.py:1018-1106`): per
    layer a causal self block then a cross block, final LN, projection to the
    vocabulary."""

    cfg: MultimodalConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        # the self blocks are plain text resblocks; reuse TextBlock through a
        # TextConfig view of the multimodal hyperparameters
        tc = TextConfig(
            context_length=c.context_length, vocab_size=c.vocab_size,
            width=c.width, heads=c.heads, layers=c.layers,
            ls_init_value=c.ls_init_value, quick_gelu=c.quick_gelu,
            ln_eps=c.ln_eps,
        )
        if c.mlp_ratio != 4.0:
            raise NotImplementedError(
                "multimodal mlp_ratio != 4 (no shipped reference config uses it)"
            )
        self.resblocks = [
            TextBlock(tc, dtype=self.dtype, name=f"resblocks_{i}")
            for i in range(c.layers)
        ]
        self.cross_attn = [
            CrossAttnBlock(c, dtype=self.dtype, name=f"cross_attn_{i}")
            for i in range(c.layers)
        ]
        self.ln_final = _ln("ln_final", c.ln_eps)
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(c.width ** -0.5),
            (c.width, c.vocab_size),
            jnp.float32,
        )

    def __call__(self, image_embs: jnp.ndarray, text_embs: jnp.ndarray) -> jnp.ndarray:
        n = text_embs.shape[1]
        causal = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)[None, None]
        x = text_embs
        for blk, cross in zip(self.resblocks, self.cross_attn):
            x = blk(x, causal)
            x = cross(x, image_embs)
        x = self.ln_final(x).astype(self.dtype)
        return x @ self.text_projection.astype(x.dtype)


class CoCa(nn.Module):
    """Contrastive captioner (reference `CoCa`, `coca_model.py:80-166`).

    Param tree mirrors the reference state-dict roots: `visual` (ViT with
    attentional pool), `text` (embed_cls text transformer), `text_decoder`
    (multimodal decoder), `logit_scale`.
    """

    cfg: CLIPConfig
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    pad_id: int = 0

    def setup(self):
        c = self.cfg
        assert c.multimodal is not None, "CoCa needs a multimodal config"
        if c.vision.eva_model_name:
            from clipself_tpu.models.eva_vit import EvaViT

            visual_cls = EvaViT
        elif c.vision.resnet_layers:
            raise NotImplementedError(
                "CoCa needs a token-sequence vision tower; ResNet towers have "
                "no token stream (as in the reference)"
            )
        else:
            from clipself_tpu.models.open_clip_vit import OpenCLIPViT

            visual_cls = OpenCLIPViT
        self.visual = visual_cls(
            c.vision, embed_dim=c.embed_dim, dtype=self.dtype,
            attn_impl=self.attn_impl, remat=self.remat, name="visual",
        )
        if c.text.hf_model_name:
            from clipself_tpu.models.hf_text import HFTextTower

            self.text = HFTextTower(
                c.text.hf_model_name, output_dim=c.embed_dim,
                pooler_type=c.text.pooler_type, proj=c.text.proj,
                hf_config_kwargs=c.text.hf_model_config,
                dtype=self.dtype, name="text",
            )
        else:
            self.text = TextTransformer(
                c.text, embed_dim=c.embed_dim, dtype=self.dtype, name="text"
            )
        self.text_decoder = MultimodalDecoder(
            c.multimodal, dtype=self.dtype, name="text_decoder"
        )
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(np.log(1.0 / 0.07)), (), jnp.float32
        )

    def _encode_image(self, image, normalize: bool = True):
        """(image_latent [B, E], image_embs [B, Q-1, E]) — reference
        `_encode_image`, `coca_model.py:131-134`."""
        pooled, tokens = self.visual.forward_pooled(image)
        latent = l2_normalize(pooled) if normalize else pooled
        return latent, tokens

    def _encode_text(self, text, normalize: bool = True, embed_cls: bool = True):
        """(text_latent [B, E], token_embs [B, L, W]) — reference
        `_encode_text`, `coca_model.py:136-139`: with embed_cls the input is
        truncated by one to make room for the CLS slot."""
        text = text[:, :-1] if embed_cls else text
        if hasattr(self.text, "forward_coca"):
            pooled, tokens = self.text.forward_coca(text)
        else:  # HF text tower: per-token hidden states + pooled projection
            pooled, tokens = self.text.forward_tokens(text)
        latent = l2_normalize(pooled) if normalize else pooled
        return latent, tokens

    def encode_image(self, image, normalize: bool = True):
        return self._encode_image(image, normalize=normalize)[0]

    def encode_text(self, text, normalize: bool = True, embed_cls: bool = True):
        return self._encode_text(text, normalize=normalize, embed_cls=embed_cls)[0]

    def decode_text(self, img_tokens, text, embed_cls: bool = False):
        """Caption logits [B, L, V] given precomputed caption image tokens —
        the per-step body of generation (the vision trunk is loop-invariant
        and must not be recomputed inside the sampling scan)."""
        _, token_embs = self._encode_text(text, embed_cls=embed_cls)
        return self.text_decoder(img_tokens, token_embs)

    def __call__(self, image, text, embed_cls: bool = True):
        text_latent, token_embs = self._encode_text(text, embed_cls=embed_cls)
        image_latent, image_embs = self._encode_image(image)
        labels = text[:, -token_embs.shape[1]:]
        logits = self.text_decoder(image_embs, token_embs)
        return {
            "image_features": image_latent,
            "text_features": text_latent,
            "logits": logits,
            "labels": labels,
            "logit_scale": jnp.exp(self.logit_scale),
        }


def coca_loss(out: dict, text: jnp.ndarray = None, caption_weight: float = 2.0,
              contrastive_weight: float = 1.0, pad_id: int = 0):
    """Contrastive + shifted caption CE (reference `CoCaLoss`,
    `src/open_clip/loss.py:134-173`). `text` defaults to out["labels"]."""
    from clipself_tpu.train.contrastive import clip_loss

    con = clip_loss(out["image_features"], out["text_features"], out["logit_scale"])
    labels = out["labels"] if text is None else text[:, -out["logits"].shape[1]:]
    logits = out["logits"][:, :-1]
    labels = labels[:, 1:]
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
    (TPU-friendly — no dynamic shapes, one compile). The decoder consumes the
    unimodal stream with embed_cls=False, exactly as the reference's
    generation loop does (`coca_model.py:259`)."""
    b = image.shape[0]
    tokens0 = jnp.full((b, max_len), model.pad_id, jnp.int32).at[:, 0].set(sot_id)

    # the vision trunk is loop-invariant: encode ONCE, decode per step
    _, img_tokens = model.apply(
        {"params": params}, image, method="_encode_image"
    )

    def logits_fn(tokens):
        return model.apply(
            {"params": params}, img_tokens, tokens, method="decode_text"
        )

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
        # a sampled pad ALSO terminates the row, with no appended EOT
        # (reference `coca_model.py:260`: mask = last==eos | last==pad)
        done = done | (nxt == eot_id) | (nxt == model.pad_id)
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
    _, img_tokens = model.apply({"params": params}, image, method="_encode_image")
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
