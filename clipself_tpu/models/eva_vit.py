"""EVA02-style vision transformer in Flax, with the dense-prediction protocol.

Behavioral parity targets (all re-derived, none translated):
  - trunk layout: pre-norm blocks with SwiGLU MLP, sub-LN (separate q/k/v
    projections + inner attention LN + ffn LN), 2-D RoPE on patch tokens
    (reference `src/open_clip/eva_clip/eva_vit_model.py:107-332,396-586`)
  - dense protocol: final block applied WITHOUT attention mixing (value path
    only), drop CLS, final norm + head, L2-normalize
    (reference `eva_vit_model.py:249-256,588-623`)
  - variable input resolution: absolute pos-embed bicubic-resized to the
    input grid, RoPE tables rebuilt per grid
    (reference `eva_vit_model.py:631-643`, `rope.py:179-214`)

TPU-first design notes:
  - channels-last [B, H, W, 3] inputs; tokens [B, N, D]
  - every input shape is a separate compiled executable; pos-embed resize and
    RoPE tables are trace-time constants (no runtime caches)
  - params live in float32; activations in a configurable compute dtype
    (bfloat16 on TPU); LayerNorms always compute in float32
  - attention dispatches to the Pallas flash kernel for long sequences
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from clipself_tpu.core.config import VisionConfig
from clipself_tpu.models.rope import apply_rope_flat, apply_rope_gathered
from clipself_tpu.ops.attention import multi_head_attention
from clipself_tpu.ops.interpolate import resize_2d
from clipself_tpu.ops.mask_pool import mask_pool
from clipself_tpu.ops.patchify import PatchEmbed
from clipself_tpu.models.common import l2_normalize
from clipself_tpu.ops.roi_align import denormalize_boxes, roi_align_1x1

Dtype = Any


class _FusableLayerNorm(nn.Module):
    """`nn.LayerNorm(dtype=f32)` with a Pallas one-pass TPU path.

    Same param tree as nn.LayerNorm ({scale, bias} in f32), same f32 math
    and association (fast variance, y = (x-mu)*(rstd*scale)+bias); on TPU
    the `pallas_ln` knob fuses stats+normalize into one VMEM pass
    (ops/layer_norm.py) and emits y directly in x.dtype — the cast every
    call site applies. The fused branch only engages when x.dtype equals
    the owning tower's compute dtype (`compute_dtype`), so the call-site
    `.astype(self.dtype)` makes both branches land on the identical value
    (one f32->dtype rounding either way); any other dtype combination takes
    the XLA f32 path, honoring the nn.LayerNorm output contract. Off-TPU /
    unsupported shapes also take the XLA composition, written to compile to
    the same graph nn.LayerNorm does.
    """

    epsilon: float
    compute_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        w = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (w,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (w,), jnp.float32)
        from clipself_tpu.core import knobs
        from clipself_tpu.ops import layer_norm as _pln

        if (
            x.ndim == 3
            and self.compute_dtype is not None
            and x.dtype == jnp.dtype(self.compute_dtype)
            and knobs.get("pallas_ln")
            and _pln.available()
            and _pln.supported(x.shape[1], w)
        ):
            return _pln.fused_layer_norm(x, scale, bias, self.epsilon)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
        )
        return (xf - mu) * (jax.lax.rsqrt(var + self.epsilon) * scale) + bias


def _fused_proj() -> bool:
    """Whether to run the subln q/k/v trio (and SwiGLU's gate+up pair) as
    one concatenated matmul (knob `fused_proj`; A/B in PERF.md)."""
    from clipself_tpu.core import knobs

    return bool(knobs.get("fused_proj"))


def _layer_norm(name: str, eps: float, dtype: Optional[Any] = None):
    # LayerNorm computes in f32 regardless of activation dtype (parity with
    # the reference's fp32 LN behavior under AMP). `dtype` is the owning
    # tower's compute dtype: it gates the Pallas fused path to the
    # cast-at-call-site contract (see _FusableLayerNorm).
    return _FusableLayerNorm(epsilon=eps, compute_dtype=dtype, name=name)


def _rel_pos_index(window: tuple[int, int]):
    """Static BEiT relative-position index over a (wh, ww) grid plus CLS:
    pairwise (dy, dx) offsets bucketed into a (2wh-1)(2ww-1) table, with three
    extra buckets for cls→token / token→cls / cls→cls (behavioral parity with
    reference `RelativePositionBias`, `eva_vit_model.py:359-393`)."""
    import numpy as np

    wh, ww = window
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)  # [2, wh*ww]
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)  # [N, N, 2]
    rel = rel + np.array([wh - 1, ww - 1])  # shift to start from 0
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    idx = np.zeros((wh * ww + 1, wh * ww + 1), np.int32)
    idx[1:, 1:] = rel[:, :, 0] * (2 * ww - 1) + rel[:, :, 1]
    idx[0, :] = num_rel - 3
    idx[:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx, num_rel


class RelPosBias(nn.Module):
    """Learned decomposed relative position bias, returned as an additive
    [1, heads, N+1, N+1] attention bias. The index is a trace-time constant;
    the gather lowers to one [num_rel, H] -> [N+1, N+1, H] take."""

    window: tuple[int, int]
    num_heads: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        idx, num_rel = _rel_pos_index(self.window)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            (num_rel, self.num_heads),
            jnp.float32,
        )
        n1 = idx.shape[0]
        bias = jnp.take(table, jnp.asarray(idx.reshape(-1)), axis=0)
        bias = bias.reshape(n1, n1, self.num_heads)
        return jnp.transpose(bias, (2, 0, 1))[None]


class EvaAttention(nn.Module):
    cfg: VisionConfig
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        c = self.cfg
        dim = c.width
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        if c.subln:
            self.q_proj = nn.Dense(dim, use_bias=c.qkv_bias, name="q_proj", **kw)
            self.k_proj = nn.Dense(dim, use_bias=False, name="k_proj", **kw)
            self.v_proj = nn.Dense(dim, use_bias=c.qkv_bias, name="v_proj", **kw)
        else:
            self.qkv = nn.Dense(dim * 3, use_bias=False, name="qkv", **kw)
            if c.qkv_bias:
                self.q_bias = self.param("q_bias", nn.initializers.zeros, (dim,), jnp.float32)
                self.v_bias = self.param("v_bias", nn.initializers.zeros, (dim,), jnp.float32)
        self.inner_attn_ln = (
            _layer_norm("inner_attn_ln", c.ln_eps, self.dtype) if c.subln else None
        )
        self.proj = nn.Dense(dim, name="proj", **kw)
        if c.use_rel_pos_bias:
            # per-block table (reference passes `window_size` into each
            # block's Attention when use_rel_pos_bias, `eva_vit_model.py:448`)
            self.rel_pos_bias = RelPosBias(
                window=(c.grid_size, c.grid_size),
                num_heads=c.num_heads,
                name="rel_pos_bias",
            )

    def _qkv_flat(self, x: jnp.ndarray):
        c = self.cfg
        if c.subln:
            if _fused_proj() and not self.is_initializing():
                # one [W, 3W] matmul instead of three [W, W]: same values
                # (bias added after the split exactly as nn.Dense adds it),
                # one read of x instead of three in fwd/dgrad/wgrad. Params
                # stay under q_proj/k_proj/v_proj — checkpoints unchanged.
                pq, pk, pv = (
                    m.variables["params"]
                    for m in (self.q_proj, self.k_proj, self.v_proj)
                )
                w = jnp.concatenate(
                    [pq["kernel"], pk["kernel"], pv["kernel"]], axis=1
                ).astype(self.dtype)
                qkv = x @ w
                q, k, v = jnp.split(qkv, 3, axis=-1)
                if c.qkv_bias:
                    q = q + pq["bias"].astype(q.dtype)
                    v = v + pv["bias"].astype(v.dtype)
                return q, k, v
            q, k, v = self.q_proj(x), self.k_proj(x), self.v_proj(x)
        else:
            qkv = self.qkv(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if c.qkv_bias:
                q = q + self.q_bias.astype(q.dtype)
                v = v + self.v_bias.astype(v.dtype)
        return q, k, v

    def __call__(
        self,
        x: jnp.ndarray,
        grid_hw: Optional[tuple[int, int]] = None,
        mask: Optional[jnp.ndarray] = None,
        seg: Optional[jnp.ndarray] = None,
        pos_idx: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = self.cfg
        q, k, v = self._qkv_flat(x)
        b, n, _ = q.shape
        heads = (b, n, c.num_heads, c.head_width)
        if c.rope and grid_hw is not None:
            gh, gw = grid_hw
            if pos_idx is not None:
                # patch-dropout path: tokens are a gathered subset; rotate by
                # their original grid positions (per-head layout)
                def rot(t):
                    t = t.reshape(heads)
                    return jnp.concatenate(
                        [t[:, :1], apply_rope_gathered(t[:, 1:], pos_idx, gh, gw, c.pt_hw_seq_len)],
                        axis=1,
                    )
            else:
                # rotate in the FLAT [B, N, width] layout (full 128-lane
                # tiles; the per-head [.., 64] layout halves lane utilization
                # on every elementwise op) with identity rows baked into the
                # tables for CLS and the flash-padding tail
                def rot(t):
                    return apply_rope_flat(
                        t, gh, gw, c.head_width, 1, c.pt_hw_seq_len
                    ).reshape(heads)

            q = rot(q)
            k = rot(k)
        else:
            q = q.reshape(heads)
            k = k.reshape(heads)
        v = v.reshape(heads)
        if c.use_rel_pos_bias:
            bias = self.rel_pos_bias()
            if bias.shape[-1] != q.shape[1]:
                raise ValueError(
                    f"rel-pos-bias window {bias.shape[-1]} != sequence {q.shape[1]}; "
                    "rel-pos models are fixed-resolution (resize the table at "
                    "checkpoint load for other input sizes)"
                )
            mask = bias if mask is None else mask + bias
        scale = c.head_width ** -0.5
        out = multi_head_attention(
            q, k, v, scale, mask=mask, impl=self.attn_impl, segment_mask=seg
        )
        b, n = x.shape[:2]
        out = out.reshape(b, n, c.width)
        if self.inner_attn_ln is not None:
            out = self.inner_attn_ln(out).astype(self.dtype)
        return self.proj(out)

    def value_path(self, x: jnp.ndarray) -> jnp.ndarray:
        """The attention branch without token mixing: v-projection + inner LN
        + output projection (reference `proj_without_attn`,
        `eva_vit_model.py:249-256`)."""
        c = self.cfg
        if c.subln:
            v = self.v_proj(x)
        else:
            v = self.qkv(x)[..., 2 * c.width :]
            if c.qkv_bias:
                v = v + self.v_bias.astype(v.dtype)
        if self.inner_attn_ln is not None:
            v = self.inner_attn_ln(v).astype(self.dtype)
        return self.proj(v)


class SwiGLU(nn.Module):
    cfg: VisionConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        hidden = int(c.width * c.mlp_ratio)
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        self.w1 = nn.Dense(hidden, name="w1", **kw)
        self.w2 = nn.Dense(hidden, name="w2", **kw)
        self.ffn_ln = _layer_norm("ffn_ln", c.ln_eps, self.dtype) if c.subln else None
        self.w3 = nn.Dense(c.width, name="w3", **kw)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if _fused_proj() and not self.is_initializing():
            # gate+up as one [W, 2H] matmul (see _qkv_flat)
            p1 = self.w1.variables["params"]
            p2 = self.w2.variables["params"]
            w = jnp.concatenate([p1["kernel"], p2["kernel"]], axis=1).astype(self.dtype)
            b = jnp.concatenate([p1["bias"], p2["bias"]]).astype(self.dtype)
            h1, h2 = jnp.split(x @ w + b, 2, axis=-1)
            h = nn.silu(h1) * h2
        else:
            h = nn.silu(self.w1(x)) * self.w2(x)
        if self.ffn_ln is not None:
            h = self.ffn_ln(h).astype(self.dtype)
        return self.w3(h)


class Mlp(nn.Module):
    """Plain GELU MLP (EVA01-style configs without naiveswiglu)."""

    cfg: VisionConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        hidden = int(c.width * c.mlp_ratio)
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        self.fc1 = nn.Dense(hidden, name="fc1", **kw)
        self.ffn_ln = _layer_norm("ffn_ln", c.ln_eps, self.dtype) if c.subln else None
        self.fc2 = nn.Dense(c.width, name="fc2", **kw)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.gelu(self.fc1(x), approximate=False)
        if self.ffn_ln is not None:
            h = self.ffn_ln(h).astype(self.dtype)
        return self.fc2(h)


class EvaBlock(nn.Module):
    cfg: VisionConfig
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        c = self.cfg
        self.norm1 = _layer_norm("norm1", c.ln_eps, self.dtype)
        self.attn = EvaAttention(c, dtype=self.dtype, attn_impl=self.attn_impl, name="attn")
        self.norm2 = _layer_norm("norm2", c.ln_eps, self.dtype)
        mlp_cls = SwiGLU if c.naiveswiglu else Mlp
        self.mlp = mlp_cls(c, dtype=self.dtype, name="mlp")
        if c.ls_init_value is not None:
            init = nn.initializers.constant(c.ls_init_value)
            self.gamma_1 = self.param("gamma_1", init, (c.width,), jnp.float32)
            self.gamma_2 = self.param("gamma_2", init, (c.width,), jnp.float32)

    def _scaled(self, y: jnp.ndarray, which: int) -> jnp.ndarray:
        if self.cfg.ls_init_value is None:
            return y
        g = self.gamma_1 if which == 1 else self.gamma_2
        return y * g.astype(y.dtype)

    def __call__(self, x, grid_hw=None, mask=None, seg=None, pos_idx=None):
        c = self.cfg
        if c.postnorm:
            x = x + self._scaled(
                self.norm1(
                    self.attn(x, grid_hw=grid_hw, mask=mask, seg=seg, pos_idx=pos_idx)
                ).astype(self.dtype), 1
            )
            x = x + self._scaled(self.norm2(self.mlp(x)).astype(self.dtype), 2)
        else:
            x = x + self._scaled(
                self.attn(
                    self.norm1(x).astype(self.dtype), grid_hw=grid_hw, mask=mask,
                    seg=seg, pos_idx=pos_idx,
                ), 1
            )
            x = x + self._scaled(self.mlp(self.norm2(x).astype(self.dtype)), 2)
        return x

    def forward_without_attn(self, x):
        """Final-block value path (reference `forward_without_attn`,
        `eva_vit_model.py:317-332`)."""
        c = self.cfg
        if c.postnorm:
            x = x + self._scaled(self.norm1(self.attn.value_path(x)).astype(self.dtype), 1)
            x = x + self._scaled(self.norm2(self.mlp(x)).astype(self.dtype), 2)
        else:
            x = x + self._scaled(self.attn.value_path(self.norm1(x).astype(self.dtype)), 1)
            x = x + self._scaled(self.mlp(self.norm2(x).astype(self.dtype)), 2)
        return x


class EvaViT(nn.Module):
    cfg: VisionConfig
    embed_dim: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    def setup(self):
        c = self.cfg
        # reshape+matmul patchify (see ops/patchify.py): parameter-identical
        # to the previous stride-p nn.Conv, ~8.7 ms/step faster on chip
        self.patch_embed = PatchEmbed(
            c.width,
            patch_size=c.patch_size,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, c.width), jnp.float32
        )
        base = c.grid_size
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, base * base + 1, c.width),
            jnp.float32,
        )
        block_cls = EvaBlock
        if self.remat:
            block_cls = nn.remat(
                EvaBlock,
                static_argnums=(2,),
                policy=jax.checkpoint_policies.nothing_saveable,
            )
        self.blocks = [
            block_cls(c, dtype=self.dtype, attn_impl=self.attn_impl, name=f"blocks_{i}")
            for i in range(c.layers)
        ]
        self.norm = _layer_norm("norm", c.ln_eps, self.dtype)
        self.head = nn.Dense(
            self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="head"
        )
        if c.use_shared_rel_pos_bias:
            # one table shared by every block (reference `eva_vit_model.py:423-424`)
            self.rel_pos_bias = RelPosBias(
                window=(c.grid_size, c.grid_size),
                num_heads=c.num_heads,
                name="rel_pos_bias",
            )

    # ---- embedding ----------------------------------------------------

    def _resized_pos_embed(self, grid_hw: tuple[int, int]) -> jnp.ndarray:
        """Bicubic-resize the absolute pos-embed grid to the input grid
        (reference `rescale_positional_embedding`, `eva_vit_model.py:631-643`)."""
        c = self.cfg
        base = c.grid_size
        gh, gw = grid_hw
        pe = self.pos_embed
        if (gh, gw) == (base, base):
            return pe
        cls_pe = pe[:, :1]
        grid_pe = pe[:, 1:].reshape(1, base, base, c.width)
        grid_pe = jnp.moveaxis(grid_pe, -1, 1)  # [1, width, base, base]
        grid_pe = resize_2d(grid_pe, (gh, gw), method="bicubic")
        grid_pe = jnp.moveaxis(grid_pe, 1, -1).reshape(1, gh * gw, c.width)
        return jnp.concatenate([cls_pe, grid_pe], axis=1)

    def embed(self, x: jnp.ndarray) -> tuple[jnp.ndarray, tuple[int, int]]:
        """Patchify [B, H, W, 3] -> tokens [B, 1 + h*w, width] with CLS+pos."""
        c = self.cfg
        b, img_h, img_w, _ = x.shape
        gh, gw = img_h // c.patch_size, img_w // c.patch_size
        t = self.patch_embed(x.astype(self.dtype))  # [B, gh, gw, width]
        t = t.reshape(b, gh * gw, c.width)
        cls = jnp.broadcast_to(self.cls_token.astype(self.dtype), (b, 1, c.width))
        t = jnp.concatenate([cls, t], axis=1)
        t = t + self._resized_pos_embed((gh, gw)).astype(self.dtype)
        return t, (gh, gw)

    def _pad_for_flash(self, t: jnp.ndarray):
        """Pad the token sequence ONCE to a flash-block multiple and return
        (t_padded, segment_mask, true_len). Long sequences otherwise pay a
        per-layer q/k/v pad/copy inside the flash wrapper; padding up front
        trades ~(pad/N) extra MLP flops for zero per-layer copies."""
        from clipself_tpu.ops.attention import (
            _flash_available,
            cls_split_applicable,
            flash_block_size,
            flash_min_seq,
        )

        n = t.shape[1]
        from clipself_tpu.core import knobs as _knobs

        lane = int(_knobs.get("xla_lane_pad"))
        if (
            lane > 0
            and n < flash_min_seq()
            and n % lane
            and not cls_split_applicable(n)
            and not self.cfg.use_rel_pos_bias
            and not self.cfg.use_shared_rel_pos_bias
        ):
            # EXPERIMENT (PERF.md): pad short XLA-path sequences (the
            # 197-token teacher crops) to a lane-friendly multiple; the
            # dispatcher turns the segment row into an additive bias.
            pad = (-n) % lane
            tp = jnp.concatenate(
                [t, jnp.zeros((t.shape[0], pad, t.shape[2]), t.dtype)], axis=1
            )
            seg = jnp.broadcast_to(
                (jnp.arange(n + pad) < n)[None, :], (t.shape[0], n + pad)
            )
            return tp, seg, n
        if (
            self.attn_impl == "xla"
            or n < flash_min_seq()
            or flash_block_size(n)
            or not _flash_available()
            # CLS + block-multiple patches (the 1024^2/16 and 896^2/14 student
            # shapes): the dispatcher's CLS-split path runs flash on exactly
            # the patch tokens — no padding, no segment mask, and the other
            # per-token work (MLP/proj/LN/RoPE) never sees pad rows either
            or cls_split_applicable(n)
            # rel-pos-bias is an additive mask -> XLA attention path, and the
            # bias table is sized to the true sequence; never pad
            or self.cfg.use_rel_pos_bias
            or self.cfg.use_shared_rel_pos_bias
        ):
            return t, None, n
        from clipself_tpu.ops.attention import flash_pad_target

        pad = flash_pad_target(n) - n
        tp = jnp.concatenate(
            [t, jnp.zeros((t.shape[0], pad, t.shape[2]), t.dtype)], axis=1
        )
        seg = jnp.broadcast_to(
            (jnp.arange(n + pad) < n)[None, :], (t.shape[0], n + pad)
        )
        return tp, seg, n

    def _shared_bias(self) -> Optional[jnp.ndarray]:
        """Shared rel-pos attention bias, or None (reference computes it once
        per forward and hands it to every block, `eva_vit_model.py:557-562`)."""
        if self.cfg.use_shared_rel_pos_bias:
            return self.rel_pos_bias()
        return None

    # ---- public protocol ----------------------------------------------

    def _patch_dropout(self, t: jnp.ndarray):
        """Drop a random subset of patch tokens (training only — requires the
        'patch_dropout' rng collection; reference `PatchDropout`,
        `eva_clip/transformer.py:75-116`). Returns (tokens, keep_idx)."""
        c = self.cfg
        if c.patch_dropout <= 0.0 or not self.has_rng("patch_dropout"):
            return t, None
        b, n1 = t.shape[:2]
        n = n1 - 1
        keep = max(1, int(n * (1.0 - c.patch_dropout)))
        rng = self.make_rng("patch_dropout")
        noise = jax.random.uniform(rng, (b, n))
        keep_idx = jnp.argsort(noise, axis=-1)[:, :keep]  # [B, K]
        patches = jnp.take_along_axis(t[:, 1:], keep_idx[..., None], axis=1)
        return jnp.concatenate([t[:, :1], patches], axis=1), keep_idx

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Image embedding from the CLS token (reference `forward` +
        `forward_features`, `eva_vit_model.py:533-586`). Patch dropout (when
        configured and an rng is supplied) applies here — the global
        embedding path — not to the dense protocol, whose grid reshape
        requires every token."""
        t, grid = self.embed(x)
        t, pos_idx = self._patch_dropout(t)
        if pos_idx is None:
            t, seg, _ = self._pad_for_flash(t)
        else:
            seg = None
        bias = self._shared_bias()
        for blk in self.blocks:
            t = blk(t, grid, bias, seg, pos_idx)
        t = self.norm(t).astype(self.dtype)
        return self.head(t[:, 0])

    def forward_tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        """Final-norm token sequence [B, 1+K, width] (CLS first) for
        attentional-pooling consumers (CoCa's AttentionalPooler). Patch
        dropout applies here like the global-embedding path — this is a
        pooled-consumption path, not the dense grid."""
        t, grid = self.embed(x)
        t, pos_idx = self._patch_dropout(t)
        if pos_idx is None:
            t, seg, n = self._pad_for_flash(t)
        else:
            seg, n = None, t.shape[1]
        bias = self._shared_bias()
        for blk in self.blocks:
            t = blk(t, grid, bias, seg, pos_idx)
        return self.norm(t[:, :n]).astype(self.dtype)

    def forward_pooled(self, x: jnp.ndarray):
        """(pooled [B, embed_dim], tokens [B, K, width]) — EVA analogue of
        the plain ViT's output_tokens path (`transformer.py:480-494`): pooled
        is the projected CLS embedding, tokens are the final-norm patch
        tokens. Used by CoCa when built over an EVA tower (an extension; the
        reference only builds CoCa over the plain VisionTransformer)."""
        t = self.forward_tokens(x)
        return self.head(t[:, 0]), t[:, 1:]

    def encode_dense(self, x: jnp.ndarray, keep_shape: bool = True) -> jnp.ndarray:
        """Dense patch-token feature map: blocks[:-1] normally, final block
        without attention, drop CLS, norm + head, L2-normalize
        (reference `encode_dense`, `eva_vit_model.py:588-623`).

        Returns [B, gh, gw, C] if keep_shape else [B, gh*gw, C].
        """
        t, grid = self.embed(x)
        t, seg, n = self._pad_for_flash(t)
        bias = self._shared_bias()
        for blk in self.blocks[:-1]:
            t = blk(t, grid, bias, seg)
        t = self.blocks[-1].forward_without_attn(t)[:, 1:n]
        t = self.norm(t).astype(self.dtype)
        t = self.head(t)
        t = l2_normalize(t)
        if keep_shape:
            b = x.shape[0]
            gh, gw = grid
            return t.reshape(b, gh, gw, -1)
        return t

    def extract_roi_features(
        self, x: jnp.ndarray, normed_boxes: jnp.ndarray, extract_type: str = "v2"
    ) -> jnp.ndarray:
        """RoI features by 1x1 aligned RoI-align over the dense map
        (reference `extract_roi_features`, `eva_vit_model.py:625-629`;
        `extract_type` is accepted and ignored, as in the reference).

        Args:
          normed_boxes: [B, M, 4] xyxy normalized to [0, 1] (padded rows OK).
        Returns [B, M, C].
        """
        dense = self.encode_dense(x, keep_shape=True)
        _, gh, gw, _ = dense.shape
        boxes = denormalize_boxes(normed_boxes, gh, gw)
        return roi_align_1x1(dense, boxes)

    def mask_pool(self, x: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
        """Masked average of normalized dense tokens (reference `mask_pool`,
        `eva_vit_model.py:645-653`). masks: [B, M, gh, gw]."""
        dense = self.encode_dense(x, keep_shape=True)
        return mask_pool(dense, masks)

    def forward_taps(
        self,
        x: jnp.ndarray,
        out_indices: tuple[int, ...],
        with_dense: bool = False,
    ) -> tuple[list[jnp.ndarray], Optional[jnp.ndarray]]:
        """Intermediate block outputs for detection backbones, one trunk pass.

        Mirrors the reference F-ViT backbone protocol
        (`F-ViT/models/evaclip_vit.py:61-115`): blocks 0..N-2 run normally and
        are tapped at `out_indices`; the final block runs WITHOUT attention
        (value path), and if index N-1 is requested its tap is that value-path
        output. With `with_dense`, additionally returns the L2-normalized
        dense VLM feature map (norm + head over the value-path tokens).

        Returns ([B, gh, gw, width] per tap, dense [B, gh, gw, embed] | None).
        """
        t, grid = self.embed(x)
        t, seg, n = self._pad_for_flash(t)
        b = x.shape[0]
        gh, gw = grid
        c = self.cfg

        def to_map(tokens):
            return tokens[:, 1:n].reshape(b, gh, gw, c.width)

        taps = []
        bias = self._shared_bias()
        for i, blk in enumerate(self.blocks[:-1]):
            t = blk(t, grid, bias, seg)
            if i in out_indices:
                taps.append(to_map(t))
        t = self.blocks[-1].forward_without_attn(t)
        if (len(self.blocks) - 1) in out_indices:
            taps.append(to_map(t))
        dense = None
        if with_dense:
            d = self.norm(t[:, 1:n]).astype(self.dtype)
            d = self.head(d)
            d = l2_normalize(d)
            dense = d.reshape(b, gh, gw, -1)
        return taps, dense

    def encode_rois_and_image(
        self, x: jnp.ndarray, normed_boxes: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """RoI features and the global image feature from ONE trunk pass
        (reference `encode_rois_and_image`, `eva_vit_model.py:666-711`).

        Returns ([B, M, C] L2-normalized roi feats, [B, C] normalized image).
        """
        t, grid = self.embed(x)
        t, seg, n = self._pad_for_flash(t)
        bias = self._shared_bias()
        for blk in self.blocks[:-1]:
            t = blk(t, grid, bias, seg)
        # image branch: full final block + CLS head
        ti = self.blocks[-1](t, grid, bias, seg)
        ti = self.norm(ti).astype(self.dtype)
        x_image = self.head(ti[:, 0])
        x_image = l2_normalize(x_image)
        # dense branch: final block value path
        td = self.blocks[-1].forward_without_attn(t)[:, 1:n]
        td = self.norm(td).astype(self.dtype)
        td = self.head(td)
        td = l2_normalize(td)
        b = x.shape[0]
        gh, gw = grid
        dense = td.reshape(b, gh, gw, -1)
        boxes = denormalize_boxes(normed_boxes, gh, gw)
        rois = roi_align_1x1(dense, boxes)
        rois = l2_normalize(rois)
        return rois, x_image
