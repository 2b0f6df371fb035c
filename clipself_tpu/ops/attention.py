"""Multi-head attention dispatcher.

The reference leans on xformers' CUDA `memory_efficient_attention` for every
EVA block (`src/open_clip/eva_clip/eva_vit_model.py:206-220`). On TPU the
equivalents are (a) a Pallas flash-attention kernel for long sequences and
(b) plain XLA einsum attention (fused by Mosaic/XLA) for short ones.

This module exposes one functional entry point used by all models; the
implementation is chosen by sequence length and platform, and can be forced
for testing.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from clipself_tpu.core import knobs

# Minimum query length for which the Pallas flash kernel pays off.
# Overridable via the `flash_min_seq` knob: the L/14 recipe's 577-token
# teacher crops sit right at the XLA-vs-flash crossover (the XLA path
# materializes [B*M, H, 577, 577] f32 logits; flash pads 577->768 with
# 384/768 blocks instead) — see the PERF.md L/14 A/Bs.
_FLASH_MIN_SEQ = 1024


def flash_min_seq() -> int:
    v = int(knobs.get("flash_min_seq"))
    return v if v > 0 else _FLASH_MIN_SEQ


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference XLA attention. q,k,v: [B, N, H, D]; mask: additive [..., N, N].

    Half-logits path (`xla_attn_half_logits`, default off; the L/14 recipe
    scripts export it on): when the inputs are half-precision and there is
    no additive mask, the [B, H, N, N] logits tensor is STORED in the input
    dtype instead of f32 — the L/14
    teacher's 20x336px crops materialize [40, 16, 577, 577] per layer
    (850MB in f32), the dominant HBM traffic of that recipe's teacher. The
    softmax stays f32-stable (max-subtract, exp and divide computed in f32
    in-register inside the fusions; only the bf16 logits and bf16 probs
    touch HBM). This matches the reference teacher's numerics class: it
    runs under fp16 autocast, which stores fp16 logits and fp16 probs
    (torch softmax upcasts to f32 internally the same way).
    """
    chunk = int(knobs.get("xla_attn_chunk_q"))
    if mask is None and chunk > 0 and q.shape[1] > chunk:
        return _chunked_xla_attention(q, k, v, scale, chunk)
    if (
        mask is None
        and q.dtype in (jnp.bfloat16, jnp.float16)
        and bool(knobs.get("xla_attn_half_logits"))
    ):
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=q.dtype
        ) * jnp.asarray(scale, q.dtype)
        m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp((logits - m).astype(jnp.float32))
        s = jnp.sum(p, axis=-1, keepdims=True)
        probs = (p / s).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _chunked_xla_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float, chunk: int
) -> jnp.ndarray:
    """Query-chunked XLA attention (`xla_attn_chunk_q` knob, default off).

    The third option between "materialize [B, H, N, N]" and "Pallas flash"
    for mid-length sequences like the L/14 teacher's 577-token crops
    (VERDICT r4 #3): a `lax.scan` over query blocks computes each
    [B, H, chunk, N] logit panel, softmaxes and contracts it before the
    next panel exists — peak logits memory drops by N/chunk with no flash
    pad/layout cost. Query rows are independent, so padding N up to a chunk
    multiple is exact (keys are never padded; padded query rows are sliced
    off). Panel logits storage follows the `xla_attn_half_logits` knob
    (input dtype with the f32-stable in-register softmax when on and the
    inputs are half-precision, f32 otherwise) so a chunk-q A/B isolates
    chunking from the logits-dtype lever. A/B results in PERF.md.
    """
    b, n, h, d = q.shape
    pad = (-n) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nc = (n + pad) // chunk
    qs = jnp.moveaxis(qp.reshape(b, nc, chunk, h, d), 1, 0)  # [nc, B, c, H, D]
    half = q.dtype in (jnp.bfloat16, jnp.float16) and bool(
        knobs.get("xla_attn_half_logits")
    )
    ldtype = q.dtype if half else jnp.float32

    def body(_, qc):
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qc, k, preferred_element_type=ldtype
        ) * jnp.asarray(scale, ldtype)
        m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp((logits - m).astype(jnp.float32))
        probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
        return None, jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    _, outs = jax.lax.scan(body, None, qs)  # [nc, B, c, H, D]
    out = jnp.moveaxis(outs, 0, 1).reshape(b, nc * chunk, h, d)
    return out[:, :n]


def _flash_available() -> bool:
    try:
        import jax.experimental.pallas.ops.tpu.flash_attention  # noqa: F401
    except Exception:  # pragma: no cover
        return False
    return jax.default_backend() == "tpu"


def flash_block_size(n: int, cap: int = 1024) -> int:
    """Largest multiple-of-128 block size <= cap dividing n (0 if none).

    128 is the TPU lane width: the kv-block becomes the lane dim of the
    QK^T output inside the kernels, so anything narrower (or non-multiple)
    forces Mosaic relayouts."""
    for b in range((min(cap, n) // 128) * 128, 0, -128):
        if n % b == 0:
            return b
    return 0


def flash_pad_multiple() -> int:
    """Sequence-pad granularity for the pad-once trunk path.

    512 guarantees the largest measured block menu (768/1536/2304) but pads
    the student's 4097 tokens to 4608 (+12.5% on every per-token op, +26% on
    QK^T/AV). The default 128 pads to 4224 instead (blocks 384/1408): the
    FLOP saving beats the smaller blocks' per-token slowdown — 16.68 vs
    15.74 img/s/chip whole-step on v5e (PERF.md)."""
    return int(knobs.get("pad_multiple"))


def flash_pad_target(n: int) -> int:
    """Padded length for an n-token sequence entering the pad-once path.

    At granularity < 512 this does not pad blindly to the next multiple —
    a length like 1664 (= 13 x 128) admits only 128-wide blocks, which
    cripples the kernels. Instead it takes the SMALLEST multiple of the
    granularity that still admits a >= 384-wide block, falling back to the
    next 512 multiple (512-wide blocks always exist there):
    4097 -> 4224 (384/1408 blocks), 1601 -> 1920 (384/640), 3137 -> 3200
    (640)."""
    m = flash_pad_multiple()
    if m >= 512:
        return n + (-n) % m
    # minimum acceptable block width: 384 measured best at the distill
    # shapes (4097 -> 4224 with 384/1408 blocks beats 4480's 640/896 and
    # 4608's 768/2304 menus); raise via env to re-run the A/B
    minb = int(knobs.get("flash_min_block"))
    hi = n + (-n) % 512
    npad = n + (-n) % m
    while npad < hi:
        # short sequences (the 577-token L/14 teacher crops) may take the
        # candidate itself as one full block — 577 pads to 640 (one 640-wide
        # block, +23% attention FLOPs) instead of 768 (+77%), which is what
        # made the round-3 flash-teacher A/B lose; long sequences keep the
        # conservative cap so the trunk pad targets are unchanged (4097 ->
        # 4224 with 384/1408 blocks)
        cap = npad if n < 1024 else max(512, minb)
        if flash_block_size(npad, cap=cap) >= minb:
            break
        npad += m
    return npad


@functools.partial(jax.named_call, name="flash_attention")
def _pallas_flash(q, k, v, scale, segment_mask=None):
    """Bundled TPU flash-attention kernel; q,k,v: [B, H, N, D].

    Sequence lengths that aren't multiples of the kernel block size are
    zero-padded; padding is masked with segment ids (real tokens = segment 1,
    padding = segment 0), which the kernel applies blockwise — no O(N^2) bias
    tensor. Padded query rows are sliced off afterwards.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, h, n, d = q.shape
    if segment_mask is None and cls_split_applicable(n):
        # [CLS; patches] with a block-perfect patch count: flash over exactly
        # the patch tokens + exact rank-1 CLS corrections (no pad FLOPs)
        return _flash_cls_split(q, k, v, scale, flash_block_size(n - 1, cap=1536))
    native = flash_block_size(n)
    if native and segment_mask is not None:
        # caller already padded the sequence to a block multiple and supplies
        # the validity row — no per-layer copies needed
        ids = segment_mask.astype(jnp.int32)
        segment_ids = SegmentIds(q=ids, kv=ids)
        block = native
        pad = 0
    elif native:
        segment_ids = None
        block = native
        pad = 0
    else:
        if segment_mask is not None:
            raise ValueError(
                "segment_mask requires a sequence already padded to a flash "
                f"block multiple; got n={n}"
            )
        # same smart pad rule as the pad-once trunk path (4097 -> 4224)
        npad_t = flash_pad_target(n)
        pad = npad_t - n
        block = flash_block_size(npad_t) or 128
    if pad:
        zq = jnp.zeros((b, h, pad, d), q.dtype)
        q = jnp.concatenate([q, zq], axis=2)
        k = jnp.concatenate([k, zq], axis=2)
        v = jnp.concatenate([v, zq], axis=2)
        npad = n + pad
        ids = (jnp.arange(npad) < n).astype(jnp.int32)
        ids = jnp.broadcast_to(ids[None, :], (b, npad))
        segment_ids = SegmentIds(q=ids, kv=ids)
    # measured on v5e: 768 blocks are ~14% faster than 512 for the backward
    # kernels at 4.6k tokens; larger blocks exceed the 16MB VMEM budget
    npad = q.shape[2]
    bwd_block = flash_block_size(npad, cap=768) or min(block, 512)
    # the FORWARD tolerates (and prefers) much larger tiles: 1536^2 measures
    # ~8-12% faster than 768^2 at 4.6k tokens on v5e (fewer grid revisits of
    # the m/l stats); the backward at 1536 would blow VMEM, so it stays apart
    fwd_block = flash_block_size(npad, cap=1536) or block
    block_sizes = BlockSizes(
        block_q=fwd_block,
        block_k_major=fwd_block,
        block_k=fwd_block,
        block_b=1,
        block_q_major_dkv=bwd_block,
        block_k_major_dkv=bwd_block,
        block_k_dkv=bwd_block,
        block_q_dkv=bwd_block,
        block_k_major_dq=bwd_block,
        block_k_dq=bwd_block,
        block_q_dq=bwd_block,
    )
    if _fused_bwd_enabled() and flash_block_size(npad, cap=768) >= 256:
        # our fused one-pass backward (flash_bwd.py) — bundled forward
        if segment_ids is not None:
            segf = segment_ids.q.astype(jnp.float32)
        else:
            segf = jnp.ones((b, npad), jnp.float32)
        out = _flash_fused_vjp(q, k, v, segf, scale, fwd_block)
    else:
        out = flash_attention(
            q, k, v, segment_ids=segment_ids, sm_scale=scale, block_sizes=block_sizes
        )
    if pad:
        out = out[:, :, :n, :]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_fused_vjp(q, k, v, segf, scale, block):
    """Flash attention with the bundled Pallas forward and OUR fused
    one-pass backward (`clipself_tpu.ops.flash_bwd`) — ~1.8x faster than the
    bundled two-pass backward at 4.6k tokens on v5e.

    q/k/v: [B, H, N, D]; segf: [B, N] float validity row (all-ones = no
    segmenting; kept float so custom_vjp cotangents are well-typed).
    """
    # primal (inference) path: no residuals — l/m aux outputs are pure waste
    return _bundled_fwd(q, k, v, segf, scale, block, save_residuals=False)


def _bundled_fwd(q, k, v, segf, scale, block, save_residuals):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        _flash_attention_impl,
    )

    ids = segf.astype(jnp.int32)
    seg = SegmentIds(q=ids, kv=ids)
    return _flash_attention_impl(
        q, k, v, None, seg, save_residuals, False, scale, 1, block, block, block, False
    )


def _flash_fused_fwd(q, k, v, segf, scale, block):
    # the residual-saving forward carries two extra f32 stats outputs whose
    # lane-padded VMEM blocks overflow the compiler's default 16MB scoped
    # budget at 1536 tiles; the train step raises the budget to 32MB
    # (train/step.py::_tpu_compiler_options), under which the full 1536 tile
    # fits and measures +2.6% whole-step. The cap must still divide the
    # sequence: e.g. n=2048 divides by a 1024 tile but not 1536, so step
    # down to the largest fitting divisor.
    npad = q.shape[2]
    train_cap = int(knobs.get("flash_fwd_train_block"))
    cap = block if block <= train_cap else flash_block_size(npad, cap=train_cap)
    out, l, m = _bundled_fwd(q, k, v, segf, scale, cap, save_residuals=True)
    return out, (q, k, v, segf, out, l, m)


def _flash_fused_bwd(scale, block, res, do):
    from clipself_tpu.ops.flash_bwd import flash_attention_bwd

    q, k, v, segf, out, l, m = res
    dq, dk, dv = flash_attention_bwd(
        q, k, v, out, l, m, do, segment_ids=segf, sm_scale=scale
    )
    return dq, dk, dv, jnp.zeros_like(segf)


_flash_fused_vjp.defvjp(_flash_fused_fwd, _flash_fused_bwd)

def _fused_bwd_enabled() -> bool:
    return bool(knobs.get("fused_flash_bwd"))


def _cls_split_enabled() -> bool:
    # Measured NEGATIVE on v5e (PERF.md "CLS-split flash"): exact, but the
    # correction einsums/slices/concats cost more than the 4097->4608 pad
    # FLOPs they remove (whole step 14.91 vs 15.32 img/s/chip). Kept as an
    # experiment knob; default off.
    return bool(knobs.get("flash_cls_split"))


def cls_split_applicable(n: int) -> bool:
    """True when a [CLS; patches] sequence of length n takes the split path:
    flash over the n-1 patch tokens (an exact block multiple) plus exact
    rank-1 CLS corrections — no padding anywhere."""
    return (
        _cls_split_enabled()
        and _fused_bwd_enabled()  # the split's backward builds on our fused kernel
        and (n - 1) >= flash_min_seq()
        and (n - 1) % 512 == 0
        and flash_block_size(n - 1) > 0
    )


def _cls_scores(qp, k_cls, scale):
    """[B, H, Np, D] x [B, H, D] -> f32 [B, H, Np] scaled CLS-key logits."""
    return (
        jnp.einsum("bhnd,bhd->bhn", qp, k_cls, preferred_element_type=jnp.float32)
        * scale
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_cls_split(q, k, v, scale, block):
    """Exact attention over a [CLS; patches] sequence with NO padding.

    The student's 1024^2 sequence is 4097 tokens = CLS + 64^2 patches; flash
    kernels need a block multiple, and padding 4097 -> 4608 costs 26% extra
    QK^T/AV FLOPs *inside the kernels* every layer. Instead: run flash on
    exactly the 4096 patch tokens (perfect blocks, no segment masking), then
    fold the CLS key into each patch row by the online-softmax combine rule
    (the kernel returns its row stats l, m; the merged row max/sum make the
    correction exact, not approximate), and compute the CLS query row as a
    single plain softmax over all n keys. O(N) rank-1 work replaces O(N^2)
    padded FLOPs. q/k/v: [B, H, 1+Np, D], CLS first.
    """
    out, _ = _cls_split_fwd_impl(q, k, v, scale, block)
    return out


def _cls_split_fwd_impl(q, k, v, scale, block):
    f32 = jnp.float32
    b, h, n, d = q.shape
    qp, kp, vp = q[:, :, 1:], k[:, :, 1:], v[:, :, 1:]
    k_cls, v_cls = k[:, :, 0], v[:, :, 0]
    seg = jnp.ones((b, n - 1), f32)
    # the combine needs the kernel's row stats even at inference; the two
    # extra [B,H,Np] f32 outputs are noise next to the saved pad FLOPs
    o_p, l, m = _bundled_fwd(qp, kp, vp, seg, scale, block, save_residuals=True)
    s_c = _cls_scores(qp, k_cls, scale)  # [B, H, Np]
    big_m = jnp.maximum(m, s_c)
    alpha = l * jnp.exp(m - big_m)        # rescaled patch-key mass
    beta = jnp.exp(s_c - big_m)           # CLS-key mass
    big_l = alpha + beta
    o_patches = (
        o_p.astype(f32) * (alpha / big_l)[..., None]
        + (beta / big_l)[..., None] * v_cls.astype(f32)[:, :, None, :]
    ).astype(q.dtype)
    # CLS query row: plain softmax over all n keys
    s_row = (
        jnp.einsum("bhd,bhnd->bhn", q[:, :, 0], k, preferred_element_type=f32)
        * scale
    )
    p_row = jax.nn.softmax(s_row, axis=-1)
    o_cls = jnp.einsum("bhn,bhnd->bhd", p_row.astype(q.dtype), v)
    out = jnp.concatenate([o_cls[:, :, None], o_patches], axis=2)
    res = (q, k, v, o_patches, big_l, big_m, beta / big_l, p_row)
    return out, res


def _flash_cls_split_fwd(q, k, v, scale, block):
    return _cls_split_fwd_impl(q, k, v, scale, block)


def _flash_cls_split_bwd(scale, block, res, do):
    from clipself_tpu.ops.flash_bwd import flash_attention_bwd

    f32 = jnp.float32
    q, k, v, o_patches, big_l, big_m, p_c, p_row = res
    qp, kp, vp = q[:, :, 1:], k[:, :, 1:], v[:, :, 1:]
    k_cls, v_cls = k[:, :, 0], v[:, :, 0]
    q_cls = q[:, :, 0]
    do_c, do_p = do[:, :, 0], do[:, :, 1:]

    # Patch-query rows. Feeding the kernel the MERGED stats (big_l, big_m)
    # and the merged per-row output makes its recomputed probabilities the
    # true full-softmax probabilities restricted to patch keys, and its
    # di = rowsum(dO*O) the full-row correction — so dq/dk/dv come out as
    # the exact patch-key part of the full gradient.
    dqp, dkp, dvp = flash_attention_bwd(
        qp, kp, vp, o_patches, big_l, big_m, do_p, segment_ids=None, sm_scale=scale
    )
    # CLS-key rank-1 corrections for the patch-query rows
    di = jnp.sum(do_p.astype(f32) * o_patches.astype(f32), axis=-1)  # [B,H,Np]
    dp_c = jnp.einsum("bhnd,bhd->bhn", do_p, v_cls, preferred_element_type=f32)
    ds_c = p_c * (dp_c - di) * scale
    dqp = dqp + (ds_c[..., None] * k_cls.astype(f32)[:, :, None, :]).astype(dqp.dtype)
    dk_cls = jnp.einsum("bhn,bhnd->bhd", ds_c.astype(q.dtype), qp)
    dv_cls = jnp.einsum("bhn,bhnd->bhd", p_c.astype(q.dtype), do_p)

    # CLS query row: plain softmax-attention backward over all n keys
    dp_row = jnp.einsum("bhd,bhnd->bhn", do_c, v, preferred_element_type=f32)
    d_row = jnp.sum(p_row * dp_row, axis=-1, keepdims=True)
    ds_row = (p_row * (dp_row - d_row) * scale).astype(q.dtype)
    dq_cls = jnp.einsum("bhn,bhnd->bhd", ds_row, k)
    dk_row = ds_row[..., None] * q_cls[:, :, None, :]           # [B,H,n,D]
    dv_row = p_row[..., None].astype(q.dtype) * do_c[:, :, None, :]

    dq = jnp.concatenate([dq_cls[:, :, None], dqp.astype(q.dtype)], axis=2)
    dk = (
        jnp.concatenate([dk_cls[:, :, None], dkp], axis=2).astype(f32) + dk_row
    ).astype(q.dtype)
    dv = (
        jnp.concatenate([dv_cls[:, :, None], dvp], axis=2).astype(f32) + dv_row
    ).astype(q.dtype)
    return dq, dk, dv


_flash_cls_split.defvjp(_flash_cls_split_fwd, _flash_cls_split_bwd)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    segment_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, N, H, D] tensors.

    Args:
      mask: optional additive bias broadcastable to [B, H, N, N] (used for the
        causal text mask and mask-attention pooling).
      impl: 'auto' | 'xla' | 'flash'.
      segment_mask: optional [B, N] validity row for sequences the CALLER has
        already padded to a flash block multiple (the pad-once trunk path,
        avoiding per-layer q/k/v copies). Padding rows must be 0.
    """
    n = q.shape[1]
    # the flash path derives padding and segment rows from q's length and
    # applies them to k/v — self-attention only; cross-attention (CoCa
    # pooler-style Nq != Nk) takes the XLA path
    self_attn = k.shape[1] == n
    if impl == "auto":
        use_flash = (
            mask is None and self_attn and n >= flash_min_seq() and _flash_available()
        )
    else:
        # an additive mask cannot be expressed to the flash kernel; a forced
        # 'flash' with a mask silently computing unmasked attention would be
        # a correctness trap — fall back to the masked XLA path
        use_flash = impl == "flash" and mask is None and self_attn
    if use_flash:
        qt = jnp.swapaxes(q, 1, 2)  # [B, H, N, D]
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        out = _pallas_flash(qt, kt, vt, scale, segment_mask=segment_mask)
        return jnp.swapaxes(out, 1, 2)
    if segment_mask is not None:
        seg_bias = jnp.where(segment_mask[:, None, None, :], 0.0, -1e9).astype(jnp.float32)
        mask = seg_bias if mask is None else mask + seg_bias
    return _xla_attention(q, k, v, scale, mask)
