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
import os
from typing import Optional

import jax
import jax.numpy as jnp

# Minimum query length for which the Pallas flash kernel pays off.
_FLASH_MIN_SEQ = 1024


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference XLA attention. q,k,v: [B, N, H, D]; mask: additive [..., N, N]."""
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _flash_available() -> bool:
    try:
        import jax.experimental.pallas.ops.tpu.flash_attention  # noqa: F401
    except Exception:  # pragma: no cover
        return False
    return jax.default_backend() == "tpu"


def flash_block_size(n: int, cap: int = 1024) -> int:
    """Largest supported block size <= cap dividing n (0 if none)."""
    for b in (1024, 768, 512, 256, 128):
        if b > cap:
            continue
        if n % b == 0:
            return b
    return 0


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
        block = 512 if n >= 512 else 128
        pad = (-n) % block
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
    if npad % 768 == 0:
        bwd_block = 768
    elif npad % 512 == 0:
        bwd_block = 512  # never above 768 (VMEM), even when fwd block is 1024
    else:
        bwd_block = min(block, 512)
    # the FORWARD tolerates (and prefers) much larger tiles: 1536^2 measures
    # ~8-12% faster than 768^2 at 4.6k tokens on v5e (fewer grid revisits of
    # the m/l stats); the backward at 1536 would blow VMEM, so it stays apart
    fwd_block = 1536 if npad % 1536 == 0 else block
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
    if _FUSED_BWD and npad % 512 == 0:
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
    train_cap = int(os.environ.get("CLIPSELF_FLASH_FWD_TRAIN_BLOCK", "1536"))
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

_FUSED_BWD = os.environ.get("CLIPSELF_FUSED_FLASH_BWD", "1") == "1"


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
            mask is None and self_attn and n >= _FLASH_MIN_SEQ and _flash_available()
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
