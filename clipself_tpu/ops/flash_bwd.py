"""Fused one-pass flash-attention backward kernel for TPU.

The bundled Pallas flash attention runs TWO backward passes (dKV then dQ),
each recomputing the attention matrix — ~3.5x forward FLOPs, and on v5e it
measures ~25-30 TF/s because the recomputed QK^T matmuls contract over
head_dim=64 (half the MXU). This kernel computes dQ, dK, dV in ONE pass:
per (batch, head, kv-block) it streams the query blocks, recomputes S once,
and derives all three grads — 3 of its 5 matmuls contract over the block
size (full MXU width) instead of head_dim.

dQ is accumulated in an f32 VMEM scratch across the sequential kv grid axis
(TPU grids execute in order, so the scratch persists between kv steps of
the same (batch, head)) and written to the output ONCE, in the native
dtype, on the last kv step — emitting f32 dq cost a full-tensor HBM
round-trip plus a ~2 ms/step relayout copy before the caller's cast.
di = rowsum(dO * O) is computed in-kernel from blocks already resident in
VMEM instead of a separate fused pass over the full o/do tensors.

Forward pass (and its softmax stats l, m) comes from the bundled kernel via
`save_residuals`; this module only replaces the backward.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 768  # fits the 32MB scoped budget the train step requests
                       # (overflowed the old 16MB default inside full graphs)
DEFAULT_BLOCK_K = 2304  # whole-step A/B at 4.6k tokens: 15.44/15.45 img/s vs
                        # 15.29/15.34 at 1536 (q=512 and kv=4608 both worse;
                        # kv=4608 overflows VMEM); b*h>24 still drops to 768


def _bwd_kernel(
    # inputs (blocked refs)
    q_ref,      # [1, 1, N, D]   full q row for this (b, h)
    k_ref,      # [1, 1, Bk, D]
    v_ref,      # [1, 1, Bk, D]
    do_ref,     # [1, 1, N, D]
    o_ref,      # [1, 1, N, D]   forward output (di = rowsum(dO*O) in-kernel)
    m_ref,      # [1, 1, 1, N]   row-max stats
    l_ref,      # [1, 1, 1, N]   row-sum stats
    seg_ref,    # [1, 1, N] int32 segment ids (all-ones when unsegmented)
    # outputs
    dq_ref,     # [1, 1, N, D]   bf16, written once on the last kv step
    dk_ref,     # [1, 1, Bk, D]
    dv_ref,     # [1, 1, Bk, D]
    # scratch
    dq_acc_ref,  # [N, D] f32 accumulator, persistent across the kv axis
    *,
    sm_scale: float,
    block_q: int,
):
    j = pl.program_id(2)
    n = q_ref.shape[2]
    d = q_ref.shape[3]
    bk = k_ref.shape[2]
    f32 = jnp.float32

    @pl.when(j == 0)
    def _():
        dq_acc_ref[...] = jnp.zeros_like(dq_acc_ref)

    # matmul operands stay in the NATIVE dtype (bf16 in practice): the MXU
    # takes bf16 operands at full rate, while f32 x f32 dots lower to a
    # multi-pass emulation. Accumulation is f32 via preferred_element_type.
    k = k_ref[0, 0, :, :]              # [Bk, D]
    v = v_ref[0, 0, :, :]
    nd = k.dtype
    seg_k = seg_ref[0, 0, pl.ds(j * bk, bk)]  # [Bk]
    dk_acc = jnp.zeros((bk, d), f32)
    dv_acc = jnp.zeros((bk, d), f32)

    num_q = n // block_q

    def qloop(i, carry):
        dk_acc, dv_acc = carry
        qs = pl.ds(i * block_q, block_q)
        qb = q_ref[0, 0, qs, :]                    # [Bq, D]
        dob = do_ref[0, 0, qs, :]                  # [Bq, D]
        mb = m_ref[0, 0, 0, qs].astype(f32)[:, None]   # [Bq, 1]
        lb = l_ref[0, 0, 0, qs].astype(f32)[:, None]
        # di = rowsum(dO * O), computed here instead of a separate fused
        # pass over the full [B, H, N, D] o/do tensors (saves that pass's
        # HBM traffic; recomputing per kv step is cheap VPU work on blocks
        # already resident in VMEM)
        ob = o_ref[0, 0, qs, :]
        dib = jnp.sum(ob.astype(f32) * dob.astype(f32), axis=-1)[:, None]
        seg_q = seg_ref[0, 0, qs]

        s = jax.lax.dot_general(
            qb, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
        ) * sm_scale                                  # [Bq, Bk]
        # mask BEFORE exp: a masked pair whose raw logit exceeds m would
        # otherwise produce exp -> inf, and inf * 0 = NaN in the grads
        segmask = seg_q[:, None] == seg_k[None, :]
        s = jnp.where(segmask, s, -jnp.inf)
        linv = jnp.where(lb > 0.0, 1.0 / lb, 0.0)
        p = jnp.exp(s - mb) * linv                    # [Bq, Bk] f32

        # dV += P^T @ dO      (contraction over Bq — full MXU width)
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(nd), dob, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        # dP = dO @ V^T
        dp = jax.lax.dot_general(
            dob, v, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )
        ds = (p * (dp - dib) * sm_scale).astype(nd)   # [Bq, Bk]
        # dQ_i += dS @ K      (contraction over Bk — full width)
        dq_blk = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        dq_acc_ref[qs, :] += dq_blk
        # dK += dS^T @ Q      (contraction over Bq — full width)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        return dk_acc, dv_acc

    dk_acc, dv_acc = jax.lax.fori_loop(0, num_q, qloop, (dk_acc, dv_acc))
    dk_ref[0, 0, :, :] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv_acc.astype(dv_ref.dtype)

    # dq leaves the kernel in the NATIVE dtype (bf16 in practice): the old
    # f32 output was cast to q.dtype immediately after the pallas_call
    # anyway, but only after XLA had round-tripped and relayout-copied the
    # full f32 tensor through HBM (~2 ms/step on the B/16 recipe, trace
    # r3). Accumulation stays f32 in the scratch, so numerics are identical.
    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        dq_ref[0, 0, :, :] = dq_acc_ref[...].astype(dq_ref.dtype)


def flash_attention_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    o: jnp.ndarray,
    l: jnp.ndarray,
    m: jnp.ndarray,
    do: jnp.ndarray,
    segment_ids=None,
    sm_scale: float = 1.0,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
):
    """One-pass flash backward.

    q/k/v/o/do: [B, H, N, D]; l/m: [B, H, N]; segment_ids: [B, N] or None.
    Returns (dq, dk, dv) in q.dtype.
    """
    b, h, n, d = q.shape
    from clipself_tpu.core import knobs

    if knobs.get("flash_bwd_block_q"):
        block_q = int(knobs.get("flash_bwd_block_q"))
    if knobs.get("flash_bwd_block_k"):
        # authoritative override — beats the b*h heuristic below: the
        # trainers set 768 when remat is on (deeper pipelining overflows
        # scoped VMEM at kv=1536); experiments may also raise it
        block_k = int(knobs.get("flash_bwd_block_k"))
    elif b * h > 24 and block_k > 1408:
        # the XLA pipeliner's scoped-VMEM accounting for this kernel exceeds
        # the budget with 1536+ kv blocks once the batch*heads grid grows
        # past the B/16 recipe's 2x12 (measured in the full distill graph at
        # per-chip batch 4 x 12 heads). kv=1408 compiles and runs at the
        # 32MB scoped budget for L/14 (batch 2 x 16 heads) and is +8%
        # whole-step over the old 768 cap — which, not dividing the 4224
        # pad, degraded to 384 (L/14 A/Bs, PERF.md). Choose the largest
        # fitting divisor <= 1408 (the n-divisor fallback below reduces it
        # further for sequences 1408 does not divide).
        block_k = 1408
    if n % block_q or n % block_k:
        from clipself_tpu.ops.attention import flash_block_size

        # pick each block independently: the q tile is VMEM-capped at its
        # default, the kv tile at its larger one (e.g. n=4096 -> 512 / 1024)
        bq = flash_block_size(n, cap=block_q)
        bk = flash_block_size(n, cap=block_k)
        if not bq or not bk:
            raise ValueError(f"seq {n} not blockable")
        block_q, block_k = bq, bk
    f32 = jnp.float32
    stats_spec = pl.BlockSpec(
        (1, 1, 1, n), lambda bi, hi, ji: (bi, hi, 0, 0), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec(
        (1, 1, n, d), lambda bi, hi, ji: (bi, hi, 0, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, 1, block_k, d), lambda bi, hi, ji: (bi, hi, ji, 0), memory_space=pltpu.VMEM
    )
    seg_spec = pl.BlockSpec((1, 1, n), lambda bi, hi, ji: (bi, 0, 0), memory_space=pltpu.VMEM)
    if segment_ids is None:
        seg = jnp.ones((b, 1, n), jnp.int32)
    else:
        seg = segment_ids.astype(jnp.int32).reshape(b, 1, n)

    grid = (b, h, n // block_k)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=sm_scale, block_q=block_q),
        grid=grid,
        in_specs=[
            row_spec,              # q
            kv_spec,               # k
            kv_spec,               # v
            row_spec,              # do
            row_spec,              # o (di computed in-kernel)
            stats_spec,            # m
            stats_spec,            # l
            seg_spec,              # seg
        ],
        out_specs=[
            row_spec,              # dq (written once, on the last kv step)
            kv_spec,               # dk
            kv_spec,               # dv
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((n, d), f32)],  # dq accumulator
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(
        q, k, v, do, o,
        m[:, :, None, :], l[:, :, None, :], seg,
    )
    return dq, dk, dv
