"""Ring attention: sequence-parallel exact attention over an 'sp' mesh axis.

The reference handles its long-"sequence" problem (4k+ patch tokens at
1024 inputs) per-device with memory-efficient attention and gradient
checkpointing (SURVEY.md §5 "long-context: none"); this primitive goes
beyond parity and shards the SEQUENCE itself: each device holds a token
shard of q/k/v, and KV shards rotate around the ring (`ppermute`) while a
streaming online-softmax accumulates exact attention — memory per device
drops by the ring size with no approximation.

Pure-jnp inner chunk math (MXU einsums under XLA), so `jax.grad` flows
through the ring untouched. For single-device long sequences the Pallas
flash kernel (`ops/attention.py`) remains the right tool; this composes
with it conceptually but is self-contained for portability (CPU-mesh tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _chunk(q, k, v, scale, m, num, den):
    """Online-softmax accumulation of one KV chunk.

    q: [B, Q, H, D]; k/v: [B, C, H, D]; m/den: [B, H, Q]; num: [B, Q, H, D].
    """
    # f32 accumulation on the MXU — without preferred_element_type the
    # einsum would materialize bf16 logits before the cast (attention.py:34)
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    m_c = s.max(-1)
    m_new = jnp.maximum(m, m_c)
    alpha = jnp.exp(m - m_new)  # rescale factor for the running sums
    p = jnp.exp(s - m_new[..., None])
    num = num * jnp.transpose(alpha, (0, 2, 1))[..., None] + jnp.einsum(
        "bhqk,bkhd->bqhd", p, v.astype(jnp.float32)
    )
    den = den * alpha + p.sum(-1)
    return m_new, num, den


def _ring_local(q, k, v, scale, axis):
    """Per-device body (inside shard_map): q/k/v are sequence shards."""
    size = jax.lax.psum(1, axis)
    # accumulators become device-varying through the ring; derive them from q
    # (0 * q keeps q's varying-axes type) so scan's carry type is stable on
    # any mesh this runs under (sp alone, or sp composed with data axes)
    zeros_bhq = jnp.transpose(q[:, :, :, 0], (0, 2, 1)).astype(jnp.float32) * 0.0
    m0 = zeros_bhq - jnp.inf
    num0 = q.astype(jnp.float32) * 0.0
    den0 = zeros_bhq
    perm = [(i, (i + 1) % size) for i in range(size)]

    def body(carry, _):
        k_c, v_c, m, num, den = carry
        m, num, den = _chunk(q, k_c, v_c, scale, m, num, den)
        # rotate the KV shard to the next device while we could be computing
        # (XLA overlaps the collective with the next chunk's einsums)
        k_c = jax.lax.ppermute(k_c, axis, perm)
        v_c = jax.lax.ppermute(v_c, axis, perm)
        return (k_c, v_c, m, num, den), None

    # size-1 rotations: the last chunk runs outside the scan so the ring
    # never pays a permute whose result nobody consumes
    (k, v, m, num, den), _ = jax.lax.scan(
        body, (k, v, m0, num0, den0), None, length=size - 1
    )
    m, num, den = _chunk(q, k, v, scale, m, num, den)
    out = num / jnp.transpose(den, (0, 2, 1))[..., None]
    return out.astype(q.dtype)


def ring_attention(
    mesh: Mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    axis: str = "sp",
):
    """Exact multi-head attention with the sequence sharded over `axis`.

    Args:
      q, k, v: [B, N, H, D] GLOBAL arrays; N must divide by mesh.shape[axis].
      scale: softmax scale (usually D**-0.5).

    Returns [B, N, H, D], numerically equal to full attention (up to float
    association). Differentiable end to end.
    """
    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        lambda q, k, v: _ring_local(q, k, v, scale, axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
