"""GPipe-style pipeline parallelism over a 'pp' mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.7 — data parallel
only, every shipped tower fits one device); this is the TPU-native scaling
primitive for towers that do not: homogeneous transformer blocks are stacked
into one leading-axis pytree, split into S contiguous stages sharded over the
'pp' axis, and microbatches stream through the stages with `ppermute` hops
under `shard_map`. Differentiable end-to-end — `jax.grad` through the
pipeline matches the sequential model (see tests/test_pipeline.py).

Schedule: plain GPipe fill-drain. T = M + S - 1 ticks for M microbatches
over S stages; at tick t, stage s processes microbatch (t - s) when it is in
[0, M). The bubble fraction is (S-1)/T — pick M >= 4*S to amortize.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_block_params(params: dict, prefix: str = "blocks_") -> tuple[Any, int]:
    """Stack per-block param subtrees `{prefix}0..{prefix}{L-1}` (identical
    structures) into one pytree with a leading block axis of size L."""
    names = sorted(
        (k for k in params if k.startswith(prefix)),
        key=lambda k: int(k[len(prefix):]),
    )
    if not names:
        raise ValueError(f"no '{prefix}*' subtrees in params")
    blocks = [params[k] for k in names]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return stacked, len(names)


def unstack_block_params(stacked: Any, prefix: str = "blocks_") -> dict:
    """Inverse of `stack_block_params`."""
    n = jax.tree.leaves(stacked)[0].shape[0]
    return {
        f"{prefix}{i}": jax.tree.map(lambda x: x[i], stacked) for i in range(n)
    }


def pipeline_apply(
    mesh: Mesh,
    stacked_params: Any,
    apply_block: Callable[[Any, jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    num_microbatches: int,
    axis: str = "pp",
):
    """Run x through all stacked blocks, pipelined over the 'pp' mesh axis.

    Args:
      stacked_params: block params with leading axis L (from
        `stack_block_params`); L must divide by the stage count S =
        mesh.shape[axis]. Stage s owns blocks [s*L/S, (s+1)*L/S).
      apply_block: (single_block_params, x) -> x, the per-block function.
      x: [B, ...] activations; B must divide by num_microbatches.
      num_microbatches: GPipe microbatch count M.

    Returns x after all L blocks, identical (up to float assoc) to applying
    the blocks sequentially.
    """
    S = mesh.shape[axis]
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    assert L % S == 0, f"{L} blocks must divide into {S} stages"
    B = x.shape[0]
    M = num_microbatches
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"
    per_stage = L // S

    # [L, ...] -> [S, L/S, ...]; the leading S axis shards over 'pp'
    staged = jax.tree.map(
        lambda p: p.reshape((S, per_stage) + p.shape[1:]), stacked_params
    )
    xs = x.reshape((M, B // M) + x.shape[1:])

    param_specs = jax.tree.map(lambda _: P(axis), staged)
    fwd = jax.shard_map(
        lambda sp, xm: _pipeline_device(sp, xm, apply_block, axis, M, per_stage),
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
    )
    ys = fwd(staged, xs)
    return ys.reshape(x.shape)


def _pipeline_device(stage_params, xs, apply_block, axis, M, per_stage):
    """Per-device GPipe loop. stage_params has leading dims [1, per_stage]
    (the sharded S axis), xs is the full [M, mb, ...] microbatch stack
    (replicated — only stage 0 reads it)."""
    S = jax.lax.psum(1, axis)
    s = jax.lax.axis_index(axis)
    stage_params = jax.tree.map(lambda p: p[0], stage_params)  # [per_stage, ...]

    def run_stage(x):
        def body(c, blk):
            return apply_block(blk, c), None

        out, _ = jax.lax.scan(body, x, stage_params)
        return out

    mb_shape = xs.shape[1:]
    T = M + S - 1
    perm = [(i, (i + 1) % S) for i in range(S)]

    def tick(carry, t):
        prev_out, ys = carry
        recv = jax.lax.ppermute(prev_out, axis, perm)
        mb_idx = t - s
        safe_idx = jnp.clip(mb_idx, 0, M - 1)
        x_in = jnp.where(s == 0, xs[safe_idx], recv)
        y = run_stage(x_in)
        valid = (mb_idx >= 0) & (mb_idx < M)
        is_last = s == S - 1
        # the last stage scatters finished microbatches into the output
        upd = jnp.where(valid & is_last, y, ys[safe_idx])
        ys = ys.at[safe_idx].set(upd)
        return (y, ys), None

    # the carries become device-varying after the first ppermute/axis_index;
    # mark the zero-initialized values varying up front to keep scan's carry
    # type stable
    ys0 = jax.lax.pcast(jnp.zeros((M,) + mb_shape, xs.dtype), (axis,), to="varying")
    x0 = jax.lax.pcast(jnp.zeros(mb_shape, xs.dtype), (axis,), to="varying")
    (_, ys), _ = jax.lax.scan(tick, (x0, ys0), jnp.arange(T))
    # every device returns a full-size buffer; only the last stage's has the
    # results — sum across stages reassembles it (others are zero)
    return jax.lax.psum(ys, axis)
