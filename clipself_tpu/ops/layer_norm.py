"""Pallas one-pass fused LayerNorm (forward + one-pass backward).

XLA compiles `nn.LayerNorm` as a stat-reduce fusion (reads x) followed by a
normalize fusion (reads x again, writes y), and its backward re-reads x/dy
for the two row-reduces and again for dx — cross-boundary traffic the
roofline table in PERF.md attributes most of the generic/reduce-fusion
residual to. This kernel keeps each [block_n, width] tile VMEM-resident:

  forward : read x once -> mean / fast-variance / normalize / affine in f32
            -> write y in x's dtype (the very cast every call site performs),
            plus per-row (mean, rstd) f32 stats for the backward
  backward: read x, dy once -> dx = rstd * (g - mean(g) - xhat*mean(g*xhat))
            with g = dy*gamma, plus dgamma/dbeta accumulated across the
            sequential grid in a revisited (width,) output block

Numerics: the f32 math matches `nn.LayerNorm(use_fast_variance=True)`
association (y = (x-mu) * (rstd*scale) + bias, var = max(0, E[x^2]-E[x]^2));
backends may contract multiply-adds (FMA) differently, so agreement is
~1 ULP rather than bit-exact (tests/test_pallas_ln.py pins fwd and vjp).
Reference analogue: apex FusedLayerNorm, which the reference enables on
every EVA block (`/root/reference/src/open_clip/eva_clip/model.py:24-28`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Per-tile VMEM budget for one [block_n, width] f32 input tile (the backward
# passes 2*width: it keeps an x AND a dy tile resident). Pallas
# double-buffers the pipeline (in + out tiles live simultaneously), so the
# true VMEM footprint is ~4x this; 3MB keeps the worst case (~12MB) inside
# the 16MB default scoped budget at any supported width while preserving the
# measured 384-row blocks at the w=768/1024 recipe shapes (advisor round-3
# finding: the old fixed 1024-row cap made an f32 [1024, 2048] tile 8MB,
# overflowing at compile time for widths beyond the measured 768/1024).
_TILE_BYTES = 3 * 1024 * 1024


def _row_cap(width: int, cap: int) -> int:
    """Row-block cap bounded by the per-tile bytes budget (f32 tiles)."""
    return min(cap, max(128, (_TILE_BYTES // (width * 4)) // 128 * 128))


def _block_n(n: int, cap: int, width: int) -> int:
    """Largest Mosaic-legal row block for a sequence of n tokens, or 0.

    Small sequences take one full-row block (full-dim blocks are exempt
    from alignment rules) as long as it fits the bytes budget. Otherwise
    the block must be 128-aligned: the row axis is the LANE dim of the
    (B, N) stats outputs, and non-full lane blocks must be 128-multiples
    on hardware."""
    cap = _row_cap(width, cap)
    if n <= 512:
        return n if n * width * 4 <= _TILE_BYTES else 0
    for bn in range(cap - cap % 128, 0, -128):
        if n % bn == 0:
            return bn
    return 0


def supported(n: int, width: int) -> bool:
    """Whether the kernel has a legal block plan for [*, n, width] inputs.

    Requires a legal plan for BOTH passes: the backward keeps an x and a dy
    tile resident, so it plans with half the row cap at double the width
    (`_bwd_call`). Without the second check, shapes like n=512/w=1024 (a
    real SwiGLU ffn_ln width) would claim support, then hit a zero backward
    block — and a trace-time ZeroDivisionError — the first time a gradient
    flows through (advisor round-4 finding)."""
    return (
        width % 128 == 0
        and width <= 2048
        and _block_n(n, 1024, width) > 0
        and _block_n(n, 512, 2 * width) > 0
    )


def available() -> bool:
    return jax.default_backend() == "tpu"


def _fwd_kernel(eps, x_ref, g_ref, b_ref, y_ref, mu_ref=None, rs_ref=None):
    x = x_ref[0].astype(jnp.float32)  # [bn, W]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    # same association as flax._normalize: (x - mu) * (rstd * scale) + bias
    y = (x - mu) * (rstd * g_ref[...].astype(jnp.float32)) + b_ref[...].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)
    if mu_ref is not None:
        mu_ref[0, 0] = mu[:, 0]
        rs_ref[0, 0] = rstd[:, 0]


def _bwd_kernel(x_ref, dy_ref, mu_ref, rs_ref, g_ref, dx_ref, dg_ref, db_ref):
    x = x_ref[0].astype(jnp.float32)  # [bn, W]
    dy = dy_ref[0].astype(jnp.float32)
    mu = mu_ref[0, 0][:, None]
    rstd = rs_ref[0, 0][:, None]
    xhat = (x - mu) * rstd
    g = dy * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(g, axis=-1, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx_ref[0] = (rstd * (g - m1 - xhat * m2)).astype(dx_ref.dtype)
    # dgamma/dbeta accumulate across the (sequential) grid into one
    # revisited (W,) block each
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dg_ref[...] = jnp.zeros(dg_ref.shape, dg_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    dg_ref[...] += jnp.sum(dy * xhat, axis=0)
    db_ref[...] += jnp.sum(dy, axis=0)


# tests flip this to run the kernels through the Pallas interpreter on CPU
_INTERPRET = False


def _fwd_call(x, scale, bias, eps, stats=True):
    """Forward pallas_call; stats=False omits the (mean, rstd) outputs
    entirely — pallas outputs cannot be DCE'd individually, so the no-grad
    primal path would otherwise pay 2*B*N f32 HBM writes per LN for stats
    nobody reads (advisor round-3 finding)."""
    bsz, n, w = x.shape
    bn = _block_n(n, 1024, w)
    grid = (bsz, n // bn)
    xspec = pl.BlockSpec((1, bn, w), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((w,), lambda bi, ni: (0,), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(
        (1, 1, bn), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps),
        grid=grid,
        in_specs=[xspec, vspec, vspec],
        out_specs=[xspec] + ([sspec, sspec] if stats else []),
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype)]
        + (
            [
                jax.ShapeDtypeStruct((bsz, 1, n), jnp.float32),
                jax.ShapeDtypeStruct((bsz, 1, n), jnp.float32),
            ]
            if stats
            else []
        ),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(x, scale, bias)
    return out if stats else (out[0], None, None)


def _bwd_call(x, dy, mu, rstd, scale):
    bsz, n, w = x.shape
    # the backward keeps an x AND a dy tile resident -> halve the row cap
    bn = _block_n(n, 512, 2 * w)
    grid = (bsz, n // bn)
    xspec = pl.BlockSpec((1, bn, w), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((w,), lambda bi, ni: (0,), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(
        (1, 1, bn), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[xspec, xspec, sspec, sspec, vspec],
        out_specs=[xspec, vspec, vspec],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((w,), jnp.float32),
            jax.ShapeDtypeStruct((w,), jnp.float32),
        ],
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            # dgamma/dbeta revisit one output block across the whole grid
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(x, dy, mu, rstd, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, scale, bias, eps):
    """LayerNorm over the last axis of x[B, N, W], Pallas one-pass fused.

    f32 internal math regardless of x.dtype (the `_layer_norm` contract,
    models/eva_vit.py:43-46); output in x.dtype — the cast every call site
    applies anyway. scale/bias are the f32 (W,) params of nn.LayerNorm.
    """
    # primal path (no grad): stats-free kernel — no (mean, rstd) HBM writes
    y, _, _ = _fwd_call(x, scale, bias, eps, stats=False)
    return y


def _fln_fwd(x, scale, bias, eps):
    y, mu, rstd = _fwd_call(x, scale, bias, eps)
    return y, (x, mu, rstd, scale)


def _fln_bwd(eps, res, dy):
    x, mu, rstd, scale = res
    dx, dg, db = _bwd_call(x, dy, mu, rstd, scale)
    return dx, dg.astype(scale.dtype), db.astype(scale.dtype)


fused_layer_norm.defvjp(_fln_fwd, _fln_bwd)
