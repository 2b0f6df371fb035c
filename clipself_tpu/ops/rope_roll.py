"""Pallas kernel for the rolled-table RoPE composition.

`models/rope.py` applies 2-D rotary embeddings as

    y = x*cos + roll(x, -1, lanes)*sin_a + roll(x, +1, lanes)*sin_b

on the flat [B, N, width] projection output. Under XLA each `jnp.roll`
lowers to slice+concat that MATERIALIZES a full shifted copy of x through
HBM, so one application moves ~5x the bytes it needs (round-3 trace:
3.25 ms/step against a ~0.9 ms byte floor on the B/16 recipe). This kernel
does the rolls in-register on VMEM-resident blocks (`pltpu.roll`), reading
x once and writing y once.

The backward is the SAME kernel with trace-time-rolled tables: with
y_i = c_i x_i + a_i x_{i+1} + b_i x_{i-1} (wraps land on zeroed table
entries by construction, `rope.py::_split_sin_np`),

    dx_j = c_j dy_j + a_{j-1} dy_{j-1} + b_{j+1} dy_{j+1}
         = dy*c + roll(dy, +1)*roll(a, +1) + roll(dy, -1)*roll(b, -1)

so the caller precomputes roll(a,+1)/roll(b,-1) in NumPy and the custom_vjp
reuses the forward kernel. Numerics: same multiplies/adds in the same
dtype as the XLA composition; backends may contract multiply-adds (FMA)
differently, so agreement is ~1 ULP rather than bit-exact
(tests/test_rope_roll.py pins it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_n(n: int, cap: int = 1056, w: int = 1024, itemsize: int = 2) -> int:
    """Pick a Mosaic-legal sequence block for rows of n tokens, or 0.

    Blocked dims must be divisible by 8 (sublane) unless the block spans the
    whole dimension. Small sequences (teacher crops, e.g. 197) take one
    full-row block; otherwise the largest 8-aligned divisor <= cap. Returns
    0 when neither exists — the caller falls back to the XLA composition.
    (In practice every shipped TPU path is covered: the trunk pads long
    sequences to a 128-multiple before any block runs — train AND eval both
    see 4224, models/eva_vit.py::_pad_for_flash — and an unpadded length
    like 4097 = 17 x 241, which has no 8-aligned divisor, only occurs on
    the CPU/XLA test paths where the knob is off anyway.)

    Full-row blocks are also taken above 512 rows when they fit the VMEM
    budget — the L/14 teacher's 577-token crops (577 is prime: no aligned
    divisor exists) otherwise fall back to the XLA composition, which the
    round-4 L/14 trace bills at ~25 ms/step of materialized roll copies.

    Blocks must fit the compiler's DEFAULT 16MB scoped-VMEM budget — the
    kernel must not depend on its caller's `compiler_options` (the train
    and detector steps request 32MB, but the evaluator and any user jit
    run at the default; a 1056-row block at width 1024 measures 16.5-17.3MB
    of kernel stack and OOMed the L/14 eval compile). Empirical stack model
    from those compiles: ~8x the block's input bytes (refs double-buffered
    plus the three f32 row temporaries); capped at 14MB for headroom under
    co-scheduled kernels. Width 768 keeps its measured-optimal 1056 block
    (13.0MB); width 1024 steps down to 704 (11.5MB)."""
    budget = 14 * 1024 * 1024

    def fits(rows: int) -> bool:
        return rows * w * itemsize * 8 <= budget

    if n <= 512:
        # full-dim block: exempt from the divisibility rule, but NOT from
        # the VMEM budget (a 512-row f32 block at w=1024 is 16MB by the
        # stack model — advisor round-4 finding)
        return n if fits(n) else 0
    if fits(n):
        return n
    for bn in range(cap - cap % 8, 0, -8):
        if n % bn == 0 and fits(bn):
            return bn
    return 0


def supported(n: int, w: int = 1024, itemsize: int = 2) -> bool:
    """Whether the kernel has a legal block plan for sequence length n."""
    return _block_n(n, w=w, itemsize=itemsize) > 0


def _rope_kernel(x_ref, c_ref, a_ref, b_ref, o_ref):
    x = x_ref[0]  # [bn, W]
    w = x.shape[-1]
    # Mosaic only implements 32-bit lane rotates; bf16 x round-trips through
    # f32 for the roll (exact) and casts back BEFORE the multiply so the
    # product runs in the same dtype as the XLA composition.
    # pltpu.roll requires non-negative shifts; roll(-1) == roll(W-1).
    xr = x if x.dtype == jnp.float32 else x.astype(jnp.float32)
    left = pltpu.roll(xr, w - 1, 1).astype(x.dtype)
    right = pltpu.roll(xr, 1, 1).astype(x.dtype)
    o_ref[0] = x * c_ref[...] + left * a_ref[...] + right * b_ref[...]


# tests flip this to run the kernel through the Pallas interpreter on CPU
_INTERPRET = False


def _rope_call(x, c, a, b):
    bsz, n, w = x.shape
    bn = _block_n(n, w=w, itemsize=x.dtype.itemsize)
    grid = (bsz, n // bn)
    xspec = pl.BlockSpec((1, bn, w), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((bn, w), lambda bi, ni: (ni, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _rope_kernel,
        grid=grid,
        in_specs=[xspec, tspec, tspec, tspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(x, c, a, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def rolled_rope(x, c, a, b, a_bwd, b_bwd):
    """y = x*c + roll(x,-1)*a + roll(x,+1)*b on [B, N, W], Pallas-fused.

    a_bwd/b_bwd are the trace-time-rolled backward tables
    (np.roll(a, +1, -1), np.roll(b, -1, -1) — see module docstring; the
    backward multiplies them against the correspondingly rolled dy).
    """
    return _rope_call(x, c, a, b)


def _rope_fwd(x, c, a, b, a_bwd, b_bwd):
    return _rope_call(x, c, a, b), (c, a_bwd, b_bwd)


def _rope_bwd(res, dy):
    c, a_bwd, b_bwd = res
    # dx = dy*c + roll(dy,+1)*roll(a,+1) + roll(dy,-1)*roll(b,-1); expressed
    # through the forward kernel (args: coeff-of-roll(-1) then coeff-of-
    # roll(+1)): roll(dy,-1) pairs with b_bwd, roll(dy,+1) with a_bwd.
    dx = _rope_call(dy, c, b_bwd, a_bwd)
    zeros = (jnp.zeros_like(c),) * 5
    return (dx, *zeros)


rolled_rope.defvjp(_rope_fwd, _rope_bwd)
