"""Pallas rolled-RoPE kernel (interpret mode) vs the XLA composition.

The kernel computes the same multiplies/adds as
`models/rope.py::_apply_rolled` in the same dtype; backends may contract
multiply-adds differently (FMA), so forward/backward are pinned to ~1-ULP
tolerance rather than bit equality. The custom-vjp backward reuses the
kernel with trace-time-rolled tables (derivation in `ops/rope_roll.py`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipself_tpu.models import rope
from clipself_tpu.ops import rope_roll


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(rope_roll, "_INTERPRET", True)


@pytest.mark.parametrize(
    "n,w,dtype",
    [(272, 256, jnp.float32), (197, 128, jnp.bfloat16), (577, 128, jnp.bfloat16)],
)
def test_forward_matches_xla_composition(n, w, dtype):
    head_dim = 64
    gh = gw = {272: 16, 197: 14, 577: 24}[n]
    cos_np, sa_np, sb_np = rope.rope_tables_flat_np(gh, gw, head_dim, w // head_dim, 1, n)
    cos, sa, sb = (jnp.asarray(t, dtype) for t in (cos_np, sa_np, sb_np))
    a2 = jnp.asarray(np.roll(sa_np, 1, -1), dtype)
    b2 = jnp.asarray(np.roll(sb_np, -1, -1), dtype)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, n, w)), dtype)
    want = np.asarray(rope._apply_rolled(x, cos, sa, sb), np.float32)
    got = np.asarray(rope_roll.rolled_rope(x, cos, sa, sb, a2, b2), np.float32)
    tol = 1e-6 if dtype == jnp.float32 else 1.6e-2  # ~2 ULP of the dtype
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_backward_matches_xla_autodiff():
    n, w, head_dim, gh, gw = 272, 256, 64, 16, 16
    cos_np, sa_np, sb_np = rope.rope_tables_flat_np(gh, gw, head_dim, w // head_dim, 1, n)
    f32 = jnp.float32
    cos, sa, sb = (jnp.asarray(t, f32) for t in (cos_np, sa_np, sb_np))
    a2 = jnp.asarray(np.roll(sa_np, 1, -1), f32)
    b2 = jnp.asarray(np.roll(sb_np, -1, -1), f32)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, n, w)), f32)
    dy = jnp.asarray(rng.standard_normal((2, n, w)), f32)

    _, vjp_ref = jax.vjp(lambda t: rope._apply_rolled(t, cos, sa, sb), x)
    _, vjp_ker = jax.vjp(lambda t: rope_roll.rolled_rope(t, cos, sa, sb, a2, b2), x)
    (dx_ref,) = vjp_ref(dy)
    (dx_ker,) = vjp_ker(dy)
    # each output lane is c*dy + one nonzero rolled product (tables are
    # parity-masked): identical math, ~1-ULP FMA-association tolerance
    np.testing.assert_allclose(np.asarray(dx_ker), np.asarray(dx_ref), rtol=1e-6, atol=1e-6)


def test_apply_rope_flat_uses_kernel_and_matches(monkeypatch):
    """apply_rope_flat with the knob on (forced available) == knob off."""
    from clipself_tpu.core import knobs

    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 197, 128)), jnp.float32)
    monkeypatch.setattr(rope, "_pallas_rope_available", lambda: True)
    knobs.set("pallas_rope", True)
    try:
        got = rope.apply_rope_flat(x, 14, 14, 64)
        knobs.set("pallas_rope", False)
        want = rope.apply_rope_flat(x, 14, 14, 64)
    finally:
        knobs.set("pallas_rope", None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_block_n_divides():
    for n in (197, 272, 4224, 2048, 1920):
        bn = rope_roll._block_n(n)
        assert n % bn == 0
        if n > 512:
            assert bn % 8 == 0 and bn <= 1056
    # the unpadded eval sequence (4097 = 17 x 241): no 8-aligned divisor —
    # apply_rope_flat must fall back to the XLA composition
    assert rope_roll._block_n(4097) == 0
    assert not rope_roll.supported(4097)
    assert rope_roll.supported(4224) and rope_roll.supported(197)
    # the L/14 teacher's 577-token crops (577 is prime): full-row block
    # under the VMEM budget in bf16, XLA fallback in f32 (round 4)
    assert rope_roll._block_n(577, w=1024, itemsize=2) == 577
    assert rope_roll.supported(577, w=1024, itemsize=2)
    assert not rope_roll.supported(577, w=1024, itemsize=4)
    # blocks must fit the compiler's DEFAULT 16MB scoped budget (the
    # evaluator compiles without the train step's 32MB option): width 768
    # keeps the measured-optimal 1056, width 1024 steps down to 704
    assert rope_roll._block_n(4224, w=768, itemsize=2) == 1056
    assert rope_roll._block_n(4224, w=1024, itemsize=2) == 704
    for n, w, it in [(4224, 768, 2), (4224, 1024, 2), (5376, 1024, 2)]:
        bn = rope_roll._block_n(n, w=w, itemsize=it)
        assert bn * w * it * 8 <= 14 * 1024 * 1024


def test_full_row_branch_respects_vmem_budget():
    """The n<=512 full-row branch must apply the same fits() VMEM check as
    the long-sequence branches: a 512-token f32 block at w=1024 is 16MB by
    the stack model — over the 14MB budget (advisor round-4 finding)."""
    assert not rope_roll.supported(512, w=1024, itemsize=4)
    assert rope_roll.supported(512, w=1024, itemsize=2)
    assert rope_roll.supported(197, w=768, itemsize=4)
