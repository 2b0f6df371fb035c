"""Hardware-gated smoke test: the fused-LN kernels must COMPILE AND RUN on a
real TPU at the shipped recipe shapes (advisor round-3: the interpreter does
not enforce Mosaic tiling/alignment legality, so the n<=512 full-row block
path and the 128-aligned lane-block plan were only verified out-of-band).

Runs only when a TPU backend is attached (skipped in the CPU-mesh CI suite,
which pins JAX_PLATFORMS=cpu in conftest); exercised on the dev chip via
`JAX_PLATFORMS='' python -m pytest tests/test_pallas_ln_tpu.py`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipself_tpu.ops import layer_norm as pln

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs TPU hardware"
)

EPS = 1e-6


@pytest.mark.parametrize(
    "n,w",
    [
        (197, 768),    # B/16 teacher crops: full-row (<=512) block path
        (4224, 768),   # B/16 padded student
        (577, 1024),   # L/14 teacher crops -> unsupported, must say so
        (4224, 1024),  # L/14 padded student
    ],
)
def test_fwd_bwd_compile_and_run_on_tpu(n, w):
    if not pln.supported(n, w):
        pytest.skip(f"({n},{w}) has no legal block plan (supported()=False)")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, n, w)), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(w) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(w) * 0.1, jnp.float32)

    y = jax.jit(lambda x: pln.fused_layer_norm(x, scale, bias, EPS))(x)
    y.block_until_ready()
    assert y.shape == x.shape and y.dtype == x.dtype
    assert np.isfinite(np.asarray(y, np.float32)).all()

    def loss(x, s, b):
        return jnp.sum(pln.fused_layer_norm(x, s, b, EPS).astype(jnp.float32) ** 2)

    dx, dg, db = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, scale, bias)
    jax.block_until_ready((dx, dg, db))
    assert np.isfinite(np.asarray(dx, np.float32)).all()
    assert np.isfinite(np.asarray(dg)).all() and np.isfinite(np.asarray(db)).all()

    # numerics vs the XLA composition at bf16 tolerance, on hardware
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
    want = ((xf - mu) * (jax.lax.rsqrt(var + EPS) * scale) + bias).astype(x.dtype)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )
