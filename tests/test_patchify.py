"""PatchEmbed (reshape+matmul patchify) must match the stride-p nn.Conv it
replaced, parameter-for-parameter (same "kernel" HWIO layout, same "bias").

The swap is a pure compute-graph change for MXU lane efficiency
(ops/patchify.py); checkpoints and torch weight import are unchanged, so
equality against flax's Conv on the same params is the whole contract.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.ops.patchify import PatchEmbed


@pytest.mark.parametrize("use_bias", [True, False])
@pytest.mark.parametrize("p,hw", [(16, 64), (14, 56), (4, 32)])
def test_matches_conv(use_bias, p, hw):
    rng = np.random.default_rng(p + hw + use_bias)
    x = jnp.asarray(rng.normal(size=(2, hw, hw, 3)), jnp.float32)
    pe = PatchEmbed(32, patch_size=p, use_bias=use_bias)
    params = pe.init(jax.random.PRNGKey(0), x)
    conv = nn.Conv(
        32, kernel_size=(p, p), strides=(p, p), padding="VALID",
        use_bias=use_bias,
    )
    got = pe.apply(params, x)
    want = conv.apply(params, x)
    assert got.shape == want.shape == (2, hw // p, hw // p, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_valid_truncation():
    """Input not divisible by p: VALID-conv semantics drop trailing pixels."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 37, 41, 3)), jnp.float32)
    pe = PatchEmbed(8, patch_size=16)
    params = pe.init(jax.random.PRNGKey(1), x)
    conv = nn.Conv(8, kernel_size=(16, 16), strides=(16, 16), padding="VALID")
    np.testing.assert_allclose(
        np.asarray(pe.apply(params, x)),
        np.asarray(conv.apply(params, x)),
        atol=2e-5,
    )


def test_param_layout_identical_to_conv():
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    pe_params = PatchEmbed(16, patch_size=16).init(jax.random.PRNGKey(0), x)
    conv_params = nn.Conv(
        16, kernel_size=(16, 16), strides=(16, 16), padding="VALID"
    ).init(jax.random.PRNGKey(0), x)
    pe_shapes = jax.tree.map(lambda a: a.shape, pe_params)
    conv_shapes = jax.tree.map(lambda a: a.shape, conv_params)
    assert pe_shapes == conv_shapes
