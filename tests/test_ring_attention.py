"""Ring (sequence-parallel) attention on the simulated 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.ops.attention import multi_head_attention
from clipself_tpu.ops.ring_attention import ring_attention
from clipself_tpu.parallel.mesh import create_mesh


def _qkv(b=2, n=64, h=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("ring", [2, 4, 8])
def test_ring_matches_full_attention(ring):
    q, k, v = _qkv()
    scale = q.shape[-1] ** -0.5
    ref = multi_head_attention(q, k, v, scale, impl="xla")
    mesh = create_mesh(ring, axis_names=("sp",))
    out = ring_attention(mesh, q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_gradients_match_full_attention():
    q, k, v = _qkv(seed=1)
    scale = q.shape[-1] ** -0.5
    mesh = create_mesh(4, axis_names=("sp",))

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(mesh, q, k, v, scale) ** 2)

    def loss_full(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v, scale, impl="xla") ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_ring_composes_with_data_axis():
    """Sequence axis alongside a data axis: each (data row, sp ring) is
    independent."""
    q, k, v = _qkv(b=4, seed=2)
    scale = q.shape[-1] ** -0.5
    mesh = create_mesh(8, axis_names=("data", "sp"), shape=(2, 4))
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = NamedSharding(mesh, P("data", "sp"))
    qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))

    ref = multi_head_attention(q, k, v, scale, impl="xla")
    out = jax.shard_map(
        lambda q, k, v: __import__(
            "clipself_tpu.ops.ring_attention", fromlist=["_ring_local"]
        )._ring_local(q, k, v, scale, "sp"),
        mesh=mesh,
        in_specs=(P("data", "sp"), P("data", "sp"), P("data", "sp")),
        out_specs=P("data", "sp"),
    )(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
