"""Query-chunked XLA attention == the reference full-softmax path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.core import knobs
from clipself_tpu.ops.attention import _chunked_xla_attention, _xla_attention


def _qkv(n=37, b=2, h=3, d=16, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, n, h, d)), dtype)
    return mk(), mk(), mk()


@pytest.mark.parametrize("n,chunk", [(37, 8), (577, 128), (64, 64)])
def test_chunked_matches_full_f32(n, chunk):
    q, k, v = _qkv(n=n)
    want = _xla_attention(q, k, v, 0.25)
    got = _chunked_xla_attention(q, k, v, 0.25, chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-6)


def test_chunked_bf16_matches_half_logits_numerics():
    """With the half-logits knob on, the chunked panels use exactly that
    storage/softmax recipe — panel-wise equality with the full path. (The
    chunked path FOLLOWS the knob rather than forcing half storage, so a
    chunk-q A/B isolates chunking from the logits-dtype lever.)"""
    q, k, v = _qkv(n=577, dtype=jnp.bfloat16, seed=1)
    knobs.set("xla_attn_half_logits", True)
    try:
        want = _xla_attention(q, k, v, 0.125)
        got = _chunked_xla_attention(q, k, v, 0.125, 128)
    finally:
        knobs.set("xla_attn_half_logits", None)
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    # same math per panel; only the jnp.max panel extent differs (the
    # row-max is over the same full key axis) -> tight agreement
    np.testing.assert_allclose(g, w, atol=2e-2, rtol=2e-2)
    cos = (g * w).sum() / (np.linalg.norm(g) * np.linalg.norm(w))
    assert cos > 0.9999


def test_knob_routes_dispatcher():
    q, k, v = _qkv(n=37)
    base = _xla_attention(q, k, v, 0.25)
    knobs.set("xla_attn_chunk_q", 8)
    try:
        routed = _xla_attention(q, k, v, 0.25)
    finally:
        knobs.set("xla_attn_chunk_q", None)
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(base), atol=1e-6, rtol=1e-6
    )


def test_chunked_grads_flow():
    q, k, v = _qkv(n=37)

    def loss(q, k, v):
        return jnp.sum(_chunked_xla_attention(q, k, v, 0.25, 8) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for t in g:
        assert bool(jnp.isfinite(t).all())
        assert float(jnp.abs(t).sum()) > 0


def test_chunk_knob_model_level_equivalence():
    """The knob routes every mask-free XLA attention in a real tower; the
    tower's outputs must be unchanged (f32, CPU)."""
    from clipself_tpu.core.config import config_from_dict
    from clipself_tpu.models.factory import create_model

    cfg = config_from_dict(
        {
            "embed_dim": 16,
            "vision_cfg": {
                "image_size": 40, "layers": 2, "width": 32, "head_width": 16,
                "patch_size": 8, "mlp_ratio": 2.0,
                "eva_model_name": "tiny-chunk-test", "rope": True,
                "naiveswiglu": True, "subln": True,
            },
            "text_cfg": {
                "context_length": 8, "vocab_size": 64, "width": 16,
                "heads": 2, "layers": 1,
            },
        },
        name="tiny-chunk",
    )
    model, params = create_model(cfg, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 40, 40, 3)), jnp.float32)
    base = model.apply({"params": params}, x, method="encode_image")
    knobs.set("xla_attn_chunk_q", 8)  # 26 tokens -> 4 panels of 8
    try:
        routed = model.apply({"params": params}, x, method="encode_image")
    finally:
        knobs.set("xla_attn_chunk_q", None)
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(base), atol=1e-6, rtol=1e-6
    )
