"""Pallas fused LayerNorm (interpret mode) vs nn.LayerNorm / autodiff.

The kernel computes the same f32 math in the same association as
`nn.LayerNorm(dtype=f32, use_fast_variance=True)`; backends may contract
multiply-adds differently (FMA), so forward/backward are pinned to ~1-ULP
tolerance rather than bit equality. The XLA fallback inside
`_FusableLayerNorm` must be BIT-identical to nn.LayerNorm (it is what the
CPU golden suite exercises)."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from clipself_tpu.ops import layer_norm as pln

EPS = 1e-6


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pln, "_INTERPRET", True)


def _ref_ln(x, scale, bias):
    mod = nn.LayerNorm(epsilon=EPS, dtype=jnp.float32, param_dtype=jnp.float32)
    return mod.apply({"params": {"scale": scale, "bias": bias}}, x)


def _make(n, w, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, n, w)) * 3 + 0.5, dtype)
    scale = jnp.asarray(rng.standard_normal(w) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(w) * 0.1, jnp.float32)
    return x, scale, bias


@pytest.mark.parametrize(
    "n,w,dtype",
    [(256, 128, jnp.float32), (197, 256, jnp.bfloat16), (1024, 128, jnp.float32)],
)
def test_forward_matches_nn_layer_norm(n, w, dtype):
    x, scale, bias = _make(n, w, dtype)
    want = np.asarray(_ref_ln(x, scale, bias), np.float32)  # f32 out
    got = np.asarray(pln.fused_layer_norm(x, scale, bias, EPS), np.float32)
    # the kernel emits x.dtype (the cast every call site performs anyway)
    want = np.asarray(jnp.asarray(want, dtype), np.float32)
    tol = 2e-6 if dtype == jnp.float32 else 1.6e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_backward_matches_xla_autodiff():
    n, w = 1024, 128  # multiple bwd grid steps: bwd block 512 -> grid (2, 2)
    x, scale, bias = _make(n, w, jnp.float32, seed=1)
    dy = jnp.asarray(np.random.default_rng(2).standard_normal((2, n, w)), jnp.float32)

    def ref(x, s, b):
        return _ref_ln(x, s, b).astype(x.dtype)

    _, vjp_ref = jax.vjp(ref, x, scale, bias)
    _, vjp_ker = jax.vjp(lambda x, s, b: pln.fused_layer_norm(x, s, b, EPS), x, scale, bias)
    dx_r, dg_r, db_r = vjp_ref(dy)
    dx_k, dg_k, db_k = vjp_ker(dy)
    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r), rtol=2e-5, atol=2e-5)
    # dgamma/dbeta accumulate across 2x2+ grid steps (the revisited block)
    np.testing.assert_allclose(np.asarray(dg_k), np.asarray(dg_r), rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(db_k), np.asarray(db_r), rtol=2e-5, atol=2e-4)


def test_module_fallback_bit_identical_to_nn_layer_norm():
    # CPU path (knob unavailable off-TPU): _FusableLayerNorm must reproduce
    # nn.LayerNorm exactly — it is what the golden suite runs through.
    from clipself_tpu.models.eva_vit import _FusableLayerNorm

    x, scale, bias = _make(197, 256, jnp.float32, seed=3)
    want = _ref_ln(x, scale, bias)
    got = _FusableLayerNorm(epsilon=EPS).apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    xb = x.astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(_FusableLayerNorm(epsilon=EPS).apply(
            {"params": {"scale": scale, "bias": bias}}, xb
        )),
        np.asarray(_ref_ln(xb, scale, bias)),
    )


def test_supported_shapes():
    assert pln.supported(4224, 768)   # B/16 student pad
    assert pln.supported(197, 768)    # B/16 teacher crops
    assert pln.supported(4224, 1024)  # L/14 student
    assert not pln.supported(577, 1024)  # L/14 teacher crops: 577 is prime
    assert not pln.supported(4097, 768)  # unpadded eval seq: no 8-aligned divisor
    assert not pln.supported(256, 100)   # lane-misaligned width


def test_eva_tower_grad_knob_on_vs_off(monkeypatch):
    """End-to-end wiring: a tiny EVA tower's loss and input-grad with the
    fused kernel (interpret mode, availability forced) match the XLA
    composition at f32 FMA tolerance."""
    import jax

    from clipself_tpu.core import knobs
    from clipself_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
    from clipself_tpu.models.factory import create_model

    monkeypatch.setattr(pln, "available", lambda: True)

    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(
            image_size=64, layers=2, width=128, head_width=64, patch_size=16,
            mlp_ratio=2.6667, rope=True, pt_hw_seq_len=16, intp_freq=True,
            naiveswiglu=True, subln=True, eva_model_name="tiny-ln",
        ),
        text=TextConfig(context_length=8, vocab_size=64, width=32, heads=2, layers=1),
        name="tiny-ln",
    )
    model, params = create_model(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray([[[0.1, 0.1, 0.6, 0.7], [0.2, 0.3, 0.9, 0.8]]], jnp.float32)

    def loss(images):
        feats = model.apply(
            {"params": params}, images, boxes, True, method="encode_pseudo_boxes"
        )
        return jnp.sum(feats * feats), feats

    outs = {}
    for on in (False, True):
        monkeypatch.setenv("CLIPSELF_PALLAS_LN", "1" if on else "0")
        assert knobs.get("pallas_ln") is on
        (val, feats), grad = jax.value_and_grad(loss, has_aux=True)(images)
        outs[on] = (float(val), np.asarray(feats), np.asarray(grad))

    assert abs(outs[True][0] - outs[False][0]) <= 1e-4 * max(1.0, abs(outs[False][0]))
    np.testing.assert_allclose(outs[True][1], outs[False][1], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs[True][2], outs[False][2], rtol=2e-4, atol=2e-5)


def test_eva_tower_grad_knob_under_remat(monkeypatch):
    """The shipped L/14 scripts combine CLIPSELF_PALLAS_LN=1 with optional
    --grad-checkpointing: the LN custom_vjp must compose with jax.checkpoint
    (primal recompute re-enters the kernel). Same tiny tower as above, built
    remat=True, knob on vs off."""
    import jax

    from clipself_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
    from clipself_tpu.models.factory import create_model

    monkeypatch.setattr(pln, "available", lambda: True)

    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(
            image_size=64, layers=2, width=128, head_width=64, patch_size=16,
            mlp_ratio=2.6667, rope=True, pt_hw_seq_len=16, intp_freq=True,
            naiveswiglu=True, subln=True, eva_model_name="tiny-ln-remat",
        ),
        text=TextConfig(context_length=8, vocab_size=64, width=32, heads=2, layers=1),
        name="tiny-ln-remat",
    )
    model, params = create_model(cfg, dtype=jnp.float32, remat=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray([[[0.1, 0.1, 0.6, 0.7]]], jnp.float32)

    def loss(images):
        feats = model.apply(
            {"params": params}, images, boxes, True, method="encode_pseudo_boxes"
        )
        return jnp.sum(feats * feats)

    outs = {}
    for on in (False, True):
        monkeypatch.setenv("CLIPSELF_PALLAS_LN", "1" if on else "0")
        val, grad = jax.value_and_grad(loss)(images)
        outs[on] = (float(val), np.asarray(grad))
    assert abs(outs[True][0] - outs[False][0]) <= 1e-4 * max(1.0, abs(outs[False][0]))
    np.testing.assert_allclose(outs[True][1], outs[False][1], rtol=2e-4, atol=2e-5)


def test_block_plan_respects_bytes_budget():
    # advisor round-3: the block cap must come from a bytes budget, not a
    # fixed row count — an f32 [1024, 2048] tile is 8MB and overflows the
    # default scoped-VMEM budget once double-buffered
    for n in (4224, 2048, 1024):
        for w in (128, 768, 1024, 2048):
            bn = pln._block_n(n, 1024, w)
            if bn:
                assert bn * w * 4 <= pln._TILE_BYTES, (n, w, bn)
            bb = pln._block_n(n, 512, 2 * w)  # backward keeps x + dy tiles
            if bb:
                assert bb * 2 * w * 4 <= pln._TILE_BYTES, (n, w, bb)
    # the measured recipe shapes keep their 384-row blocks (PERF.md A/Bs)
    assert pln._block_n(4224, 1024, 768) == 384
    assert pln._block_n(4224, 1024, 1024) == 384
    assert pln._block_n(4224, 512, 2 * 768) == 384
    assert pln._block_n(4224, 512, 2 * 1024) == 384


def test_primal_is_stats_free():
    # the no-grad path must not emit the (mean, rstd) outputs at all
    # (pallas outputs cannot be DCE'd individually)
    import jax

    x, scale, bias = _make(256, 128, jnp.float32, seed=4)

    def find_pallas(jaxpr, out):
        for e in jaxpr.eqns:
            if e.primitive.name == "pallas_call":
                out.append(e)
            for v in e.params.values():
                if hasattr(v, "jaxpr"):
                    find_pallas(v.jaxpr, out)
        return out

    jaxpr = jax.make_jaxpr(lambda x: pln.fused_layer_norm(x, scale, bias, EPS))(x)
    [pcall] = find_pallas(jaxpr.jaxpr, [])
    assert len(pcall.outvars) == 1  # y only — no stats
    # ... while the grad path still gets its stats from the saving forward
    jaxpr_g = jax.make_jaxpr(
        jax.grad(lambda x: pln.fused_layer_norm(x, scale, bias, EPS).sum())
    )(x)
    calls = find_pallas(jaxpr_g.jaxpr, [])
    assert max(len(e.outvars) for e in calls) == 3


def test_supported_requires_legal_backward_plan():
    """supported() must reject shapes whose BACKWARD block plan is zero —
    n=512/w=1024 (a real SwiGLU ffn_ln width) passed the forward-only check
    but divided by a zero backward block at trace time whenever a gradient
    flowed (advisor round-4 medium finding)."""
    assert not pln.supported(512, 1024)
    assert not pln.supported(384, 2048)
    # ... and the accepted recipe shapes still plan a positive bwd block
    for n, w in [(4224, 768), (197, 768), (4224, 1024)]:
        assert pln.supported(n, w)
        assert pln._block_n(n, 512, 2 * w) > 0, (n, w)
