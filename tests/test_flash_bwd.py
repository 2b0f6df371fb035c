"""Fused one-pass flash backward (interpret mode) vs autodiff reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.ops.flash_bwd import flash_attention_bwd

B, H, N, D = 2, 3, 256, 64
SCALE = D ** -0.5


def ref_attn(q, k, v, seg=None):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * SCALE
    if seg is not None:
        mask = seg[:, None, :, None] == seg[:, None, None, :]
        logits = jnp.where(mask, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("use_seg", [False, True])
def test_fused_bwd_matches_autodiff(use_seg):
    rng = np.random.default_rng(0)
    q, k, v, do = (
        jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32) for _ in range(4)
    )
    seg = None
    if use_seg:
        seg = jnp.broadcast_to(
            jnp.asarray((np.arange(N) < 200).astype(np.int32))[None], (B, N)
        )
    dq_ref, dk_ref, dv_ref = jax.grad(
        lambda q_, k_, v_: jnp.sum(ref_attn(q_, k_, v_, seg) * do), argnums=(0, 1, 2)
    )(q, k, v)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * SCALE
    if seg is not None:
        logits = jnp.where(
            seg[:, None, :, None] == seg[:, None, None, :], logits, -1e30
        )
    m = logits.max(-1)
    l = jnp.exp(logits - m[..., None]).sum(-1)
    o = ref_attn(q, k, v, seg)

    dq, dk, dv = flash_attention_bwd(
        q, k, v, o, l, m, do, segment_ids=seg, sm_scale=SCALE,
        block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=1e-4)


def test_fused_vjp_wrapper_bwd_rule_cpu(monkeypatch):
    """The custom_vjp wrapper's ACTUAL bwd rule (`_flash_fused_bwd`): run it
    with interpret-mode kernels against autodiff of the reference attention
    — a broken cotangent (shape, swapped outputs, NaN) must fail here."""
    import functools

    import clipself_tpu.ops.flash_bwd as FB
    from clipself_tpu.ops import attention as A

    # route the bwd rule's kernel through interpret mode (no TPU on CI)
    monkeypatch.setattr(
        FB, "flash_attention_bwd",
        functools.partial(FB.flash_attention_bwd, interpret=True),
    )

    rng = np.random.default_rng(1)
    q, k, v, do = (
        jnp.asarray(rng.normal(size=(1, 2, 128, 64)), jnp.float32) for _ in range(4)
    )
    segf = jnp.ones((1, 128), jnp.float32)

    # residuals exactly as the bundled forward would save them
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * SCALE
    m = logits.max(-1)
    l = jnp.exp(logits - m[..., None]).sum(-1)
    o = ref_attn(q, k, v)

    dq, dk, dv, dseg = A._flash_fused_bwd(
        SCALE, 128, (q, k, v, segf, o, l, m), do
    )
    # autodiff reference
    def f(q, k, v):
        return jnp.sum(ref_attn(q, k, v) * do)

    dq_ref, dk_ref, dv_ref = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=1e-4)
    assert dseg.shape == segf.shape  # cotangent for the non-diff segf input


def test_fused_bwd_no_nan_with_extreme_masked_logits():
    """A masked (q,k) pair whose raw logit exceeds the masked row max must
    not produce inf*0=NaN grads (mask is applied before exp)."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 1, N, D)), jnp.float32)
    # padding keys with huge magnitude -> raw logits far above the valid max
    k = jnp.asarray(
        np.concatenate(
            [rng.normal(size=(1, 1, 128, D)), 40.0 * np.ones((1, 1, N - 128, D))], 2
        ),
        jnp.float32,
    )
    v = jnp.asarray(rng.normal(size=(1, 1, N, D)), jnp.float32)
    do = jnp.asarray(rng.normal(size=(1, 1, N, D)), jnp.float32)
    seg = jnp.broadcast_to(
        jnp.asarray((np.arange(N) < 128).astype(np.int32))[None], (1, N)
    )
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * SCALE
    logits = jnp.where(seg[:, None, :, None] == seg[:, None, None, :], logits, -1e30)
    m = logits.max(-1)
    l = jnp.exp(logits - m[..., None]).sum(-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
    dq, dk, dv = flash_attention_bwd(
        q, k, v, o, l, m, do, segment_ids=seg, sm_scale=SCALE,
        block_q=128, block_k=128, interpret=True,
    )
    for g in (dq, dk, dv):
        assert np.isfinite(np.asarray(g)).all()


class TestClsSplit:
    """CLS-split flash (`attention._flash_cls_split`): flash over exactly the
    patch tokens + exact rank-1 CLS corrections. On CPU the bundled Pallas
    forward is replaced by an exact (o, l, m) reference and the fused
    backward runs in interpret mode — the combine math and the gradient
    assembly are what's under test; the kernels themselves are covered by
    the tests above and by the on-chip parity harness."""

    Np = 128  # patch tokens (block-perfect); total sequence = 1 + Np

    @staticmethod
    def _patch_bundled_fwd(monkeypatch):
        import functools

        import clipself_tpu.ops.flash_bwd as FB
        from clipself_tpu.ops import attention as A

        def ref_bundled(q, k, v, segf, scale, block, save_residuals):
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            m = logits.max(-1)
            l = jnp.exp(logits - m[..., None]).sum(-1)
            o = jnp.einsum(
                "bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1).astype(q.dtype), v
            )
            return (o, l, m) if save_residuals else o

        monkeypatch.setattr(A, "_bundled_fwd", ref_bundled)
        monkeypatch.setattr(
            FB, "flash_attention_bwd",
            functools.partial(FB.flash_attention_bwd, interpret=True),
        )

    def _qkv(self, seed=0):
        rng = np.random.default_rng(seed)
        n = self.Np + 1
        return tuple(
            jnp.asarray(rng.normal(size=(2, 3, n, 64)), jnp.float32)
            for _ in range(3)
        )

    def test_forward_matches_full_softmax(self, monkeypatch):
        from clipself_tpu.ops import attention as A

        self._patch_bundled_fwd(monkeypatch)
        q, k, v = self._qkv(0)
        out = A._flash_cls_split(q, k, v, SCALE, 128)
        ref = ref_attn(q, k, v).astype(out.dtype)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_backward_matches_autodiff(self, monkeypatch):
        from clipself_tpu.ops import attention as A

        self._patch_bundled_fwd(monkeypatch)
        q, k, v = self._qkv(1)
        do = jnp.asarray(
            np.random.default_rng(2).normal(size=q.shape), jnp.float32
        )

        dq, dk, dv = jax.grad(
            lambda q_, k_, v_: jnp.sum(A._flash_cls_split(q_, k_, v_, SCALE, 128) * do),
            argnums=(0, 1, 2),
        )(q, k, v)
        dq_r, dk_r, dv_r = jax.grad(
            lambda q_, k_, v_: jnp.sum(ref_attn(q_, k_, v_) * do), argnums=(0, 1, 2)
        )(q, k, v)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r), atol=1e-4)

    def test_applicability_gate(self, monkeypatch):
        from clipself_tpu.ops import attention as A

        # experiment knob, default off (core/knobs.py)
        monkeypatch.setenv("CLIPSELF_FLASH_CLS_SPLIT", "1")
        assert A.cls_split_applicable(4097)   # 1024^2/16 student
        assert A.cls_split_applicable(4097)   # 896^2/14 student (same count)
        assert not A.cls_split_applicable(4096)  # no CLS remainder
        assert not A.cls_split_applicable(1601)  # 640^2/16: patches not 512-multiple
        assert not A.cls_split_applicable(197)   # 224^2/16: short XLA path


class TestBlockAndPadSelection:
    """The pad-once trunk path chooses the padded length; the kernels choose
    blocks that divide it. Both rules must stay in sync (PERF.md: 4097->4224
    measured +6% whole-step over the old 4608 pad)."""

    def test_block_size_is_largest_lane_multiple_divisor(self):
        from clipself_tpu.ops.attention import flash_block_size

        assert flash_block_size(4608, cap=1536) == 1536
        assert flash_block_size(4608, cap=768) == 768
        assert flash_block_size(4224, cap=1536) == 1408
        assert flash_block_size(4224, cap=768) == 384
        assert flash_block_size(4224, cap=2304) == 1408
        assert flash_block_size(1664, cap=512) == 128  # 13x128: lane-width only
        assert flash_block_size(197, cap=1024) == 0

    def test_pad_target_default(self, monkeypatch):
        monkeypatch.delenv("CLIPSELF_PAD_MULTIPLE", raising=False)
        from clipself_tpu.ops.attention import flash_block_size, flash_pad_target

        # student shapes (1024^2/16 and 896^2/14 both give 4097 tokens)
        assert flash_pad_target(4097) == 4224
        # multiscale 640px: blind 128-rounding would land on 1664 (blocks
        # of 128 only); the rule skips ahead to a >=384-block length
        assert flash_pad_target(1601) == 1920
        # the L/14 teacher's 577 tokens: one full 640-wide block (round 4 —
        # the 768 target the 512-capped rule used to pick adds +77% QK/AV
        # FLOPs vs 640's +23%)
        assert flash_pad_target(577) == 640
        for n in (4097, 1601, 3137, 401, 769, 577):
            t = flash_pad_target(n)
            assert t >= n and t % 128 == 0
            # short sequences may take the whole padded length as one block;
            # long ones keep the conservative 512 search cap
            assert flash_block_size(t, cap=t if n < 1024 else 512) >= 384
            assert t <= n + (-n) % 512  # never worse than the old 512 rule

    def test_pad_target_512_env_restores_old_rule(self, monkeypatch):
        monkeypatch.setenv("CLIPSELF_PAD_MULTIPLE", "512")
        from clipself_tpu.ops.attention import flash_pad_target

        assert flash_pad_target(4097) == 4608
        assert flash_pad_target(1601) == 2048

    def test_fused_bwd_accepts_4224_blocks(self):
        """The fallback block picker must find (384, 1408) for n=4224 and
        the kernel must run them (interpret mode, small b/h/d)."""
        rng = np.random.default_rng(3)
        n = 4224
        q, k, v, do = (
            jnp.asarray(rng.normal(size=(1, 1, n, 8)), jnp.float32)
            for _ in range(4)
        )
        out = ref_attn(q, k, v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * SCALE
        m = logits.max(axis=-1)
        l = jnp.exp(logits - m[..., None]).sum(axis=-1)
        dq, dk, dv = flash_attention_bwd(
            q, k, v, out.astype(q.dtype), l, m, do, sm_scale=SCALE, interpret=True
        )
        f = lambda q, k, v: (ref_attn(q, k, v) * do).sum()
        rq, rk, rv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(dq, rq, atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(dk, rk, atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(dv, rv, atol=2e-4, rtol=1e-3)


def test_xla_lane_pad_is_exact(monkeypatch):
    """The experiment lane-pad for short XLA-path sequences (197-token
    teacher crops -> 256) must be numerically exact: pad rows are masked in
    attention and the CLS readout ignores them (PERF.md A/B knob)."""
    import jax.numpy as jnp

    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.models.factory import create_model

    cfg = get_model_config("EVA02-CLIP-Tiny-Test")
    model, params = create_model(cfg, dtype=jnp.float32)
    img = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 32, 32, 3)), jnp.float32
    )
    base = model.apply({"params": params}, img, method="encode_image")
    monkeypatch.setenv("CLIPSELF_XLA_LANE_PAD", "32")  # 17 tokens -> 32
    padded = model.apply({"params": params}, img, method="encode_image")
    np.testing.assert_allclose(np.asarray(padded), np.asarray(base), atol=1e-5)
