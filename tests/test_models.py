"""Model-level tests on the tiny config: shapes, protocol invariants,
variable resolution, jit consistency, and torch checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.core.config import get_model_config
from clipself_tpu.models.factory import create_model

CFG = get_model_config("EVA02-CLIP-Tiny-Test")


@pytest.fixture(scope="module")
def model_and_params():
    model, params = create_model(CFG, dtype=jnp.float32, seed=0)
    return model, params


def test_encode_image_text_shapes(model_and_params):
    model, params = model_and_params
    img = jnp.ones((2, 32, 32, 3), jnp.float32)
    txt = jnp.array([[1, 5, 3, 0] + [0] * 12, [2, 9, 1, 0] + [0] * 12], jnp.int32)
    feats = model.apply({"params": params}, img, method="encode_image")
    assert feats.shape == (2, CFG.embed_dim)
    tfeats = model.apply({"params": params}, txt, method="encode_text")
    assert tfeats.shape == (2, CFG.embed_dim)


def test_encode_dense_normalized(model_and_params):
    model, params = model_and_params
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32)
    dense = model.apply({"params": params}, img, keep_shape=True, method="encode_dense")
    assert dense.shape == (2, 4, 4, CFG.embed_dim)
    norms = np.linalg.norm(np.asarray(dense), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_full_box_roi_equals_mask_pool(model_and_params):
    """RoI-align with a full-image box must equal mask-pool with all-ones mask
    (both are the plain mean of the dense map)."""
    model, params = model_and_params
    img = jnp.asarray(np.random.default_rng(1).normal(size=(1, 32, 32, 3)), jnp.float32)
    boxes = jnp.asarray([[[0.0, 0.0, 1.0, 1.0]]])
    rois = model.apply({"params": params}, img, boxes, method="encode_pseudo_boxes")
    masks = jnp.ones((1, 1, 4, 4), jnp.float32)
    pooled = model.apply({"params": params}, img, masks, False, method="encode_masks")
    np.testing.assert_allclose(np.asarray(rois), np.asarray(pooled), rtol=1e-4, atol=1e-5)


def test_variable_resolution(model_and_params):
    """224-style pretraining grid consumed at a larger resolution: pos-embed
    resize + RoPE table rebuild must kick in without errors."""
    model, params = model_and_params
    img = jnp.asarray(np.random.default_rng(2).normal(size=(1, 64, 64, 3)), jnp.float32)
    dense = model.apply({"params": params}, img, keep_shape=True, method="encode_dense")
    assert dense.shape == (1, 8, 8, CFG.embed_dim)
    feats = model.apply({"params": params}, img, method="encode_image")
    assert feats.shape == (1, CFG.embed_dim)


def test_rois_and_image_consistency(model_and_params):
    model, params = model_and_params
    img = jnp.asarray(np.random.default_rng(3).normal(size=(1, 32, 32, 3)), jnp.float32)
    boxes = jnp.asarray([[[0.1, 0.1, 0.8, 0.9], [0.0, 0.0, 1.0, 1.0]]])
    rois, x_image = model.apply({"params": params}, img, boxes, method="encode_rois_and_image")
    img_direct = model.apply({"params": params}, img, True, method="encode_image")
    np.testing.assert_allclose(np.asarray(x_image), np.asarray(img_direct), rtol=1e-4, atol=1e-5)
    rois_direct = model.apply(
        {"params": params}, img, boxes, True, method="encode_pseudo_boxes"
    )
    np.testing.assert_allclose(np.asarray(rois), np.asarray(rois_direct), rtol=1e-4, atol=1e-5)


def test_jit_consistency(model_and_params):
    model, params = model_and_params
    img = jnp.asarray(np.random.default_rng(4).normal(size=(1, 32, 32, 3)), jnp.float32)

    def f(p, x):
        return model.apply({"params": p}, x, method="encode_image")

    eager = f(params, img)
    jitted = jax.jit(f)(params, img)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-5)


def test_text_eot_pooling(model_and_params):
    """Pooled text feature must come from the argmax-token position: changing
    a token AFTER the EOT position must not change the embedding."""
    model, params = model_and_params
    txt1 = jnp.array([[1, 5, 100, 2, 0, 0] + [0] * 10], jnp.int32)  # EOT=100 at pos 2
    txt2 = txt1.at[0, 4].set(7)  # change a token after EOT
    f1 = model.apply({"params": params}, txt1, method="encode_text")
    f2 = model.apply({"params": params}, txt2, method="encode_text")
    # positions after EOT still feed attention of earlier tokens? No: causal
    # mask means position 2 only sees 0..2, so the pooled feature is invariant.
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-5, atol=1e-6)


def test_torch_roundtrip(model_and_params, tmp_path):
    torch = pytest.importorskip("torch")
    from clipself_tpu.models.torch_io import load_pretrained, save_torch_checkpoint

    model, params = model_and_params
    path = str(tmp_path / "ckpt.pt")
    save_torch_checkpoint(path, params, CFG, meta={"epoch": 3})
    # perturb params, then reload: must recover the originals exactly
    perturbed = jax.tree.map(lambda x: x + 1.0, params)
    restored = load_pretrained(path, perturbed, CFG)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(restored)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_import_resizes_pos_embed(model_and_params):
    """A checkpoint saved at a different grid must be bicubic-resized on load
    (reference `resize_evaclip_pos_embed` behavior)."""
    from clipself_tpu.models.torch_io import export_state_dict, import_state_dict

    model, params = model_and_params
    sd = export_state_dict(params, CFG)
    base = CFG.vision.grid_size  # 4 for the tiny config
    src = 8
    rng = np.random.default_rng(5)
    sd["visual.pos_embed"] = rng.normal(size=(1, src * src + 1, CFG.vision.width)).astype(
        np.float32
    )
    loaded = import_state_dict(sd, params, CFG)
    assert loaded["visual"]["pos_embed"].shape == (1, base * base + 1, CFG.vision.width)


def test_patch_dropout_rope_gather():
    """Patch dropout drops tokens during training and is a no-op without the
    rng collection; RoPE rotates the kept subset by original positions."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from clipself_tpu.models.factory import create_model

    cfg = dataclasses.replace(
        CFG, vision=dataclasses.replace(CFG.vision, patch_dropout=0.5)
    )
    model, params = create_model(cfg, dtype=jnp.float32)
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32
    )
    out_det = model.apply({"params": params}, img, method="encode_image")
    out_det2 = model.apply({"params": params}, img, method="encode_image")
    np.testing.assert_allclose(np.asarray(out_det), np.asarray(out_det2))
    out_drop = model.apply(
        {"params": params}, img, method="encode_image",
        rngs={"patch_dropout": jax.random.PRNGKey(0)},
    )
    assert out_drop.shape == out_det.shape
    assert np.isfinite(np.asarray(out_drop)).all()
    # dropping half the tokens must change the embedding
    assert np.abs(np.asarray(out_drop) - np.asarray(out_det)).max() > 1e-4


def test_rope_padded_matches_slice_compose():
    """The shipped one-pass rolled-table rope (identity rows for CLS + pad
    tail, lane rolls instead of stride-2 deinterleave) must equal the naive
    composition: slice out patch tokens, x*cos + rotate_half(x)*sin, concat
    CLS/tail back (reference semantics, `src/open_clip/eva_clip/rope.py`)."""
    import jax.numpy as jnp
    import numpy as np

    from clipself_tpu.models.rope import (
        apply_rope_padded,
        rope_tables_np,
        rotate_half,
    )

    gh = gw = 5
    d = 16
    n_total = 1 + gh * gw + 6  # CLS + patches + flash-padding tail
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, n_total, 3, d)), jnp.float32
    )

    cos_np, sin_np = rope_tables_np(gh, gw, d // 2)
    cos = jnp.asarray(cos_np[:, None, :])
    sin = jnp.asarray(sin_np[:, None, :])
    patches = x[:, 1 : 1 + gh * gw]
    naive = jnp.concatenate(
        [x[:, :1], patches * cos + rotate_half(patches) * sin, x[:, 1 + gh * gw :]],
        axis=1,
    )
    out = apply_rope_padded(x, gh, gw, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(naive), atol=1e-7)


def test_rope_gathered_matches_rotate_half():
    """The rolled-table gathered path equals x*cos + rotate_half(x)*sin on
    the gathered tables."""
    import jax.numpy as jnp
    import numpy as np

    from clipself_tpu.models.rope import (
        apply_rope_gathered,
        rope_tables_np,
        rotate_half,
    )

    gh = gw = 4
    d = 8
    k = 7
    rng = np.random.default_rng(1)
    keep = jnp.asarray(rng.choice(gh * gw, size=(2, k), replace=False))
    x = jnp.asarray(rng.normal(size=(2, k, 2, d)), jnp.float32)
    cos_np, sin_np = rope_tables_np(gh, gw, d // 2)
    cos = jnp.asarray(cos_np)[keep][:, :, None, :]
    sin = jnp.asarray(sin_np)[keep][:, :, None, :]
    naive = x * cos + rotate_half(x) * sin
    out = apply_rope_gathered(x, keep, gh, gw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(naive), atol=1e-7)


# ---- relative position bias (reference eva_vit_model.py:359-393,423-448) ----


def _rel_cfg(**vision_overrides):
    import dataclasses

    vision = dataclasses.replace(CFG.vision, rope=False, **vision_overrides)
    return dataclasses.replace(CFG, vision=vision)


def test_rel_pos_index_matches_torch_reference_semantics():
    """The static index must reproduce the BEiT construction: bucketed 2-D
    offsets + 3 dedicated cls buckets, symmetric under transpose-negation."""
    from clipself_tpu.models.eva_vit import _rel_pos_index

    idx, num_rel = _rel_pos_index((3, 4))
    assert num_rel == 5 * 7 + 3
    assert idx.shape == (13, 13)
    # cls rows/cols take the three reserved buckets
    assert (idx[0, 1:] == num_rel - 3).all()
    assert (idx[1:, 0] == num_rel - 2).all()
    assert idx[0, 0] == num_rel - 1
    # diagonal = zero offset bucket, the table center
    center = (2 * 3 - 1) * (2 * 4 - 1) // 2
    assert (np.diag(idx)[1:] == center).all()
    # same spatial offset -> same bucket: tokens (0,0)->(1,2) and (1,1)->(2,3)
    def tok(r, c):
        return 1 + r * 4 + c
    assert idx[tok(0, 0), tok(1, 2)] == idx[tok(1, 1), tok(2, 3)]
    # opposite offsets land in mirrored buckets
    assert idx[tok(1, 2), tok(0, 0)] == (num_rel - 4) - idx[tok(0, 0), tok(1, 2)]


@pytest.mark.parametrize("shared", [False, True])
def test_rel_pos_bias_forward_and_effect(shared):
    cfg = _rel_cfg(
        use_rel_pos_bias=not shared, use_shared_rel_pos_bias=shared
    )
    model, params = create_model(cfg, dtype=jnp.float32, seed=0)
    flat = jax.tree_util.tree_leaves_with_path(params)
    tables = [p for p, _ in flat if "relative_position_bias_table" in str(p)]
    assert len(tables) == (1 if shared else cfg.vision.layers)

    img = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)), jnp.float32)
    base = model.apply({"params": params}, img, method="encode_image")
    assert np.isfinite(np.asarray(base)).all()

    # zero-init tables are a no-op; perturbing one must change the output
    perturbed = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.5 if "relative_position_bias_table" in str(p) else v,
        params,
    )
    out = model.apply({"params": perturbed}, img, method="encode_image")
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-6

    # dense protocol (value-path final block) also runs under rel-pos
    dense = model.apply({"params": perturbed}, img, keep_shape=True, method="encode_dense")
    assert dense.shape == (1, 4, 4, cfg.embed_dim)


def test_rel_pos_bias_torch_roundtrip():
    from clipself_tpu.models.torch_io import export_state_dict, import_state_dict

    cfg = _rel_cfg(use_rel_pos_bias=True)
    model, params = create_model(cfg, dtype=jnp.float32, seed=0)
    sd = export_state_dict(params, cfg)
    assert "visual.blocks.0.attn.relative_position_bias_table" in sd
    rng = np.random.default_rng(1)
    for k in sd:
        if "relative_position_bias_table" in k:
            sd[k] = rng.normal(size=sd[k].shape).astype(np.float32)
    params2 = import_state_dict(sd, params, cfg, strict=True)
    got = np.asarray(
        jax.tree_util.tree_map(lambda x: x, params2)["visual"]["blocks_0"]["attn"][
            "rel_pos_bias"
        ]["relative_position_bias_table"]
    )
    np.testing.assert_allclose(
        got, sd["visual.blocks.0.attn.relative_position_bias_table"]
    )


def test_fused_proj_knob_equivalence(model_and_params):
    """fused_proj=1 (one concatenated q/k/v + SwiGLU gate-up matmul) must
    reproduce the separate-projection path: same multiplies in the same
    dtype, so f32 CPU agreement is tight (accumulation-order ULPs only)."""
    from clipself_tpu.core import knobs

    model, params = model_and_params
    img = jnp.asarray(np.random.default_rng(8).normal(size=(2, 32, 32, 3)), jnp.float32)
    grads_of = lambda: jax.grad(
        lambda p: jnp.sum(model.apply({"params": p}, img, method="encode_dense"))
    )(params)
    base = model.apply({"params": params}, img, method="encode_dense")
    gbase = grads_of()
    knobs.set("fused_proj", True)
    try:
        fused = model.apply({"params": params}, img, method="encode_dense")
        gfused = grads_of()
    finally:
        knobs.set("fused_proj", None)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), rtol=2e-6, atol=2e-6)
    key = lambda pl: jax.tree_util.keystr(pl[0])
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gbase), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(gfused), key=key),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-5, atol=5e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(ka)}",
        )
