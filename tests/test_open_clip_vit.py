"""Plain OpenCLIP ViT tower: protocol invariants + v1 mask-attention pooling."""

import jax.numpy as jnp
import numpy as np
import pytest

from clipself_tpu.core.config import get_model_config
from clipself_tpu.models.factory import create_model
from clipself_tpu.models.open_clip_vit import OpenCLIPViT

CFG = get_model_config("ViT-Tiny-Test")


@pytest.fixture(scope="module")
def model_and_params():
    return create_model(CFG, dtype=jnp.float32, seed=0)


def test_shapes_and_dense(model_and_params):
    model, params = model_and_params
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32)
    feats = model.apply({"params": params}, img, method="encode_image")
    assert feats.shape == (2, CFG.embed_dim)
    dense = model.apply({"params": params}, img, keep_shape=True, method="encode_dense")
    assert dense.shape == (2, 4, 4, CFG.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dense), axis=-1), 1.0, atol=1e-5)


def test_v2_full_box_is_mean(model_and_params):
    model, params = model_and_params
    img = jnp.asarray(np.random.default_rng(1).normal(size=(1, 32, 32, 3)), jnp.float32)
    boxes = jnp.asarray([[[0.0, 0.0, 1.0, 1.0]]])
    rois = model.apply(
        {"params": params}, img, boxes, False, "v2", method="encode_pseudo_boxes"
    )
    dense = model.apply({"params": params}, img, keep_shape=True, method="encode_dense")
    np.testing.assert_allclose(
        np.asarray(rois)[0, 0],
        np.asarray(dense)[0].reshape(-1, CFG.embed_dim).mean(0),
        rtol=1e-4, atol=1e-5,
    )


def test_boxes_to_grid_masks():
    boxes = jnp.asarray([[[0.0, 0.0, 0.5, 0.5], [0.25, 0.5, 1.0, 1.0]]])
    masks = OpenCLIPViT.boxes_to_grid_masks(boxes, 4, 4)
    assert masks.shape == (1, 2, 4, 4)
    np.testing.assert_array_equal(np.asarray(masks)[0, 0], np.asarray(
        [[1, 1, 0, 0], [1, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]], np.float32))
    np.testing.assert_array_equal(np.asarray(masks)[0, 1], np.asarray(
        [[0, 0, 0, 0], [0, 0, 0, 0], [0, 1, 1, 1], [0, 1, 1, 1]], np.float32))


def test_v1_mask_attention_pooling(model_and_params):
    """v1 queries must respond to box content: the pooled feature of a box
    over region A must differ from the same box when image content changes
    inside A but not outside (and vice versa stay identical)."""
    model, params = model_and_params
    rng = np.random.default_rng(2)
    img = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    boxes = jnp.asarray([[[0.0, 0.0, 0.5, 0.5], [0.5, 0.5, 1.0, 1.0]]])

    v1 = model.apply(
        {"params": params}, jnp.asarray(img), boxes, True, "v1", method="encode_pseudo_boxes"
    )
    assert v1.shape == (1, 2, CFG.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v1), axis=-1), 1.0, atol=1e-5)
    # different boxes give different features
    assert np.abs(np.asarray(v1)[0, 0] - np.asarray(v1)[0, 1]).max() > 1e-3


def test_v1_respects_mask_locality(model_and_params):
    """With attention restricted to the masked patches (+CLS), perturbing
    pixels far outside the box should change the query feature only through
    the shared CLS token — verify the dominant sensitivity is inside."""
    model, params = model_and_params
    rng = np.random.default_rng(3)
    img = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    img2 = img.copy()
    img2[0, 16:, 16:, :] += 10.0  # perturb bottom-right quadrant heavily
    boxes = jnp.asarray([[[0.0, 0.0, 0.45, 0.45]]])  # top-left box

    def v1(i):
        return np.asarray(
            model.apply(
                {"params": params}, jnp.asarray(i), boxes, True, "v1",
                method="encode_pseudo_boxes",
            )
        )[0, 0]

    d_far = np.abs(v1(img) - v1(img2)).max()
    img3 = img.copy()
    img3[0, :14, :14, :] += 10.0  # perturb inside the box
    d_near = np.abs(v1(img) - v1(img3)).max()
    assert d_near > d_far


def test_mask_attn_pool_via_encode_masks(model_and_params):
    model, params = model_and_params
    img = jnp.asarray(np.random.default_rng(4).normal(size=(1, 32, 32, 3)), jnp.float32)
    masks = jnp.zeros((1, 2, 4, 4), jnp.float32).at[0, 0, :2, :2].set(1.0).at[0, 1, 2:, :].set(1.0)
    attn_pooled = model.apply(
        {"params": params}, img, masks, True, True, method="encode_masks"
    )
    plain_pooled = model.apply(
        {"params": params}, img, masks, True, False, method="encode_masks"
    )
    assert attn_pooled.shape == plain_pooled.shape == (1, 2, CFG.embed_dim)
    # the two pooling styles are genuinely different computations
    assert np.abs(np.asarray(attn_pooled) - np.asarray(plain_pooled)).max() > 1e-3


def test_torch_roundtrip_openclip(model_and_params, tmp_path):
    torch = pytest.importorskip("torch")
    import jax

    from clipself_tpu.models.torch_io import load_pretrained, save_torch_checkpoint

    model, params = model_and_params
    path = str(tmp_path / "vit.pt")
    save_torch_checkpoint(path, params, CFG)
    perturbed = jax.tree.map(lambda x: x + 1.0, params)
    restored = load_pretrained(path, perturbed, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_extract_v3_matches_v1_v2_semantics():
    """v3 returns (mask-attn, roi-align) features from one pass."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clipself_tpu.core.config import get_model_config
    from clipself_tpu.models.factory import create_model

    cfg = get_model_config("ViT-Tiny-Test")
    model, params = create_model(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, cfg.vision.image_size, cfg.vision.image_size, 3)), jnp.float32)
    boxes = jnp.asarray([[[0.0, 0.0, 0.6, 0.6], [0.2, 0.2, 1.0, 1.0]]] * 2)
    v1, v2 = model.apply(
        {"params": params}, img, boxes, "v3",
        method=lambda m, i, b, t: m.visual.extract_roi_features(i, b, extract_type=t),
    )
    assert v1.shape == v2.shape == (2, 2, cfg.embed_dim)
    ref_v1 = model.apply(
        {"params": params}, img, boxes, "v1",
        method=lambda m, i, b, t: m.visual.extract_roi_features(i, b, extract_type=t),
    )
    ref_v2 = model.apply(
        {"params": params}, img, boxes, "v2",
        method=lambda m, i, b, t: m.visual.extract_roi_features(i, b, extract_type=t),
    )
    # v2 branch identical to standalone v2 (same final-block value path)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(ref_v2), atol=2e-3)
    # v1 branch highly correlated with standalone v1 (standalone applies the
    # full masked final block too — identical here)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v1), atol=2e-3)
